"""Extension-dispatched file reading (S1, reference:
src/pandas_profiling/utils/dataframe.py:24-67 read_pandas).

Columnar/native formats go straight through ``spark.read`` (distributed, pushdown).
Exotic single-node formats the reference supports via pandas (Stata, SAS, HDF,
Excel, pickle) are read driver-side with pandas and parallelized with
``spark.createDataFrame`` — correct but driver-bounded; documented as such.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

def read_parquet(spark: SparkSession, path: str | Path) -> DataFrame:
    """Parquet reader tolerant of TIMESTAMP(NANOS) columns, which vanilla
    ``spark.read.parquet`` rejects ([PARQUET_TYPE_ILLEGAL]). Nanos columns are
    read as longs (``spark.sql.legacy.parquet.nanosAsLong``) and converted back to
    microsecond timestamps. Detection uses only the parquet footer (no data read).
    """
    path = str(path)
    ns_cols: list[str] = []
    try:
        import pyarrow.parquet as pq
        import pyarrow as pa

        target = Path(path)
        if target.is_dir():
            target = next(p for p in sorted(target.rglob("*.parquet")))
        schema = pq.read_schema(str(target))
        ns_cols = [
            f.name
            for f in schema
            if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
        ]
    except Exception:
        ns_cols = []
    if not ns_cols:
        return spark.read.parquet(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    from pyspark.sql import functions as F, types as T

    for c in ns_cols:
        if isinstance(df.schema[c].dataType, T.LongType):
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


_SPARK_NATIVE = {
    ".parquet": "parquet",
    ".orc": "orc",
    ".csv": "csv",
    ".tsv": "csv",
    ".json": "json",
    ".jsonl": "json",
    ".ndjson": "json",
}

_PANDAS_READERS = {
    ".xlsx": "read_excel",
    ".xls": "read_excel",
    ".dta": "read_stata",
    ".sas7bdat": "read_sas",
    ".xpt": "read_sas",
    ".h5": "read_hdf",
    ".hdf": "read_hdf",
    ".pkl": "read_pickle",
    ".pickle": "read_pickle",
}


def read_table(spark: SparkSession, path: str | Path, **options) -> DataFrame:
    """Read any supported file into a Spark DataFrame, dispatching on extension."""
    p = Path(path)
    suffix = p.suffix.lower()
    if suffix == ".parquet":
        return read_parquet(spark, p)
    if suffix in _SPARK_NATIVE:
        fmt = _SPARK_NATIVE[suffix]
        reader = spark.read
        if fmt == "csv":
            reader = reader.options(
                header=options.pop("header", True),
                inferSchema=options.pop("inferSchema", True),
                sep="\t" if suffix == ".tsv" else options.pop("sep", ","),
            )
        return reader.options(**options).format(fmt).load(str(p))
    if suffix in _PANDAS_READERS:
        import pandas as pd

        pdf = getattr(pd, _PANDAS_READERS[suffix])(str(p), **options)
        # normalize column names to strings (reference: dataframe_wrappers.py:243-270)
        pdf.columns = [str(c) for c in pdf.columns]
        return spark.createDataFrame(pdf)
    raise ValueError(f"Unsupported file extension: {suffix!r} ({p})")
