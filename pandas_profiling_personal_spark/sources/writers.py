"""Sinks for pipeline outputs (deduplicated corpora, profile tables, pair
lists) with the layout controls that matter at scale.

The reference's only sinks are report artifacts (HTML/JSON/pickle — covered in
``report/``; reference: src/pandas_profiling/profile_report.py:345-430). A
corpus-scale engine also needs to MATERIALIZE results: these writers are thin,
declarative wrappers over ``DataFrameWriter`` that make the three
scale-critical choices explicit instead of implicit:

* **partition_by** — hive-style directory partitioning for downstream
  partition pruning (date/language/source buckets).
* **target_file_rows** — bounds output file count and size via
  ``maxRecordsPerFile`` so a 1000-executor write neither emits a million tiny
  files nor single multi-GB ones.
* **sort_within_partitions** — clusters rows inside each file so parquet
  min/max page stats actually prune (e.g. sort by doc_id for point lookups).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from pandas_profiling_personal_spark.functions import stats as S

_FORMATS = {"parquet", "orc", "json", "csv"}


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "error",
    partition_by: list[str] | None = None,
    sort_within_partitions: list[str] | None = None,
    target_file_rows: int | None = None,
    compression: str | None = None,
    **options,
) -> None:
    """Write ``df`` to ``path`` in ``fmt`` with explicit scale layout.

    ``partition_by`` columns become directory partitions; when given, the data
    is repartitioned on them first so each task writes to one directory
    (otherwise every task can open a file in every partition — the classic
    small-files explosion)."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported sink format {fmt!r}; one of {sorted(_FORMATS)}")
    out = df
    if partition_by:
        out = out.repartition(*[S.col(c) for c in partition_by])
    if sort_within_partitions:
        out = out.sortWithinPartitions(*[S.col(c) for c in sort_within_partitions])
    writer = out.write.format(fmt).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if target_file_rows:
        writer = writer.option("maxRecordsPerFile", int(target_file_rows))
    if compression:
        writer = writer.option("compression", compression)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)


def write_deduplicated(
    df: DataFrame,
    keep_list: DataFrame,
    id_col: str,
    path: str,
    fmt: str = "parquet",
    **kwargs,
) -> None:
    """Materialize the deduplicated corpus: inner-join ``df`` against the
    ``keep=true`` rows of a :func:`~pandas_profiling_personal_spark.operators.
    dedup.dedup_keep_list` result and write it. The keep side is projected to
    the bare id (narrowest possible shuffle); the join strategy is left to
    AQE — the keep list is corpus-cardinality, so forcing a broadcast would be
    wrong at scale."""
    from pyspark.sql import functions as F

    keep = keep_list.where(F.col("keep")).select(
        S.col(id_col).alias("__keep_id")
    )
    kept = df.join(
        keep, S.col(id_col) == F.col("__keep_id"), "inner"
    ).drop("__keep_id")
    write_table(kept, path, fmt=fmt, **kwargs)
