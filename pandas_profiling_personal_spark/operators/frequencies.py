"""Frequency tables, distinct/unique counts, top-K values.

The reference runs ``dropna.groupBy(col).count()`` + ``orderBy.limit(250).toPandas()``
once per column (reference: series_wrappers.py:104-131, summary_algorithms.py:449-480)
— N shuffles for N columns. This engine *melts* all requested columns into
``(column, value)`` pairs with one ``explode`` and aggregates them in ONE shuffle:
map-side partial aggregation compresses each partition to its distinct values before
the exchange, so the explode factor never hits the wire. Per-column helpers are also
provided for single-column use.

Unique-value semantics: ``n_unique`` = number of values occurring exactly once —
the reference's Spark backend gets this wrong (``dropDuplicates().count()``, which
is just distinct count; reference: series_wrappers.py:170-171). We implement the
documented pandas semantics (summary_algorithms.py:93-94).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from pandas_profiling_personal_spark.functions import stats as S


def melt(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Long form ``(column, value)`` with values cast to string, nulls dropped.

    One narrow projection + explode; no shuffle by itself."""
    columns = columns or df.columns
    structs = [
        F.struct(
            F.lit(c).alias("column"), S.col(c).cast("string").alias("value")
        )
        for c in columns
    ]
    return (
        df.select(F.explode(F.array(*structs)).alias("kv"))
        .select("kv.column", "kv.value")
        .where(F.col("value").isNotNull())
    )


def value_counts(df: DataFrame, column: str) -> DataFrame:
    """Per-column frequency table (NaN/null excluded), native value type.

    reference: series_wrappers.py:104-131."""
    c = S.col(column)
    return df.where(c.isNotNull()).groupBy(c.alias("value")).agg(
        F.count(F.lit(1)).alias("count")
    )


def value_counts_all(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Frequency tables for ALL columns in one shuffle: (column, value, count)."""
    return melt(df, columns).groupBy("column", "value").agg(
        F.count(F.lit(1)).alias("count")
    )


def distinct_unique_counts(
    df: DataFrame, columns: list[str] | None = None
) -> DataFrame:
    """Exact ``(column, n_distinct, n_unique)`` for all columns in one shuffle."""
    vc = value_counts_all(df, columns)
    return vc.groupBy("column").agg(
        F.count(F.lit(1)).alias("n_distinct"),
        F.coalesce(
            F.sum(F.when(F.col("count") == 1, 1).otherwise(0)), F.lit(0)
        ).alias("n_unique"),
    )


def top_k_all(
    df: DataFrame, k: int, columns: list[str] | None = None
) -> DataFrame:
    """Top-K most frequent values per column, deterministic tie-break on value.

    (column, value, count, rank); one shuffle + one small window over the already
    aggregated counts (reference transfers top-250 per column — K1,
    summary_algorithms.py:462-468)."""
    vc = value_counts_all(df, columns)
    w = Window.partitionBy("column").orderBy(
        F.desc("count"), F.asc("value")
    )
    return (
        vc.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def frequency_summary(
    df: DataFrame,
    columns: list[str] | None = None,
    k: int = 10,
) -> tuple[dict[str, dict], dict[str, list[tuple[str, int]]]]:
    """Driver-side convenience: one job computing, per column, exact
    ``n_distinct``/``n_unique`` and the top-K value list.

    Returns ``({column: {n_distinct, n_unique}}, {column: [(value, count), ...]})``.
    """
    columns = columns or df.columns
    topk = top_k_all(df, k, columns)
    du = distinct_unique_counts(df, columns)
    joined = du.join(topk, "column", "left").collect()
    scalars: dict[str, dict] = {}
    tops: dict[str, list[tuple[str, int]]] = {c: [] for c in columns}
    rows = sorted(
        joined, key=lambda r: (r["column"], r["rank"] if r["rank"] is not None else 0)
    )
    for r in rows:
        scalars[r["column"]] = {
            "n_distinct": r["n_distinct"],
            "n_unique": r["n_unique"],
        }
        if r["rank"] is not None:
            tops[r["column"]].append((r["value"], r["count"]))
    return scalars, tops
