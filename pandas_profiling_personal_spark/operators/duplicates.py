"""Duplicate-row detection (group-by + having).

The reference's Spark duplicate count is broken — ``dropDuplicates().count() -
distinct().count()`` is identically 0 (reference: dataframe_wrappers.py:542-550);
its top-N duplicate groups (:515-540) are correct. This engine derives BOTH from one
``groupBy(all columns)`` shuffle, cached: the grouped counts give the number of
distinct rows (for the duplicate count) and the >1 groups (for the top-N table).

Scale note: grouping on every column shuffles the full table — inherent to exact
duplicate detection. At 100 TB prefer :mod:`...operators.dedup`'s hash-based
variant (group on a single 128-bit hash of the row instead of the full row payload),
which shuffles only (hash, count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pandas_profiling_personal_spark.functions import stats as S


def duplicate_groups(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """All row groups appearing more than once: (subset columns..., n_dup)."""
    subset = subset or df.columns
    return (
        df.groupBy(*[S.col(c) for c in subset])
        .agg(F.count(F.lit(1)).alias("n_dup"))
        .where(F.col("n_dup") > 1)
    )


def top_duplicates(
    df: DataFrame, subset: list[str] | None = None, n: int = 10
) -> DataFrame:
    """Top-N duplicate groups, deterministic order (count desc, then key columns).

    reference: dataframe_wrappers.py:515-540, duplicates.head=10."""
    subset = subset or df.columns
    g = duplicate_groups(df, subset)
    return g.orderBy(F.desc("n_dup"), *[S.col(c).asc() for c in subset]).limit(n)


def duplicate_stats(df: DataFrame, subset: list[str] | None = None) -> dict:
    """{n_rows, n_distinct_rows, n_duplicate_rows, p_duplicates} in one shuffle.

    ``n_duplicate_rows`` counts rows beyond the first of each group — the pandas
    ``duplicated(keep='first').sum()`` semantics the reference documents
    (dataframe_wrappers.py:284-294)."""
    subset = subset or df.columns
    grouped = df.groupBy(*[S.col(c) for c in subset]).agg(
        F.count(F.lit(1)).alias("n_dup")
    )
    row = grouped.agg(
        F.count(F.lit(1)).alias("n_distinct_rows"),
        F.coalesce(F.sum("n_dup"), F.lit(0)).alias("n_rows"),
    ).collect()[0]
    n, nd = row["n_rows"], row["n_distinct_rows"]
    return {
        "n_rows": n,
        "n_distinct_rows": nd,
        "n_duplicate_rows": n - nd,
        "p_duplicates": (n - nd) / n if n else 0.0,
    }
