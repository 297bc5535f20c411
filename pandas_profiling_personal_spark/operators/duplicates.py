"""Duplicate-row detection (group-by + having).

The reference's Spark duplicate count is broken — ``dropDuplicates().count() -
distinct().count()`` is identically 0 (reference: dataframe_wrappers.py:542-550);
its top-N duplicate groups (:515-540) are correct. This engine derives BOTH from one
``groupBy(all columns)`` shuffle, cached: the grouped counts give the number of
distinct rows (for the duplicate count) and the >1 groups (for the top-N table).

Scale note: grouping on every column shuffles the full table — inherent to exact
duplicate detection. At 100 TB use :func:`duplicate_summary_hashed` below (group
on two salted 64-bit row hashes instead of the full row payload — the exchange
carries 16 bytes + count per row); ``profile()`` auto-selects it above
``duplicates_hash_min_cols`` grouped columns.
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


def duplicate_summary_hashed(
    df: DataFrame, subset: list[str] | None = None, n: int = 10
) -> tuple[dict, list[dict]]:
    """Duplicate stats + top-N groups with the row payload REPLACED by a
    128-bit hash through the exchange: ``groupBy(xxhash64(salt1, cols...),
    xxhash64(salt2, cols...))`` shuffles 16 bytes + count per row instead of
    the full row — on a 100-column table that is ~10-50x less exchange volume,
    and the group comparison is two longs instead of a 100-field row. The
    top-N groups' VALUES are recovered afterwards by broadcasting the N
    winning hash pairs back against the table and keeping one exemplar per
    group (group members are identical on ``subset`` by construction).

    Collision safety: two independently salted 64-bit hashes ~ 128 bits;
    P(any collision) <= D^2 / 2^129 — ~1.5e-15 even at 10^12 distinct rows.
    Tie-break at the top-N boundary is by hash (not column values), which can
    admit a different same-count group than the exact path — the documented
    trade of the wide/scale tier; the RETURNED rows are re-sorted by
    (n_dup desc, subset values) so presentation order matches the exact path.
    """
    from pyspark import StorageLevel

    subset = subset or df.columns
    cols = [S.col(c) for c in subset]
    h1 = F.xxhash64(F.lit(1), *cols).alias("__h1")
    h2 = F.xxhash64(F.lit(2), *cols).alias("__h2")
    grouped = (
        df.groupBy(h1, h2)
        .agg(F.count(F.lit(1)).alias("n_dup"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    try:
        row = grouped.agg(
            F.coalesce(F.sum("n_dup"), F.lit(0)).alias("n_rows"),
            F.count(F.lit(1)).alias("n_distinct_rows"),
        ).collect()[0]
        nr, nd = row["n_rows"], row["n_distinct_rows"]
        stats = {
            "n_rows": nr,
            "n_distinct_rows": nd,
            "n_duplicate_rows": nr - nd,
            "p_duplicates": (nr - nd) / nr if nr else 0.0,
        }
        top = (
            grouped.where(F.col("n_dup") > 1)
            .orderBy(F.desc("n_dup"), F.asc("__h1"), F.asc("__h2"))
            .limit(n)
            .collect()
        )
        if not top:
            return stats, []
        spark = df.sparkSession
        tops_df = spark.createDataFrame(
            [(r["__h1"], r["__h2"], r["n_dup"]) for r in top],
            "__h1 long, __h2 long, n_dup long",
        )
        exemplars = (
            df.select(*cols, F.xxhash64(F.lit(1), *cols).alias("__h1"),
                      F.xxhash64(F.lit(2), *cols).alias("__h2"))
            .join(F.broadcast(tops_df), ["__h1", "__h2"])
            .dropDuplicates(["__h1", "__h2"])
            .select(*[S.col(c) for c in subset], F.col("n_dup"))
            .collect()
        )
        out = [r.asDict() for r in exemplars]
        out.sort(key=lambda d: (-d["n_dup"], tuple(str(d[c]) for c in subset)))
        return stats, out
    finally:
        grouped.unpersist()
