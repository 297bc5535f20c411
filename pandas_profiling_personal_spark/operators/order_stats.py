"""Order-dependent statistics: monotonicity (A10) and extreme observations (K5).

Spark DataFrames have no row order, so monotonicity is only meaningful relative
to an explicit order column — the reference's Spark path hardcodes False
(reference: summary_algorithms.py:600-606), which is a lie; this engine either
gets an order column or reports None. The check is distributed: lag() within
partitions via a range-partitioned sort, each partition checked independently,
plus boundary rows — implemented simply as lag over a global orderBy window
(one range-shuffle; fine for a per-request statistic).

Extreme observations are the exact bottom-N / top-N values with counts
(reference: frequency_table_utils.py:82-117 slices the value_counts index;
here: orderBy + limit = TakeOrderedAndProject, no full sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from pandas_profiling_personal_spark.functions import stats as S


def monotonicity_df(df: DataFrame, column: str, order_col: str) -> DataFrame:
    """One-row DataFrame (increasing, strictly_increasing, decreasing,
    strictly_decreasing booleans) of ``column`` ordered by ``order_col``.
    ``order_col`` should be a total order (unique) for a deterministic answer."""
    c, o = S.col(column), S.col(order_col)
    w = Window.orderBy(F.col("o"))
    prev = F.lag(F.col("v")).over(w)
    return (
        df.select(c.alias("v"), o.alias("o"))
        .where(F.col("v").isNotNull())
        .select(
            (F.col("v") >= prev).alias("inc"),
            (F.col("v") > prev).alias("sinc"),
            (F.col("v") <= prev).alias("dec"),
            (F.col("v") < prev).alias("sdec"),
        )
        .agg(
            F.min(F.coalesce("inc", F.lit(True))).alias("increasing"),
            F.min(F.coalesce("sinc", F.lit(True))).alias("strictly_increasing"),
            F.min(F.coalesce("dec", F.lit(True))).alias("decreasing"),
            F.min(F.coalesce("sdec", F.lit(True))).alias("strictly_decreasing"),
        )
    )


def monotonicity(
    df: DataFrame, column: str, order_col: str
) -> dict[str, bool | None]:
    """{increasing, strictly_increasing, decreasing, strictly_decreasing} of
    ``column`` when rows are ordered by ``order_col``."""
    return monotonicity_df(df, column, order_col).collect()[0].asDict()


def extreme_observations(
    df: DataFrame, column: str, n: int = 10
) -> dict[str, list[dict]]:
    """{'min': [{value, count} x n ascending], 'max': [... descending]} — two
    TakeOrderedAndProject jobs over the value counts (no full sort)."""
    c = S.col(column)
    vc = (
        df.where(c.isNotNull())
        .groupBy(c.alias("value"))
        .agg(F.count(F.lit(1)).alias("count"))
    )
    lo = vc.orderBy(F.asc("value")).limit(n).collect()
    hi = vc.orderBy(F.desc("value")).limit(n).collect()
    return {
        "min": [r.asDict() for r in lo],
        "max": [r.asDict() for r in hi],
    }


def size_estimate(df: DataFrame) -> int | None:
    """Estimated in-memory/serialized size in bytes from Catalyst statistics
    (column pruning aware). The reference samples cube-root rows to pandas and
    extrapolates (reference: dataframe_wrappers.py:503-513) — driver-heavy and
    noisy; the optimizer's own estimate is free and scale-independent. Returns
    None if the JVM internals are unavailable."""
    try:
        jdf = df._jdf  # noqa: SLF001 — no public API for plan stats
        size = jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        # py4j auto-converts the scala BigInt to a Python int on Spark 4;
        # older bridges hand back a JVM object needing toString (the silent
        # always-None bug this except used to swallow — caught by the r8
        # inventory test, not by any user)
        return int(size if isinstance(size, int) else size.toString())
    except Exception:
        return None
