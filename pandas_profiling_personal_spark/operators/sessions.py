"""Event-stream batch operators: time rollups and sessionization.

The reference is batch-only and has no window functions at all (SURVEY.md §2.8/
§2.12); these are the standard event-table operators a profiling/pipeline engine
needs, built on Spark windows: time-bucketed rollups (the batch twin of the
streaming profile) and gap-based sessionization (lag + cumulative sum — the
classic pattern; `session_window` covers the streaming side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from pandas_profiling_personal_spark.functions import stats as S


def time_rollup(
    df: DataFrame,
    ts_col: str,
    granularity: str = "hour",
    group_cols: list[str] | None = None,
    value_col: str | None = None,
) -> DataFrame:
    """Counts (and optional stable value sums) per date_trunc bucket — one
    combine-friendly shuffle (bucket, group...)."""
    keys = [
        F.date_trunc(granularity, S.col(ts_col)).alias("bucket")
    ] + [S.col(c) for c in (group_cols or [])]
    aggs = [F.count(F.lit(1)).alias("n")]
    if value_col:
        aggs.append(S.stable_sum(S.col(value_col)).alias("value_sum"))
    return df.groupBy(*keys).agg(*aggs)


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_minutes: int = 30,
) -> DataFrame:
    """Assign a session id per user: a new session starts when the gap from the
    previous event exceeds ``gap_minutes``. lag + cumulative sum over a
    per-user window — shuffles once on the user key; each user's timeline sorts
    within its partition (no global sort)."""
    u, t = S.col(user_col), S.col(ts_col)
    w = Window.partitionBy(u).orderBy(t)
    gap = F.unix_micros(t.cast("timestamp")) - F.unix_micros(
        F.lag(t).over(w).cast("timestamp")
    )
    new_session = F.when(
        gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), 1
    ).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )


def session_stats(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_minutes: int = 30,
) -> DataFrame:
    """(user, n_sessions, n_events) — sessionize then aggregate."""
    s = sessionize(df, user_col, ts_col, gap_minutes)
    return s.groupBy(S.col(user_col).alias("user_key")).agg(
        F.count_distinct("session_id").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )
