"""Time-series analysis over event tables: regular-grid resampling,
autocorrelation, seasonal profile, rolling trend.

The reference has no time-series mode at all (its successor project added
one later, pandas-side only); these are the distributed equivalents, and
the design constraint is the same one that shapes every operator here:
NO global-order window over raw rows. A lag/ACF formulated as
``lag(value) OVER (ORDER BY ts)`` is a single-partition sort — the
classic scale-killer. Instead:

1. ``resample`` first: one combine-friendly shuffle collapses the raw
   table to a REGULAR grid (one row per date_trunc bucket). The grid's
   cardinality is bounded by the time span / granularity — hours of a
   decade are ~87k rows — so everything downstream is bounded work
   regardless of the raw row count.
2. ``acf`` then computes lag-k correlation as an EQUI-join of the grid
   with a time-shifted copy of itself (t = t' + k·Δ), all requested lags
   in one join via a tiny exploded lag dimension — Catalyst broadcasts
   it. Pearson over the overlapping pairs (pandas ``Series.autocorr``
   semantics, not the classical constant-denominator estimator — the
   difference and the gap handling are documented below).
3. ``seasonal_profile`` / ``rolling_trend`` are a groupBy and a bounded
   window over the grid respectively.

Gaps: empty buckets simply do not exist as grid rows, so a lag pair
whose partner bucket is missing drops out of that lag's correlation
(count ``n_pairs`` is reported so thin lags are visible). Call
``resample(..., fill=True)`` to densify with explicit nulls instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_GRAN_US = {
    "minute": 60_000_000,
    "hour": 3_600_000_000,
    "day": 86_400_000_000,
}


def resample(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    granularity: str = "hour",
    fill: bool = False,
    stable: bool = False,
) -> DataFrame:
    """Collapse events to a regular (t, v, n) grid: v = mean(value) per
    date_trunc bucket. One partial-aggregated shuffle over the raw table;
    with ``fill=True`` the full bucket sequence between min and max t is
    generated (via one 1-row min/max aggregate + sequence explode) and
    empty buckets appear with v = NULL.

    ``stable=True`` computes the bucket mean as an exact DECIMAL sum
    divided by the count instead of ``avg`` — order-independent, so the
    mean is bit-identical across partition layouts and engines. A plain
    double ``avg`` wobbles in its last ulp with partition order; when a
    bucket mean then lands on a ``round(·, 4)`` boundary, downstream
    rounded outputs flip between runs (observed on the events table: one
    hourly bucket sat exactly on x.xxxx5). The cross-engine oracle tier
    runs stable=True; the default stays ``avg`` (whole-stage-codegen'd,
    no decimal arithmetic in the hot path)."""
    if granularity not in _GRAN_US:
        raise ValueError(
            f"resample: granularity must be one of {sorted(_GRAN_US)}"
        )
    t = F.date_trunc(granularity, F.col(ts_col).cast("timestamp"))
    base = df.where(F.col(ts_col).isNotNull()).groupBy(t.alias("t"))
    if stable:
        from pandas_profiling_personal_spark.functions.stats import (
            stable_sum,
        )

        grid = base.agg(
            stable_sum(F.col(value_col), 6).alias("__s"),
            F.count(F.col(value_col)).alias("n"),
        ).select(
            "t",
            F.when(
                F.col("n") > 0, F.col("__s") / F.col("n")
            ).alias("v"),
            "n",
        )
    else:
        grid = base.agg(
            F.avg(F.col(value_col)).alias("v"),
            F.count(F.col(value_col)).alias("n"),
        )
    if fill:
        span = grid.agg(
            F.min("t").alias("lo"), F.max("t").alias("hi")
        ).collect()[0]
        if span["lo"] is None:
            return grid
        step = f"interval 1 {granularity}"
        full = grid.sparkSession.range(1).select(
            F.explode(
                F.sequence(
                    F.lit(span["lo"]),
                    F.lit(span["hi"]),
                    F.expr(step),
                )
            ).alias("t")
        )
        grid = full.join(grid, "t", "left").select(
            "t", "v", F.coalesce("n", F.lit(0)).alias("n")
        )
    return grid


def acf(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    lags: list[int] | int = 24,
    granularity: str = "hour",
) -> DataFrame:
    """Autocorrelation of the resampled series at each requested lag
    (buckets of ``granularity``): Pearson correlation between the grid
    and its lag-k shift over the overlapping buckets — the
    ``pandas.Series.autocorr`` definition, which unlike the classical
    ACF estimator uses per-lag means/variances, making each lag an
    honest independent correlation (and SQL-reproducible).

    Returns (lag, n_pairs, acf_value) — one row per lag. Plan: the grid
    (bounded rows) self-joins through a tiny exploded lag dimension on a
    pure equality key, then ONE groupBy(lag) aggregate; nothing here
    scales with the raw row count."""
    if isinstance(lags, int):
        lags = list(range(1, lags + 1))
    if not lags or any(k <= 0 for k in lags):
        raise ValueError("acf: lags must be positive bucket counts")
    grid = resample(df, ts_col, value_col, granularity).where(
        F.col("v").isNotNull()
    )
    step_us = _GRAN_US[granularity]
    lag_dim = grid.sparkSession.range(1).select(
        F.explode(F.array(*[F.lit(int(k)) for k in lags])).alias("lag")
    )
    # shifted copy: (t + k·Δ, lag, v') joins the grid on t — equality only
    shifted = grid.crossJoin(lag_dim).select(
        F.timestamp_micros(
            F.unix_micros(F.col("t")) + F.col("lag") * F.lit(step_us)
        ).alias("t"),
        "lag",
        F.col("v").alias("v_lag"),
    )
    return (
        grid.join(shifted, "t", "inner")
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.corr("v", "v_lag").alias("acf_value"),
        )
    )


def seasonal_profile(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    period: str = "hour_of_day",
) -> DataFrame:
    """Mean/dispersion of the value by calendar position — the cheap
    seasonality read (hour-of-day / day-of-week / day-of-month / month):
    one combine-friendly shuffle with at most 31 output rows."""
    t = F.col(ts_col).cast("timestamp")
    keys = {
        "hour_of_day": F.hour(t),
        "day_of_week": F.dayofweek(t),
        "day_of_month": F.dayofmonth(t),
        "month": F.month(t),
    }
    if period not in keys:
        raise ValueError(
            f"seasonal_profile: period must be one of {sorted(keys)}"
        )
    return (
        df.where(F.col(ts_col).isNotNull())
        .groupBy(keys[period].alias("period"))
        .agg(
            F.count(F.col(value_col)).alias("n"),
            F.avg(F.col(value_col)).alias("mean_value"),
            F.stddev_samp(F.col(value_col)).alias("std_value"),
        )
    )


def rolling_trend(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    window_buckets: int = 24,
    granularity: str = "hour",
    stable_sums: bool = False,
    stable: bool = False,
) -> DataFrame:
    """Centered moving average over the resampled grid — the trend
    component of a classical decomposition. The window runs over the
    GRID (bounded by time span / granularity), not the raw rows, so the
    single-partition ordering it needs is a deliberate bounded choice,
    not a scale hazard; the raw table only ever sees the resample
    shuffle.

    ``stable_sums=True`` adds a ``trend_sum_x1e4`` column: the window sum
    of the 4-decimal-rounded grid values, scaled to BIGINT — integer
    window arithmetic is exact in every engine, so the column is
    bit-identical across engines and partition orders (the cross-engine
    oracle tier; a double window-average is a SECOND-order float
    reduction whose last ulp legitimately differs between engines, and
    even a DECIMAL window sum is inexact in some engines' sliding-frame
    accumulators — measured: DuckDB 1.0 deviates by 1 unit in the last
    place on ~15% of frames)."""
    grid = resample(df, ts_col, value_col, granularity, stable=stable)
    half = window_buckets // 2
    w = (
        Window.orderBy(F.col("t"))
        .rowsBetween(-half, window_buckets - half - 1)
    )
    cols = [
        F.col("t"),
        F.col("v"),
        F.col("n"),
        F.avg("v").over(w).alias("trend"),
        F.count("v").over(w).alias("trend_support"),
    ]
    if stable_sums:
        vi = (
            F.round(F.col("v"), 4).cast("decimal(20,4)") * F.lit(10000)
        ).cast("long")
        cols.append(F.sum(vi).over(w).alias("trend_sum_x1e4"))
    return grid.select(*cols)
