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


#: calendar-position extractors shared by the decomposition (the
#: seasonal_profile keys, as column functions over the grid's t)
_PERIODS = {
    "hour_of_day": F.hour,
    "day_of_week": F.dayofweek,
    "day_of_month": F.dayofmonth,
    "month": F.month,
}


def seasonal_decompose(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    window_buckets: int = 24,
    granularity: str = "hour",
    period: str = "hour_of_day",
    stable: bool = False,
    stable_sums: bool = False,
) -> DataFrame:
    """Classical additive decomposition on the bounded grid:
    ``v = trend + seasonal + resid`` per bucket — the explanatory layer on
    top of :func:`rolling_trend` / :func:`seasonal_profile` (which report
    the components in isolation; this reconciles them per bucket so the
    residual is inspectable, e.g. by :func:`detect_anomalies` semantics).

    * ``trend``: centered moving average over ``window_buckets`` grid rows
      (:func:`rolling_trend` — the window runs over the BOUNDED grid,
      never the raw table)
    * ``seasonal``: per-``period`` mean of the detrended series, centered
      so the period effects sum to zero (the classical moving-average
      decomposition; an uncentered mean would leak level into seasonality)
    * ``resid``: what neither explains — the anomaly surface

    Scale shape: the raw table pays the one resample shuffle; everything
    after runs on the grid (window + one tiny per-period aggregate joined
    back — at most |period positions| rows, broadcast by AQE).

    ``stable``/``stable_sums`` are the cross-engine oracle tiers of the
    underlying grid (exact DECIMAL bucket means; scaled-BIGINT window
    sums — see :func:`rolling_trend`); production default stays double
    ``avg`` end-to-end."""
    if period not in _PERIODS:
        raise ValueError(
            f"seasonal_decompose: period must be one of {sorted(_PERIODS)}"
        )
    base = rolling_trend(
        df, ts_col, value_col, window_buckets, granularity,
        stable_sums=stable_sums, stable=stable,
    )
    pos = _PERIODS[period](F.col("t")).alias("period_pos")
    base = base.select("*", pos)
    det = (F.col("v") - F.col("trend")).alias("detrended")
    per_pos = base.select("period_pos", det).groupBy("period_pos").agg(
        F.avg("detrended").alias("__s_raw"),
        F.count("detrended").alias("seasonal_support"),
    )
    # center the period effects: seasonal must sum to ~0 across positions
    # (unweighted over positions, the classical convention)
    center = per_pos.agg(F.avg("__s_raw").alias("__c"))
    seasonal = per_pos.crossJoin(center).select(
        "period_pos",
        (F.col("__s_raw") - F.col("__c")).alias("seasonal"),
        "seasonal_support",
    )
    out = base.join(seasonal, "period_pos", "left")
    keep = [
        "t", "v", "n", "period_pos", "trend", "trend_support",
        "seasonal", "seasonal_support",
        (F.col("v") - F.col("trend") - F.col("seasonal")).alias("resid"),
    ]
    if stable_sums:
        keep.append(F.col("trend_sum_x1e4"))
    return out.select(*keep)


_SEASON_OF_GRAN = {"minute": "hour_of_day", "hour": "hour_of_day",
                   "day": "day_of_week"}


def timeseries_profile(
    df: DataFrame,
    ts_col: str,
    value_cols: list[str],
    lags: int = 24,
    granularity: str = "hour",
) -> dict:
    """Per-column time-series diagnostics for ``profile()``'s tsmode tier
    (the reference has no time-series mode; its successor's is
    pandas-only): autocorrelation, calendar seasonality strength, linear
    trend, grid coverage — for EVERY numeric column from ONE grid
    aggregate.

    Scale shape: a single date_trunc groupBy computes (sum, sumsq, count)
    for all columns in one combine-friendly shuffle — the only pass over
    the raw table. The grid (bounded by timespan/granularity) collects to
    the driver, where ACF/trend/seasonality are exact arithmetic over
    bucket sums; per-column work never touches the raw rows again. This
    is the drift-state pattern: bounded aggregate rows cross the network,
    everything after is driver math.

    Definitions (documented, deliberately simple):
    * ``acf`` — Pearson correlation of the bucket-mean series with its
      lag-k shift over overlapping non-empty buckets (same semantics as
      :func:`acf`, pandas ``Series.autocorr``).
    * ``trend_r`` — Pearson correlation of bucket means against bucket
      time: the sign/strength of a monotone linear drift.
    * ``seasonal_strength`` — one-way ANOVA eta²: between-calendar-period
      sum of squares over total, computed exactly from the RAW-row sums
      (not bucket means), so it answers "how much raw variance does the
      calendar position explain".
    """
    cells = grid_cells(df, ts_col, value_cols, granularity)
    return finalize_timeseries(cells, ts_col, value_cols, lags, granularity)


def grid_cells(
    df: DataFrame,
    ts_col: str,
    value_cols: list[str],
    granularity: str = "hour",
    max_grid_rows: int = 200_000,
) -> dict:
    """The ONE raw-table pass behind the tsmode tier: per date_trunc
    bucket, (sum, sumsq, count) for every column in a single
    combine-friendly shuffle. Returns {col: [(t, s, ss, n), ...]} sorted
    by t — plain additive cells, which is what makes the per-shard
    time-series STATE exactly mergeable (plans/incremental.py): two
    shards' cells merge by vector add with zero information loss.

    The grid is bounded by timespan/granularity, NOT the raw row count —
    but minute buckets over decades would still be millions of driver
    rows × 3 cells per column, so the collect is capped: more than
    ``max_grid_rows`` buckets refuses loudly naming the fix (coarser
    granularity, shorter span, or a raised cap) instead of silently
    OOMing the driver."""
    if granularity not in _GRAN_US:
        raise ValueError(
            f"timeseries grid: granularity must be one of "
            f"{sorted(_GRAN_US)}"
        )
    t = F.date_trunc(granularity, F.col(ts_col).cast("timestamp"))
    aggs = []
    for c in value_cols:
        v = F.col(c).cast("double")
        ok = v.isNotNull() & ~F.isnan(v)
        clean = F.when(ok, v)
        aggs += [
            F.sum(clean).alias(f"__s_{c}"),
            F.sum(clean * clean).alias(f"__ss_{c}"),
            F.count(clean).alias(f"__n_{c}"),
        ]
    rows = (
        df.where(F.col(ts_col).isNotNull())
        .groupBy(t.alias("t"))
        .agg(*aggs)
        .limit(max_grid_rows + 1)
        .collect()
    )
    if len(rows) > max_grid_rows:
        raise ValueError(
            f"timeseries grid: more than {max_grid_rows} "
            f"{granularity} buckets — the grid diagnostics are driver "
            "arithmetic over collected cells; use a coarser granularity, "
            "profile a narrower time span, or raise max_grid_rows "
            "explicitly"
        )
    rows.sort(key=lambda r: r["t"])
    return {
        c: [
            (r["t"], r[f"__s_{c}"], r[f"__ss_{c}"], r[f"__n_{c}"])
            for r in rows
        ]
        for c in value_cols
    }


def finalize_timeseries(
    cells: dict,
    ts_col: str,
    value_cols: list[str],
    lags: int = 24,
    granularity: str = "hour",
) -> dict:
    """Driver arithmetic over additive grid cells -> the tsmode dict.
    Shared verbatim by the batch tier (:func:`timeseries_profile`) and
    the mergeable per-shard state (plans/incremental.py), so merged
    states finalize EXACTLY like a whole-table pass."""
    season_key = _SEASON_OF_GRAN.get(granularity, "hour_of_day")
    # bucket coverage counts buckets with AT LEAST ONE tracked observation
    # (n > 0 in some column) — deliberately, so the batch path and the
    # mergeable state (which stores only n>0 cells,
    # plans/incremental.timeseries_partial) agree by construction even on
    # buckets whose every tracked column is null
    all_ts = sorted(
        {
            t
            for c in value_cols
            for t, _s, _ss, n in cells.get(c, [])
            if n and n > 0
        }
    )
    rows = all_ts

    def _period(ts):
        return ts.hour if season_key == "hour_of_day" else ts.isoweekday()

    out: dict = {
        "ts_col": ts_col,
        "granularity": granularity,
        "seasonal_period": season_key,
        "n_buckets": len(rows),
        "columns": {},
    }
    if not rows:
        return out
    span = rows[-1] - rows[0]
    step = _GRAN_US[granularity] / 1_000_000
    out["empty_buckets"] = max(
        0, int(round(span.total_seconds() / step)) + 1 - len(rows)
    )

    def _corr(xs, ys):
        n = len(xs)
        if n < 3:
            return None
        mx = sum(xs) / n
        my = sum(ys) / n
        sxx = sum((x - mx) ** 2 for x in xs)
        syy = sum((y - my) ** 2 for y in ys)
        if sxx <= 0 or syy <= 0:
            return None
        sxy = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
        return sxy / (sxx * syy) ** 0.5

    for c in value_cols:
        pts = [
            (t_, s, ss, n)
            for t_, s, ss, n in cells.get(c, [])
            if n and n > 0
        ]
        col: dict = {"n_buckets": len(pts)}
        out["columns"][c] = col
        if not pts:
            continue
        means = {ts: s / n for ts, s, _, n in pts}
        ts_sorted = [p[0] for p in pts]
        # ACF over the bucket-mean series (lag pairs via timestamp set —
        # gaps drop out, matching acf())
        acf_list = []
        idx = set(means)
        for k in range(1, lags + 1):
            shift = _dt_shift(granularity, k)
            pairs = [
                (means[ts], means[ts - shift])
                for ts in ts_sorted
                if (ts - shift) in idx
            ]
            r = _corr([a for a, _ in pairs], [b for _, b in pairs])
            acf_list.append(
                {"lag": k, "n_pairs": len(pairs), "value": r}
            )
        col["acf"] = acf_list
        col["acf1"] = acf_list[0]["value"] if acf_list else None
        # PACF via Durbin–Levinson over CLASSICAL autocorrelations (one
        # shared mean/variance, lag covariances normalized by the full
        # series variance — the stationarity-assuming estimator the
        # recursion requires; documented approximation on gappy grids,
        # where covariances use only the surviving pairs). AR(p) structure
        # reads directly off where the PACF cuts to ~0.
        vs = [means[ts] for ts in ts_sorted]
        nb = len(vs)
        if nb >= 3:
            mu = sum(vs) / nb
            var = sum((x - mu) ** 2 for x in vs) / nb
            if var > 1e-300:
                rho = [1.0]
                for k in range(1, min(lags, nb - 1) + 1):
                    shift = _dt_shift(granularity, k)
                    cov = sum(
                        (means[ts] - mu) * (means[ts - shift] - mu)
                        for ts in ts_sorted
                        if (ts - shift) in idx
                    ) / nb
                    rho.append(cov / var)
                pacf = []
                phi_prev: list = []
                for k in range(1, len(rho)):
                    if k == 1:
                        phi_k = [rho[1]]
                    else:
                        num = rho[k] - sum(
                            phi_prev[j] * rho[k - 1 - j]
                            for j in range(k - 1)
                        )
                        den = 1.0 - sum(
                            phi_prev[j] * rho[j + 1] for j in range(k - 1)
                        )
                        if abs(den) < 1e-12:
                            break
                        last = num / den
                        phi_k = [
                            phi_prev[j] - last * phi_prev[k - 2 - j]
                            for j in range(k - 1)
                        ] + [last]
                    phi_prev = phi_k
                    pacf.append({"lag": k, "value": phi_k[-1]})
                col["pacf"] = pacf
        # linear trend: bucket means vs time
        col["trend_r"] = _corr(
            [ts.timestamp() for ts in ts_sorted],
            [means[ts] for ts in ts_sorted],
        )
        # exact one-way ANOVA eta^2 over RAW rows, from bucket sums
        S_ = sum(s for _, s, _, _ in pts)
        SS = sum(ss for _, _, ss, _ in pts)
        N = sum(n for _, _, _, n in pts)
        groups: dict = {}
        for ts, s, ss, n in pts:
            g = groups.setdefault(_period(ts), [0.0, 0])
            g[0] += s
            g[1] += n
        sst = SS - S_ * S_ / N if N > 0 else 0.0
        ssb = (
            sum(gs * gs / gn for gs, gn in groups.values()) - S_ * S_ / N
            if N > 0
            else 0.0
        )
        col["seasonal_strength"] = (
            max(0.0, min(1.0, ssb / sst)) if sst > 1e-12 else None
        )
        col["seasonal"] = [
            {
                "period": p,
                "n": gn,
                "mean": gs / gn if gn else None,
            }
            for p, (gs, gn) in sorted(groups.items())
        ]
        # anomalous buckets (same rule as detect_anomalies: deviation
        # from the self-excluding centered rolling baseline > 3 stds,
        # >= 8 neighbours) — pure driver arithmetic over the cells the
        # tier already collected; bounded list so the report stays small
        vs_seq = [means[ts] for ts in ts_sorted]
        anoms = []
        half = 12
        for i, ts in enumerate(ts_sorted):
            nbrs = vs_seq[max(0, i - half):i] + vs_seq[i + 1:i + 1 + half]
            nwn = len(nbrs)
            if nwn < 8:
                continue
            mu = sum(nbrs) / nwn
            var = sum((x - mu) ** 2 for x in nbrs) / (nwn - 1)
            if abs(vs_seq[i] - mu) > 3.0 * var**0.5:
                anoms.append(
                    {"t": ts, "value": vs_seq[i], "baseline_mean": mu}
                )
        col["n_anomalies"] = len(anoms)
        col["anomalies"] = anoms[:20]
    return out


def _dt_shift(granularity: str, k: int):
    import datetime as _dt

    return _dt.timedelta(microseconds=k * _GRAN_US[granularity])


def detect_anomalies(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    window_buckets: int = 24,
    k: float = 3.0,
    min_support: int = 8,
    granularity: str = "hour",
    stable: bool = False,
) -> DataFrame:
    """Spike/dip detection over the resampled grid: a bucket is anomalous
    when its mean deviates from the centered rolling baseline by more
    than ``k`` baseline standard deviations. The baseline EXCLUDES the
    bucket itself (two window frames, ``[-half, -1]`` and ``[1, half]``)
    — a self-inclusive window lets a large spike inflate its own baseline
    std and mask itself. Buckets with fewer than ``min_support`` baseline
    neighbours get ``flagged = NULL`` (not enough evidence), never a
    silent false.

    Scale shape: the raw table pays the one resample shuffle; the frames
    run over the bounded grid.

    ``stable=True`` evaluates the threshold in EXACT integer arithmetic
    over the 4-decimal-scaled grid (the cross-engine oracle tier):
    ``dev² · (nw-1) · 1000  >  round(k²·1000) · nw · (nw·Σq − S²)``
    — algebraically identical to ``|v − mean| > k·std`` with the sample
    std, but free of float rounding, so the BOOLEAN is bit-identical in
    every engine (DECIMAL(38)/HUGEINT headroom for the products). The
    default tier computes the same rule in plain doubles."""
    grid = resample(df, ts_col, value_col, granularity, stable=stable)
    half = window_buckets // 2
    if half < 1:
        raise ValueError("detect_anomalies: window_buckets must be >= 2")
    if min_support < 2:
        raise ValueError(
            "detect_anomalies: min_support must be >= 2 — a baseline "
            "std needs at least two neighbours"
        )
    wl = Window.orderBy(F.col("t")).rowsBetween(-half, -1)
    wr = Window.orderBy(F.col("t")).rowsBetween(1, half)

    def both(agg_fn, c):
        return F.coalesce(agg_fn(c).over(wl), F.lit(0)) + F.coalesce(
            agg_fn(c).over(wr), F.lit(0)
        )

    if stable:
        vi = (
            F.round(F.col("v"), 4).cast("decimal(20,4)") * F.lit(10000)
        ).cast("long")
        g = grid.withColumn("__vi", vi)
        s = both(F.sum, F.col("__vi"))
        # vi² accumulates in DECIMAL so large value magnitudes widen
        # instead of overflowing long under ANSI (exact either way; the
        # decimal arithmetic only ever touches the bounded grid)
        q = both(
            F.sum, F.col("__vi").cast("decimal(38,0)") * F.col("__vi")
        )
        nw = both(F.count, F.col("__vi"))
        dev = nw * F.col("__vi").cast("decimal(38,0)") - s
        k2 = int(round(k * k * 1000))
        lhs = dev * dev * (nw - 1).cast("decimal(38,0)") * F.lit(1000)
        rhs = (
            F.lit(k2).cast("decimal(38,0)")
            * nw.cast("decimal(38,0)")
            * (nw * q - s.cast("decimal(38,0)") * s)
        )
        flagged = F.when(
            (nw >= min_support) & F.col("__vi").isNotNull(), lhs > rhs
        )
        return g.select(
            "t", "v", "n", nw.alias("baseline_n"), flagged.alias("flagged")
        )
    s = both(F.sum, F.col("v"))
    q = both(F.sum, F.col("v") * F.col("v"))
    nw = both(F.count, F.col("v"))
    mean = s / nw
    var = (nw * q - s * s) / (nw * (nw - 1))
    flagged = F.when(
        (nw >= min_support) & F.col("v").isNotNull(),
        F.abs(F.col("v") - mean) > F.lit(k) * F.sqrt(F.greatest(var, F.lit(0.0))),
    )
    return grid.select(
        "t", "v", "n", nw.alias("baseline_n"), flagged.alias("flagged")
    )
