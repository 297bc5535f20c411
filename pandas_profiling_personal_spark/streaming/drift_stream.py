"""Streaming drift: per-window PSI of an incoming stream against a STATIC
baseline corpus — "is today's crawl drifting from the reference snapshot",
answered continuously.

The reference is strictly batch (SURVEY.md §2.12); this extends the drift
operators (``operators.drift``) to Structured Streaming with the shape that
actually works under streaming's single-stateful-aggregation constraint:

* the baseline reduces ONCE, batch-side, at plan-build time — per column:
  shared bucket edges (min/max) and smoothed baseline proportions. Both are
  folded into the streaming plan as LITERALS (a map column-name → proportion
  array), so the stream side never joins, never shuffles the baseline, and
  keeps one stateful operator;
* the stream melts to (window, column, bucket-inline) and runs ONE windowed
  groupBy(window, column) whose aggregates are ``bins`` conditional counts —
  state is bounded by windows × columns × bins, independent of row volume;
* PSI is a pure post-aggregation projection over those counts and the
  baseline literals (whole-stage codegen; no second stateful op, so the
  query runs in append mode with a watermark).

Same ε-smoothing and IEEE bucket arithmetic as the batch tier, so a window
whose distribution matches the baseline reads ~0 and results match the
batch run of the identical plan bit-for-bit (equivalence-tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pandas_profiling_personal_spark.functions import stats as S


def drift_stream(
    stream_df: DataFrame,
    baseline_df: DataFrame,
    columns: list[str],
    ts_col: str,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
    bins: int = 10,
    eps: float = 1e-6,
    round_to: int = 6,
) -> DataFrame:
    """Windowed PSI vs a static baseline: one row per (window, column) —
    ``(window, column, n, psi)``. Works identically on a batch DataFrame
    (same plan minus the watermark clock) for tests/backfills.

    Columns that are all-null/NaN in the baseline have no edges and are
    dropped with a loud ValueError — a baseline that can't define buckets
    can't define drift either."""
    if not columns:
        raise ValueError("columns must name at least one column")

    def masked(c):
        cc = S.col(c).cast("double")
        return F.when(~F.isnan(cc), cc)

    # baseline reduction: ONE batch action — min/max edges + bucket counts
    # per column, collapsed to smoothed proportion literals
    agg = baseline_df.agg(
        *[F.min(masked(c)).alias(f"lo_{i}") for i, c in enumerate(columns)],
        *[F.max(masked(c)).alias(f"hi_{i}") for i, c in enumerate(columns)],
    ).collect()[0]
    edges: dict[str, tuple[float, float]] = {}
    for i, c in enumerate(columns):
        lo, hi = agg[f"lo_{i}"], agg[f"hi_{i}"]
        if lo is None:
            raise ValueError(
                f"baseline column {c!r} is all-null/NaN — no bucket edges"
            )
        edges[c] = (float(lo), float(hi))

    def bucket_expr(c: str):
        lo, hi = edges[c]
        v = masked(c)
        if hi == lo:
            return F.when(v.isNotNull(), F.lit(0))
        raw = F.floor((v - F.lit(lo)) / F.lit((hi - lo) / float(bins)))
        return F.when(
            v.isNotNull(),
            F.least(F.greatest(raw, F.lit(0)), F.lit(bins - 1)).cast("int"),
        )

    base_counts = (
        baseline_df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("column"),
                            bucket_expr(c).alias("bucket"),
                        )
                        for c in columns
                    ]
                )
            ).alias("kv")
        )
        .select("kv.column", "kv.bucket")
        .where(F.col("bucket").isNotNull())
        .groupBy("column", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    pa: dict[str, list[float]] = {c: [0.0] * bins for c in columns}
    totals: dict[str, int] = {c: 0 for c in columns}
    for r in base_counts:
        pa[r["column"]][r["bucket"]] = float(r["c"])
        totals[r["column"]] += int(r["c"])
    for c in columns:
        n_a = totals[c]
        pa[c] = [(x + eps) / (n_a + eps * bins) for x in pa[c]]

    # baseline proportions as ONE map literal: column -> array<double>;
    # plan size O(columns x bins) constants, nothing baseline-side at runtime
    pa_map = F.create_map(
        *[
            x
            for c in columns
            for x in (F.lit(c), F.array(*[F.lit(p) for p in pa[c]]))
        ]
    )

    is_streaming = stream_df.isStreaming
    if is_streaming:
        stream_df = stream_df.withWatermark(ts_col, watermark)

    melted = stream_df.select(
        F.col(ts_col).alias("__ts"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        bucket_expr(c).alias("bucket"),
                    )
                    for c in columns
                ]
            )
        ).alias("kv"),
    ).select("__ts", "kv.column", "kv.bucket")
    # null buckets (null/NaN values) are KEPT through the groupBy so a window
    # in which a monitored column is entirely null still emits an explicit
    # (window, column, n=0, psi=null) row — the batch tier's no-edges
    # contract; a monitor keyed on (window, column) sees the break, not a
    # silent gap. n counts non-null buckets only, matching the batch n_b.

    win = (
        F.window("__ts", window, slide) if slide else F.window("__ts", window)
    )
    counts = melted.groupBy(win.alias("window"), "column").agg(
        F.count("bucket").alias("n"),
        *[
            F.count(F.when(F.col("bucket") == i, 1)).alias(f"c_{i}")
            for i in range(bins)
        ],
    )

    # PSI as a pure projection: pb_i from the window counts, pa_i from the
    # literal map — no second stateful operator
    pa_arr = F.element_at(pa_map, F.col("column"))
    term = None
    for i in range(bins):
        pb_i = (F.col(f"c_{i}") + F.lit(eps)) / (
            F.col("n") + F.lit(eps * bins)
        )
        pa_i = F.element_at(pa_arr, i + 1)
        t = (pa_i - pb_i) * F.log(pa_i / pb_i)
        term = t if term is None else term + t
    return counts.select(
        "window",
        "column",
        "n",
        F.when(F.col("n") > 0, F.round(term, round_to)).alias("psi"),
    )
