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


def embedding_drift_stream(
    stream_df: DataFrame,
    baseline_df: DataFrame,
    vec_col: str,
    ts_col: str,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
    dim: int | None = None,
    bins: int = 10,
    eps: float = 1e-6,
    round_to: int = 6,
) -> DataFrame:
    """Windowed EMBEDDING drift vs a static baseline snapshot — the
    streaming half of ``operators.drift.embedding_drift``: one row per
    window, ``(window, n, norm_psi, centroid_cosine)``.

    Same one-stateful-operator shape as :func:`drift_stream`: the baseline
    reduces batch-side at plan-build time into LITERALS — norm bucket
    edges, smoothed baseline bucket proportions, and the baseline MEAN
    VECTOR — so the stream never joins the baseline. Per row the stream
    computes the L2 norm and an inline bucket (stateless HOF fold), then
    ONE windowed groupBy carries ``bins`` conditional counts plus ``dim``
    per-dimension sums; norm-PSI and the window-centroid-vs-baseline
    cosine are pure post-aggregation projections. State: windows ×
    (bins + dim + 1) numbers, independent of row volume.

    Two deliberate deviations from the batch operator (documented, not
    drift): bucket edges come from the BASELINE alone (a stream cannot
    contribute to a union min/max before it arrives — norms outside the
    baseline range clamp into the edge buckets), and the per-dimension
    argmax is omitted (it needs both sides' variances; run the batch
    operator on a materialized window when a drilled-down signal fires).
    Validity rule (non-null, size==dim, all-finite) shared with the batch
    tier. Works identically on a batch DataFrame for tests/backfills."""
    from pandas_profiling_personal_spark.operators.similarity import (
        as_double,
        l2_norm,
    )
    from pandas_profiling_personal_spark.operators.text import size_or_null

    if dim is None:
        probe = baseline_df.agg(
            F.median(size_or_null(S.col(vec_col))).alias("d")
        ).collect()[0]
        if probe["d"] is None:
            raise ValueError("cannot infer dim from an all-null baseline")
        dim = int(probe["d"])

    def prep(df):
        v = as_double(S.col(vec_col))
        valid = (
            S.col(vec_col).isNotNull()
            & (F.size(v) == dim)
            & F.forall(
                v,
                lambda x: x.isNotNull()
                & ~F.isnan(x)
                & ~x.isin(float("inf"), float("-inf")),
            )
        )
        return df.where(valid), v

    from pyspark import StorageLevel

    base, bv = prep(baseline_df)
    # persisted: the baseline reduction needs TWO passes by construction
    # (edges before bucketing), and unpersisted each would re-run the
    # validity filter + norm fold over the whole snapshot (review r7)
    base = base.select(l2_norm(bv).alias("norm"), bv.alias("__v")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    try:
        row = base.agg(
            F.count(F.lit(1)).alias("n"),
            F.min("norm").alias("lo"),
            F.max("norm").alias("hi"),
            *[F.sum(F.col("__v")[i]).alias(f"s{i}") for i in range(dim)],
        ).collect()[0]
        if not row["n"]:
            raise ValueError(
                "baseline has no valid vectors — no drift reference"
            )
        lo, hi = float(row["lo"]), float(row["hi"])
        mb = [row[f"s{i}"] / row["n"] for i in range(dim)]
        mb_norm = sum(x * x for x in mb) ** 0.5

        def bucket_expr(norm_col):
            # the ONE engine bucket definition (functions/stats.bucket_index,
            # oracle-proven IEEE form) — a hand-rolled copy here could
            # silently diverge from the batch tier it promises to match
            # (review r7)
            return S.bucket_index(norm_col, F.lit(lo), F.lit(hi), bins)

        bcounts = (
            base.select(bucket_expr(F.col("norm")).alias("b"))
            .groupBy("b")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
    finally:
        base.unpersist()
    cmap = {r["b"]: r["c"] for r in bcounts}
    nb = row["n"]
    qb = [(cmap.get(b, 0) + eps) / (nb + eps * bins) for b in range(bins)]

    sdf, sv = prep(stream_df)
    sdf = sdf.select(
        S.col(ts_col).alias("__ts"),
        l2_norm(sv).alias("norm"),
        sv.alias("__v"),
    )
    if sdf.isStreaming:
        sdf = sdf.withWatermark("__ts", watermark)
    win = (
        F.window("__ts", window, slide) if slide else F.window("__ts", window)
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    aggs += [
        F.sum((bucket_expr(F.col("norm")) == b).cast("long")).alias(f"c{b}")
        for b in range(bins)
    ]
    aggs += [F.sum(F.col("__v")[i]).alias(f"s{i}") for i in range(dim)]
    agg = sdf.groupBy(win.alias("window")).agg(*aggs)

    n = F.col("n")
    psi = None
    for b in range(bins):
        p = (F.col(f"c{b}") + F.lit(eps)) / (n + F.lit(eps * bins))
        term = (p - F.lit(qb[b])) * F.log(p / F.lit(qb[b]))
        psi = term if psi is None else psi + term
    dot = None
    sq = None
    for i in range(dim):
        m_i = F.col(f"s{i}") / n
        d_i = m_i * F.lit(mb[i])
        q_i = m_i * m_i
        dot = d_i if dot is None else dot + d_i
        sq = q_i if sq is None else sq + q_i
    cos = (
        dot / (F.sqrt(sq) * F.lit(mb_norm))
        if mb_norm > 0
        else F.lit(None).cast("double")
    )
    return agg.select(
        "window",
        "n",
        F.round(psi, round_to).alias("norm_psi"),
        F.round(cos, round_to).alias("centroid_cosine"),
    )
