"""Distribution-drift detection between two corpus snapshots.

The check a training-data pipeline runs between crawls/releases: per-column
Population Stability Index over a shared histogram — PSI ≳ 0.1 is the
conventional "investigate", ≳ 0.25 "significant shift". The reference
profiles one frame and has no two-frame comparison surface.

100 TB shape: snapshot A and snapshot B are each reduced by ONE
melt+groupBy exchange to (column, bucket, count) — bounded by
columns × bins rows per side — after a 1-row min/max aggregate per side
fixes the shared bucket edges. Nothing but those bounded tables crosses
the network or reaches the driver; both sides scan once. Bucket arithmetic
is the engine's oracle-proven IEEE form (functions/stats.bucket_index), so
any engine reproduces the buckets — and therefore the PSI — bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pandas_profiling_personal_spark.functions import stats as S


def drift_profile(
    df_a: DataFrame,
    df_b: DataFrame,
    columns: list[str],
    bins: int = 10,
    eps: float = 1e-6,
    round_to: int = 6,
) -> DataFrame:
    """Per-column PSI between ``df_a`` (baseline) and ``df_b`` (candidate):
    ``(column, n_a, n_b, psi, max_shift_bucket)`` ordered by column.

    Shared bucket edges come from the UNION min/max of each column (one
    1-row aggregate over each side), so both snapshots land in identical
    buckets. Proportions are ε-smoothed so empty buckets contribute a
    finite, symmetric penalty: ``p_i = (c_i + eps) / (n + eps·bins)``;
    ``PSI = Σ (pa_i − pb_i) · ln(pa_i / pb_i)``. ``max_shift_bucket`` is
    the bucket index with the largest |pa − pb| — where to look first.
    NaNs and nulls are excluded from both sides (their drift shows up in
    count drift, reported as n_a / n_b)."""
    if not columns:
        raise ValueError("columns must name at least one column")

    def masked(c):
        cc = S.col(c).cast("double")
        return F.when(~F.isnan(cc), cc)

    # shared edges: both sides' 1-row min/max aggregates crossJoined into a
    # single row — ONE driver action instead of two (2 numbers per column
    # per side cross the driver, nothing else)
    def minmax(df, tag: str):
        return df.agg(
            *[
                F.min(masked(c)).alias(f"lo_{tag}_{i}")
                for i, c in enumerate(columns)
            ],
            *[
                F.max(masked(c)).alias(f"hi_{tag}_{i}")
                for i, c in enumerate(columns)
            ],
        )

    row = minmax(df_a, "a").crossJoin(minmax(df_b, "b")).collect()[0]
    edges: dict[str, tuple[float, float]] = {}
    for i, c in enumerate(columns):
        los = [v for v in (row[f"lo_a_{i}"], row[f"lo_b_{i}"]) if v is not None]
        his = [v for v in (row[f"hi_a_{i}"], row[f"hi_b_{i}"]) if v is not None]
        if los and his:
            edges[c] = (min(los), max(his))

    # columns that are all-null/NaN on BOTH sides have no edges: emit an
    # explicit (psi=null, n=0) row rather than silently dropping them, and
    # short-circuit when NO column has edges (F.array() over zero structs is
    # VOID-typed and would fail the .select below)
    no_edges = (
        df_a.sparkSession.createDataFrame(
            [(c, 0, 0, None, None) for c in columns if c not in edges],
            "column string, n_a long, n_b long, psi double, max_shift_bucket long",
        )
        if len(edges) < len(columns)
        else None
    )
    if not edges:
        return no_edges.orderBy("column")

    def bucket_counts(df, side: str):
        structs = [
            F.struct(
                F.lit(c).alias("column"),
                F.when(
                    masked(c).isNotNull(),
                    S.bucket_index(
                        masked(c),
                        F.lit(edges[c][0]),
                        F.lit(edges[c][1]),
                        bins,
                    ),
                ).alias("bucket"),
            )
            for c in columns
            if c in edges
        ]
        return (
            df.select(F.explode(F.array(*structs)).alias("kv"))
            .select("kv.column", "kv.bucket")
            .where(F.col("bucket").isNotNull())
            .groupBy("column", "bucket")
            .agg(F.count(F.lit(1)).alias(f"c_{side}"))
        )

    ca, cb = bucket_counts(df_a, "a"), bucket_counts(df_b, "b")
    # dense bucket grid so empty buckets get the symmetric eps penalty —
    # |columns| x bins literal rows, generated JVM-side
    grid = (
        df_a.sparkSession.range(bins)
        .select(F.col("id").cast("long").alias("bucket"))
        .crossJoin(
            df_a.sparkSession.createDataFrame(
                [(c,) for c in edges], "column string"
            )
        )
    )
    joined = (
        grid.join(ca, ["column", "bucket"], "left")
        .join(cb, ["column", "bucket"], "left")
        .na.fill({"c_a": 0, "c_b": 0})
    )
    n_a = F.sum("c_a").over(_col_window())
    n_b = F.sum("c_b").over(_col_window())
    pa = (F.col("c_a") + F.lit(eps)) / (n_a + F.lit(eps * bins))
    pb = (F.col("c_b") + F.lit(eps)) / (n_b + F.lit(eps * bins))
    term = (pa - pb) * F.log(pa / pb)
    shift = F.abs(pa - pb)
    per_bucket = joined.select(
        "column", "bucket",
        n_a.alias("n_a"), n_b.alias("n_b"),
        term.alias("term"), shift.alias("shift"),
    )
    out = per_bucket.groupBy("column").agg(
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
        F.round(F.sum("term"), round_to).alias("psi"),
        # lexicographic (shift, bucket) makes ties deterministic —
        # required for cross-engine reproducibility
        F.max_by(
            "bucket", F.struct(F.col("shift"), F.col("bucket"))
        ).alias("max_shift_bucket"),
    )
    if no_edges is not None:
        out = out.unionByName(no_edges)
    return out.orderBy("column")


def round_half_up(x: float | None, ndigits: int) -> float | None:
    """Round half AWAY from zero — the SQL ``round()`` rule DuckDB and
    Spark's ``F.round`` share. Python's builtin ``round()`` is banker's
    (half-to-even), so an exact tie at the ``ndigits``-th decimal diverges
    between a Python-side finalization and a SQL oracle (review r8 — the
    hazard ``audio_metadata_query`` worked around by exclusion). Driver-side
    finalizations that an oracle re-derives must use THIS."""
    if x is None:
        return None
    import math as _math

    if not _math.isfinite(x):
        # the builtin round() this replaces passed inf/NaN through; Decimal
        # quantize would raise InvalidOperation on inf (review r8 — an
        # overflowed aggregate must report inf, not crash the finalization)
        return x
    from decimal import ROUND_HALF_UP, Decimal

    # Decimal(x), NOT Decimal(repr(x)): the EXACT binary expansion is what
    # the DuckDB oracle rounds (scaled std::round) — the shortest-repr
    # decimal would call a near-tie like 0.1234565 (binary ...64999) a tie
    # and round it the other way. Spark's F.round is the OTHER convention
    # (BigDecimal.valueOf(double), i.e. shortest-repr HALF_UP), so on such
    # near-ties a batch F.round finalization and this function can disagree
    # at the last digit (review r9) — driver-side finalizations that a
    # DuckDB oracle re-derives must use THIS, not match F.round
    return float(
        Decimal(x).quantize(
            Decimal(1).scaleb(-ndigits), rounding=ROUND_HALF_UP
        )
    )


def _col_window():
    from pyspark.sql import Window

    # per-column window over the bins x columns grid — bounded rows by design
    return Window.partitionBy("column")


def drift_profile_categorical(
    df_a: DataFrame,
    df_b: DataFrame,
    columns: list[str],
    top_n: int = 20,
    eps: float = 1e-6,
    round_to: int = 6,
    other_label: str = "__other__",
) -> DataFrame:
    """Per-column PSI over CATEGORICAL value proportions between two
    snapshots: ``(column, n_a, n_b, psi, max_shift_value)`` ordered by
    column. This is the most common real drift question for an LLM corpus —
    did the language mix / source mix / license mix move between crawls —
    which the numeric tier (``drift_profile``) cannot answer (it casts
    categories to NULL doubles).

    Buckets are the top-``top_n`` values of each column by COMBINED count
    (ties broken by value ascending — deterministic cross-engine), with
    everything else folded into ``other_label``. Proportions are ε-smoothed
    exactly like the numeric tier, with the per-column bucket count as the
    smoothing denominator's bin term. Nulls are excluded from both sides
    (count drift shows in n_a/n_b); columns with no non-null value on either
    side get an explicit (psi=null, n=0) row.

    100 TB shape: both snapshots are melted and reduced by ONE shared
    (column, value) exchange (map-side combined, side-conditional counts) —
    the same shape as value_counts over all columns. Every subsequent step
    (rank, other-fold, PSI) runs on the bounded (column, distinct-value)
    aggregate. The per-column rank window assumes true categoricals
    (distinct values per column ≪ rows); an ID-like column makes the
    aggregate itself large, as it would for value_counts.
    """
    from pyspark.sql import Window

    if not columns:
        raise ValueError("columns must name at least one column")

    def melt(df, side: str):
        structs = [
            F.struct(
                F.lit(c).alias("column"),
                S.col(c).cast("string").alias("value"),
            )
            for c in columns
        ]
        return df.select(F.explode(F.array(*structs)).alias("kv")).select(
            "kv.column",
            "kv.value",
            F.lit(side).alias("side"),
        )

    counts = (
        melt(df_a, "a")
        .unionByName(melt(df_b, "b"))
        .where(F.col("value").isNotNull())
        .groupBy("column", "value")
        .agg(
            F.count(F.when(F.col("side") == "a", 1)).alias("c_a"),
            F.count(F.when(F.col("side") == "b", 1)).alias("c_b"),
        )
    )
    # rank on the bounded per-(column,value) aggregate; (count desc, value
    # asc) makes the top-N cut deterministic and oracle-reproducible
    rank_w = Window.partitionBy("column").orderBy(
        (F.col("c_a") + F.col("c_b")).desc(), F.col("value").asc()
    )
    folded = (
        counts.withColumn("rk", F.row_number().over(rank_w))
        .select(
            "column",
            F.when(F.col("rk") <= top_n, F.col("value"))
            .otherwise(F.lit(other_label))
            .alias("value"),
            "c_a",
            "c_b",
        )
        .groupBy("column", "value")
        .agg(F.sum("c_a").alias("c_a"), F.sum("c_b").alias("c_b"))
    )
    w = _col_window()
    n_a = F.sum("c_a").over(w)
    n_b = F.sum("c_b").over(w)
    n_buckets = F.count(F.lit(1)).over(w)
    pa = (F.col("c_a") + F.lit(eps)) / (n_a + F.lit(eps) * n_buckets)
    pb = (F.col("c_b") + F.lit(eps)) / (n_b + F.lit(eps) * n_buckets)
    term = (pa - pb) * F.log(pa / pb)
    shift = F.abs(pa - pb)
    per_value = folded.select(
        "column",
        "value",
        n_a.alias("n_a"),
        n_b.alias("n_b"),
        term.alias("term"),
        shift.alias("shift"),
    )
    out = per_value.groupBy("column").agg(
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
        F.round(F.sum("term"), round_to).alias("psi"),
        F.max_by(
            "value", F.struct(F.col("shift"), F.col("value"))
        ).alias("max_shift_value"),
    )
    # explicit rows for columns that are all-null on both sides — they have
    # no (column, value) row at all and would otherwise vanish
    empties = df_a.sparkSession.createDataFrame(
        [(c, 0, 0, None, None) for c in columns],
        "column string, n_a long, n_b long, psi double, max_shift_value string",
    ).join(out.select("column"), "column", "left_anti")
    return out.unionByName(empties).orderBy("column")


def embedding_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    vec_col: str = "embedding",
    dim: int | None = None,
    bins: int = 10,
    eps: float = 1e-6,
    round_to: int = 6,
) -> DataFrame:
    """Embedding-space drift between two corpus snapshots — the signal that
    catches embedding-space rot between crawls/embedder versions, which
    numeric/categorical PSI (:func:`drift_profile`) cannot see and a single
    snapshot's health profile (``similarity.embedding_stats``) does not
    compare. ONE output row:

    ``(n_a, n_b, norm_psi, max_shift_bucket, centroid_cosine,
    mean_shift_l2, max_shift_dim, max_mean_shift)``

    * ``norm_psi`` — PSI over the L2-norm distribution (shared union
      min/max edges, the engine's IEEE bucket arithmetic, ε-smoothed like
      every other PSI here): catches scale/normalization drift.
    * ``centroid_cosine`` — cosine between the two mean vectors: catches
      directional drift of the whole space.
    * ``mean_shift_l2`` — L2 distance between mean vectors.
    * ``max_shift_dim`` / ``max_mean_shift`` — the 0-based dimension with
      the largest |Δmean| / pooled_std (per-dimension standardized shift;
      shift rounded to ``round_to`` BEFORE the argmax, ties to the lowest
      dim — deterministic cross-engine) and its value: where to look first.

    Only VALID vectors participate (non-null, ``size == dim``, all
    components finite and non-null — the same validity rule as
    ``embedding_stats``, whose counters report the invalid ones); ``n_a`` /
    ``n_b`` count valid vectors.

    100 TB shape: each side is scanned twice (a 1-row norm min/max to fix
    shared edges, then ONE 1-row aggregate carrying the ``bins`` bucket
    counts as conditional sums plus 2×``dim`` per-dimension power sums) —
    no explode, no shuffle beyond partial-agg collapse, nothing crosses the
    network but two bounded rows. Final arithmetic runs on the driver over
    those 2(bins + 2·dim + 1) numbers."""
    import math

    from pandas_profiling_personal_spark.operators.similarity import (
        as_double,
        l2_norm,
    )

    if dim is None:
        # median vector size over snapshot A, NOT the first physical row: a
        # single ragged/corrupt leading vector (exactly what the validity
        # filter exists to exclude) must not silently redefine validity for
        # the whole comparison (review r7)
        from pandas_profiling_personal_spark.operators.text import (
            size_or_null,  # size(NULL) is -1 under legacy sizeOfNull
        )

        probe = df_a.agg(
            F.median(size_or_null(S.col(vec_col))).alias("d")
        ).collect()[0]
        if probe["d"] is None:
            raise ValueError(
                "cannot infer dim: snapshot A has no non-null vectors — "
                "pass dim explicitly"
            )
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
        return df.where(valid).select(v.alias("v"), l2_norm(v).alias("norm"))

    pa, pb = prep(df_a), prep(df_b)

    # pass 1: shared norm edges — one crossJoined 1-row action
    edges_row = (
        pa.agg(F.min("norm").alias("lo_a"), F.max("norm").alias("hi_a"))
        .crossJoin(
            pb.agg(F.min("norm").alias("lo_b"), F.max("norm").alias("hi_b"))
        )
        .collect()[0]
    )
    has_a = edges_row["lo_a"] is not None
    has_b = edges_row["lo_b"] is not None
    schema = (
        "n_a long, n_b long, norm_psi double, max_shift_bucket long, "
        "centroid_cosine double, mean_shift_l2 double, max_shift_dim long, "
        "max_mean_shift double"
    )
    if not (has_a and has_b):  # a side with zero valid vectors: drift is
        # undefined — explicit null-signal row (count drift shows in n_a/n_b)
        n_a = pa.count() if has_a else 0
        n_b = pb.count() if has_b else 0
        return df_a.sparkSession.createDataFrame(
            [(n_a, n_b, None, None, None, None, None, None)], schema
        )
    lo = min(edges_row["lo_a"], edges_row["lo_b"])
    hi = max(edges_row["hi_a"], edges_row["hi_b"])

    # pass 2: one 1-row aggregate per side — bucket counts as conditional
    # sums over the shared edges + per-dimension power sums
    def side_agg(df, tag):
        bucket = S.bucket_index(F.col("norm"), F.lit(lo), F.lit(hi), bins)
        aggs = [F.count(F.lit(1)).alias(f"n_{tag}")]
        aggs += [
            F.sum((bucket == b).cast("long")).alias(f"c{b}_{tag}")
            for b in range(bins)
        ]
        aggs += [
            F.sum(F.col("v")[i]).alias(f"s{i}_{tag}") for i in range(dim)
        ]
        aggs += [
            F.sum(F.col("v")[i] * F.col("v")[i]).alias(f"q{i}_{tag}")
            for i in range(dim)
        ]
        return df.agg(*aggs)

    r = side_agg(pa, "a").crossJoin(side_agg(pb, "b")).collect()[0]
    n_a, n_b = r["n_a"], r["n_b"]

    # PSI over the norm buckets (ε-smoothed, identical formula to
    # drift_profile); shift rounded before the argmax for determinism
    psi, best_shift, best_bucket = 0.0, -1.0, 0
    for b in range(bins):
        p = (r[f"c{b}_a"] + eps) / (n_a + eps * bins)
        q = (r[f"c{b}_b"] + eps) / (n_b + eps * bins)
        psi += (p - q) * math.log(p / q)
        shift = round_half_up(abs(p - q), round_to)
        if shift > best_shift:
            best_shift, best_bucket = shift, b

    mean_a = [r[f"s{i}_a"] / n_a for i in range(dim)]
    mean_b = [r[f"s{i}_b"] / n_b for i in range(dim)]
    dot = sum(x * y for x, y in zip(mean_a, mean_b))
    na = math.sqrt(sum(x * x for x in mean_a))
    nb = math.sqrt(sum(x * x for x in mean_b))
    cos = dot / (na * nb) if na > 0 and nb > 0 else None
    l2 = math.sqrt(sum((x - y) ** 2 for x, y in zip(mean_a, mean_b)))
    best_dim, best_dshift = 0, -1.0
    for i in range(dim):
        var_a = max(r[f"q{i}_a"] / n_a - mean_a[i] ** 2, 0.0)
        var_b = max(r[f"q{i}_b"] / n_b - mean_b[i] ** 2, 0.0)
        pooled = math.sqrt((var_a + var_b) / 2.0)
        dshift = round_half_up(
            abs(mean_a[i] - mean_b[i]) / (pooled + eps), round_to
        )
        if dshift > best_dshift:
            best_dshift, best_dim = dshift, i

    return df_a.sparkSession.createDataFrame(
        [
            (
                n_a,
                n_b,
                round_half_up(psi, round_to),
                best_bucket,
                round_half_up(cos, round_to),
                round_half_up(l2, round_to),
                best_dim,
                best_dshift,
            )
        ],
        schema,
    )


def drift_alerts(
    numeric_rows: list | None = None,
    categorical_rows: list | None = None,
    embedding_row: "dict | None" = None,
    association_rows: list | None = None,
    timeseries_rows: list | None = None,
    *,
    schema_drift: "dict | None" = None,
    psi_watch: float = 0.1,
    psi_significant: float = 0.25,
    min_centroid_cosine: float = 0.98,
    max_dim_shift: float = 3.0,
    max_association_shift: float = 0.1,
    max_ts_structure_shift: float = 0.3,
) -> list[dict]:
    """Rule-based alert classification over the drift operators' outputs —
    the two-frame counterpart of ``plans/alerts.compute_alerts`` (pure
    driver logic over already-collected rows, no Spark jobs).

    * numeric/categorical PSI rows (:func:`drift_profile` /
      :func:`drift_profile_categorical`): PSI >= ``psi_significant``
      (conventional 0.25, "significant shift") -> ``DRIFT_SIGNIFICANT``;
      >= ``psi_watch`` (0.1, "investigate") -> ``DRIFT_WATCH``. Each alert
      carries the max-shift bucket/value so the reader knows where to look.
    * the :func:`embedding_drift` row: norm-PSI classified on the same
      scale (``EMBEDDING_NORM_DRIFT``); ``centroid_cosine`` below
      ``min_centroid_cosine`` -> ``EMBEDDING_DIRECTION_DRIFT``;
      ``max_mean_shift`` (standardized per-dimension shift) above
      ``max_dim_shift`` sigmas -> ``EMBEDDING_DIM_SHIFT`` naming the
      dimension.
    * association rows (incremental
      ``association_drift_between_partials``): ``|delta_v|`` at or above
      ``max_association_shift`` (Cramér's V lives in [0, 1], so 0.1 is a
      tenth of the scale) -> ``DRIFT_ASSOCIATION`` naming the pair and
      both V values; an inexact (cell-capped) comparison is flagged on
      the alert rather than suppressed.

    Rows may be ``pyspark.sql.Row`` or plain dicts."""
    alerts: list[dict] = []

    def _get(r, k):
        if hasattr(r, "asDict"):
            r = r.asDict()
        return r.get(k) if isinstance(r, dict) else r[k]

    def _classify(rows, shift_key):
        for r in rows or []:
            psi = _get(r, "psi")
            if psi is None:
                continue
            kind = (
                "DRIFT_SIGNIFICANT"
                if psi >= psi_significant
                else "DRIFT_WATCH" if psi >= psi_watch else None
            )
            if kind:
                alerts.append(
                    {
                        "type": kind,
                        "column": _get(r, "column"),
                        "psi": psi,
                        shift_key: _get(r, shift_key),
                    }
                )

    _classify(numeric_rows, "max_shift_bucket")
    _classify(categorical_rows, "max_shift_value")
    for r in association_rows or []:
        dv = _get(r, "delta_v")
        va_, vb_ = _get(r, "v_a"), _get(r, "v_b")
        degenerate = dv is None and (va_ is None) != (vb_ is None)
        if dv is None and not degenerate:
            continue  # no V on either side: nothing to compare
        if dv is not None and abs(dv) < max_association_shift:
            continue
        alert = {
            "type": "DRIFT_ASSOCIATION",
            "column": _get(r, "column"),
            "v_a": va_,
            "v_b": vb_,
            "delta_v": dv,
        }
        if degenerate:
            # a V that collapsed to None on ONE side is itself an
            # association event (a column lost enough levels to make the
            # contingency degenerate, or gained them back) — silence here
            # would read as "no drift" on exactly the kind of total change
            # this surface exists to catch
            alert["degenerate"] = True
        if _get(r, "exact") is False:
            alert["exact"] = False
        alerts.append(alert)
    if embedding_row is not None:
        e = embedding_row
        npsi = _get(e, "norm_psi")
        if npsi is not None and npsi >= psi_watch:
            alerts.append(
                {
                    "type": "EMBEDDING_NORM_DRIFT",
                    "column": None,
                    "psi": npsi,
                    "significant": npsi >= psi_significant,
                }
            )
        cos = _get(e, "centroid_cosine")
        if cos is not None and cos < min_centroid_cosine:
            alerts.append(
                {
                    "type": "EMBEDDING_DIRECTION_DRIFT",
                    "column": None,
                    "centroid_cosine": cos,
                }
            )
        ds = _get(e, "max_mean_shift")
        if ds is not None and ds > max_dim_shift:
            alerts.append(
                {
                    "type": "EMBEDDING_DIM_SHIFT",
                    "column": None,
                    "dim": _get(e, "max_shift_dim"),
                    "shift_sigmas": ds,
                }
            )
    # time-series structure rows (incremental timeseries_drift_between):
    # which metric moved is named on the alert — "the trend flipped" and
    # "the seasonality vanished" are different operational stories
    for r in timeseries_rows or []:
        moved = {
            k: _get(r, f"{k}_delta")
            for k in ("acf1", "trend_r", "seasonal_strength")
            if _get(r, f"{k}_delta") is not None
            and abs(_get(r, f"{k}_delta")) >= max_ts_structure_shift
        }
        if moved:
            alerts.append(
                {
                    "type": "DRIFT_TS_STRUCTURE",
                    "column": _get(r, "column"),
                    **{f"{k}_delta": v for k, v in moved.items()},
                }
            )
    # schema drift (incremental schema_drift_between_partials): one alert
    # per structural change — the value-drift tables above only cover
    # SHARED columns, so this is the only place a rename/drop/retype shows
    if schema_drift:
        for c in schema_drift.get("added") or []:
            alerts.append(
                {"type": "DRIFT_SCHEMA", "column": c, "change": "added"}
            )
        for c in schema_drift.get("removed") or []:
            alerts.append(
                {"type": "DRIFT_SCHEMA", "column": c, "change": "removed"}
            )
        for tc in schema_drift.get("type_changed") or []:
            alerts.append(
                {
                    "type": "DRIFT_SCHEMA",
                    "column": tc["column"],
                    "change": "type_changed",
                    "type_a": tc["type_a"],
                    "type_b": tc["type_b"],
                }
            )
    return alerts


def drift_report_html(
    numeric_rows: list | None = None,
    categorical_rows: list | None = None,
    embedding_row: "dict | None" = None,
    association_rows: list | None = None,
    timeseries_rows: list | None = None,
    *,
    schema_drift: "dict | None" = None,
    title: str = "Drift report",
    **alert_thresholds,
) -> str:
    """Standalone single-file HTML for the two-frame drift surface: the
    numeric/categorical PSI tables, the embedding signal row, and the
    :func:`drift_alerts` classification banner — driver-side rendering of
    already-collected rows (no Spark jobs), same htmlbits the corpus
    report uses."""
    from pandas_profiling_personal_spark.report.htmlbits import (
        esc,
        kv_table,
        page,
    )

    def _row(r):
        return r.asDict() if hasattr(r, "asDict") else dict(r)

    alerts = drift_alerts(
        numeric_rows=numeric_rows,
        categorical_rows=categorical_rows,
        embedding_row=embedding_row,
        association_rows=association_rows,
        timeseries_rows=timeseries_rows,
        schema_drift=schema_drift,
        **alert_thresholds,
    )
    sections: list[str] = []
    if alerts:
        items = "".join(
            f"<li><b>{esc(a['type'])}</b>"
            + (f" — {esc(a['column'])}" if a.get("column") else "")
            + "".join(
                f" {esc(k)}={esc(v)}"
                for k, v in a.items()
                if k not in ("type", "column")
            )
            + "</li>"
            for a in alerts
        )
        sections.append(f"<h2>Alerts ({len(alerts)})</h2><ul>{items}</ul>")
    else:
        sections.append("<h2>Alerts</h2><p>none — no drift band crossed</p>")

    def _psi_table(rows, shift_key, label):
        if not rows:
            return
        body = "".join(
            "<tr><th>{c}</th><td>{na}</td><td>{nb}</td><td>{psi}</td>"
            "<td>{sh}</td></tr>".format(
                c=esc(_row(r)["column"]),
                na=_row(r)["n_a"],
                nb=_row(r)["n_b"],
                psi=_row(r)["psi"],
                sh=esc(_row(r).get(shift_key)),
            )
            for r in rows
        )
        sections.append(
            f"<h2>{label}</h2><table><tr><th>column</th><th>n_a</th>"
            f"<th>n_b</th><th>psi</th><th>max shift</th></tr>{body}</table>"
        )

    if schema_drift and schema_drift.get("changed"):
        body = "".join(
            f"<tr><th>{esc(c)}</th><td>added</td><td>—</td><td>—</td></tr>"
            for c in schema_drift.get("added") or []
        ) + "".join(
            f"<tr><th>{esc(c)}</th><td>removed</td><td>—</td><td>—</td></tr>"
            for c in schema_drift.get("removed") or []
        ) + "".join(
            "<tr><th>{c}</th><td>type changed</td><td>{a}</td><td>{b}</td>"
            "</tr>".format(
                c=esc(tc["column"]), a=esc(tc["type_a"]), b=esc(tc["type_b"])
            )
            for tc in schema_drift.get("type_changed") or []
        )
        sections.append(
            "<h2>Schema</h2><table><tr><th>column</th><th>change</th>"
            f"<th>type a</th><th>type b</th></tr>{body}</table>"
        )

    _psi_table(numeric_rows, "max_shift_bucket", "Numeric PSI")
    _psi_table(categorical_rows, "max_shift_value", "Categorical PSI")
    if association_rows:
        body = "".join(
            "<tr><th>{c}</th><td>{na}</td><td>{nb}</td><td>{va}</td>"
            "<td>{vb}</td><td>{dv}</td><td>{ex}</td></tr>".format(
                c=esc(_row(r)["column"]),
                na=_row(r)["n_a"],
                nb=_row(r)["n_b"],
                va=_row(r)["v_a"],
                vb=_row(r)["v_b"],
                dv=_row(r)["delta_v"],
                ex=_row(r).get("exact", True),
            )
            for r in association_rows
        )
        sections.append(
            "<h2>Association (Cramér's V)</h2><table><tr><th>pair</th>"
            "<th>n_a</th><th>n_b</th><th>v_a</th><th>v_b</th>"
            f"<th>delta</th><th>exact</th></tr>{body}</table>"
        )
    if timeseries_rows:
        body = "".join(
            "<tr><th>{c}</th><td>{a1a}</td><td>{a1b}</td><td>{tra}</td>"
            "<td>{trb}</td><td>{ssa}</td><td>{ssb}</td><td>{fl}</td></tr>"
            .format(
                c=esc(_row(r)["column"]),
                a1a=_row(r).get("acf1_a"),
                a1b=_row(r).get("acf1_b"),
                tra=_row(r).get("trend_r_a"),
                trb=_row(r).get("trend_r_b"),
                ssa=_row(r).get("seasonal_strength_a"),
                ssb=_row(r).get("seasonal_strength_b"),
                fl="yes" if _row(r).get("flagged") else "",
            )
            for r in timeseries_rows
        )
        sections.append(
            "<h2>Time-series structure</h2><table><tr><th>column</th>"
            "<th>acf1 a</th><th>acf1 b</th><th>trend a</th><th>trend b</th>"
            "<th>seasonal a</th><th>seasonal b</th><th>flagged</th></tr>"
            f"{body}</table>"
        )
    if embedding_row is not None:
        sections.append("<h2>Embedding</h2>" + kv_table(_row(embedding_row)))
    return page(title, "".join(sections))
