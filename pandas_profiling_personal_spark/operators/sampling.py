"""Row samples for the report (reference: model/sample.py, dataframe_wrappers.py:476-482).

All samples are bounded driver transfers (limit/sample-then-limit). ``head`` on an
unordered Spark DataFrame is nondeterministic across runs/engines; ``head`` here
optionally orders by key columns first so tests and oracles are stable (the
reference's samples are unseeded and unstable — K4 note in SURVEY.md §2.6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from pandas_profiling_personal_spark.functions import stats as S


def head(df: DataFrame, n: int, order_by: list[str] | None = None) -> DataFrame:
    out = df
    if order_by:
        out = out.orderBy(*[S.col(c) for c in order_by])
    return out.limit(n)


def tail(df: DataFrame, n: int, order_by: list[str] | None = None) -> list:
    """Last ``n`` rows (K3 — the reference has no Spark tail,
    dataframe_wrappers.py:331-342; Spark >= 3.0 provides ``df.tail``). A
    driver-heavy action: the scan runs to the end and ``n`` rows return to the
    driver, so callers must keep ``n`` report-sized. With ``order_by`` the
    frame is sorted first so "last" is well-defined across engines (an
    unordered Spark frame has no stable row order)."""
    out = df
    if order_by:
        out = out.orderBy(*[S.col(c) for c in order_by])
    return out.tail(n)


def random_sample(
    df: DataFrame, n: int, seed: int = 42, total: int | None = None
) -> DataFrame:
    """Seeded random sample of ~n rows (fraction-free: sample a generous fraction
    then limit; exact-n semantics are not needed for a report preview).
    Pass ``total`` when the row count is already known (the profile pipeline
    knows it from pass 1) to skip the count job."""
    if total is None:
        total = df.count()
    if total <= n:
        return df
    fraction = min(1.0, (n * 2.0) / total)
    return df.sample(fraction=fraction, seed=seed).limit(n)


def deterministic_sample(
    df: DataFrame, key: str, mod: int = 20, bucket: int = 0
) -> DataFrame:
    """Engine-independent pseudo-random sample: keep rows where
    md5(key) mod ``mod`` == ``bucket``. Unlike ``df.sample``, any engine computing
    the same expression selects the same rows — used for oracle-checkable sampling
    and for cheap stable subsamples at scale."""
    h = F.conv(F.substring(F.md5(S.col(key).cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    return df.where(h % mod == bucket)


def deterministic_split(
    df: DataFrame,
    key: str,
    weights: tuple[tuple[str, float], ...] = (
        ("train", 0.9),
        ("val", 0.05),
        ("test", 0.05),
    ),
    granularity: int = 10000,
    out_col: str = "split",
) -> DataFrame:
    """Train/val/test assignment a training-data pipeline can trust: each row's
    split is a pure function of ``md5(key)``, so the partition is deterministic
    across runs, engines, cluster sizes and row order — re-ingesting the corpus
    never migrates a document between splits (the property ``df.randomSplit``
    lacks: its assignment depends on partitioning). Zero shuffle: one codegen'd
    projection.

    ``weights`` are (name, fraction) in priority order; fractions are realized
    as integer bucket boundaries out of ``granularity`` (exact boundaries, no
    float accumulation). Fractions need not sum to 1 — any remainder falls to
    the LAST split. Per-stratum ratios hold in expectation for any stratum
    uncorrelated with the key hash; verify with :func:`split_counts`."""
    h = F.conv(F.substring(F.md5(S.col(key).cast("string")), 1, 8), 16, 10).cast(
        "long"
    ) % granularity
    bounds: list[tuple[str, int]] = []
    cum = 0.0
    for name, w in weights[:-1]:
        cum += w
        bounds.append((name, int(round(cum * granularity))))
    label = None
    for name, b in bounds:
        cond = h < b
        label = (
            F.when(cond, F.lit(name))
            if label is None
            else label.when(cond, F.lit(name))
        )
    last = F.lit(weights[-1][0])
    label = last if label is None else label.otherwise(last)
    return df.withColumn(out_col, label)


def weighted_sample(
    df: DataFrame,
    key: str,
    weight_col: str,
    target_fraction: float,
    temperature: float = 1.0,
    granularity: int = 1_000_000,
) -> DataFrame:
    """Score-proportional deterministic sampling — the row-level
    complement of source-level mixture planning: keep each row with
    probability ∝ ``weight^(1/temperature)``, scaled so the EXPECTED kept
    fraction is ``target_fraction`` (the quality/temperature sampling of
    LLM data-mixing recipes: T=1 proportional, T→∞ uniform, T<1 sharpens
    toward the highest scores).

    Deterministic end to end: the per-row uniform is md5(key) (the
    :func:`deterministic_split` convention — re-runs, engines, and
    partitionings keep the same rows), and the scale constant
    ``c = target_fraction · n / Σ w^(1/T)`` is ONE 1-row aggregate.
    ``p = min(1, c·w^(1/T))`` is rounded to 9 decimals so the compare is
    engine-stable; rows with NULL or non-positive weight are never kept
    (a log-domain weight should be exponentiated by the caller). When
    high-weight rows saturate at p=1 the realized fraction falls below
    the target rather than redistributing mass — a single-pass choice,
    stated here: exact redistribution needs iterative waterfilling.

    Returns the KEPT rows with a ``keep_prob`` audit column. Scale shape:
    one tiny aggregate crossJoined as a literal-like 1-row plan, then one
    codegen'd filter — no shuffle of the data itself."""
    if not 0.0 < target_fraction <= 1.0:
        raise ValueError(
            f"target_fraction must be in (0, 1], got {target_fraction}"
        )
    if temperature <= 0:
        raise ValueError(f"temperature must be positive, got {temperature}")
    w = S.col(weight_col).cast("double")
    wt = F.when(
        w.isNotNull() & (w > 0) & ~F.isnan(w),
        F.pow(w, F.lit(1.0 / temperature)),
    )
    totals = df.agg(
        F.sum(wt).alias("__wsum"), F.count(wt).alias("__n")
    )
    u = (
        F.conv(F.substring(F.md5(S.col(key).cast("string")), 1, 8), 16, 10)
        .cast("long") % granularity
    ) / F.lit(float(granularity))
    # the wt.isNotNull guard is load-bearing: Spark's least() SKIPS nulls,
    # so least(1.0, NULL) is 1.0 and an invalid-weight row would sail
    # through at probability 1 without it
    p = F.when(
        wt.isNotNull(),
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(target_fraction) * F.col("__n") / F.col("__wsum") * wt,
            ),
            9,
        ),
    )
    return (
        df.crossJoin(totals)
        .select("*", p.alias("keep_prob"), u.alias("__u"))
        .where(F.col("keep_prob").isNotNull() & (F.col("__u") < F.col("keep_prob")))
        .drop("__wsum", "__n", "__u")
    )


def split_counts(
    df: DataFrame,
    key: str,
    strata_col: str | None = None,
    weights: tuple[tuple[str, float], ...] = (
        ("train", 0.9),
        ("val", 0.05),
        ("test", 0.05),
    ),
    granularity: int = 10000,
) -> DataFrame:
    """Verification rollup for :func:`deterministic_split`: rows per split
    (× stratum when given) — ONE combine-friendly aggregate, driver transfer
    ≤ splits × strata."""
    out = deterministic_split(df, key, weights, granularity)
    group = ["split"] + ([strata_col] if strata_col else [])
    return (
        out.groupBy(*[S.col(g) for g in group])
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(*group)
    )


def stratified_sample(
    df: DataFrame,
    group_col: str,
    n_per_group: int,
    key: str,
) -> DataFrame:
    """Deterministic exact-N-per-group sample — the eval-set / human-review
    builder: ``n_per_group`` rows from EVERY group (language, source,
    quality bucket …), chosen by md5-rank of ``key`` so the sample is
    stable across runs, engines, cluster sizes and row order (the property
    ``df.sampleBy`` lacks: fraction-based, partitioning-dependent, and
    never exact-N). Groups smaller than ``n_per_group`` return whole.

    ``key`` must be UNIQUE within each group (a row id / primary key —
    advice r6): rows tied on ``key`` are tied on ``md5(key)`` and the
    tiebreak too, so which physical row wins the rank would be
    partition-dependent and the determinism guarantee void. With a
    duplicated key the MULTISET of sampled key values is still stable;
    only which of the identical-key rows is returned can vary.

    Output: the input columns plus ``sample_rank`` (1-based md5 rank
    within the group — feed ``sample_rank <= m`` to shrink the sample
    later WITHOUT re-electing members: ranks are stable, so a 100-row
    sample is always a superset of the 10-row one).

    Shape: ONE group-keyed window exchange (the same exchange any
    per-group operator pays); the md5 rank needs no pre-aggregation. A
    pathologically hot group serializes its own partition like any
    window — for billion-row groups sample via
    :func:`deterministic_split`-style bucket thresholds instead (keeps
    no order, approximate N)."""
    if n_per_group <= 0:
        raise ValueError(f"n_per_group must be positive, got {n_per_group}")
    h = F.md5(S.col(key).cast("string"))
    w = Window.partitionBy(S.col(group_col)).orderBy(
        h.asc(), S.col(key).asc()
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= n_per_group)
    )
