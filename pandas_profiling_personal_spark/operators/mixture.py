"""Corpus mixture planning — the pretraining data-mix operation.

A training corpus is assembled from heterogeneous sources (web crawl, code,
books, wiki, ...) to TARGET proportions by token budget. Given per-document
sizes and a target weight per group, compute the largest total budget
reachable without oversampling any group (no document repeats), and the
per-group deterministic sampling rate that realizes it:

    T_max  = min_g ( size_g / target_g )          # binding group has rate 1
    rate_g = T_max * target_g / size_g

The reference has nothing comparable (it profiles a single frame); this is
part of the LLM-pipeline tier the brief adds. Shapes for 100 TB:

* the plan is ONE combine-friendly groupBy(group) aggregate — the exchange
  carries |groups| rows, not documents — plus a single-partition window over
  those |groups| rows (bounded: a mixture has tens of sources, not millions);
* applying the plan is a BROADCAST join (plan side is tiny by construction)
  plus a codegen'd md5 threshold test: a document's keep/drop decision is a
  pure function of (key, its group's rate), so the materialized mixture is
  deterministic across runs, engines, cluster sizes and row order — the
  property ``df.sampleBy`` lacks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from pandas_profiling_personal_spark.functions import stats as S

#: 16^8 — the md5-prefix hash space used by the deterministic samplers
_HASH_SPACE = float(2**32)


def _target_expr(group, targets: dict[str, float]):
    """targets as a literal CASE chain (a handful of groups; a create_map
    literal would also do, but CASE renders identically in any oracle SQL)."""
    expr = None
    for g, w in targets.items():
        cond = group == g
        expr = F.when(cond, float(w)) if expr is None else expr.when(cond, float(w))
    return expr.otherwise(F.lit(0.0)) if expr is not None else F.lit(0.0)


def _maxrep_expr(group, max_repeats: "float | dict[str, float]"):
    if not isinstance(max_repeats, dict):
        return F.lit(float(max_repeats))
    expr = None
    for g, r in max_repeats.items():
        cond = group == g
        expr = F.when(cond, float(r)) if expr is None else expr.when(cond, float(r))
    return expr.otherwise(F.lit(1.0)) if expr is not None else F.lit(1.0)


def mixture_plan(
    df: DataFrame,
    group_col: str,
    targets: dict[str, float],
    size_col: str | None = None,
    max_repeats: "float | dict[str, float]" = 1.0,
) -> DataFrame:
    """Per-group mixture plan: ``(group, n_docs, size, current_share,
    target_share, sampling_rate, planned_size)``, ordered by group.

    ``size_col`` is the per-document budget contribution (token count,
    byte length, ...); ``None`` counts documents. Groups absent from
    ``targets`` get rate 0 (dropped from the mixture); a target group absent
    from the data simply contributes nothing (its weight is unreachable —
    visible because the realized shares of the others exceed their targets).

    ``max_repeats`` allows UPSAMPLING small high-value groups (pretraining
    mixes routinely repeat wiki/books several epochs while the web crawl is
    subsampled): a group's budget contribution is capped at
    ``size_g * max_repeats_g``, so ``sampling_rate`` may exceed 1 — a rate
    of 2.4 means every document appears twice plus a 0.4 md5-deterministic
    chance of a third copy (:func:`apply_mixture` materializes the copies
    with an ``epoch`` column). The default 1.0 is the no-repeats plan.
    """
    grouped = (
        df.select(
            S.col(group_col).alias("group"),
            (S.col(size_col) if size_col else F.lit(1)).alias("__size"),
        )
        .groupBy("group")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__size").alias("size"),
        )
    )
    w = Window.partitionBy()  # |groups| rows total — bounded by design
    tgt = _target_expr(F.col("group"), targets)
    rep = _maxrep_expr(F.col("group"), max_repeats)
    ratio = F.when(tgt > 0, F.col("size").cast("double") * rep / tgt)
    t_max = F.min(ratio).over(w)
    rate = F.when(
        tgt > 0, t_max * tgt / F.col("size").cast("double")
    ).otherwise(F.lit(0.0))
    return (
        grouped.select(
            "group",
            "n_docs",
            "size",
            (F.col("size").cast("double") / F.sum("size").over(w)).alias(
                "current_share"
            ),
            tgt.alias("target_share"),
            rate.alias("sampling_rate"),
            (rate * F.col("size").cast("double")).alias("planned_size"),
        )
        .orderBy("group")
    )


def apply_mixture(
    df: DataFrame,
    plan: DataFrame,
    group_col: str,
    key: str,
) -> DataFrame:
    """Materialize the mixture: each document appears
    ``floor(rate) + (u < frac(rate))`` times, where ``u`` is its
    deterministic md5-uniform draw — rates ≤ 1 subsample, rates > 1 (an
    upsampling plan, see ``mixture_plan(max_repeats=...)``) repeat the
    document across epochs. Output rows carry an ``epoch`` column
    (1-based copy index) so downstream sharding can spread repeats. The
    plan side is broadcast (tiny by construction); the draw is the same
    ``conv(substring(md5(key), 1, 8), 16, 10)`` idiom as
    :func:`~pandas_profiling_personal_spark.operators.sampling.deterministic_split`,
    normalized to [0, 1). Zero-copy rows vanish via the empty ``sequence``
    explode — no filter pass needed."""
    u = (
        F.conv(F.substring(F.md5(S.col(key).cast("string")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(_HASH_SPACE)
    )
    # __mix_-prefixed join columns so a corpus column named "group" or
    # "sampling_rate" is never shadowed or dropped
    p = F.broadcast(
        plan.select(
            F.col("group").alias("__mix_group"),
            F.col("sampling_rate").alias("__mix_rate"),
        )
    )
    rate = F.coalesce(F.col("__mix_rate"), F.lit(0.0))
    n_copies = (
        F.floor(rate) + F.when(u < rate - F.floor(rate), 1).otherwise(0)
    ).cast("int")
    return (
        df.join(p, S.col(group_col) == p["__mix_group"], "left")
        .withColumn(
            "epoch",
            # guard: sequence(1, 0) would infer step -1 and emit [1, 0]
            F.explode(
                F.when(
                    n_copies >= 1, F.sequence(F.lit(1), n_copies)
                ).otherwise(F.array().cast("array<int>"))
            ),
        )
        .drop("__mix_group", "__mix_rate")
    )


def mixture_counts(
    df: DataFrame,
    group_col: str,
    targets: dict[str, float],
    key: str,
    size_col: str | None = None,
    max_repeats: "float | dict[str, float]" = 1.0,
) -> DataFrame:
    """Verification rollup: plan + apply + re-aggregate — ``(group, n_kept,
    kept_size)`` per surviving group, copies counted individually. One extra
    groupBy over the sampled corpus; driver transfer ≤ |groups| rows."""
    plan = mixture_plan(df, group_col, targets, size_col, max_repeats)
    kept = apply_mixture(df, plan, group_col, key)
    return (
        kept.select(
            S.col(group_col).alias("group"),
            (S.col(size_col) if size_col else F.lit(1)).alias("__size"),
        )
        .groupBy("group")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("__size").alias("kept_size"),
        )
        .orderBy("group")
    )
