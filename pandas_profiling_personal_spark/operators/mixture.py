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


def mixture_plan(
    df: DataFrame,
    group_col: str,
    targets: dict[str, float],
    size_col: str | None = None,
) -> DataFrame:
    """Per-group mixture plan: ``(group, n_docs, size, current_share,
    target_share, sampling_rate, planned_size)``, ordered by group.

    ``size_col`` is the per-document budget contribution (token count,
    byte length, ...); ``None`` counts documents. Groups absent from
    ``targets`` get rate 0 (dropped from the mixture); a target group absent
    from the data simply contributes nothing (its weight is unreachable —
    visible because the realized shares of the others exceed their targets).
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
    ratio = F.when(tgt > 0, F.col("size").cast("double") / tgt)
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
    """Materialize the mixture: keep a document iff its deterministic
    md5-uniform draw falls under its group's sampling rate. The plan side is
    broadcast (tiny by construction); the draw is the same
    ``conv(substring(md5(key), 1, 8), 16, 10)`` idiom as
    :func:`~pandas_profiling_personal_spark.operators.sampling.deterministic_split`,
    normalized to [0, 1)."""
    u = (
        F.conv(F.substring(F.md5(S.col(key).cast("string")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(_HASH_SPACE)
    )
    p = F.broadcast(plan.select("group", "sampling_rate"))
    return (
        df.join(p, S.col(group_col) == p["group"], "left")
        .where(u < F.coalesce(F.col("sampling_rate"), F.lit(0.0)))
        .drop("group", "sampling_rate")
    )


def mixture_counts(
    df: DataFrame,
    group_col: str,
    targets: dict[str, float],
    key: str,
    size_col: str | None = None,
) -> DataFrame:
    """Verification rollup: plan + apply + re-aggregate — ``(group, n_kept,
    kept_size)`` per surviving group. One extra groupBy over the sampled
    corpus; driver transfer ≤ |groups| rows."""
    plan = mixture_plan(df, group_col, targets, size_col)
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
