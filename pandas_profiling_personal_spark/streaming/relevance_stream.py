"""Streaming target relevance — the stream tier of
``operators/correlations.py:target_relevance``.

Completes the newest family's operating-mode matrix (batch ranking /
state-mode ``target_relevance_of`` / CLI / THIS): per closed event-time
window, every declared feature's association with a numeric target from
ONE watermarked windowed aggregation — |Pearson| for numeric features
(``corr`` is a declarative aggregate) and η² for categorical features via
the DECLARED-DOMAIN trick: per declared category value, conditional
``[n, Σy, Σy²]`` sums ride the same aggregate, and values outside the
domain pool into an implicit residual group computed by subtraction
(total − Σ declared), so the arithmetic needs no second aggregation and
no per-category shuffle rows. A downstream sink can alert the moment a
feature's relevance to the target drifts — without buffering raw rows.

Honest scope: pooling undeclared values into one residual group makes the
window η² a LOWER BOUND when the undeclared tail spans multiple real
groups (pooling can only reduce SS_between); it equals the batch η²
exactly whenever the declared domain covers the window's values — the
condition the equivalence test pins. Categorical targets (Cramér's V
needs the full contingency) refuse by name; the per-micro-batch
alternative for them is ``relevance_foreach_batch`` + the batch operator,
with one-batch visibility stated.

The same plan runs on a batch frame (minus the watermark clock), which is
how the equivalence test pins stream == batch per window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from pandas_profiling_personal_spark.functions import stats as S


def relevance_stream(
    df: DataFrame,
    target: str,
    ts_col: str,
    numeric_cols: list[str] | None = None,
    categorical_domains: "dict[str, list[str]] | None" = None,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Windowed feature-vs-target ranking: one row per (event-time window,
    feature) with the batch methods and 4-decimal rounding.

    Output columns: ``window_start``, ``window_end``, ``feature``,
    ``method`` (``pearson_abs`` / ``eta_squared``), ``score`` — a window's
    rows are directly comparable with ``target_relevance`` run on that
    window's slice (append mode cannot sort; consumers rank per window).

    ``categorical_domains`` maps each categorical feature to its declared
    value list (the profiler already knows the top values; a drifting
    NEW value lands in the residual group and moves the score — which is
    the signal a relevance monitor wants).
    """
    numeric_cols = [c for c in (numeric_cols or []) if c != target]
    categorical_domains = {
        c: [str(v) for v in vs]
        for c, vs in (categorical_domains or {}).items()
        if c != target
    }
    if not numeric_cols and not categorical_domains:
        raise ValueError("relevance_stream: no features")
    for c, vs in categorical_domains.items():
        if not vs:
            raise ValueError(
                f"relevance_stream: empty domain for {c!r} — declare the "
                "expected category values (profile top_values)"
            )
        if len(vs) != len(set(vs)):
            raise ValueError(
                f"relevance_stream: duplicate domain values for {c!r}"
            )

    y = S.col(target).cast("double")
    aggs: list[Column] = []
    for i, c in enumerate(numeric_cols):
        aggs.append(
            F.corr(S.col(c).cast("double"), y).alias(f"p{i}")
        )
    for j, (c, domain) in enumerate(categorical_domains.items()):
        g = S.col(c).cast("string")
        ok = g.isNotNull() & y.isNotNull() & ~F.isnan(y)
        aggs += [
            F.count(F.when(ok, 1)).alias(f"e{j}_n"),
            F.sum(F.when(ok, y)).alias(f"e{j}_s"),
            F.sum(F.when(ok, y * y)).alias(f"e{j}_ss"),
        ]
        for k, v in enumerate(domain):
            okv = ok & (g == F.lit(v))
            aggs += [
                F.count(F.when(okv, 1)).alias(f"e{j}_{k}_n"),
                F.sum(F.when(okv, y)).alias(f"e{j}_{k}_s"),
                F.sum(F.when(okv, y * y)).alias(f"e{j}_{k}_ss"),
            ]

    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    agg = df.groupBy(
        F.window(F.col(ts_col), window, slide or window).alias("window")
    ).agg(*aggs)

    # post-aggregation projection: the batch scores as Column arithmetic
    def _group_term(n: Column, s: Column, ss: Column) -> Column:
        # a group's SS_within contribution; empty group contributes 0
        return F.when(n > 0, ss - (s * s) / n).otherwise(F.lit(0.0))

    structs: list[Column] = []
    for i, c in enumerate(numeric_cols):
        structs.append(
            F.struct(
                F.lit(c).alias("feature"),
                F.lit("pearson_abs").alias("method"),
                F.round(F.abs(F.col(f"p{i}")), 4).alias("score"),
            )
        )
    for j, (c, domain) in enumerate(categorical_domains.items()):
        n_t, s_t, ss_t = (
            F.col(f"e{j}_n"),
            F.coalesce(F.col(f"e{j}_s"), F.lit(0.0)),
            F.coalesce(F.col(f"e{j}_ss"), F.lit(0.0)),
        )
        decl_n = [F.col(f"e{j}_{k}_n") for k in range(len(domain))]
        decl_s = [
            F.coalesce(F.col(f"e{j}_{k}_s"), F.lit(0.0))
            for k in range(len(domain))
        ]
        decl_ss = [
            F.coalesce(F.col(f"e{j}_{k}_ss"), F.lit(0.0))
            for k in range(len(domain))
        ]
        sum_n = sum(decl_n[1:], decl_n[0])
        sum_s = sum(decl_s[1:], decl_s[0])
        sum_ss = sum(decl_ss[1:], decl_ss[0])
        oth_n, oth_s, oth_ss = n_t - sum_n, s_t - sum_s, ss_t - sum_ss
        within = _group_term(oth_n, oth_s, oth_ss)
        for k in range(len(domain)):
            within = within + _group_term(decl_n[k], decl_s[k], decl_ss[k])
        total = F.when(n_t > 0, ss_t - (s_t * s_t) / n_t).otherwise(
            F.lit(None)
        )
        n_groups = (
            sum(
                (F.when(n > 0, 1).otherwise(0) for n in decl_n[1:]),
                F.when(decl_n[0] > 0, 1).otherwise(0),
            )
            + F.when(oth_n > 0, 1).otherwise(0)
        )
        eta2 = F.when(
            (n_groups >= 2) & (total > 0),
            F.round(
                F.greatest(
                    F.lit(0.0),
                    F.least(F.lit(1.0), F.lit(1.0) - within / total),
                ),
                4,
            ),
        )
        structs.append(
            F.struct(
                F.lit(c).alias("feature"),
                F.lit("eta_squared").alias("method"),
                eta2.alias("score"),
            )
        )

    return agg.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        F.explode(F.array(*structs)).alias("r"),
    ).select("window_start", "window_end", "r.*")


def relevance_foreach_batch(
    target: str,
    out_path: str,
    numeric_cols: list[str] | None = None,
    categorical_cols: list[str] | None = None,
    max_categories: int = 100,
):
    """``foreachBatch`` processor: the FULL batch ranking per micro-batch —
    the tier for categorical targets (Cramér's V) and undeclared-domain
    categoricals, with the honest contract stated: each batch is ranked in
    ISOLATION (one-batch visibility; cross-history relevance is the
    state-mode ``target_relevance_of`` over merged daily states). Result
    rows land in ``out_path/batch=<id>`` with overwrite (a retried
    micro-batch replaces its own output — the asof_foreach_batch arrival
    contract). Wire it up::

        q = (stream.writeStream
             .foreachBatch(relevance_foreach_batch("label", out))
             .option("checkpointLocation", ckpt).start())
    """
    from pandas_profiling_personal_spark.operators.correlations import (
        target_relevance,
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        rows = target_relevance(
            batch_df,
            target,
            numeric_cols=numeric_cols,
            categorical_cols=categorical_cols,
            max_categories=max_categories,
        )
        spark = batch_df.sparkSession
        (
            spark.createDataFrame(
                [
                    (r["feature"], r["method"], r["score"],
                     r.get("reason"))
                    for r in rows
                ],
                "feature string, method string, score double, "
                "reason string",
            )
            .write.mode("overwrite")
            .parquet(f"{out_path}/batch={batch_id}")
        )

    return process
