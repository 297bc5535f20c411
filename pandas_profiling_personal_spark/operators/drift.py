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
