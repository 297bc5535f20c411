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

    # shared edges: one 1-row agg per side, combined driver-side (2 numbers
    # per column cross the driver, nothing else)
    def minmax(df):
        return df.agg(
            *[F.min(masked(c)).alias(f"lo_{i}") for i, c in enumerate(columns)],
            *[F.max(masked(c)).alias(f"hi_{i}") for i, c in enumerate(columns)],
        ).collect()[0]

    ra, rb = minmax(df_a), minmax(df_b)
    edges: dict[str, tuple[float, float]] = {}
    for i, c in enumerate(columns):
        los = [v for v in (ra[f"lo_{i}"], rb[f"lo_{i}"]) if v is not None]
        his = [v for v in (ra[f"hi_{i}"], rb[f"hi_{i}"]) if v is not None]
        if los and his:
            edges[c] = (min(los), max(his))

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
    return (
        per_bucket.groupBy("column")
        .agg(
            F.max("n_a").alias("n_a"),
            F.max("n_b").alias("n_b"),
            F.round(F.sum("term"), round_to).alias("psi"),
            # lexicographic (shift, bucket) makes ties deterministic —
            # required for cross-engine reproducibility
            F.max_by(
                "bucket", F.struct(F.col("shift"), F.col("bucket"))
            ).alias("max_shift_bucket"),
        )
        .orderBy("column")
    )


def _col_window():
    from pyspark.sql import Window

    # per-column window over the bins x columns grid — bounded rows by design
    return Window.partitionBy("column")
