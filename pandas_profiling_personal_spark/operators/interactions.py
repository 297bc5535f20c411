"""Pairwise interactions / scatter data (C7).

The reference pre-aggregates ``groupby(x, y).count()`` on Spark and renders a
weighted hexbin (reference: summary.py:463-509, visualisation/plot.py:283-330) —
aggregate-then-plot is exactly the right 100 TB shape, so this engine keeps it
and adds explicit bucketing so the transferred grid is bounded by bins², not by
the number of distinct (x, y) pairs."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pandas_profiling_personal_spark.functions import stats as S


def scatter_counts(
    df: DataFrame,
    x: str,
    y: str,
    x_range: tuple[float, float],
    y_range: tuple[float, float],
    bins: int = 32,
) -> DataFrame:
    """(x_bucket, y_bucket, cnt) grid for a weighted density plot — ONE
    combine-friendly shuffle, driver transfer bounded by bins². Ranges come from
    the pass-1 min/max (or any chosen window)."""
    cx, cy = S.col(x).cast("double"), S.col(y).cast("double")
    bx = S.bucket_index(
        cx, F.lit(float(x_range[0])), F.lit(float(x_range[1])), bins
    )
    by = S.bucket_index(
        cy, F.lit(float(y_range[0])), F.lit(float(y_range[1])), bins
    )
    return (
        df.where(
            cx.isNotNull() & cy.isNotNull() & ~F.isnan(cx) & ~F.isnan(cy)
        )
        .groupBy(bx.alias("x_bucket"), by.alias("y_bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def scatter_all(
    df: DataFrame,
    ranges: dict[str, tuple[float, float]],
    bins: int = 24,
    targets: list[str] | None = None,
) -> dict[tuple[str, str], list[dict]]:
    """Bucketed 2-D densities for EVERY pair of the given columns in ONE shuffle.

    The reference computes one scatter per pair sequentially (one Spark job per
    plot — reference: summary.py:463-509); here all pairs ride a single
    explode + groupBy: bucket indexes are computed once per column in a narrow
    projection, pairs are melted to (x_col, y_col, xb, yb) structs, and map-side
    partial aggregation compresses each partition to ≤ pairs·bins² rows before
    the exchange. Row expansion is quadratic in column count — callers cap the
    column list (config.interactions_max_cols).

    ``targets`` restricts pairs to those involving a target column
    (reference ``interactions.targets``, config_default.yaml:103-105):
    with T targets over N columns the expansion drops from N²/2 to ~T·N —
    the practical way to keep interactions on for wide tables when only a
    label/score column's relationships matter.

    Returns {(x, y): [{x_bucket, y_bucket, cnt}, ...]} for x < y; driver
    transfer ≤ pairs·bins²."""
    from itertools import combinations

    cols = list(ranges)
    if len(cols) < 2:
        return {}
    tset = set(targets or ())
    # bucket_index collapses a degenerate lo==hi range to bucket 0
    # unconditionally and floors NaN into bucket 0, so missing/NaN rows must be
    # masked to NULL *here* — the post-explode filter drops NULL buckets, and
    # without the mask a constant column would count its null rows in bucket 0.
    def _bucket(c: str, i: int):
        v = S.col(c).cast("double")
        return F.when(
            v.isNotNull() & ~F.isnan(v),
            S.bucket_index(
                v,
                F.lit(float(ranges[c][0])),
                F.lit(float(ranges[c][1])),
                bins,
            ),
        ).alias(f"__b_{i}")

    proj = df.select(*[_bucket(c, i) for i, c in enumerate(cols)])
    structs = [
        F.struct(
            F.lit(a).alias("x_col"),
            F.lit(b).alias("y_col"),
            F.col(f"__b_{i}").alias("xb"),
            F.col(f"__b_{j}").alias("yb"),
        )
        for (i, a), (j, b) in combinations(enumerate(cols), 2)
        if not tset or a in tset or b in tset
    ]
    if not structs:
        return {}
    grid = (
        proj.select(F.explode(F.array(*structs)).alias("kv"))
        .select("kv.*")
        .where(F.col("xb").isNotNull() & F.col("yb").isNotNull())
        .groupBy("x_col", "y_col", "xb", "yb")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    out: dict[tuple[str, str], list[dict]] = {}
    for r in grid:
        out.setdefault((r["x_col"], r["y_col"]), []).append(
            {"x_bucket": r["xb"], "y_bucket": r["yb"], "cnt": r["cnt"]}
        )
    for v in out.values():
        v.sort(key=lambda d: (d["x_bucket"], d["y_bucket"]))
    return out


def pair_counts(df: DataFrame, x: str, y: str) -> DataFrame:
    """Raw (x, y, cnt) — the reference's exact shape, for low-cardinality
    pairs (reference: summary.py:496-509)."""
    cx, cy = S.col(x), S.col(y)
    return (
        df.where(cx.isNotNull() & cy.isNotNull())
        .groupBy(cx.alias("x"), cy.alias("y"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
