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
    cx, cy = S.col(x), S.col(y)
    bx = S.bucket_index(
        cx.cast("double"), F.lit(float(x_range[0])), F.lit(float(x_range[1])), bins
    )
    by = S.bucket_index(
        cy.cast("double"), F.lit(float(y_range[0])), F.lit(float(y_range[1])), bins
    )
    return (
        df.where(cx.isNotNull() & cy.isNotNull())
        .groupBy(bx.alias("x_bucket"), by.alias("y_bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def pair_counts(df: DataFrame, x: str, y: str) -> DataFrame:
    """Raw (x, y, cnt) — the reference's exact shape, for low-cardinality
    pairs (reference: summary.py:496-509)."""
    cx, cy = S.col(x), S.col(y)
    return (
        df.where(cx.isNotNull() & cy.isNotNull())
        .groupBy(cx.alias("x"), cy.alias("y"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
