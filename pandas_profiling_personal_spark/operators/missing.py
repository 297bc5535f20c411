"""Missing-value structure.

M1 null-count bar: the per-column null counts come free from the pass-1 scalar
summary (reference computes them in one agg too — dataframe_wrappers.py:552-571).
M3 nullity correlation: the reference only supports this on pandas
(missing.py:174-215); here it is fully distributed — Pearson over null-indicator
columns in ONE aggregation pass (pairwise F.corr, no ML vector assembly).
M2 nullity matrix sample: bounded driver transfer of a boolean isnull raster.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame, functions as F

from pandas_profiling_personal_spark.functions import stats as S


def null_counts(df: DataFrame, columns: list[str] | None = None) -> dict[str, int]:
    """Per-column null counts, one pass (P6)."""
    columns = columns or df.columns
    row = df.agg(
        *[S.n_missing(S.col(c)).alias(f"c{i}") for i, c in enumerate(columns)]
    ).collect()[0]
    return {c: row[f"c{i}"] for i, c in enumerate(columns)}


def nullity_correlation(
    df: DataFrame, columns: list[str] | None = None
) -> dict[tuple[str, str], float | None]:
    """Pearson correlation between isnull indicators of column pairs (M3).

    One agg pass with p*(p-1)/2 ``F.corr`` expressions. Columns with no nulls have
    zero-variance indicators -> null correlation (excluded by caller if desired)."""
    columns = columns or df.columns
    ind = {c: S.col(c).isNull().cast("double") for c in columns}
    pairs = list(combinations(columns, 2))
    if not pairs:
        return {}
    exprs = [
        S.safe_corr(ind[a], ind[b]).alias(f"p{i}") for i, (a, b) in enumerate(pairs)
    ]
    row = df.agg(*exprs).collect()[0]
    return {(a, b): row[f"p{i}"] for i, (a, b) in enumerate(pairs)}


def nullity_sample(df: DataFrame, n: int = 500) -> "list[dict]":
    """Bounded boolean isnull raster for the nullity-matrix plot (M2)."""
    proj = df.select(
        *[S.col(c).isNull().alias(c) for c in df.columns]
    ).limit(n)
    return [r.asDict() for r in proj.collect()]
