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
    columns = df.columns if columns is None else columns
    if not columns:
        return {}
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
    columns = df.columns if columns is None else columns
    ind = {c: S.col(c).isNull().cast("double") for c in columns}
    pairs = list(combinations(columns, 2))
    if not pairs:
        return {}
    exprs = [
        S.safe_corr(ind[a], ind[b]).alias(f"p{i}") for i, (a, b) in enumerate(pairs)
    ]
    row = df.agg(*exprs).collect()[0]
    return {(a, b): row[f"p{i}"] for i, (a, b) in enumerate(pairs)}


def nullity_dendrogram(
    correlation: dict[tuple[str, str], float | None],
) -> list[tuple[int, int, float]]:
    """M4: hierarchical (single-linkage) clustering of columns by nullity
    similarity — driver-side over the small M3 matrix, scipy-free.

    Distance = 1 - |corr| (unknown correlations treated as distance 1). Returns
    scipy-linkage-style merge steps: (cluster_i, cluster_j, distance) where
    original columns are clusters 0..p-1 (in sorted name order) and each merge
    creates cluster p+step. The reference only offers this on pandas via
    missingno/scipy (reference: missing.py:218-238)."""
    names = sorted({c for pair in correlation for c in pair})
    idx = {c: i for i, c in enumerate(names)}
    p = len(names)
    if p < 2:
        return []
    dist = [[1.0] * p for _ in range(p)]
    for (a, b), v in correlation.items():
        d = 1.0 if v is None else max(0.0, 1.0 - abs(v))
        dist[idx[a]][idx[b]] = dist[idx[b]][idx[a]] = d
    # single linkage over active clusters (p is small: columns, not rows)
    active = {i: {i} for i in range(p)}
    merges: list[tuple[int, int, float]] = []
    next_id = p
    while len(active) > 1:
        best = None
        for ci in active:
            for cj in active:
                if ci >= cj:
                    continue
                d = min(
                    dist[a][b] for a in active[ci] for b in active[cj]
                )
                if best is None or d < best[0]:
                    best = (d, ci, cj)
        d, ci, cj = best
        merges.append((ci, cj, d))
        active[next_id] = active.pop(ci) | active.pop(cj)
        next_id += 1
    return merges


def nullity_sample(df: DataFrame, n: int = 500) -> "list[dict]":
    """Bounded boolean isnull raster for the nullity-matrix plot (M2)."""
    proj = df.select(
        *[S.col(c).isNull().alias(c) for c in df.columns]
    ).limit(n)
    return [r.asDict() for r in proj.collect()]
