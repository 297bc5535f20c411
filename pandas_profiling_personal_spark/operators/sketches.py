"""Sketch-tier statistics — mergeable summaries for the 100 TB configuration.

The exact pass-2 frequency machinery (melt → groupBy(column, value)) shuffles
one row per distinct (column, value) pair: correct, and fine while
cardinalities are bounded, but a continuous or near-unique column makes that
branch a full-cardinality exchange. This module provides the sketch
alternatives built on Spark 4's native Datasketches/sketch aggregates — all
JVM-side, all mergeable (so they compose with streaming state and tree
aggregation), all one pass, with driver transfer measured in kilobytes:

* heavy hitters: ``count_min_sketch`` + a ``freqItems`` (Karp/Misra-Gries)
  candidate set — the one-pass frequent-items aggregate deterministically
  surfaces every value above the support threshold (no sampling miss
  probability, no layout sensitivity), and the CMS then gives each
  candidate's full-data count, biased only upward.
* distinct counts: ``hll_sketch_agg`` (Datasketches HLL, ~1.6% error at
  lgK=12, unionable across partitions/streams — strictly stronger than
  ``approx_count_distinct`` for incremental maintenance).
* quantiles: ``kll_sketch_agg_double`` (KLL, mergeable with a priori error
  bounds — unlike GK ``percentile_approx``, two KLL sketches merge losslessly,
  which is what a 1000-executor tree aggregation or a streaming state store
  needs).

None of these are in the reference (its Spark path uses approxQuantile and
exact groupBys; reference: summary_algorithms.py:567-580); they are the
engine's scale/extension layer (SURVEY.md §7.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pandas_profiling_personal_spark.functions import stats as S
from pandas_profiling_personal_spark.operators.frequencies import melt


def hll_distinct_counts(
    df: DataFrame, columns: list[str] | None = None, lgk: int = 12
) -> "dict[str, int]":
    """Approximate distinct count per column in ONE aggregation, via
    Datasketches HLL. Driver transfer: one 2^lgk-byte sketch per column."""
    columns = df.columns if columns is None else columns
    if not columns:
        return {}
    exprs = [
        F.hll_sketch_estimate(
            F.hll_sketch_agg(S.col(c).cast("string"), F.lit(lgk))
        ).alias(f"d{i}")
        for i, c in enumerate(columns)
    ]
    row = df.agg(*exprs).collect()[0]
    return {c: row[f"d{i}"] for i, c in enumerate(columns)}


def kll_quantiles(
    df: DataFrame,
    columns: list[str],
    quantiles: "tuple[float, ...]" = (0.05, 0.25, 0.5, 0.75, 0.95),
    k: int = 400,
) -> "dict[str, list[float | None]]":
    """Quantiles for all numeric ``columns`` in ONE aggregation via KLL
    sketches — mergeable (tree-aggregation / streaming-state friendly), with
    distribution-free error bounds set by ``k`` (400 ≈ 0.7% rank error).
    The sketch query runs in the same projection, so only the final values
    reach the driver."""
    qarr = F.lit(list(quantiles))
    exprs = [
        F.kll_sketch_get_quantile_double(
            F.kll_sketch_agg_double(S.col(c).cast("double"), F.lit(k)), qarr
        ).alias(f"q{i}")
        for i, c in enumerate(columns)
    ]
    row = df.agg(*exprs).collect()[0]
    return {
        c: (list(row[f"q{i}"]) if row[f"q{i}"] is not None else None)
        for i, c in enumerate(columns)
    }


def cms_top_k(
    df: DataFrame,
    columns: list[str] | None = None,
    k: int = 10,
    eps: float = 0.0001,
    confidence: float = 0.99,
    candidate_factor: int = 4,
) -> "dict[str, list[tuple[str, int]]]":
    """Approximate top-K heavy hitters per column WITHOUT the full-cardinality
    frequency shuffle: {column: [(value, est_count), ...] desc}.

    Two bounded passes over the input:

    1. candidate harvest — ``df.stat.freqItems`` (Spark's JVM implementation
       of the Karp/Misra-Gries one-pass frequent-items algorithm) with
       support ``1/(candidate_factor·k)``. DETERMINISTIC GUARANTEE: every
       value with true frequency > n/(candidate_factor·k) is returned, no
       matter how it is distributed across partitions — unlike the earlier
       seeded-row-sample harvest, there is no adversarial layout or skew
       that can hide a true heavy hitter, and driver transfer is hard-capped
       at ``candidate_factor·k`` items per column (the algorithm keeps at
       most 1/support counters). False positives are possible and harmless:
       pass 2 re-counts every candidate.
    2. one ``count_min_sketch`` aggregate per column over the FULL data —
       partial sketches merge map-side; one ~eps⁻¹-cell sketch per column
       reaches the driver, which reads each candidate's estimate through the
       JVM sketch API (upward-biased only, bias ≤ eps·n w.p. ``confidence``).

    The melt/groupBy machinery this replaces shuffles O(distinct values);
    this shuffles O(columns · sketch_size) regardless of cardinality."""
    columns = df.columns if columns is None else columns
    if not columns:
        return {}
    # pass 1: JVM frequent-items candidates (no shuffle, one aggregate).
    # String-cast first so candidate values line up with the CMS key space.
    support = 1.0 / (candidate_factor * k)
    str_df = df.select(
        *[S.col(c).cast("string").alias(f"c{i}") for i, c in enumerate(columns)]
    )
    fi_row = str_df.stat.freqItems(
        [f"c{i}" for i in range(len(columns))], support
    ).collect()[0]
    cand: "dict[str, list[str]]" = {
        c: [v for v in (fi_row[f"c{i}_freqItems"] or []) if v is not None][
            : candidate_factor * k
        ]
        for i, c in enumerate(columns)
    }

    # pass 2: one CMS per column, merged JVM-side, queried on the driver
    exprs = [
        F.count_min_sketch(
            S.col(c).cast("string"), F.lit(eps), F.lit(confidence), F.lit(42)
        ).alias(f"s{i}")
        for i, c in enumerate(columns)
    ]
    row = df.agg(*exprs).collect()[0]
    jvm = df.sparkSession._jvm
    out: "dict[str, list[tuple[str, int]]]" = {}
    for i, c in enumerate(columns):
        blob = row[f"s{i}"]
        if blob is None or not cand[c]:
            out[c] = []
            continue
        stream = jvm.java.io.ByteArrayInputStream(bytes(blob))
        cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(stream)
        est = [(v, int(cms.estimateCount(v))) for v in cand[c]]
        est.sort(key=lambda t: (-t[1], t[0]))
        out[c] = est[:k]
    return out
