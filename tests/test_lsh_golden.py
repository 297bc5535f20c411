"""Golden end-to-end pin for the LSH embedding tier (VERDICT r3 #4).

The scale path of ``embedding_near_duplicates`` (LSH mode) and
``ann_topk_lsh`` cannot have a cross-engine SQL oracle: the candidate set is
defined by sign-bit signatures of SEEDED Gaussian hyperplanes folded in a
fixed left-to-right IEEE order — an engine-specific construction DuckDB
cannot reproduce without re-implementing the exact plane generator and fold.
What CAN be pinned is the complete output on a frozen corpus + seed: the
engine is deterministic end to end (seeded planes, deterministic explode/
join/distinct, round(...,4), rank tie-break on neighbor id). These literals
were produced by the shipped implementation; ANY change to the plane
generator, signature fold, bucketing join, or re-rank ordering changes them
and fails this test.

The fixture plants 10 near-duplicate pairs (cosine ≥ 0.998); the LSH tier
finds 10/10 here, so this doubles as a frozen recall gate.
"""

import random

from pyspark.sql import functions as F

DIM = 16

GOLDEN_PAIRS = [
    (0, 100, 0.9996), (1, 101, 0.9999), (2, 102, 0.9996), (3, 103, 0.9998),
    (4, 104, 0.9999), (5, 105, 0.9998), (6, 106, 0.9998), (7, 107, 0.9996),
    (8, 108, 0.9999), (9, 109, 0.9999),
]

GOLDEN_TOPK = {
    0: [(1, 100, 0.9996), (2, 107, 0.0105), (3, 7, 0.0046)],
    1: [(1, 101, 0.9999)],
    2: [(1, 102, 0.9996), (2, 13, 0.0407)],
    3: [(1, 103, 0.9998), (2, 5, 0.1923)],
    4: [(1, 104, 0.9999), (2, 13, 0.2505)],
}


def _corpus(spark):
    rng = random.Random(7)
    rows = []
    for i in range(30):
        rows.append((i, [rng.gauss(0, 1) for _ in range(DIM)]))
    for i in range(10):  # ids 100+i: tiny perturbations of 0..9
        base = rows[i][1]
        rows.append((100 + i, [v + rng.gauss(0, 0.02) for v in base]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_embedding_near_dup_lsh_golden(spark):
    from pandas_profiling_personal_spark.operators.similarity import (
        embedding_near_duplicates,
    )

    nd = embedding_near_duplicates(
        _corpus(spark), dim=DIM, threshold=0.98, n_planes=8, n_tables=4,
        seed=42,
    )
    got = sorted((r["id_a"], r["id_b"], r["cosine_sim"]) for r in nd.collect())
    assert got == GOLDEN_PAIRS


def test_ann_topk_lsh_golden(spark):
    from pandas_profiling_personal_spark.operators.similarity import (
        ann_topk_lsh,
    )

    df = _corpus(spark)
    topk = ann_topk_lsh(
        df, df.where(F.col("vec_id") < 5), dim=DIM, k=3, n_planes=8,
        n_tables=4, seed=42,
    )
    got: dict[int, list] = {}
    for r in topk.collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["neighbor_id"], r["cosine_sim"])
        )
    assert {k: sorted(v) for k, v in sorted(got.items())} == GOLDEN_TOPK
