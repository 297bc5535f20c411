"""Sketch-tier operators (operators/sketches.py): accuracy vs the exact
computations on real testdata. Sketches are approximate by design — the
assertions encode their published error bounds, not exact equality."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def lineitem(spark):
    from pandas_profiling_personal_spark.sources.readers import read_parquet

    return read_parquet(spark, f"{SF_DIR}/lineitem.parquet")


def test_hll_distinct_within_error(spark, lineitem):
    from pandas_profiling_personal_spark.operators.sketches import (
        hll_distinct_counts,
    )

    cols = ["l_returnflag", "l_orderkey", "l_quantity"]
    est = hll_distinct_counts(lineitem, cols)
    exact = lineitem.agg(
        *[F.countDistinct(c).alias(c) for c in cols]
    ).collect()[0]
    for c in cols:
        assert est[c] == pytest.approx(exact[c], rel=0.05), c


def test_kll_quantiles_within_rank_error(spark, lineitem):
    from pandas_profiling_personal_spark.operators.sketches import kll_quantiles

    qs = (0.05, 0.25, 0.5, 0.75, 0.95)
    est = kll_quantiles(lineitem, ["l_extendedprice"], qs)["l_extendedprice"]
    n = lineitem.count()
    vals = [r[0] for r in lineitem.select("l_extendedprice").collect()]
    vals.sort()
    # KLL k=400 -> ~0.7% rank error; assert each estimate's true rank is
    # within 2% of the requested rank (slack for ties/interpolation)
    import bisect

    for q, v in zip(qs, est):
        rank = bisect.bisect_right(vals, v) / n
        assert abs(rank - q) < 0.02, (q, v, rank)


def test_cms_top_k_matches_exact_heavy_hitters(spark, lineitem):
    from pandas_profiling_personal_spark.operators.sketches import cms_top_k

    got = cms_top_k(lineitem, ["l_returnflag", "l_linestatus"], k=3)
    for col in ("l_returnflag", "l_linestatus"):
        exact = {
            r[col]: r["cnt"]
            for r in lineitem.groupBy(col)
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }
        est = dict(got[col])
        # same value set (these columns have <= 3 heavy values)
        assert set(est) == set(exact), col
        for v, c in est.items():
            # CMS overestimates only, by at most eps*n (tiny here)
            assert exact[v] <= c <= exact[v] * 1.01, (col, v)
        # ranking preserved
        assert [v for v, _ in got[col]] == sorted(
            exact, key=lambda v: (-exact[v], v)
        )


def test_corpus_overlap_hll_matches_exact(spark):
    """The join-free HLL inclusion-exclusion tier must track the exact
    distinct-intersect within sketch error (train/test contamination check)."""
    from pandas_profiling_personal_spark.operators.dedup import corpus_overlap
    from pandas_profiling_personal_spark.sources.readers import read_parquet

    docs = read_parquet(spark, f"{SF_DIR}/documents.parquet")
    a = docs.where(F.col("doc_id") % 2 == 0)
    b = docs.where(F.col("doc_id") % 2 == 1)
    ex = corpus_overlap(a, b, "text", unit="token", exact=True).collect()[0]
    est = corpus_overlap(a, b, "text", unit="token", exact=False).collect()[0]
    assert ex["n_overlap"] > 0  # corpora share vocabulary by construction
    for f in ("n_a", "n_b", "n_overlap"):
        assert est[f] == pytest.approx(ex[f], rel=0.05), f
    assert est["jaccard"] == pytest.approx(ex["jaccard"], abs=0.05)


def test_corpus_overlap_units(spark):
    """shingle and fingerprint units: duplicate docs across the two sides must
    register as fingerprint overlap; shingle overlap >= 0 and bounded by the
    smaller side's distinct count."""
    from pandas_profiling_personal_spark.operators.dedup import corpus_overlap

    a = spark.createDataFrame(
        [(1, "the quick brown fox jumps high"), (2, "completely unrelated words")],
        "doc_id long, text string",
    )
    b = spark.createDataFrame(
        [(3, "THE  quick brown fox jumps high"), (4, "other corpus text body")],
        "doc_id long, text string",
    )
    fp = corpus_overlap(a, b, "text", unit="fingerprint").collect()[0]
    assert (fp["n_a"], fp["n_b"], fp["n_overlap"]) == (2, 2, 1)
    assert fp["containment_a_in_b"] == 0.5
    sh = corpus_overlap(a, b, "text", unit="shingle").collect()[0]
    assert 0 < sh["n_overlap"] <= min(sh["n_a"], sh["n_b"])
    with pytest.raises(ValueError):
        corpus_overlap(a, b, "text", unit="bogus").collect()


def test_cms_top_k_zipf_synthetic(spark):
    """Skewed synthetic column: sketch top-5 must equal the exact top-5 (the
    designed use — heavy hitters stand far above the sample/CMS noise)."""
    import random

    from pandas_profiling_personal_spark.operators.sketches import cms_top_k

    rng = random.Random(17)
    rows = []
    for i in range(20000):
        z = rng.random()
        if z < 0.5:
            v = f"head_{int(z * 10)}"  # 5 hot values, ~10% each
        else:
            v = f"tail_{rng.randrange(5000)}"
        rows.append((v,))
    df = spark.createDataFrame(rows, "v string")
    got = cms_top_k(df, ["v"], k=5)
    exact = [
        r["v"]
        for r in df.groupBy("v")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "v")
        .limit(5)
        .collect()
    ]
    assert [v for v, _ in got["v"]] == exact


def test_cms_top_k_adversarial_skew_no_sample_miss(spark):
    """VERDICT r3 #9: the old candidate harvest (exact counts on a seeded
    ~1/sample_mod row sample) could miss a true heavy hitter whose absolute
    count is small relative to the sampling rate; ``freqItems`` (Karp
    one-pass frequent items) deterministically returns every value with
    frequency > n/(candidate_factor*k) regardless of row layout. This fixture
    is built so the sample-based harvest PROVABLY (seeded, deterministic)
    misses the heavy hitter while the shipped path finds it."""
    from pandas_profiling_personal_spark.operators.frequencies import melt
    from pandas_profiling_personal_spark.operators.sketches import cms_top_k

    # 20k unique-ish rows + one value at ~3.8% concentrated in ONE partition
    # (worst-case layout for partition-unaware designs).
    base = spark.range(20000).select(
        F.concat(F.lit("u"), F.col("id")).alias("v")
    )
    hot = spark.range(800).select(F.lit("HOT").alias("v")).coalesce(1)
    df = base.unionAll(hot)

    # the retired harvest, reproduced verbatim: seeded row sample -> exact
    # counts. At sample_mod=2000 the expected sample holds ~10 of 20800 rows;
    # with seed 42 the sample provably (deterministically) contains no HOT row.
    sampled = [
        r["value"]
        for r in melt(df.where(F.rand(42) < 1.0 / 2000), ["v"])
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    ]
    assert "HOT" not in sampled, (
        "fixture invalid: seeded sample caught the heavy hitter; "
        "raise sample_mod"
    )

    got = cms_top_k(df, ["v"], k=10)
    assert got["v"], "no candidates returned"
    assert got["v"][0][0] == "HOT"
    assert abs(got["v"][0][1] - 800) <= 0.0001 * 20800 + 1
    # driver transfer stays hard-capped
    assert len(got["v"]) <= 10
