"""Incremental (mergeable) profiling: shard states merged == whole-frame
profile, exactly for moments/counts/extremes, within sketch bounds for
distinct/quantiles, exactly for top values on bounded-cardinality data."""

import json
import math

import pytest
from pyspark.sql import functions as F


def _load(spark):
    from pandas_profiling_personal_spark.sources.readers import read_parquet

    return read_parquet(spark, "/root/testdata/sf0.01/lineitem.parquet")


def test_shard_merge_matches_whole_frame(spark):
    from pandas_profiling_personal_spark import ProfileConfig, profile
    from pandas_profiling_personal_spark.plans.incremental import (
        finalize_partial,
        merge_partials,
        partial_profile,
    )

    df = _load(spark).select(
        "l_quantity", "l_extendedprice", "l_discount", "l_returnflag",
        "l_linestatus",
    )
    # three deterministic, unequal shards
    shards = [
        df.where(F.col("l_extendedprice") % 7 < 2),
        df.where(F.col("l_extendedprice") % 7 == 2),
        df.where(F.col("l_extendedprice") % 7 > 2),
    ]
    parts = [partial_profile(s) for s in shards]
    merged = merge_partials(parts)
    inc = finalize_partial(merged, spark)

    batch = profile(
        df, ProfileConfig(exact=True, correlations=(), duplicates=False)
    )
    assert inc["table"]["n"] == batch.table["n"]
    assert inc["table"]["n_shards"] == 3

    for c in ("l_quantity", "l_extendedprice", "l_discount"):
        iv, bv = inc["variables"][c], batch.variables[c]
        assert iv["count"] == bv["count"]
        assert iv["n_missing"] == bv["n_missing"]
        assert iv["n_zeros"] == bv["n_zeros"]
        assert iv["min"] == bv["min"] and iv["max"] == bv["max"]
        # Pébay-merged moments are exact (fp-tolerance only)
        for k in ("mean", "std", "variance", "skewness", "kurtosis"):
            assert math.isclose(iv[k], bv[k], rel_tol=1e-9), (c, k, iv[k], bv[k])
        # HLL distinct within its a-priori bound (~1.6% at lgK=12)
        assert abs(iv["n_distinct_approx"] - bv["n_distinct"]) <= max(
            3, 0.05 * bv["n_distinct"]
        )
        # KLL median within a rank-error neighbourhood of the exact median
        exact_med = bv["q_0_5"]
        kll_med = iv["quantiles_approx"]["0.5"]
        lo, hi = bv["q_0_25"], bv["q_0_75"]
        assert lo <= kll_med <= hi and abs(kll_med - exact_med) <= (hi - lo)

    # categorical top values: exact on bounded-cardinality columns
    for c in ("l_returnflag", "l_linestatus"):
        iv, bv = inc["variables"][c], batch.variables[c]
        batch_top = {
            t["value"]: t["count"] for t in bv["top_values"]
        }
        inc_top = dict(iv["top_values"])
        assert inc_top == dict(
            sorted(batch_top.items(), key=lambda kv: (-kv[1], kv[0]))[
                : len(inc_top)
            ]
        )

    # merge is associative in the stats that matter: ((a+b)+c) == (a+(b+c))
    alt = merge_partials([parts[0], merge_partials(parts[1:])])
    alt_fin = finalize_partial(alt, spark)
    for c in ("l_quantity", "l_extendedprice"):
        for k in ("mean", "std", "skewness", "kurtosis"):
            assert math.isclose(
                alt_fin["variables"][c][k], inc["variables"][c][k],
                rel_tol=1e-9,
            )


def test_partial_profile_json_roundtrip(spark):
    from pandas_profiling_personal_spark.plans.incremental import (
        PartialProfile,
        finalize_partial,
        merge_partials,
        partial_profile,
    )

    df = _load(spark).select("l_quantity", "l_returnflag").limit(500)
    a = partial_profile(df.where(F.col("l_quantity") <= 25))
    b = partial_profile(df.where(F.col("l_quantity") > 25))

    # shard states survive JSON (the cross-session persistence contract)
    a2 = PartialProfile.from_json(a.to_json())
    b2 = PartialProfile.from_json(b.to_json())
    fin = finalize_partial(merge_partials([a, b]), spark)
    fin2 = finalize_partial(merge_partials([a2, b2]), spark)
    assert json.dumps(fin, default=str) == json.dumps(fin2, default=str)

    # mismatched column sets fail loudly
    c = partial_profile(df.select("l_quantity"))
    with pytest.raises(ValueError, match="column sets differ"):
        merge_partials([a, c])


def test_partial_profile_nan_inf_matches_batch(spark):
    """NaN/inf columns: shard states carry the BATCH profile's semantics —
    count includes NaN, n_infinite is ±inf only, NaN tracked as n_nan, max
    follows Spark's NaN-is-largest ordering, and non-finite means
    contaminate the moment estimators to NaN (never a fabricated 0)."""
    from pandas_profiling_personal_spark import ProfileConfig, profile
    from pandas_profiling_personal_spark.plans.incremental import (
        finalize_partial,
        merge_partials,
        partial_profile,
    )

    df = spark.createDataFrame(
        [(float("nan"),), (1.0,), (2.0,), (float("inf"),)], "v double"
    )
    inc = finalize_partial(partial_profile(df), spark)["variables"]["v"]
    bv = profile(
        df, ProfileConfig(exact=True, correlations=(), duplicates=False)
    ).variables["v"]
    assert inc["count"] == bv["count"] == 4
    assert inc["n_infinite"] == bv["n_infinite"] == 1
    assert inc["n_nan"] == bv["n_nan"] == 1
    assert math.isnan(inc["mean"]) and math.isnan(inc["variance"])
    assert math.isnan(inc["max"]) and math.isnan(bv["max"])

    # merging a finite shard with an inf shard contaminates, not zeroes
    clean = partial_profile(spark.createDataFrame([(3.0,), (4.0,)], "v double"))
    dirty = partial_profile(
        spark.createDataFrame([(1.0,), (float("inf"),)], "v double")
    )
    fm = finalize_partial(merge_partials([clean, dirty]), spark)["variables"][
        "v"
    ]
    assert math.isinf(fm["mean"]) and math.isnan(fm["variance"])


def test_partial_profile_datetime_json_and_type_drift(spark):
    """A JSON round-tripped shard state merges with a FRESH one — datetime
    min/max come back as datetimes, not strings; and per-column type drift
    between shards raises instead of silently merging garbage."""
    import datetime as dt

    from pandas_profiling_personal_spark.plans.incremental import (
        PartialProfile,
        finalize_partial,
        merge_partials,
        partial_profile,
    )

    a = partial_profile(
        spark.createDataFrame(
            [(dt.datetime(2024, 1, 1, 3, 4, 5),)], "ts timestamp"
        )
    )
    loaded = PartialProfile.from_json(
        partial_profile(
            spark.createDataFrame([(dt.datetime(2024, 6, 1),)], "ts timestamp")
        ).to_json()
    )
    fin = finalize_partial(merge_partials([a, loaded]), spark)
    v = fin["variables"]["ts"]
    assert v["min"] == dt.datetime(2024, 1, 1, 3, 4, 5)
    assert v["max"] == dt.datetime(2024, 6, 1)

    num = partial_profile(spark.createDataFrame([(1.0,)], "x double"))
    cat = partial_profile(spark.createDataFrame([("a",)], "x string"))
    with pytest.raises(ValueError, match="type differs"):
        merge_partials([num, cat])


def test_partial_profile_all_null_and_empty_shards(spark):
    from pandas_profiling_personal_spark.plans.incremental import (
        finalize_partial,
        merge_partials,
        partial_profile,
    )

    df = spark.createDataFrame(
        [(None, "x")] * 10, "v double, s string"
    )
    empty = df.where("s = 'nope'")
    merged = merge_partials([partial_profile(df), partial_profile(empty)])
    fin = finalize_partial(merged, spark)
    v = fin["variables"]["v"]
    assert v["count"] == 0 and v["n_missing"] == 10
    assert v.get("mean") is None
    assert fin["variables"]["s"]["top_values"] == [("x", 10)]


def test_mergeable_histograms_match_batch_at_shared_edges(spark):
    """histograms=: shard states binned over shared edges merge as a
    vector add that equals the batch histogram_all at the same spec
    bit-for-bit; first-shard edge derivation + histogram_specs_of round
    the flow; JSON round-trips; differing specs refuse to merge."""
    from pandas_profiling_personal_spark.operators.histogram import (
        histogram_all,
    )
    from pandas_profiling_personal_spark.plans.incremental import (
        PartialProfile,
        finalize_partial,
        histogram_specs_of,
        merge_partials,
        partial_profile,
    )

    df = _load(spark).select(
        "l_quantity", "l_extendedprice", "l_returnflag", "l_shipdate"
    )
    shards = [
        df.where(F.col("l_extendedprice") % 3 < 1),
        df.where(F.col("l_extendedprice") % 3 >= 1),
    ]
    # first shard derives 12-bin edges from its own min/max — datetime
    # columns included (epoch-second edges, histogram_all's conversion) …
    p0 = partial_profile(shards[0], histograms=12)
    specs = histogram_specs_of(p0)
    assert set(specs) == {"l_quantity", "l_extendedprice", "l_shipdate"}
    assert specs["l_quantity"][0] == 12
    # … later shards bin over the SAME edges (values outside clamp)
    p1 = partial_profile(shards[1], histograms=specs)
    merged = merge_partials(
        [PartialProfile.from_json(p0.to_json()), p1]  # JSON round-trip leg
    )
    out = finalize_partial(merged, spark)
    batch = histogram_all(df, specs)
    for c in specs:
        assert out["variables"][c]["histogram"]["counts"] == \
            batch[c]["counts"], c
        assert out["variables"][c]["histogram"]["bin_edges"] == \
            batch[c]["bin_edges"], c
    assert sum(out["variables"]["l_quantity"]["histogram"]["counts"]) == \
        df.where(F.col("l_quantity").isNotNull()).count()

    # spec drift and missing-histogram shards refuse to merge
    p_oth = partial_profile(
        shards[1], histograms={"l_quantity": (8, 0.0, 10.0)}
    )
    with pytest.raises(ValueError, match="histogram"):
        merge_partials([p0, p_oth])
    p_none = partial_profile(shards[1])
    with pytest.raises(ValueError, match="histogram"):
        merge_partials([p0, p_none])

    # non-numeric spec keys fail loudly
    with pytest.raises(ValueError, match="non-numeric"):
        partial_profile(shards[0], histograms={"l_returnflag": (4, 0.0, 1.0)})


def test_mergeable_pearson_matches_batch(spark):
    """correlations=True: per-pair co-moment states merged across 3 and 5
    unequal shards reproduce the whole-frame pearson_matrix to 1e-9 —
    including a null-bearing column (pairwise-complete row sets differ per
    pair) and a constant column (batch try_divide null)."""
    from pandas_profiling_personal_spark.operators.correlations import (
        pearson_matrix,
    )
    from pandas_profiling_personal_spark.plans.incremental import (
        PartialProfile,
        finalize_partial,
        merge_partials,
        partial_profile,
        pearson_of,
    )

    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    base = _load(spark).select(*cols)
    # plant nulls in one column (misaligned with another's nulls) and a
    # constant column: the two cases that separate pairwise-complete
    # co-moments from a naive whole-column computation
    df = base.withColumn(
        "l_tax", F.when(F.col("l_quantity") % 11 != 0, F.col("l_tax"))
    ).withColumn(
        "l_discount",
        F.when(F.col("l_extendedprice") % 13 != 0, F.col("l_discount")),
    ).withColumn("const_col", F.lit(4.0))
    all_cols = cols + ["const_col"]

    batch = pearson_matrix(df, all_cols)

    def shards(k):
        key = F.floor(F.col("l_extendedprice")).cast("long") % k
        return [df.where(key == i) for i in range(k)]

    for k in (3, 5):
        parts = [
            partial_profile(s, columns=all_cols, correlations=True)
            for s in shards(k)
        ]
        merged = merge_partials(parts)
        inc = pearson_of(merged)
        assert set(inc) == set(batch)
        for pair, bv in batch.items():
            iv = inc[pair]
            if bv is None:
                assert iv is None, (pair, iv)
            else:
                assert iv is not None and math.isclose(
                    iv, bv, rel_tol=1e-9, abs_tol=1e-12
                ), (k, pair, iv, bv)

    # associativity: ((a+b)+rest) == merge(all)
    alt = merge_partials([parts[0], merge_partials(parts[1:])])
    for pair, v in pearson_of(alt).items():
        w = inc[pair]
        assert (v is None) == (w is None)
        if v is not None:
            assert math.isclose(v, w, rel_tol=1e-12)

    # JSON round-trip carries the pair states
    rt = merge_partials(
        [PartialProfile.from_json(p.to_json()) for p in parts]
    )
    assert pearson_of(rt) == inc

    # finalize exposes the batch profile's nested matrix shape
    fin = finalize_partial(merged, spark)
    m = fin["correlations"]["pearson"]
    b01 = batch[("l_quantity", "l_extendedprice")]
    assert math.isclose(
        m["l_quantity"]["l_extendedprice"], b01, rel_tol=1e-9
    )
    assert m["l_extendedprice"]["l_quantity"] == m["l_quantity"]["l_extendedprice"]

    # mixed correlations= settings refuse to merge
    plain = partial_profile(shards(3)[0], columns=all_cols)
    with pytest.raises(ValueError, match="Pearson"):
        merge_partials([parts[0], plain])


def test_mergeable_cramers_v_matches_batch(spark):
    """categorical_pairs=: contingency states merged across 3 and 5 unequal
    shards reproduce the whole-frame cramers_v_matrix EXACTLY — integer
    cells vector-add with zero FP merge error, so this is ==, not isclose.
    Covers a null-bearing column (pairwise-complete n differs from the
    frame count), the max_cells cap degrading loudly via exact=False, the
    all-or-nothing merge discipline, JSON round trip, associativity."""
    from pandas_profiling_personal_spark.operators.correlations import (
        cramers_v_matrix,
    )
    from pandas_profiling_personal_spark.plans.incremental import (
        PartialProfile,
        cramers_v_of,
        merge_partials,
        partial_profile,
    )

    df = _load(spark).select(
        "l_extendedprice",
        F.floor(F.col("l_quantity") / 10).cast("string").alias("q_decile"),
        F.pmod(F.col("l_quantity").cast("long"), F.lit(7))
        .cast("string")
        .alias("q_mod7"),
        # null-bearing: pairwise-complete row set != frame row set
        F.when(F.col("l_quantity") % 11 != 0, F.col("l_returnflag")).alias(
            "flag_nulled"
        ),
    )
    pairs = [("q_decile", "q_mod7"), ("q_mod7", "flag_nulled")]
    batch = cramers_v_matrix(df, ["q_decile", "q_mod7", "flag_nulled"])
    n_pairwise = df.where(
        F.col("flag_nulled").isNotNull() & F.col("q_mod7").isNotNull()
    ).count()

    def shards(k):
        key = F.floor(F.col("l_extendedprice")).cast("long") % k
        return [df.where(key == i) for i in range(k)]

    for k in (3, 5):
        parts = [
            partial_profile(s, top_m=0, categorical_pairs=pairs)
            for s in shards(k)
        ]
        merged = merge_partials(parts)
        inc = cramers_v_of(merged)
        for p in pairs:
            assert inc[p]["exact"] is True
            assert inc[p]["v"] == batch[p], (k, p, inc[p], batch[p])
        assert inc[("q_mod7", "flag_nulled")]["n"] == n_pairwise
        assert inc[("q_decile", "q_mod7")]["n"] == df.count()

    # associativity: ((a+b)+rest) == merge(all)
    alt = merge_partials([parts[0], merge_partials(parts[1:])])
    assert cramers_v_of(alt) == inc

    # JSON round-trip carries the integer cells bit-for-bit
    rt = merge_partials(
        [PartialProfile.from_json(p.to_json()) for p in parts]
    )
    assert cramers_v_of(rt) == inc

    # cap: a 2-cell budget on a 6x7 table degrades LOUDLY — exact=False,
    # n still the full pairwise-complete count, v from the kept cells
    capped = merge_partials(
        [
            partial_profile(
                s, top_m=0, categorical_pairs=pairs, max_cells=2
            )
            for s in shards(3)
        ]
    )
    cres = cramers_v_of(capped)[("q_decile", "q_mod7")]
    assert cres["exact"] is False
    assert cres["n"] == df.count()

    # mixed categorical_pairs= settings refuse to merge
    plain = partial_profile(shards(3)[0], top_m=0)
    with pytest.raises(ValueError, match="contingency"):
        merge_partials([parts[0], plain])
    other = partial_profile(
        shards(3)[0], top_m=0, categorical_pairs=[("q_decile", "q_mod7")]
    )
    with pytest.raises(ValueError, match="pair sets differ"):
        merge_partials([parts[0], other])

    # no state -> loud error, not an empty dict
    with pytest.raises(ValueError, match="categorical_pairs"):
        cramers_v_of(plain)


def test_drift_between_partials_matches_drift_profile(spark):
    """drift_between_partials: PSI between two shard states (pure driver
    arithmetic over the mergeable histograms) equals the batch drift_profile
    on the raw frames when the fixed edges cover both sides — including the
    eps smoothing of empty buckets and the highest-bucket tie rule."""
    from pandas_profiling_personal_spark.operators.drift import drift_profile
    from pandas_profiling_personal_spark.plans.incremental import (
        drift_between_partials,
        histogram_specs_of,
        merge_partials,
        partial_profile,
    )

    cols = ["l_quantity", "l_extendedprice"]
    base = _load(spark).select(*cols)
    df_a = base.where(F.col("l_quantity") <= 30)
    df_b = base.where(F.col("l_quantity") > 10)

    # shared edges covering BOTH sides: the union min/max (what
    # drift_profile derives internally)
    row = base.agg(
        *[F.min(c).alias(f"lo_{c}") for c in cols],
        *[F.max(c).alias(f"hi_{c}") for c in cols],
    ).collect()[0]
    specs = {
        c: (10, float(row[f"lo_{c}"]), float(row[f"hi_{c}"])) for c in cols
    }
    pa = partial_profile(df_a, histograms=specs)
    pb = partial_profile(df_b, histograms=specs)

    batch = {
        r["column"]: r
        for r in drift_profile(df_a, df_b, cols, bins=10).collect()
    }
    inc = drift_between_partials(pa, pb)
    assert set(inc) == set(cols)
    for c in cols:
        assert inc[c]["n_a"] == batch[c]["n_a"]
        assert inc[c]["n_b"] == batch[c]["n_b"]
        assert inc[c]["psi"] == pytest.approx(batch[c]["psi"], abs=2e-6)
        assert inc[c]["max_shift_bucket"] == batch[c]["max_shift_bucket"], c
        assert inc[c]["standardized_mean_shift"] is not None

    # states merged from shards drift identically (merge-then-drift ==
    # whole-shard drift): the histograms are exact vector adds
    key = F.floor(F.col("l_extendedprice")).cast("long") % 2
    pa2 = merge_partials([
        partial_profile(df_a.where(key == i), histograms=specs)
        for i in range(2)
    ])
    assert histogram_specs_of(pa2) == specs
    inc2 = drift_between_partials(pa2, pb)
    assert {c: inc2[c]["psi"] for c in cols} == {
        c: inc[c]["psi"] for c in cols
    }

    # mismatched specs refuse to drift
    pb_other = partial_profile(
        df_b, histograms={c: (8, specs[c][1], specs[c][2]) for c in cols}
    )
    with pytest.raises(ValueError, match="specs differ"):
        drift_between_partials(pa, pb_other)


def test_mergeable_embedding_state_matches_batch_drift(spark):
    """EmbeddingState: shard states merged over shared norm edges reproduce
    the batch embedding_drift row field-for-field, survive JSON, and refuse
    to merge or drift across mismatched specs."""
    from pandas_profiling_personal_spark.operators.drift import (
        embedding_drift,
    )
    from pandas_profiling_personal_spark.plans.incremental import (
        EmbeddingState,
        embedding_drift_between,
        embedding_norm_extent,
        embedding_partial,
        merge_embedding_states,
    )
    from pandas_profiling_personal_spark.sources.readers import read_parquet

    dim = 64
    emb = read_parquet(spark, "/root/testdata/sf0.01/embeddings.parquet")
    df_b = emb.where(F.col("vec_id") % 3 != 0).select(
        F.transform(
            "embedding", lambda x: x.cast("double") * 1.05 + 0.1
        ).alias("embedding")
    )
    batch = embedding_drift(emb, df_b, "embedding", dim=dim).collect()[0]

    ea = embedding_norm_extent(emb, "embedding", dim)
    eb = embedding_norm_extent(df_b, "embedding", dim)
    edges = (min(ea[0], eb[0]), max(ea[1], eb[1]))
    shards = [
        embedding_partial(
            emb.where(F.col("vec_id") % 3 == i), "embedding", dim, edges
        )
        for i in range(3)
    ]
    pa = merge_embedding_states(shards)
    pb = embedding_partial(df_b, "embedding", dim, edges)
    inc = embedding_drift_between(pa, pb)
    assert inc["n_a"] == batch["n_a"] and inc["n_b"] == batch["n_b"]
    for k in ("norm_psi", "centroid_cosine", "mean_shift_l2",
              "max_mean_shift"):
        assert inc[k] == pytest.approx(batch[k], abs=2e-6), k
    assert inc["max_shift_bucket"] == batch["max_shift_bucket"]
    assert inc["max_shift_dim"] == batch["max_shift_dim"]

    # JSON round-trip drifts identically
    rt = merge_embedding_states(
        [EmbeddingState.from_json(s.to_json()) for s in shards]
    )
    assert embedding_drift_between(rt, pb) == inc

    # spec mismatch refuses
    other = embedding_partial(df_b, "embedding", dim, (0.0, 1.0), bins=10)
    with pytest.raises(ValueError, match="specs differ"):
        embedding_drift_between(pa, other)
    with pytest.raises(ValueError, match="specs differ"):
        merge_embedding_states([pa, other])

    # empty side -> explicit null-signal dict
    empty = embedding_partial(
        emb.where("vec_id < 0"), "embedding", dim, edges
    )
    nul = embedding_drift_between(pa, empty)
    assert nul["n_b"] == 0 and nul["norm_psi"] is None


def test_categorical_drift_between_partials_matches_batch(spark):
    """Categorical state drift: on bounded-cardinality columns (complete
    value counts -> exact=True) the PSI/max-shift equal the batch
    drift_profile_categorical on the raw frames; high-cardinality columns
    flag exact=False and fold the uncaptured tail into __other__."""
    from pandas_profiling_personal_spark.operators.drift import (
        drift_profile_categorical,
    )
    from pandas_profiling_personal_spark.plans.incremental import (
        categorical_drift_between_partials,
        merge_partials,
        partial_profile,
    )

    cols = ["l_returnflag", "l_linestatus"]
    base = _load(spark).select(*cols, "l_quantity")
    df_a = base.where(F.col("l_quantity") <= 30).select(*cols)
    df_b = base.where(F.col("l_quantity") > 20).select(*cols)

    key = F.crc32(F.concat_ws("|", *cols)) % 2
    pa = merge_partials([
        partial_profile(df_a.where(key == i)) for i in range(2)
    ])
    pb = partial_profile(df_b)

    batch = {
        r["column"]: r
        for r in drift_profile_categorical(df_a, df_b, cols).collect()
    }
    inc = categorical_drift_between_partials(pa, pb)
    assert set(inc) == set(cols)
    for c in cols:
        assert inc[c]["exact"] is True
        assert inc[c]["n_a"] == batch[c]["n_a"]
        assert inc[c]["n_b"] == batch[c]["n_b"]
        assert inc[c]["psi"] == pytest.approx(batch[c]["psi"], abs=2e-6)
        assert inc[c]["max_shift_value"] == batch[c]["max_shift_value"], c

    # high-cardinality column: per-shard top-M drops tail values -> the
    # drift is flagged approximate, still computable
    wide = _load(spark).select(
        F.col("l_orderkey").cast("string").alias("k")
    )
    qa = partial_profile(wide.limit(2000), top_m=10)
    qb = partial_profile(wide.limit(3000), top_m=10)
    approx = categorical_drift_between_partials(qa, qb)["k"]
    assert approx["exact"] is False
    assert approx["psi"] is not None


def test_incremental_drift_report_surface(spark):
    """incremental_drift_report: the daily-incremental one-pager — numeric,
    categorical and embedding drift between states through the shared
    alert rules and HTML renderer, no Spark jobs past state construction."""
    from pandas_profiling_personal_spark.plans.incremental import (
        embedding_norm_extent,
        embedding_partial,
        incremental_drift_report,
        partial_profile,
    )
    from pandas_profiling_personal_spark.sources.readers import read_parquet

    cols = ["l_quantity", "l_returnflag"]
    base = _load(spark).select(*cols)
    row = base.agg(
        F.min("l_quantity").alias("lo"), F.max("l_quantity").alias("hi")
    ).collect()[0]
    specs = {"l_quantity": (10, float(row["lo"]), float(row["hi"]))}
    pa = partial_profile(base.where("l_quantity <= 30"), histograms=specs)
    pb = partial_profile(base.where("l_quantity > 25"), histograms=specs)

    emb = read_parquet(spark, "/root/testdata/sf0.01/embeddings.parquet")
    shifted = emb.select(
        F.transform("embedding", lambda x: x.cast("double") * 3.0).alias(
            "embedding"
        )
    )
    edges_a = embedding_norm_extent(emb, "embedding", 64)
    edges_b = embedding_norm_extent(shifted, "embedding", 64)
    edges = (min(edges_a[0], edges_b[0]), max(edges_a[1], edges_b[1]))
    ea = embedding_partial(emb, "embedding", 64, edges)
    eb = embedding_partial(shifted, "embedding", 64, edges)

    html = incremental_drift_report(pa, pb, ea, eb)
    assert "<html" in html and "Alerts" in html
    # the deliberately shifted quantity slice and the 3x-scaled embeddings
    # must both surface in the alert banner
    assert "l_quantity" in html
    assert "EMBEDDING_NORM_DRIFT" in html or "DRIFT_" in html


def test_align_refuses_disjoint_shard_range(spark):
    """The --align-state honesty guard: profiling a shard against stored
    edges that its observed range lies ENTIRELY outside must refuse loudly
    (bucket_index clamps everything into one boundary bucket, so drift PSI
    would read near-zero on completely moved data). Partial overlap and
    all-null columns still align fine."""
    from pandas_profiling_personal_spark.plans.incremental import (
        histogram_specs_of,
        partial_profile,
    )

    base = spark.range(0, 101).select(
        F.col("id").cast("double").alias("x"),
        F.col("id").cast("double").alias("y"),
    )
    specs = histogram_specs_of(partial_profile(base, histograms=10))
    assert set(specs) == {"x", "y"}  # edges [0, 100]

    # shard entirely above the stored edges -> loud refusal naming re-edging
    far = spark.range(1000, 1101).select(
        F.col("id").cast("double").alias("x"),
        F.col("id").cast("double").alias("y"),
    )
    with pytest.raises(ValueError, match="[Rr]e-edge"):
        partial_profile(far, histograms=specs)

    # partial overlap: clamped tail mass is visible drift -> allowed
    part = spark.range(50, 151).select(
        F.col("id").cast("double").alias("x"),
        F.col("id").cast("double").alias("y"),
    )
    p = partial_profile(part, histograms=specs)
    assert sum(p.columns["x"].hist_counts) == 101

    # all-null shard column: nothing clamps -> allowed, zero-count histogram
    nul = spark.range(0, 5).select(
        F.lit(None).cast("double").alias("x"),
        F.col("id").cast("double").alias("y"),
    )
    p2 = partial_profile(nul, histograms=specs)
    assert sum(p2.columns["x"].hist_counts) == 0

    # one disjoint column among healthy ones is still named in the error
    mix = spark.range(0, 50).select(
        (F.col("id") + 10000).cast("double").alias("x"),
        F.col("id").cast("double").alias("y"),
    )
    with pytest.raises(ValueError, match="x.*observed"):
        partial_profile(mix, histograms=specs)


def test_mergeable_phik_matches_batch(spark):
    """phik_of: the SAME merged contingency cells cramers_v_of rides,
    finalized through the batch _phik_from_cells inversion — categorical
    x categorical phik bins variables AS their values, so a 3-shard merged
    state equals the batch phik on the whole frame exactly."""
    from pandas_profiling_personal_spark.operators.correlations import phik
    from pandas_profiling_personal_spark.plans.incremental import (
        merge_partials,
        partial_profile,
        phik_of,
    )

    df = _load(spark).select(
        "l_extendedprice",
        F.floor(F.col("l_quantity") / 10).cast("string").alias("q_decile"),
        F.pmod(F.col("l_quantity").cast("long"), F.lit(7))
        .cast("string")
        .alias("q_mod7"),
    )
    pairs = [("q_decile", "q_mod7")]
    batch = phik(df, "q_decile", "q_mod7", a_numeric=False, b_numeric=False)

    key = F.floor(F.col("l_extendedprice")).cast("long") % 3
    parts = [
        partial_profile(
            df.where(key == i), top_m=0, categorical_pairs=pairs
        )
        for i in range(3)
    ]
    inc = phik_of(merge_partials(parts))[("q_decile", "q_mod7")]
    assert inc["exact"] is True
    assert inc["phik"] == batch
    assert 0.0 < inc["phik"] <= 1.0  # derived pair: genuinely associated

    plain = partial_profile(df.where(key == 0), top_m=0)
    with pytest.raises(ValueError, match="categorical_pairs"):
        phik_of(plain)


def test_association_drift_between_partials(spark):
    """Association drift: the language x source coupling can shift while
    both marginals stay identical — delta Cramér's V between states
    catches it (pure driver arithmetic), DRIFT_ASSOCIATION fires in the
    report, disjoint declared pair sets refuse."""
    from pandas_profiling_personal_spark.operators.correlations import (
        cramers_v_matrix,
    )
    from pandas_profiling_personal_spark.operators.drift import (
        round_half_up,
    )
    from pandas_profiling_personal_spark.plans.incremental import (
        association_drift_between_partials,
        histogram_specs_of,
        incremental_drift_report,
        partial_profile,
    )

    base = _load(spark).select(
        "l_quantity",
        "l_extendedprice",
        F.pmod(F.col("l_quantity").cast("long"), F.lit(5))
        .cast("string")
        .alias("a"),
    )
    # day A: b fully determined by a (V=1); day B: b derived from an
    # unrelated column (V~0). The coupling moves — which is exactly what
    # marginal PSI cannot see when the marginals stay similar.
    df_a = base.withColumn("b", F.col("a"))
    df_b = base.withColumn(
        "b",
        F.pmod(F.floor("l_extendedprice").cast("long"), F.lit(5))
        .cast("string"),
    )
    pairs = [("a", "b")]
    pa = partial_profile(df_a, top_m=0, categorical_pairs=pairs)
    pb = partial_profile(df_b, top_m=0, categorical_pairs=pairs)

    out = association_drift_between_partials(pa, pb)[("a", "b")]
    batch_a = cramers_v_matrix(df_a, ["a", "b"])[("a", "b")]
    batch_b = cramers_v_matrix(df_b, ["a", "b"])[("a", "b")]
    assert out["v_a"] == round_half_up(batch_a, 6)
    assert out["v_b"] == round_half_up(batch_b, 6)
    assert out["delta_v"] == round_half_up(batch_b - batch_a, 6)
    assert out["exact"] is True
    assert out["v_a"] > 0.99  # b == a on day A
    assert abs(out["delta_v"]) > 0.1  # the coupling really moved

    # the one-call report surfaces it as DRIFT_ASSOCIATION
    specs = histogram_specs_of(
        partial_profile(df_a.select("l_quantity"), histograms=8)
    )
    pa2 = partial_profile(df_a, histograms=specs, top_m=0, categorical_pairs=pairs)
    pb2 = partial_profile(df_b, histograms=specs, top_m=0, categorical_pairs=pairs)
    html = incremental_drift_report(pa2, pb2)
    assert "DRIFT_ASSOCIATION" in html
    assert "Association" in html and "a×b" in html

    # disjoint declared pair sets refuse rather than reading "no drift"
    other = partial_profile(
        df_a.withColumn("c", F.col("a")),
        top_m=0,
        categorical_pairs=[("a", "c")],
    )
    with pytest.raises(ValueError, match="disjoint"):
        association_drift_between_partials(pa, other)


def test_cli_categorical_pairs_state_loop(tmp_path):
    """CLI: --categorical-pairs carries the mergeable contingency state
    through --save-state; --align-state and --drift-against reuse the
    STORED pairs automatically and the drift HTML gains the association
    section."""
    import subprocess
    import sys

    import pandas as pd

    src_a = tmp_path / "day1.parquet"
    src_b = tmp_path / "day2.parquet"
    n = 40
    pd.DataFrame(
        {
            "v": [float(i % 10) for i in range(n)],
            "lang": [str(i % 4) for i in range(n)],
            "src": [str(i % 4) for i in range(n)],  # coupled to lang
        }
    ).to_parquet(src_a)
    pd.DataFrame(
        {
            "v": [float(i % 10) for i in range(n)],
            "lang": [str(i % 4) for i in range(n)],
            "src": [str((i // 4) % 4) for i in range(n)],  # decoupled
        }
    ).to_parquet(src_b)

    def run(*argv):
        proc = subprocess.run(
            [sys.executable, "-m", "pandas_profiling_personal_spark.cli",
             *argv, "--master", "local[2]"],
            capture_output=True, text=True, timeout=300, cwd="/root/repo",
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        return json.loads(proc.stdout.strip().splitlines()[-1])

    st_a = tmp_path / "a.json"
    st_b = tmp_path / "b.json"
    out = tmp_path / "drift.html"
    run(str(src_a), "--save-state", str(st_a),
        "--categorical-pairs", "lang:src")
    from pandas_profiling_personal_spark.plans.incremental import (
        PartialProfile,
        cramers_v_of,
    )

    pa = PartialProfile.from_json(st_a.read_text())
    assert pa.cat_pairs is not None
    assert cramers_v_of(pa)[("lang", "src")]["v"] > 0.99

    # align: stored pairs reused without re-declaring them
    run(str(src_b), "--save-state", str(st_b), "--align-state", str(st_a))
    pb = PartialProfile.from_json(st_b.read_text())
    assert pb.cat_pairs is not None and ("lang", "src") in pb.cat_pairs

    # drift: association section + alert in the HTML
    run(str(src_b), str(out), "--drift-against", str(st_a))
    html = out.read_text()
    assert "Association" in html and "lang×src" in html
    assert "DRIFT_ASSOCIATION" in html


def test_cli_drift_pair_flag_validation(tmp_path):
    """Review r9 second pass: --categorical-pairs with --drift-against must
    refuse by name when the stored baseline carries no pairs (or different
    ones) — an explicitly requested analysis must not silently vanish."""
    import subprocess
    import sys

    import pandas as pd

    src = tmp_path / "day.parquet"
    pd.DataFrame(
        {"v": [1.0, 2.0], "lang": ["a", "b"], "src": ["x", "y"]}
    ).to_parquet(src)
    st = tmp_path / "st.json"
    out = tmp_path / "drift.html"

    def run(*argv):
        return subprocess.run(
            [sys.executable, "-m", "pandas_profiling_personal_spark.cli",
             *argv, "--master", "local[2]"],
            capture_output=True, text=True, timeout=300, cwd="/root/repo",
        )

    # baseline saved WITHOUT pairs
    assert run(str(src), "--save-state", str(st)).returncode == 0
    p = run(str(src), str(out), "--drift-against", str(st),
            "--categorical-pairs", "lang:src")
    assert p.returncode != 0
    assert "carries no contingency pairs" in (p.stderr + p.stdout)

    # baseline saved WITH different pairs -> named mismatch, not a traceback
    st2 = tmp_path / "st2.json"
    assert run(str(src), "--save-state", str(st2),
               "--categorical-pairs", "lang:src").returncode == 0
    p2 = run(str(src), str(out), "--drift-against", str(st2),
             "--categorical-pairs", "v:lang")
    assert p2.returncode != 0
    assert "disagrees with the stored" in (p2.stderr + p2.stdout)
    assert "Traceback" not in p2.stderr


def test_cli_embedding_state_loop(tmp_path):
    """CLI: --embedding-col closes the last drift family in the daily
    loop — --save-state writes a .emb sidecar (norm buckets + power sums
    at inferred dim), --drift-against picks it up automatically, and a
    scaled embedder surfaces EMBEDDING_* alerts in the report."""
    import subprocess
    import sys

    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(5)
    base = rng.normal(0, 1, (300, 16))
    src_a = tmp_path / "day1.parquet"
    src_b = tmp_path / "day2.parquet"
    pd.DataFrame(
        {"vec_id": range(300), "embedding": [r.tolist() for r in base]}
    ).to_parquet(src_a)
    pd.DataFrame(
        {"vec_id": range(300), "embedding": [(3.0 * r).tolist() for r in base]}
    ).to_parquet(src_b)

    def run(*argv):
        proc = subprocess.run(
            [sys.executable, "-m", "pandas_profiling_personal_spark.cli",
             *argv, "--master", "local[2]"],
            capture_output=True, text=True, timeout=300, cwd="/root/repo",
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        return json.loads(proc.stdout.strip().splitlines()[-1])

    st_a = tmp_path / "a.json"
    out = tmp_path / "drift.html"
    s1 = run(str(src_a), "--save-state", str(st_a),
             "--embedding-col", "embedding")
    assert s1["embedding_state"] == str(st_a) + ".emb"
    side = json.loads((tmp_path / "a.json.emb").read_text())
    assert side["column"] == "embedding"
    assert side["state"]["dim"] == 16 and side["state"]["n"] == 300

    s3 = run(str(src_b), str(out), "--drift-against", str(st_a))
    assert s3["embedding"] is True
    html = out.read_text()
    assert "EMBEDDING_NORM_DRIFT" in html or "EMBEDDING_DIM_SHIFT" in html

    # --embedding-col against a baseline without a sidecar: named refusal
    st_plain = tmp_path / "plain.json"
    run(str(src_a), "--save-state", str(st_plain))
    p = subprocess.run(
        [sys.executable, "-m", "pandas_profiling_personal_spark.cli",
         str(src_b), str(out), "--drift-against", str(st_plain),
         "--embedding-col", "embedding", "--master", "local[2]"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert p.returncode != 0
    assert "no .emb sidecar" in (p.stderr + p.stdout)


def test_cli_embedding_sidecar_contract(tmp_path):
    """Review r9 third pass: --align-state carries the .emb sidecar forward
    without re-declaring the flag (the stored-pairs contract); an explicit
    --embedding-dim disagreeing with the sidecar refuses by name; a dim
    migration (zero valid vectors at the stored dim) refuses rather than
    reporting a silent 'no embedding drift'; a dropped column refuses."""
    import subprocess
    import sys

    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(9)
    v16 = rng.normal(0, 1, (60, 16))
    src_a = tmp_path / "day1.parquet"
    src_b = tmp_path / "day2.parquet"
    src_c = tmp_path / "day3_migrated.parquet"
    src_d = tmp_path / "day4_dropped.parquet"
    pd.DataFrame(
        {"vec_id": range(60), "emb": [r.tolist() for r in v16]}
    ).to_parquet(src_a)
    pd.DataFrame(
        {"vec_id": range(60), "emb": [(1.1 * r).tolist() for r in v16]}
    ).to_parquet(src_b)
    pd.DataFrame(
        {"vec_id": range(60),
         "emb": [r.tolist() + r.tolist() for r in v16]}  # 32-dim now
    ).to_parquet(src_c)
    pd.DataFrame({"vec_id": range(60)}).to_parquet(src_d)

    def run(*argv, ok=True):
        proc = subprocess.run(
            [sys.executable, "-m", "pandas_profiling_personal_spark.cli",
             *argv, "--master", "local[2]"],
            capture_output=True, text=True, timeout=300, cwd="/root/repo",
        )
        if ok:
            assert proc.returncode == 0, proc.stderr[-2000:]
            return json.loads(proc.stdout.strip().splitlines()[-1])
        assert proc.returncode != 0
        assert "Traceback" not in proc.stderr, proc.stderr[-2000:]
        return proc.stderr + proc.stdout

    st_a, st_b = tmp_path / "a.json", tmp_path / "b.json"
    run(str(src_a), "--save-state", str(st_a), "--embedding-col", "emb")

    # align WITHOUT the flag: sidecar carries forward automatically
    s2 = run(str(src_b), "--save-state", str(st_b),
             "--align-state", str(st_a))
    assert s2["embedding_state"] == str(st_b) + ".emb"
    side = json.loads((tmp_path / "b.json.emb").read_text())
    assert side["column"] == "emb" and side["state"]["n"] == 60

    # explicit dim disagreeing with the aligned sidecar: named refusal
    msg = run(str(src_b), "--save-state", str(tmp_path / "x.json"),
              "--align-state", str(st_a), "--embedding-col", "emb",
              "--embedding-dim", "32", ok=False)
    assert "disagrees with the aligned sidecar" in msg

    # dim migration at drift time: refuse, never silent no-drift
    msg = run(str(src_c), str(tmp_path / "d.html"),
              "--drift-against", str(st_a), ok=False)
    assert "ZERO valid finite 16-dim" in msg

    # dropped column at drift time: named refusal
    msg = run(str(src_d), str(tmp_path / "d.html"),
              "--drift-against", str(st_a), ok=False)
    assert "is not in today's input" in msg


def test_schema_drift_between_partials(spark):
    """Structural change between states: the gap the value-drift tables
    (shared-columns only) cannot see — renamed/dropped/added/re-typed
    columns surface as DRIFT_SCHEMA, never silently vanish."""
    from pandas_profiling_personal_spark.operators.drift import (
        drift_alerts, drift_report_html,
    )
    from pandas_profiling_personal_spark.plans.incremental import (
        partial_profile, schema_drift_between_partials,
    )

    df_a = spark.createDataFrame(
        [(1, 1.0, "x")], "id int, val double, cat string")
    df_b = spark.createDataFrame(
        [(1, "one", True)], "id int, val string, extra boolean")
    a, b = partial_profile(df_a), partial_profile(df_b)

    sd = schema_drift_between_partials(a, b)
    assert sd["added"] == ["extra"]
    assert sd["removed"] == ["cat"]
    assert [tc["column"] for tc in sd["type_changed"]] == ["val"]
    assert sd["type_changed"][0]["type_a"] != sd["type_changed"][0]["type_b"]
    assert sd["changed"]

    alerts = drift_alerts(schema_drift=sd)
    assert {(x["column"], x["change"]) for x in alerts} == {
        ("extra", "added"), ("cat", "removed"), ("val", "type_changed")}
    assert all(x["type"] == "DRIFT_SCHEMA" for x in alerts)

    html = drift_report_html(schema_drift=sd)
    assert "Schema" in html and "type changed" in html and "extra" in html

    # identical states: no schema drift, no alert, no section
    same = schema_drift_between_partials(a, a)
    assert not same["changed"]
    assert drift_alerts(schema_drift=same) == []
    assert "Schema" not in drift_report_html(schema_drift=same).split(
        "<h2>Alerts")[1]


def test_incremental_drift_report_includes_schema(spark):
    from pandas_profiling_personal_spark.plans.incremental import (
        incremental_drift_report, partial_profile,
    )

    df_a = spark.createDataFrame([(1.0,)], "val double")
    df_b = spark.createDataFrame([(1.0, "s")], "val double, surprise string")
    html = incremental_drift_report(
        partial_profile(df_a), partial_profile(df_b))
    assert "DRIFT_SCHEMA" in html and "surprise" in html


def test_mergeable_eta_squared_and_target_relevance(spark):
    """group_pairs=: per-category [n, Σy, Σy²] states merged across
    unequal shards reproduce the whole-frame correlation_ratio_all within
    FP-addition rounding, and target_relevance_of(merged state) equals the
    batch target_relevance ranking exactly at its 4-decimal contract —
    ZERO rescans (VERDICT r11 #5). Covers both target roles, the
    max_groups cap degrading loudly, merge discipline, JSON round trip."""
    from pandas_profiling_personal_spark.operators.correlations import (
        correlation_ratio_all,
        target_relevance,
    )
    from pandas_profiling_personal_spark.plans.incremental import (
        PartialProfile,
        eta_squared_of,
        merge_partials,
        partial_profile,
        target_relevance_of,
    )

    df = _load(spark).select(
        "l_extendedprice", "l_quantity", "l_discount",
        "l_returnflag", "l_linestatus",
    )
    target = "l_extendedprice"
    num_f = ["l_quantity", "l_discount"]
    cat_f = ["l_returnflag", "l_linestatus"]
    gpairs = [(c, target) for c in cat_f]

    batch_rank = target_relevance(
        df, target, numeric_cols=num_f, categorical_cols=cat_f)
    batch_eta = correlation_ratio_all(df, target, cat_f)

    key = F.floor(F.col(target)).cast("long") % 3
    parts = [
        partial_profile(
            df.where(key == i), top_m=0, correlations=True,
            group_pairs=gpairs,
        )
        for i in range(3)
    ]
    merged = merge_partials(parts)

    # η² itself: merged sums through the same driver algebra
    etas = eta_squared_of(merged)
    for c in cat_f:
        e = etas[(c, target)]
        assert e["exact"] is True
        assert e["eta2"] == pytest.approx(batch_eta[c], abs=1e-9)

    # the full ranking: same rows, same order, same 4-decimal scores
    state_rank = target_relevance_of(
        merged, target, numeric_cols=num_f, categorical_cols=cat_f)
    assert state_rank == batch_rank

    # JSON round trip + associativity preserve the ranking
    rt = merge_partials(
        [PartialProfile.from_json(p.to_json()) for p in parts])
    assert target_relevance_of(
        rt, target, numeric_cols=num_f, categorical_cols=cat_f
    ) == batch_rank
    alt = merge_partials([parts[0], merge_partials(parts[1:])])
    assert target_relevance_of(
        alt, target, numeric_cols=num_f, categorical_cols=cat_f
    ) == batch_rank

    # categorical target: numeric features via swapped-role η², categorical
    # features via the contingency state — equals the batch routing
    tgt2 = "l_returnflag"
    batch2 = target_relevance(
        df, tgt2, numeric_cols=["l_quantity"],
        categorical_cols=["l_linestatus"])
    parts2 = [
        partial_profile(
            df.where(key == i), top_m=0,
            group_pairs=[(tgt2, "l_quantity")],
            categorical_pairs=[(tgt2, "l_linestatus")],
        )
        for i in range(3)
    ]
    state2 = target_relevance_of(
        merge_partials(parts2), tgt2, numeric_cols=["l_quantity"],
        categorical_cols=["l_linestatus"])
    assert state2 == batch2

    # cap degrades loudly: a 2-group budget on a 6-value column
    capped = merge_partials([
        partial_profile(
            df.where(key == i), top_m=0, group_pairs=gpairs, max_groups=2)
        for i in range(3)
    ])
    ce = eta_squared_of(capped)[("l_returnflag", target)]
    assert ce["exact"] is False and ce["n_groups"] <= 6

    # merge discipline: mixed group_pairs= settings refuse
    plain = partial_profile(df.where(key == 0), top_m=0)
    no_groups = partial_profile(
        df.where(key == 0), top_m=0, correlations=True)
    with pytest.raises(ValueError, match="group-moment"):
        merge_partials([parts[0], no_groups])
    other = partial_profile(
        df.where(key == 0), top_m=0, correlations=True,
        group_pairs=[("l_returnflag", target)])
    with pytest.raises(ValueError, match="pair sets differ"):
        merge_partials([parts[0], other])

    # missing kernels raise by name, never silently drop a feature
    with pytest.raises(ValueError, match="group_pairs"):
        eta_squared_of(plain)
    with pytest.raises(ValueError, match="correlations=True"):
        target_relevance_of(
            merge_partials(parts2), target, numeric_cols=["l_quantity"])
    # derive-from-state: no explicit lists -> every kernel involving the
    # target becomes a feature, matching the explicit-list ranking
    derived = target_relevance_of(merged, target)
    explicit = target_relevance_of(
        merged, target,
        numeric_cols=["l_quantity", "l_discount"], categorical_cols=cat_f)
    assert derived == explicit
    # a kernel-less state has nothing to derive -> loud, not empty
    with pytest.raises(ValueError, match="no features"):
        target_relevance_of(plain, target)
    with pytest.raises(ValueError, match="not in the state"):
        target_relevance_of(merged, "ghost", numeric_cols=num_f)


def test_cli_group_pairs_and_relevance_from_state(tmp_path):
    """CLI daily loop for state-mode target relevance: --group-pairs
    carries the mergeable eta^2 cells through --save-state, --align-state
    reuses the STORED pairs automatically (and a disagreeing flag refuses
    by name), and --relevance-from-state ranks from the merged state with
    NO Spark session — the JSON artifact matches target_relevance_of."""
    import subprocess
    import sys

    import pandas as pd

    src_a = tmp_path / "day1.parquet"
    src_b = tmp_path / "day2.parquet"
    n = 60
    pd.DataFrame({
        "y": [10.0 * (i % 3) + 0.01 * i for i in range(n)],
        "lin": [2.0 * i for i in range(n)],
        "grp": ["abc"[i % 3] for i in range(n)],
    }).to_parquet(src_a)
    pd.DataFrame({
        "y": [10.0 * (i % 3) + 0.01 * i + 0.005 for i in range(n)],
        "lin": [2.0 * i + 1.0 for i in range(n)],
        "grp": ["abc"[(i + 1) % 3] for i in range(n)],
    }).to_parquet(src_b)

    def run(*argv, expect=0):
        proc = subprocess.run(
            [sys.executable, "-m", "pandas_profiling_personal_spark.cli",
             *argv, "--master", "local[2]"],
            capture_output=True, text=True, timeout=300, cwd="/root/repo",
        )
        assert proc.returncode == expect, (
            proc.returncode, proc.stderr[-2000:])
        return proc

    st_a = tmp_path / "a.json"
    st_b = tmp_path / "b.json"
    run(str(src_a), "--save-state", str(st_a), "--group-pairs", "grp:y")
    from pandas_profiling_personal_spark.plans.incremental import (
        PartialProfile,
        merge_partials,
        target_relevance_of,
    )

    pa = PartialProfile.from_json(st_a.read_text())
    assert pa.group_pairs is not None and ("grp", "y") in pa.group_pairs

    # align: stored group pairs carry forward without re-declaring
    run(str(src_b), "--save-state", str(st_b), "--align-state", str(st_a))
    pb = PartialProfile.from_json(st_b.read_text())
    assert pb.group_pairs is not None and ("grp", "y") in pb.group_pairs

    # a disagreeing flag refuses by name, not a merge-time traceback
    bad = run(str(src_b), "--save-state", str(tmp_path / "c.json"),
              "--align-state", str(st_a), "--group-pairs", "grp:lin",
              expect=1)
    assert "--group-pairs disagrees" in bad.stderr

    # merged state -> ranking JSON with ZERO Spark (no session started)
    merged = tmp_path / "merged.json"
    merged.write_text(
        merge_partials([pa, pb]).to_json(), encoding="utf-8")
    out = tmp_path / "rank.json"
    proc = run(str(merged), str(out), "--relevance-from-state", "y")
    assert "SparkSession" not in proc.stderr  # never started a JVM
    payload = json.loads(out.read_text())
    assert payload["target"] == "y"
    expected = target_relevance_of(merge_partials([pa, pb]), "y")
    assert payload["relevance"] == expected
    by = {r["feature"]: r for r in payload["relevance"]}
    assert by["lin"]["method"] == "pearson_abs"
    assert by["grp"]["method"] == "eta_squared"

    # a target the state has no kernels for refuses by name
    bad2 = run(str(merged), "--relevance-from-state", "ghost", expect=1)
    assert "refused" in bad2.stderr and "ghost" in bad2.stderr


def test_relevance_stream_batch_equivalence(spark, tmp_path):
    """Streaming target relevance: per closed window the ONE-aggregation
    ranking equals the batch target_relevance on that window's slice when
    the declared domains cover the values; undeclared values pool into the
    residual group (documented lower bound — exercised); a categorical
    target refuses toward relevance_foreach_batch, which writes the full
    batch ranking per micro-batch."""
    import datetime as dt

    from pyspark.sql import functions as F, types as T

    from pandas_profiling_personal_spark.operators.correlations import (
        target_relevance,
    )
    from pandas_profiling_personal_spark.streaming.relevance_stream import (
        relevance_foreach_batch,
        relevance_stream,
    )

    rows = []
    for i in range(240):
        minute = i % 10
        grp = "abc"[i % 3]
        # window 0: grp determines y strongly; window 1: y is noise-like
        if minute < 5:
            y = {"a": 10.0, "b": 50.0, "c": 90.0}[grp] + 0.01 * i
        else:
            y = float((i * 7) % 23)
        rows.append((
            dt.datetime(2024, 1, 1, 0, minute, i // 10 % 60),
            y, 2.0 * y + 1.0, grp,
        ))
    schema = T.StructType([
        T.StructField("ts", T.TimestampType()),
        T.StructField("y", T.DoubleType()),
        T.StructField("lin", T.DoubleType()),
        T.StructField("grp", T.StringType()),
    ])
    src = tmp_path / "rel_stream_src"
    spark.createDataFrame(rows, schema).write.parquet(str(src))

    args = dict(
        numeric_cols=["lin"],
        categorical_domains={"grp": ["a", "b", "c"]},
    )
    batch = relevance_stream(
        spark.read.parquet(str(src)), "y", "ts", **args)
    brows = {(str(r["window_start"]), r["feature"]): r["score"]
             for r in batch.collect()}
    assert len(brows) == 2 * 2  # 2 windows x 2 features

    stream_df = spark.readStream.schema(schema).parquet(str(src))
    q = (relevance_stream(stream_df, "y", "ts", **args)
         .writeStream.outputMode("complete").format("memory")
         .queryName("t_rel").start())
    try:
        q.processAllAvailable()
        srows = {(str(r["window_start"]), r["feature"]): r["score"]
                 for r in spark.table("t_rel").collect()}
    finally:
        q.stop()
    assert srows == brows

    # per-window scores == batch target_relevance on that window's slice
    for wmin, pred in ((0, F.minute("ts") < 5), (5, F.minute("ts") >= 5)):
        sliced = spark.read.parquet(str(src)).filter(pred)
        expect = {r["feature"]: r["score"] for r in target_relevance(
            sliced, "y", numeric_cols=["lin"], categorical_cols=["grp"])}
        got = {k[1]: v for k, v in brows.items()
               if f"00:0{wmin}:00" in k[0]}
        assert got == expect, wmin
    # the determining window reads ~1, the noise window low
    strong = [v for k, v in brows.items()
              if k[1] == "grp" and "00:00:00" in k[0]][0]
    weak = [v for k, v in brows.items()
            if k[1] == "grp" and "00:05:00" in k[0]][0]
    assert strong > 0.99 and weak < 0.2

    # undeclared values pool into the residual group: declaring only
    # {a} pools b+c, lowering (never raising) the determining window's η²
    pooled = relevance_stream(
        spark.read.parquet(str(src)).filter(F.minute("ts") < 5),
        "y", "ts", categorical_domains={"grp": ["a"]})
    pv = [r["score"] for r in pooled.collect() if r["feature"] == "grp"][0]
    assert pv <= strong and pv > 0  # still associated, lower-bounded

    # refusals
    import pytest as _pt
    with _pt.raises(ValueError, match="no features"):
        relevance_stream(spark.read.parquet(str(src)), "y", "ts")
    with _pt.raises(ValueError, match="empty domain"):
        relevance_stream(spark.read.parquet(str(src)), "y", "ts",
                         categorical_domains={"grp": []})

    # foreachBatch tier: full batch ranking per micro-batch, batch=<id>
    out = tmp_path / "rel_fb"
    ckpt = tmp_path / "rel_ck"
    proc = relevance_foreach_batch(
        "y", str(out), numeric_cols=["lin"], categorical_cols=["grp"])
    q2 = (spark.readStream.schema(schema).parquet(str(src))
          .writeStream.foreachBatch(proc)
          .option("checkpointLocation", str(ckpt)).start())
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    fb = spark.read.parquet(str(out / "batch=0"))
    fbrows = {r["feature"]: r for r in fb.collect()}
    whole = {r["feature"]: r for r in target_relevance(
        spark.read.parquet(str(src)), "y",
        numeric_cols=["lin"], categorical_cols=["grp"])}
    assert fbrows["lin"]["score"] == whole["lin"]["score"]
    assert fbrows["grp"]["score"] == whole["grp"]["score"]


def test_state_mode_fd_discovery_screen(spark):
    """VERDICT r12 #3: fd_pairs= adds pair-tuple HLL sketches that RIDE
    the single wide aggregate; discover_fds_of ranks FD candidates from
    persisted/merged states with zero data rescans, its survivor set
    covers the batch screen's on the same data, survivors verify through
    ONE discover_fds melt, and the merge discipline refuses mismatched
    shard configs by name."""
    from pandas_profiling_personal_spark.operators.checks import (
        discover_fds,
    )
    from pandas_profiling_personal_spark.plans.incremental import (
        PartialProfile,
        discover_fds_of,
        merge_partials,
        partial_profile,
    )

    rows = [
        (f"c{i % 6}", f"n{(i % 6) % 3}", float(i % 9),
         None if i % 5 == 0 else f"g{i % 4}", i)
        for i in range(120)
    ]
    df = spark.createDataFrame(
        rows, "city string, country string, price double,"
              " nul string, id int")
    pairs = [("city", "country"), ("city", "price"),
             ("country", "price"), ("nul", "country")]

    # the sketches ride the SAME aggregate: job count with fd_pairs ==
    # job count without (zero extra jobs)
    tracker = spark.sparkContext.statusTracker()

    def jobs() -> int:
        return len(tracker.getJobIdsForGroup(None) or [])

    j0 = jobs()
    partial_profile(df, correlations=False)
    base_jobs = jobs() - j0
    j1 = jobs()
    part_all = partial_profile(df, correlations=False, fd_pairs=pairs)
    assert jobs() - j1 == base_jobs

    # 3-shard split -> merge -> JSON round trip keeps the sketches
    shards = [df.where(f"id % 3 = {k}") for k in range(3)]
    parts = [partial_profile(s, fd_pairs=pairs) for s in shards]
    merged = PartialProfile.from_json(merge_partials(parts).to_json())
    cand = discover_fds_of(merged, spark)
    got = {(c["determinant"], c["dependent"]): c for c in cand}
    # never refutes: every row is holds=None / exact=False
    assert all(c["holds"] is None and c["exact"] is False for c in cand)
    # the true FDs survive the screen with ratio ~1
    for k in (("city", "country"), ("price", "country")):
        assert got[k]["survives_screen"], k
        assert got[k]["screen_ratio"] <= 1.15
    # a violating direction reads a big ratio and is screened out
    assert not got[("price", "city")]["survives_screen"]
    # the single-shard state screens identically to the merged one
    got1 = {(c["determinant"], c["dependent"]): c["survives_screen"]
            for c in discover_fds_of(part_all, spark)}
    assert got1 == {k: c["survives_screen"] for k, c in got.items()}

    # survivor set covers the batch tier-2 screen's on the same data:
    # every pair the batch screen lets through to the melt (and that the
    # state declared) is a state survivor too
    batch = {(r["determinant"], r["dependent"]): r
             for r in discover_fds(
                 df, columns=["city", "country", "price", "nul"]).collect()}
    declared = {tuple(sorted(p)) for p in pairs}
    for (det, dep), r in batch.items():
        if r["exact"] and tuple(sorted((det, dep))) in declared:
            assert got[(det, dep)]["survives_screen"], (det, dep)

    # survivors verify through one melt and agree with the batch verdict
    survivors = [(c["determinant"], c["dependent"]) for c in cand
                 if c["survives_screen"]]
    ver = {(r["determinant"], r["dependent"]): r["holds"]
           for r in discover_fds(df, candidates=survivors).collect()}
    for k, holds in ver.items():
        if k in batch and batch[k]["exact"]:
            assert holds == batch[k]["holds"], k

    # refusals: no sketches; mismatched shard configs
    bare = partial_profile(df.select("city", "country"))
    with pytest.raises(ValueError, match="fd_pairs"):
        discover_fds_of(bare, spark)
    bare_full = partial_profile(shards[1])
    with pytest.raises(ValueError, match="some shards carry fd-pair"):
        merge_partials([parts[0], bare_full])
    other = partial_profile(shards[1], fd_pairs=[("city", "price")])
    with pytest.raises(ValueError, match="fd-pair sets differ"):
        merge_partials([parts[0], other])
    with pytest.raises(ValueError, match="not in the frame"):
        partial_profile(df, fd_pairs=[("city", "ghost")])
    with pytest.raises(ValueError, match="self-pair"):
        partial_profile(df, fd_pairs=[("city", "city")])


def test_cli_fd_pairs_state_screen_loop(tmp_path):
    """CLI loop for the state-mode FD screen: --fd-pairs carries the
    pair sketches through --save-state, --align-state reuses the stored
    pairs (a disagreeing flag refuses by name), and --suggest-checks
    --checks-from-state --discover-fds ranks candidates from the merged
    state — zero raw-table rescans, no contracts declared unverified."""
    import subprocess
    import sys

    import pandas as pd

    src_a = tmp_path / "day1.parquet"
    src_b = tmp_path / "day2.parquet"
    n = 90
    pd.DataFrame({
        "city": [f"c{i % 6}" for i in range(n)],
        "country": [f"n{(i % 6) % 3}" for i in range(n)],
        "price": [float(i % 9) for i in range(n)],
    }).to_parquet(src_a)
    pd.DataFrame({
        "city": [f"c{(i + 2) % 6}" for i in range(n)],
        "country": [f"n{((i + 2) % 6) % 3}" for i in range(n)],
        "price": [float((i + 1) % 9) for i in range(n)],
    }).to_parquet(src_b)

    def run(*argv, expect=0):
        proc = subprocess.run(
            [sys.executable, "-m", "pandas_profiling_personal_spark.cli",
             *argv, "--master", "local[2]"],
            capture_output=True, text=True, timeout=300, cwd="/root/repo",
        )
        assert proc.returncode == expect, (
            proc.returncode, proc.stderr[-2000:])
        return proc

    st_a = tmp_path / "a.json"
    st_b = tmp_path / "b.json"
    run(str(src_a), "--save-state", str(st_a),
        "--fd-pairs", "city:country,city:price")
    from pandas_profiling_personal_spark.plans.incremental import (
        PartialProfile,
        merge_partials,
    )

    pa = PartialProfile.from_json(st_a.read_text())
    assert pa.pair_hlls is not None and ("city", "country") in pa.pair_hlls

    # align: stored fd pairs carry forward without re-declaring
    run(str(src_b), "--save-state", str(st_b), "--align-state", str(st_a))
    pb = PartialProfile.from_json(st_b.read_text())
    assert set(pb.pair_hlls) == set(pa.pair_hlls)
    bad = run(str(src_b), "--save-state", str(tmp_path / "c.json"),
              "--align-state", str(st_a), "--fd-pairs", "city:price",
              expect=1)
    assert "--fd-pairs disagrees" in bad.stderr

    merged = tmp_path / "merged.json"
    merged.write_text(merge_partials([pa, pb]).to_json(), encoding="utf-8")
    suite = tmp_path / "suite.json"
    out = run(str(merged), "--suggest-checks", str(suite),
              "--checks-from-state", "--discover-fds", "--discover-keys")
    meta = json.loads(out.stdout.strip().splitlines()[-1])
    # the key screen rides the same state sketches: ranked, no contracts
    kc = {c["key"]: c for c in meta["key_candidates"]}
    # no column set is anywhere near a key on this frame (18 distinct
    # (city, price) tuples over 180 rows) — the screen says so honestly
    # from the sketches alone, never inventing a survivor
    assert not any(c["survives_screen"] for c in kc.values())
    assert kc["city,price"]["arity"] == 2
    assert kc["city,price"]["screen_ratio"] <= 0.2
    assert all(c["is_key"] is None for c in kc.values())
    assert meta["discovered_keys"] == 0
    cands = meta["fd_candidates"]
    surv = {(c["determinant"], c["dependent"])
            for c in cands if c["survives_screen"]}
    assert ("city", "country") in surv
    # screen-only: nothing declared as a functional_dependency contract
    assert meta["discovered_fds"] == 0
    spec = json.loads(suite.read_text())
    assert not [c for c in spec["checks"]
                if c["kind"] == "functional_dependency"]


def test_state_mode_key_discovery_screen(spark):
    """discover_keys_of: key-candidate screening from persisted states —
    the SAME per-column + fd-pair sketches serve both miners; unary
    candidates come from every profiled column (NULL-adjusted), pair
    candidates from the declared fd_pairs; survivors verify through one
    discover_keys melt; never decides (is_key=None everywhere)."""
    from pandas_profiling_personal_spark.operators.checks import (
        discover_keys,
    )
    from pandas_profiling_personal_spark.plans.incremental import (
        PartialProfile,
        discover_keys_of,
        merge_partials,
        partial_profile,
    )

    rows = [(i, i % 7, f"u{i}", i // 2) for i in range(100)]
    df = spark.createDataFrame(rows, "id int, m int, uid string, half int")
    pairs = [("half", "m"), ("m", "uid")]
    shards = [df.where(f"id % 3 = {k}") for k in range(3)]
    parts = [partial_profile(s, fd_pairs=pairs) for s in shards]
    merged = PartialProfile.from_json(merge_partials(parts).to_json())

    cand = discover_keys_of(merged, spark)
    got = {c["key"]: c for c in cand}
    assert all(c["is_key"] is None and c["exact"] is False for c in cand)
    # unary keys and the composite key survive with ratio ~1
    for k in ("id", "uid", "half,m"):
        assert got[k]["survives_screen"], k
        assert got[k]["screen_ratio"] >= 0.85
    # low-cardinality columns read tiny ratios and are screened out
    assert not got["m"]["survives_screen"]
    assert got["m"]["screen_ratio"] < 0.2
    # ranked best-first: every survivor precedes every non-survivor
    flags = [c["survives_screen"] for c in cand]
    assert flags == sorted(flags, reverse=True)

    # survivors verify through the one melt and the true keys hold
    surv = [tuple(c["key"].split(",")) for c in cand
            if c["survives_screen"]]
    ver = {r["key"]: r for r in discover_keys(
        df, candidates=surv).collect()}
    assert ver["id"]["is_key"] and ver["uid"]["is_key"]
    assert ver["half,m"]["is_key"]

    # a state with no pair sketches still screens unary candidates
    bare = partial_profile(df)
    unary_only = discover_keys_of(bare, spark)
    assert {c["key"] for c in unary_only} == set(df.columns)


def test_state_mode_inclusion_screen(spark):
    """discover_inclusions_of: cross-state FK screening — the inclusion
    necessary conditions (cardinality + range) from two persisted
    states' sketches and extents with zero rescans; survivors verify
    through one discover_inclusions anti-join; never decides
    (contained=None everywhere)."""
    from pandas_profiling_personal_spark.operators.checks import (
        discover_inclusions,
    )
    from pandas_profiling_personal_spark.plans.incremental import (
        PartialProfile,
        discover_inclusions_of,
        partial_profile,
    )

    child = spark.createDataFrame(
        [(i % 20, float(i % 20), f"u{i}") for i in range(100)],
        "fk int, fkd double, uid string")
    parent = spark.createDataFrame(
        [(k, f"p{k}") for k in range(25)], "pk bigint, name string")
    pc = PartialProfile.from_json(partial_profile(child).to_json())
    pp = PartialProfile.from_json(partial_profile(parent).to_json())

    cand = discover_inclusions_of(pc, pp, spark)
    got = {(c["child_column"], c["parent_column"]): c for c in cand}
    assert all(c["contained"] is None and c["exact"] is False
               for c in cand)
    # the genuine references pass both necessary conditions
    for k in (("fk", "pk"), ("fkd", "pk")):
        assert got[k]["survives_screen"], k
    # 100 distinct uids cannot live inside 25 names: screened out
    assert not got[("uid", "name")]["survives_screen"]
    assert got[("uid", "name")]["screen_ratio"] > 1.2
    # family rule: no string/int cross-family candidates
    assert ("uid", "pk") not in got and ("fk", "name") not in got

    # survivors verify through the one anti-join and genuinely hold
    surv = [(c["child_column"], c["parent_column"]) for c in cand
            if c["survives_screen"]]
    ver = {(r["child_column"], r["parent_column"]): r
           for r in discover_inclusions(
               child, parent, candidates=surv).collect()}
    assert ver[("fk", "pk")]["contained"]

    # a range-excluded pair is screened even when cardinality passes:
    # child values outside the parent's extent cannot be contained
    c2 = spark.createDataFrame([(i + 1000,) for i in range(10)], "x int")
    p2 = spark.createDataFrame([(k,) for k in range(25)], "y int")
    s2 = discover_inclusions_of(
        PartialProfile.from_json(partial_profile(c2).to_json()),
        PartialProfile.from_json(partial_profile(p2).to_json()),
        spark)[0]
    assert not s2["survives_screen"]

    # no compatible families refuses by name
    only_str = partial_profile(child.select("uid"))
    only_num = partial_profile(parent.select("pk"))
    with pytest.raises(ValueError, match="no type-compatible"):
        discover_inclusions_of(only_str, only_num, spark)
