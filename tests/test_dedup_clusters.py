"""Near-dup clustering and keep-list (the end product of the dedup pipeline)."""

from pyspark.sql import functions as F


def test_cluster_pairs_and_keep_list(spark):
    from pandas_profiling_personal_spark.operators.dedup import (
        cluster_pairs,
        dedup_keep_list,
    )

    # components: {1,2,3} (chain), {10,11}, singletons 20, 21
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    labels = {r["doc_id"]: r["cluster_id"] for r in cluster_pairs(pairs).collect()}
    assert labels == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}

    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in (1, 2, 3, 10, 11, 20, 21)], "doc_id long, text string"
    )
    keep = {
        r["doc_id"]: r["keep"] for r in dedup_keep_list(docs, pairs, "doc_id").collect()
    }
    assert keep == {1: True, 2: False, 3: False, 10: True, 11: False, 20: True, 21: True}


def test_cluster_pairs_long_chain_and_nonconvergence(spark):
    import pytest as _pt

    from pandas_profiling_personal_spark.operators.dedup import cluster_pairs

    # diameter-15 chain: converges under the default cap (the old cap of 10
    # silently returned non-minimum labels here)
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(15)], "doc_a long, doc_b long"
    )
    labels = {r["doc_id"]: r["cluster_id"] for r in cluster_pairs(chain).collect()}
    assert set(labels.values()) == {0}
    # an insufficient cap must fail loudly, not return wrong labels
    with _pt.raises(RuntimeError, match="did not converge"):
        cluster_pairs(chain, max_iterations=3)


def test_end_to_end_minhash_to_keep_list(spark):
    from pandas_profiling_personal_spark.operators.dedup import (
        dedup_keep_list,
        minhash_dedup,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    rows = [
        (1, base),
        (2, base.replace("kappa", "sigma")),
        (3, base),
        (4, "unrelated words about completely different topics entirely here now"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash_dedup(df, "doc_id", "text", num_hashes=16, bands=8, min_jaccard=0.5)
    kept = dedup_keep_list(df, pairs, "doc_id").where(F.col("keep"))
    ids = {r["doc_id"] for r in kept.collect()}
    assert 4 in ids  # unrelated doc survives
    assert 1 in ids  # representative of the near-dup cluster
    assert len(ids) == 2  # 2 and 3 dropped


def test_type_date_alert(spark):
    from pandas_profiling_personal_spark import ProfileConfig, profile

    df = spark.createDataFrame(
        [("2021-01-0%d" % (i % 8 + 1), f"w{i}") for i in range(20)],
        "d string, w string",
    )
    r = profile(df, ProfileConfig(correlations=(), duplicates=False))
    assert any(
        a["type"] == "TYPE_DATE" and a["column"] == "d" for a in r.alerts
    )
    assert not any(
        a["type"] == "TYPE_DATE" and a["column"] == "w" for a in r.alerts
    )


def test_scatter_counts(spark):
    from pandas_profiling_personal_spark.operators.interactions import (
        pair_counts,
        scatter_counts,
    )

    df = spark.createDataFrame(
        [(float(i % 4), float(i % 3)) for i in range(60)], "x double, y double"
    )
    grid = scatter_counts(df, "x", "y", (0.0, 3.0), (0.0, 2.0), bins=3).collect()
    assert sum(r["cnt"] for r in grid) == 60
    pc = pair_counts(df, "x", "y").collect()
    assert sum(r["cnt"] for r in pc) == 60
    assert len(pc) == 12


def test_sessionize(spark):
    import datetime as dt

    from pandas_profiling_personal_spark.operators.sessions import (
        session_stats,
        sessionize,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, t0),
        (1, t0 + dt.timedelta(minutes=10)),   # same session
        (1, t0 + dt.timedelta(minutes=70)),   # new session (gap 60 > 30)
        (2, t0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    s = {(r["user_id"], r["ts"]): r["session_id"] for r in sessionize(df, "user_id", "ts", 30).collect()}
    assert s[(1, t0)] == s[(1, t0 + dt.timedelta(minutes=10))]
    assert s[(1, t0 + dt.timedelta(minutes=70))] == s[(1, t0)] + 1
    st = {r["user_key"]: (r["n_sessions"], r["n_events"]) for r in session_stats(df, "user_id", "ts", 30).collect()}
    assert st == {1: (2, 3), 2: (1, 1)}


def test_span_dedup_first_occurrence_wins(spark):
    """span_dedup: a span repeated across documents survives only at its
    smallest (doc_id, idx); documents reassemble in span order; spans under
    min_span_chars are exempt; span counts are exact."""
    from pandas_profiling_personal_spark.operators.dedup import span_dedup

    boiler = "the quick brown fox jumps over the lazy dog again"  # 10 words
    uniq_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    uniq_b = "one two three four five six seven eight nine ten"
    rows = [
        (1, f"{boiler} {uniq_a}"),
        (2, f"{uniq_b} {boiler}"),        # boiler repeated -> dropped here
        (3, boiler),                        # dropped entirely -> empty text
        (4, "short tail"),                 # sub-span-size chunk
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in span_dedup(df, span_words=10).collect()}
    assert out[1]["text_deduped"] == f"{boiler} {uniq_a}"
    assert out[2]["text_deduped"] == uniq_b
    assert out[3]["text_deduped"] == ""
    assert out[4]["text_deduped"] == "short tail"
    assert (out[2]["n_spans"], out[2]["n_spans_kept"]) == (2, 1)
    assert (out[3]["n_spans"], out[3]["n_spans_kept"]) == (1, 0)

    # exemption: "short tail" duplicated across docs but under min_span_chars
    df2 = spark.createDataFrame(
        [(1, "short tail"), (2, "short tail")], "doc_id bigint, text string"
    )
    out2 = {
        r["doc_id"]: r
        for r in span_dedup(df2, span_words=10, min_span_chars=20).collect()
    }
    assert out2[1]["n_spans_kept"] == 1 and out2[2]["n_spans_kept"] == 1
    # without the exemption the second copy is removed
    out3 = {r["doc_id"]: r for r in span_dedup(df2, span_words=10).collect()}
    assert out3[1]["n_spans_kept"] == 1 and out3[2]["n_spans_kept"] == 0


def test_span_dedup_null_text(spark):
    """Null-text docs report n_spans == 0 (NOT the floored 1), so they are
    distinguishable from docs whose only span was removed as a duplicate."""
    from pandas_profiling_personal_spark.operators.dedup import span_dedup

    boiler = "the quick brown fox jumps over the lazy dog again"
    df = spark.createDataFrame(
        [(1, boiler), (2, boiler), (3, None)], "doc_id bigint, text string"
    )
    out = {r["doc_id"]: r for r in span_dedup(df, span_words=10).collect()}
    assert (out[2]["n_spans"], out[2]["n_spans_kept"]) == (1, 0)  # dup removed
    assert (out[3]["n_spans"], out[3]["n_spans_kept"]) == (0, 0)  # null text
    assert out[3]["text_deduped"] == ""


def test_contamination_hash_tier_empty_docs(spark):
    """Empty/punctuation-only docs must NOT cross-match in hash shingle mode:
    the empty token array yields NULL (no shingle), not the aggregate's
    initial accumulator 0 shared by every empty doc."""
    from pandas_profiling_personal_spark.operators.dedup import (
        contamination_keep_list,
        hashed_word_shingles,
    )
    from pyspark.sql import functions as F

    corpus = spark.createDataFrame(
        [(1, ""), (2, "..!!.."), (3, "a real document with several words here")],
        "doc_id bigint, text string",
    )
    benchmark = spark.createDataFrame(
        [(1, ""), (2, "totally unrelated benchmark prose")],
        "doc_id bigint, text string",
    )
    for repr_ in ("string", "hash"):
        out = {
            r["doc_id"]: r["keep"]
            for r in contamination_keep_list(
                corpus, benchmark, shingle_k=8, shingle_repr=repr_
            ).collect()
        }
        assert out == {1: True, 2: True, 3: True}, (repr_, out)

    # unit level: empty token array -> NULL shingle array
    row = (
        spark.range(1)
        .select(hashed_word_shingles(F.lit("  "), 8).alias("sh"))
        .first()
    )
    assert row["sh"] is None


def test_span_dedup_invariants_random(spark):
    """Property: with every span eligible, (1) summed kept spans == count of
    DISTINCT spans in the corpus (each survives exactly once), (2) total
    spans are conserved, (3) re-running span_dedup on the deduplicated
    corpus is a fixed point (no span repeats remain)."""
    import random

    from pyspark.sql import functions as F

    from pandas_profiling_personal_spark.operators.dedup import span_dedup

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for d in range(60):
        n = rng.randint(0, 45)
        rows.append((d, " ".join(rng.choice(vocab) for _ in range(n))))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = span_dedup(df, span_words=5)
    agg = out.agg(
        F.sum("n_spans").alias("tot"), F.sum("n_spans_kept").alias("kept")
    ).first()

    # independent distinct-span count (empty text still yields one '' span,
    # matching F.split semantics)
    spans = df.select(
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.greatest(
                        F.ceil(F.size(F.split("text", " ")) / 5.0).cast("int"),
                        F.lit(1),
                    ) - 1,
                ),
                lambda i: F.concat_ws(
                    " ", F.slice(F.split("text", " "), (i * 5 + 1).cast("int"), 5)
                ),
            )
        ).alias("s")
    )
    n_total, n_distinct = spans.agg(
        F.count("s"), F.count_distinct("s")
    ).first()
    assert agg["tot"] == n_total
    assert agg["kept"] == n_distinct

    # fixed point: dedup of the deduped corpus keeps everything
    again = span_dedup(
        out.selectExpr("doc_id", "text_deduped AS text"), span_words=5
    )
    a = again.agg(
        F.sum("n_spans").alias("t"), F.sum("n_spans_kept").alias("k")
    ).first()
    # spans can re-chunk differently after removal, so compare kept==total
    # (no repeated span survives), not counts vs the first pass
    assert a["k"] == a["t"] or (
        # re-chunking may create a new duplicate pair in pathological
        # small-vocab cases; allow <=2% slack and require near-total
        a["k"] >= a["t"] * 0.98
    )


def test_contamination_hash_tier_matches_string_tier(spark):
    """The xxhash64 shingle fast tier must produce the same keep-list as the
    exact string tier on real data (collisions are ppb-level; none expected
    at test scale)."""
    from pyspark.sql import functions as F

    from pandas_profiling_personal_spark.operators.dedup import (
        contamination_keep_list,
    )
    from pandas_profiling_personal_spark.sources.readers import read_parquet

    docs = read_parquet(spark, "/root/testdata/sf0.001/documents.parquet")
    bench = docs.where(F.col("doc_id") % 11 == 0)

    def snap(repr_):
        return {
            (r["doc_id"], r["n_matched"], r["keep"])
            for r in contamination_keep_list(
                docs, bench, shingle_repr=repr_
            ).collect()
        }

    s, h = snap("string"), snap("hash")
    assert s == h and any(not keep for _, _, keep in s)


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_incremental_exact_dedup_two_step_equals_batch(spark):
    """incremental_exact_dedup: shard A then shard B against A's store
    must keep exactly the docs batch exact-dedup keeps over A ∪ B
    (min-id per fingerprint), with dup_of pointing at the true winner."""
    from pandas_profiling_personal_spark.operators.dedup import (
        dedup_store_update,
        incremental_exact_dedup,
    )

    t1, t2, t3 = "alpha beta gamma", "delta epsilon zeta", "eta theta iota"
    # doc 4 / doc 14: null text — the \x00null sentinel makes them ONE
    # dup group ACROSS shards (review r6: a SQL-null fingerprint would
    # silently exempt them from the store join)
    shard_a = _mk_docs(spark, [(1, t1), (2, t1), (3, t2), (4, None)])
    shard_b = _mk_docs(
        spark,
        [(10, t1), (11, t3), (12, t3), (13, "  ALPHA   beta GAMMA "),
         (14, None)],
    )  # 10 and 13 dup history's 1 (13 via normalization); 12 dups 11

    fa = incremental_exact_dedup(shard_a, None)
    store = dedup_store_update(None, fa)
    fb = incremental_exact_dedup(shard_b, store)
    by_a = {r["doc_id"]: r for r in fa.collect()}
    by_b = {r["doc_id"]: r for r in fb.collect()}
    assert by_a[1]["keep"] and by_a[3]["keep"] and not by_a[2]["keep"]
    assert by_a[2]["dup_of"] == 1 and by_a[1]["dup_of"] is None
    assert not by_b[10]["keep"] and by_b[10]["dup_of"] == 1   # historical win
    assert not by_b[13]["keep"] and by_b[13]["dup_of"] == 1   # normalized
    assert by_b[11]["keep"] and not by_b[12]["keep"]
    assert by_b[12]["dup_of"] == 11                            # in-shard win
    assert by_a[4]["keep"]                                     # first null doc
    assert not by_b[14]["keep"] and by_b[14]["dup_of"] == 4    # cross-shard

    # batch reference: one-step over the union == the two-step keep set
    union = shard_a.unionByName(shard_b)
    batch = {r["doc_id"]: r for r in
             incremental_exact_dedup(union, None).collect()}
    two_step = {**by_a, **by_b}
    assert {d for d, r in two_step.items() if r["keep"]} == \
           {d for d, r in batch.items() if r["keep"]}

    # the next-round store carries history + new winners only
    store2 = dedup_store_update(store, fb)
    assert {r["doc_id"] for r in store2.collect()} == {1, 3, 4, 11}


def test_incremental_minhash_dedup_two_step_equals_batch(spark):
    """incremental_minhash_dedup: signature-store two-step == batch over
    the union; history participates through its 16-int signatures only
    (dropped docs included — the greedy sweep needs them)."""
    from pandas_profiling_personal_spark.operators.dedup import (
        incremental_minhash_dedup,
    )

    base = ("the quick brown fox jumps over the lazy dog and then runs "
            "far away into the deep green forest tonight")
    nearA = base + " again"                    # near-dup of base
    other = ("completely different words about astronomy telescopes and "
            "planetary orbits circling distant binary stars quietly")
    shard_a = _mk_docs(spark, [(1, base), (2, nearA), (3, other)])
    # 10 near-dups base (cross-shard vs a KEPT doc), 11 near-dups nearA's
    # exact text (cross-shard vs a DROPPED doc), 12 unrelated
    shard_b = _mk_docs(
        spark,
        [(10, base + " today"), (11, nearA),
         (12, "unrelated content on medieval castle architecture and "
              "fortified stone walls built visibly high")],
    )

    kw = dict(num_hashes=16, bands=4, min_est_jaccard=0.7)
    fa = incremental_minhash_dedup(shard_a, None, **kw)
    sig_cols = [f"m{i}" for i in range(16)]
    store = fa.select("doc_id", *sig_cols)          # ALL docs, kept or not
    fb = incremental_minhash_dedup(shard_b, store, **kw)
    by = {r["doc_id"]: r for r in fa.collect()}
    by.update({r["doc_id"]: r for r in fb.collect()})
    assert by[1]["keep"] and by[3]["keep"] and not by[2]["keep"]
    assert not by[10]["keep"] and by[10]["dup_of"] == 1
    assert not by[11]["keep"] and by[11]["dup_of"] in (1, 2)  # via dropped 2
    assert by[12]["keep"]

    union = shard_a.unionByName(shard_b)
    batch = {r["doc_id"]: r for r in
             incremental_minhash_dedup(union, None, **kw).collect()}
    assert {d for d, r in by.items() if r["keep"]} == \
           {d for d, r in batch.items() if r["keep"]}
    for d, r in by.items():
        assert r["dup_of"] == batch[d]["dup_of"], (d, r, batch[d])


def test_incremental_minhash_bucket_cap_divergence_direction(spark):
    """Pin the ONE documented two-step/batch divergence of
    incremental_minhash_dedup: when a bucket crosses ``max_bucket_size``
    only after later shards join, an EARLY run generated its pairs while
    the bucket was small, while the batch run anti-joins the whole (now
    hot) bucket away. Every run's bucket population is a subset of the
    batch run's, so candidate pairs flow one way only:

        two-step drops  ⊇  batch drops     (two-step keeps ⊆ batch keeps)

    — the cap can only ever make the BATCH side keep more; a refactor that
    flips this direction (two-step inventing keeps the batch would drop)
    breaks the cost-guard contract in the docstring."""
    from pandas_profiling_personal_spark.operators.dedup import (
        incremental_minhash_dedup,
    )

    text = (
        "identical duplicated document text repeated across both shards "
        "so every band bucket holds the whole group"
    )
    shard_a = spark.createDataFrame(
        [(1, text), (2, text)], "doc_id bigint, text string"
    )
    shard_b = spark.createDataFrame(
        [(10, text), (11, text), (12, text)], "doc_id bigint, text string"
    )
    kw = dict(num_hashes=16, bands=4, min_est_jaccard=0.7, max_bucket_size=3)

    fa = incremental_minhash_dedup(shard_a, None, **kw)
    store = fa.select("doc_id", *[f"m{i}" for i in range(16)])
    fb = incremental_minhash_dedup(shard_b, store, **kw)
    two_step = {r["doc_id"]: r["keep"] for r in fa.unionByName(fb).collect()}

    batch = {
        r["doc_id"]: r["keep"]
        for r in incremental_minhash_dedup(
            shard_a.unionByName(shard_b), None, **kw
        ).collect()
    }

    # shard A ran while the bucket held 2 docs (<= cap): pair generated,
    # doc 2 dropped; the batch bucket holds all 5 (> cap): anti-joined
    # away, every doc kept
    assert two_step == {1: True, 2: False, 10: True, 11: True, 12: True}
    assert batch == {d: True for d in (1, 2, 10, 11, 12)}

    # the pinned direction: two-step keep-set ⊆ batch keep-set
    ts_keeps = {d for d, k in two_step.items() if k}
    batch_keeps = {d for d, k in batch.items() if k}
    assert ts_keeps <= batch_keeps and ts_keeps != batch_keeps


def test_incremental_minhash_store_never_reshingled(spark):
    """Plan gate: the new shard is scanned+shingled ONCE — the signature
    aggregate's exchange is shared by its three consumers (store∪new band
    table, new band table, final keep join) via ReuseExchange — and the
    store participates through its band/bucket and doc_id keys only (it
    has no text to re-shingle; persisting it severed the lineage)."""
    from pandas_profiling_personal_spark.operators.dedup import (
        incremental_minhash_dedup,
    )
    from pandas_profiling_personal_spark.sources.readers import read_parquet

    # sf0.01, not sf0.001: on a tiny corpus AQE legitimately replans the
    # band joins as broadcasts (re-executing the small scan per consumer);
    # the shared-exchange shape this test gates appears at shuffle scale
    docs = read_parquet(spark, "/root/testdata/sf0.01/documents.parquet")
    store = incremental_minhash_dedup(
        docs.where("doc_id % 2 = 0"), None
    ).select("doc_id", *[f"m{i}" for i in range(16)])
    # persisted store == no lineage back to text (what the daily job does)
    store = spark.createDataFrame(store.collect(), store.schema)
    out = incremental_minhash_dedup(docs.where("doc_id % 2 = 1"), store)
    rows = out.collect()  # executes out's OWN queryExecution (final plan)
    assert len(rows) == docs.where("doc_id % 2 = 1").count()
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    final = plan.split("Initial Plan")[0]
    # exactly one corpus scan in the executed plan; the other signature
    # consumers read the reused exchange
    assert final.count("Scan parquet") == 1, final
    assert final.count("ReusedExchange") >= 2, final
