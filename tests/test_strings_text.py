"""String-content (A14/A17/A18) and text/dedup/similarity operator tests on
synthetic fixtures (testdata has no URL/path columns)."""

import pytest
from pyspark.sql import functions as F, types as T


def _sdf(spark, values, name="s"):
    schema = T.StructType([T.StructField(name, T.StringType())])
    return spark.createDataFrame([(v,) for v in values], schema)


def test_char_counts_and_unicode_summary(spark):
    from pandas_profiling_personal_spark.operators.strings import unicode_summary

    df = _sdf(spark, ["aab", "b!", None, "Я"])
    s = unicode_summary(df, "s")
    assert s["n_characters"] == 6
    assert s["n_distinct_characters"] == 4
    assert s["top_chars"][0] == ("a", 2)
    assert s["categories"]["Ll"] == 4  # a,a,b,b
    assert s["categories"]["Lu"] == 1  # Я
    assert s["categories"]["Po"] == 1  # !
    assert "CYRILLIC" in s["blocks"]


def test_url_parts(spark):
    from pandas_profiling_personal_spark.operators.strings import url_parts

    df = _sdf(
        spark,
        [
            "https://example.com/a/b?q=1#frag",
            "http://example.com/a",
            "https://other.org/",
        ],
    )
    rows = {
        (r["part"], r["value"]): r["count"] for r in url_parts(df, "s").collect()
    }
    assert rows[("host", "example.com")] == 2
    assert rows[("protocol", "https")] == 2
    assert rows[("query", "q=1")] == 1
    assert rows[("ref", "frag")] == 1


def test_path_parts_and_common_prefix(spark):
    from pandas_profiling_personal_spark.operators.strings import (
        common_prefix,
        path_parts,
    )

    df = _sdf(spark, ["/usr/lib/spark.jar", "/usr/bin/python3.11", "/usr/lib/a.b.c"])
    rows = {
        (r["part"], r["value"]): r["count"] for r in path_parts(df, "s").collect()
    }
    assert rows[("parent", "/usr/lib")] == 2
    assert rows[("name", "spark.jar")] == 1
    assert rows[("suffix", ".jar")] == 1
    assert rows[("suffix", ".c")] == 1
    assert rows[("stem", "a.b")] == 1
    assert rows[("anchor", "/")] == 3
    assert common_prefix(df, "s") == "/usr/"


def test_language_id_and_quality(spark):
    from pandas_profiling_personal_spark.operators.text import text_profile

    rows = [
        (1, "the cat and the dog are in the house and it is for you"),
        (2, "le chien et le chat sont dans la maison pour que tu es"),
        (3, "der hund und die katze sind nicht mit der maus zu haus"),
        (4, "xyzzy qwerty asdf"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in text_profile(df, "text", "doc_id").collect()}
    assert out[1]["language"] == "en"
    assert out[2]["language"] == "fr"
    assert out[3]["language"] == "de"
    assert out[4]["language"] == "und"
    assert out[1]["quality_score"] > out[4]["quality_score"]


def test_minhash_finds_planted_near_dup(spark):
    from pandas_profiling_personal_spark.operators.dedup import (
        exact_duplicates,
        minhash_dedup,
    )

    base = "the quick brown fox jumps over the lazy dog again and again every day"
    near = base.replace("lazy", "sleepy")
    other = "completely different content about spark dataframes and aggregation plans"
    rows = [(1, base), (2, near), (3, other), (4, base)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    exact = exact_duplicates(df, "doc_id", "text").collect()
    assert len(exact) == 1 and exact[0]["doc_ids"] == [1, 4]

    # scale guard: doc_ids payload is capped, n_docs still counts the group
    many = spark.createDataFrame(
        [(i, base) for i in range(7)] + [(99, other)], "doc_id long, text string"
    )
    capped = exact_duplicates(many, "doc_id", "text", max_ids=3).collect()
    assert len(capped) == 1
    assert capped[0]["n_docs"] == 7 and capped[0]["doc_ids"] == [0, 1, 2]

    pairs = minhash_dedup(
        df, "doc_id", "text", num_hashes=16, bands=8, min_jaccard=0.5
    ).collect()
    found = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert (1, 4) in found  # identical
    assert (1, 2) in found or (2, 4) in found  # near-dup
    assert all(3 not in p for p in found)


def test_lm_perplexity_scoring(spark):
    """Bigram-LM quality scoring (CCNet recipe): documents that look like
    the reference corpus score LOWER perplexity than shuffled/gibberish
    text; OOV tokens route through <unk>; the model tables are bounded and
    deterministic."""
    from pandas_profiling_personal_spark.operators.text import (
        lm_perplexity_score,
        ngram_lm_train,
    )

    ref_sentences = [
        "the cat sat on the mat and the dog sat on the rug",
        "the dog ran to the cat and the cat ran to the mat",
        "a cat and a dog sat on a mat near the door",
        "the mat was on the floor and the cat was on the mat",
    ] * 5
    ref = spark.createDataFrame([(s,) for s in ref_sentences], "text string")
    uni, big = ngram_lm_train(ref, vocab_size=8)  # small: forces <unk>
    vocab = {r["w"] for r in uni.collect()}
    assert "<unk>" in vocab and len(vocab) == 9
    assert big.count() <= 9 * 9  # bounded by (vocab+unk)^2

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),          # in-domain
            (2, "zqx vbnm kjhg fdsa trewq yuiop"),  # gibberish: all <unk>
            (3, "mat the on sat cat the"),          # right words, wrong order
            (4, "single"),                          # < 2 tokens: absent
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in lm_perplexity_score(docs, uni, big).collect()
    }
    assert 4 not in got
    assert got[1]["ppl"] < got[2]["ppl"], "in-domain must beat gibberish"
    assert got[1]["ppl"] < got[3]["ppl"], "word order must matter (bigrams)"
    assert got[1]["n_bigrams"] == 5

    # deterministic across runs
    again = {
        r["doc_id"]: r["mean_logp"]
        for r in lm_perplexity_score(docs, uni, big).collect()
    }
    assert again == {d: r["mean_logp"] for d, r in got.items()}


def test_pack_sequences_assignment(spark):
    """pack_sequences: the executable concatenate-and-chunk packing — global
    offsets exact across multiple prefix-sum buckets, boundary-crossing docs
    span seq_first..seq_last, nulls pack as 0 tokens, and the number of
    sequences equals the planner's min_sequences lower bound."""
    import math

    from pandas_profiling_personal_spark.operators.text import pack_sequences

    counts = [30, 80, 25, None, 90, 10, 55, 70, 5, 40]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(counts)], "doc_id long, n_tokens long"
    )
    out = {
        r["doc_id"]: r
        for r in pack_sequences(
            df, "doc_id", "n_tokens", context_len=64, bucket_size=3
        ).collect()
    }
    # reference: plain running sum
    cum = 0
    total = 0
    for i, c in enumerate(counts):
        t = c or 0
        r = out[i]
        assert r["n_tokens"] == t and r["start_token"] == cum, (i, r)
        assert r["seq_first"] == cum // 64
        assert r["seq_last"] == ((cum + t - 1) // 64 if t else cum // 64)
        cum += t
        total += t
    # doc 1 (starts at 30, 80 tokens) crosses the first boundary
    assert out[1]["seq_first"] == 0 and out[1]["seq_last"] == 1
    n_seqs = max(r["seq_last"] for r in out.values()) + 1
    assert n_seqs == math.ceil(total / 64)  # the planner's min_sequences


def test_pack_sequences_duplicate_ids_no_overlap(spark):
    """The ROWS-framed cumsum (review r7): rows TIED on the id still get
    DISTINCT, non-overlapping token ranges — the default RANGE frame
    handed duplicates the tie-group total and overlapping slots."""
    from pandas_profiling_personal_spark.operators.text import pack_sequences

    df = spark.createDataFrame(
        [(1, 10), (2, 10), (2, 10), (3, 10)], "doc_id long, n_tokens long"
    )
    rows = pack_sequences(
        df, "doc_id", "n_tokens", context_len=64, bucket_size=10
    ).collect()
    starts = sorted(r["start_token"] for r in rows)
    assert starts == [0, 10, 20, 30]  # distinct, gap-free, non-overlapping


def test_wav_parser_truncation_and_hostile_headers():
    """_parse_wav_header (review r7): a truncated payload clamps the frame
    count to the bytes present; a hostile 32-bit sample rate and a short
    fmt chunk are rejected instead of poisoning the int32 schema."""
    from pandas_profiling_personal_spark.operators.multimodal import (
        _parse_wav_header,
    )

    from tests.test_surfaces import _wav

    full = _wav(rate=16000, channels=1, bits=16, frames=1000)
    ok = _parse_wav_header(full)
    assert ok["n_frames"] == 1000

    truncated = full[: len(full) - 1500]  # cut mid-payload (2B/frame)
    t = _parse_wav_header(truncated)
    assert t is not None and t["n_frames"] == 1000 - 750

    hostile = bytearray(full)
    hostile[24:28] = (0xFFFFFFFF).to_bytes(4, "little")  # "sample rate"
    assert _parse_wav_header(bytes(hostile)) is None

    short_fmt = bytearray(full)
    short_fmt[16:20] = (8).to_bytes(4, "little")  # fmt csize < 16
    assert _parse_wav_header(bytes(short_fmt)) is None


def test_simhash_hamming(spark):
    from pandas_profiling_personal_spark.operators.dedup import (
        hamming_distance,
        simhash_table,
    )

    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta iota"),
        (3, "one two three four five six seven eight"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sim = simhash_table(df, "doc_id", "text", bits=32)
    a = sim.alias("a")
    b = sim.alias("b")
    d = (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            "a.doc_id",
            "b.doc_id",
            hamming_distance(F.col("a.simhash"), F.col("b.simhash")).alias("h"),
        )
        .collect()
    )
    dist = {(r[0], r[1]): r["h"] for r in d}
    assert dist[(1, 2)] < dist[(1, 3)]
    assert dist[(1, 2)] < dist[(2, 3)]


def test_cosine_topk_exact(spark):
    from pandas_profiling_personal_spark.operators.similarity import cosine_topk

    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.0, 1.0]),
    ]
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    out = cosine_topk(df, df.where(F.col("vec_id") == 0), k=2).collect()
    ranked = [(r["neighbor_id"], r["rank"]) for r in out]
    assert ranked[0] == (1, 1)  # closest to [1,0,0] is [0.9,0.1,0]
    assert len(ranked) == 2


def test_ivf_topk_probes_and_recall(spark):
    """IVF with all cells probed must equal the exact scan; fewer probes is a
    subset of the corpus but keeps the exact ranking within probed cells."""
    from pandas_profiling_personal_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
    )
    from pandas_profiling_personal_spark.sources.readers import read_parquet

    emb = read_parquet(spark, "/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 3)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, q, k=5).collect()
    }
    full = ivf_topk(emb, q, k=5, n_cells=8, n_probe=8)
    assert {
        (r["query_id"], r["neighbor_id"]) for r in full.collect()
    } == exact
    approx = ivf_topk(emb, q, k=5, n_cells=8, n_probe=2).collect()
    assert approx  # probing 2/8 cells still yields neighbors
    hits = {(r["query_id"], r["neighbor_id"]) for r in approx}
    assert hits & exact  # non-zero recall vs the exact scan


def test_ivf_topk_string_ids(spark):
    """Tie-break must not negate the id column — string ids are legal and the
    unary minus on them throws under ANSI (ADVICE r1)."""
    from pandas_profiling_personal_spark.operators.similarity import ivf_topk

    rows = [
        (f"doc-{i}", [float((i * 7 + j * 3) % 11) for j in range(8)])
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<float>")
    q = df.where(F.col("vec_id").isin("doc-0", "doc-1"))
    out = ivf_topk(df, q, k=3, n_cells=4, n_probe=4).collect()
    assert out and all(1 <= r["rank"] <= 3 for r in out)
    assert {r["query_id"] for r in out} == {"doc-0", "doc-1"}


def test_ann_lsh_recall_vs_exact(spark):
    """Hyperplane-LSH ANN must recover a healthy fraction of the exact top-K
    (the sign-bit buckets are FP-dependent, so recall — not bucket values — is
    the contract)."""
    import random

    from pandas_profiling_personal_spark.operators.similarity import (
        ann_topk_lsh,
        cosine_topk,
    )

    # clustered corpus: LSH recall is only meaningful when true neighbors are
    # actually close (cos ≈ 0.99 within a cluster; sign-bit agreement ~0.97
    # per plane) — on near-random vectors every method degenerates
    rng = random.Random(5)
    dim, rows = 32, []
    centers = [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(3)
    ]
    for i in range(120):
        c = centers[i % 3]
        rows.append((i, [x + rng.gauss(0.0, 0.05) for x in c]))
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    q = emb.where(F.col("vec_id") < 3)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, q, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_topk_lsh(
            emb, q, dim=dim, k=5, n_planes=8, n_tables=6
        ).collect()
    }
    assert len(approx & exact) >= len(exact) * 3 // 4, (approx, exact)


def test_lsh_signature_matches_per_plane_bits(spark):
    """The aggregate-folded signature must equal the per-plane LSB-first
    Σ bit_i·2^i definition."""
    from pandas_profiling_personal_spark.operators.similarity import (
        dot,
        hyperplanes,
        lsh_signature,
    )

    planes = hyperplanes(6, 10, seed=7)
    rows = [([float((i * 13 + j * 5) % 9 - 4) for j in range(6)],) for i in range(16)]
    df = spark.createDataFrame(rows, "v array<double>")
    got = [r[0] for r in df.select(lsh_signature(F.col("v"), planes)).collect()]
    import builtins

    expected = []
    for (vec,) in rows:
        sig = 0
        for i, p in enumerate(planes):
            if builtins.sum(x * y for x, y in zip(vec, p)) >= 0:
                sig |= 1 << i
        expected.append(sig)
    assert got == expected


def test_read_table_csv_and_formats(spark, tmp_path):
    import pandas as pd

    from pandas_profiling_personal_spark.sources.readers import read_table

    p = tmp_path / "t.csv"
    pd.DataFrame({"a": [1, 2], "b": ["x", "y"]}).to_csv(p, index=False)
    df = read_table(spark, p)
    assert df.count() == 2 and set(df.columns) == {"a", "b"}

    pkl = tmp_path / "t.pkl"
    pd.DataFrame({"z": [1.5, 2.5]}).to_pickle(pkl)
    assert read_table(spark, pkl).count() == 2

    with pytest.raises(ValueError):
        read_table(spark, tmp_path / "t.unknown")


def test_ivf_kmeans_centroids(spark):
    """MLlib k-means centroids drop into the same probe machinery and return
    well-formed ranked neighbors (deterministic under a fixed seed)."""
    from pandas_profiling_personal_spark.operators.similarity import (
        ivf_centroids_kmeans,
        ivf_topk,
    )
    from pandas_profiling_personal_spark.sources.readers import read_parquet

    emb = read_parquet(spark, "/root/testdata/sf0.001/embeddings.parquet")
    cents = ivf_centroids_kmeans(emb, n_cells=4, seed=42)
    assert cents.count() == 4
    q = emb.where(F.col("vec_id") < 2)
    out = ivf_topk(emb, q, k=3, n_probe=2, centroids=cents).collect()
    assert out and all(1 <= r["rank"] <= 3 for r in out)
    assert {r["query_id"] for r in out} == {0, 1}


def test_mixture_plan_and_apply(spark):
    """Corpus mixture planner: the binding group samples at rate 1, every
    other rate lands in (0,1], realized sizes hit the target ratios, groups
    outside the target mix drop entirely, and apply is deterministic."""
    from pandas_profiling_personal_spark.operators.mixture import (
        apply_mixture,
        mixture_counts,
        mixture_plan,
    )

    rows = [(i, ["web", "code", "books", "junk"][i % 4], 100 + (i % 7)) for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, n_tokens bigint")
    targets = {"web": 0.6, "code": 0.3, "books": 0.1}
    plan = mixture_plan(df, "source", targets, "n_tokens").collect()
    by = {r["group"]: r for r in plan}
    assert by["junk"]["sampling_rate"] == 0.0
    # equal-sized groups -> web (largest target) is binding at rate 1
    assert abs(by["web"]["sampling_rate"] - 1.0) < 1e-12
    for g in ("code", "books"):
        assert 0.0 < by[g]["sampling_rate"] < 1.0
    # planned sizes realize the target ratio exactly
    assert abs(by["code"]["planned_size"] / by["web"]["planned_size"] - 0.5) < 1e-9
    assert abs(by["books"]["planned_size"] / by["web"]["planned_size"] - (1 / 6)) < 1e-9

    plan_df = mixture_plan(df, "source", targets, "n_tokens")
    kept1 = sorted(r["doc_id"] for r in apply_mixture(df, plan_df, "source", "doc_id").collect())
    kept2 = sorted(
        r["doc_id"]
        for r in apply_mixture(
            df.repartition(7), plan_df, "source", "doc_id"
        ).collect()
    )
    assert kept1 == kept2 and kept1  # deterministic under relayout
    counts = {r["group"]: r for r in mixture_counts(df, "source", targets, "doc_id", "n_tokens").collect()}
    assert "junk" not in counts
    # md5-uniform sampling tracks the planned size within sampling noise
    for g in ("web", "code", "books"):
        assert abs(counts[g]["kept_size"] - by[g]["planned_size"]) / by[g]["planned_size"] < 0.15


def test_mixture_upsampling_epochs(spark):
    """max_repeats > 1: rates may exceed 1 and apply_mixture materializes
    floor(rate) guaranteed copies plus an md5-deterministic fractional one,
    tagged with a 1-based epoch column."""
    from pandas_profiling_personal_spark.operators.mixture import (
        apply_mixture,
        mixture_plan,
    )

    rows = [(i, "wiki" if i < 200 else "web", 50) for i in range(2200)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, n_tokens bigint")
    targets = {"wiki": 0.3, "web": 0.7}
    plan = mixture_plan(df, "source", targets, "n_tokens", max_repeats=4.0)
    by = {r["group"]: r for r in plan.collect()}
    # wiki is 1/11 of the corpus but wants 30%: upsampled beyond 1 epoch
    assert by["wiki"]["sampling_rate"] > 1.0
    out = apply_mixture(df, plan, "source", "doc_id")
    kept = out.groupBy("source").count().collect()
    k = {r["source"]: r["count"] for r in kept}
    rate_w = by["wiki"]["sampling_rate"]
    assert k["wiki"] >= 200 * int(rate_w)  # floor copies guaranteed
    # every wiki doc appears at least floor(rate) times with distinct epochs
    eps = (
        out.where("source = 'wiki'")
        .groupBy("doc_id")
        .agg({"epoch": "max", "*": "count"})
        .collect()
    )
    assert all(r["count(1)"] >= int(rate_w) for r in eps)
    assert all(r["max(epoch)"] == r["count(1)"] for r in eps)


def test_chunk_documents_sliding_window(spark):
    """chunk_documents: sliding token windows with overlap — hand example
    pins start positions, tail-window suppression, deterministic chunk ids,
    and the null/empty-doc contract (no chunks)."""
    from pandas_profiling_personal_spark.operators.text import chunk_documents

    df = spark.createDataFrame(
        [
            (1, "t1 t2 t3 t4 t5 t6 t7 t8"),   # 8 tokens
            (2, "a b"),                        # shorter than one chunk
            (3, None),
            (4, ""),
            (5, "   "),                        # whitespace-only: no chunks
            (6, "\t\n  "),                     # tabs/newlines: no chunks
            (7, "\t x1  x2\n"),                # edge whitespace: clean tokens
        ],
        "doc_id bigint, text string",
    )
    out = chunk_documents(df, "doc_id", "text", chunk_tokens=4, overlap_tokens=1)
    rows = sorted(
        ((r["id"], r["chunk_index"], r["chunk_text"], r["n_chunk_tokens"])
         for r in out.collect())
    )
    # stride 3, starts while start <= n-overlap=7: 1, 4, 7
    assert rows == [
        (1, 0, "t1 t2 t3 t4", 4),
        (1, 1, "t4 t5 t6 t7", 4),
        (1, 2, "t7 t8", 2),
        (2, 0, "a b", 2),
        (7, 0, "x1 x2", 2),  # edge tabs/newlines stripped, no '' tokens
    ]
    # overlap: each chunk's first token is the previous chunk's last
    # chunk_id is a pure function of (id, index) — engine/partition-free
    ids = {(r["id"], r["chunk_index"]): r["chunk_id"] for r in out.collect()}
    import hashlib

    assert ids[(1, 1)] == hashlib.md5(b"1:1").hexdigest()

    # degenerate tail suppressed: 5 tokens, chunk 4, overlap 1 -> starts 1, 4
    # (a start at 7 would exist without the n-overlap cap on 8 tokens... and
    # for n=5 a start at 4 covers through token 5; no start-5+ window)
    five = spark.createDataFrame([(9, "x1 x2 x3 x4 x5")], "doc_id bigint, text string")
    out5 = chunk_documents(five, "doc_id", "text", chunk_tokens=4, overlap_tokens=1)
    assert [r["chunk_text"] for r in sorted(out5.collect(), key=lambda r: r["chunk_index"])] == [
        "x1 x2 x3 x4", "x4 x5",
    ]

    import pytest

    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, "doc_id", "text", chunk_tokens=4, overlap_tokens=4)


def test_chunk_documents_no_shuffle(spark):
    """Chunking is NARROW — sequence/explode/slice inside codegen, zero
    KEYED exchanges: the 100 TB guarantee that chunking runs at scan
    speed. The only exchange permitted is parallelize_narrow's RoundRobin
    widening, the small-file guard that is a no-op at real scale."""
    import re

    from pandas_profiling_personal_spark.operators.text import chunk_documents
    from pandas_profiling_personal_spark.sources.readers import read_parquet

    df = read_parquet(spark, "/root/testdata/sf0.001/documents.parquet")
    plan = chunk_documents(df, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    keyed = [
        ln for ln in plan.splitlines()
        if "Exchange" in ln and "RoundRobinPartitioning" not in ln
    ]
    assert not keyed, keyed
    # and when the input is already wide, the guard itself disappears
    wide = df.repartition(spark.sparkContext.defaultParallelism)
    plan2 = chunk_documents(wide, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange", plan2)) == 1  # only the test's own repartition


def test_c4_line_filter_semantics(spark):
    """C4 line cleaning: terminal punctuation + min-words + ban list, with
    per-doc kept/total counts; null docs pass through as null."""
    from pandas_profiling_personal_spark.operators.text import c4_line_filter

    doc = "\n".join(
        [
            "This line is long enough and ends properly.",  # keep
            "Too short.",                                    # < 3 words
            "No terminal punctuation on this line",          # no punct
            "Enable javascript to view this page.",          # banned word
            "A config block { with braces } inside.",        # banned '{'
            'He said "a quoted ending counts."',             # keep (quote)
        ]
    )
    df = spark.createDataFrame(
        [(1, doc), (2, None)], "doc_id bigint, text string"
    )
    out = {r["id"]: r for r in c4_line_filter(df, "doc_id", "text").collect()}
    assert out[1]["n_lines"] == 6 and out[1]["n_lines_kept"] == 2
    assert out[1]["text_clean"] == (
        "This line is long enough and ends properly.\n"
        'He said "a quoted ending counts."'
    )
    assert out[2]["text_clean"] is None and out[2]["n_lines"] is None

    # narrow plan: zero exchanges
    plan = c4_line_filter(df, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_tfidf_top_terms_semantics(spark):
    """TF-IDF ranking: rare terms outrank corpus-wide terms; smoothed IDF
    pinned by hand; min_df prunes the vocab tail; rank ties break on term."""
    import math

    from pandas_profiling_personal_spark.operators.text import tfidf_top_terms

    df = spark.createDataFrame(
        [
            (1, "common rare rare"),
            (2, "common alpha alpha"),
            (3, "common beta"),
        ],
        "doc_id bigint, text string",
    )
    out = tfidf_top_terms(df, "doc_id", "text", k=2)
    rows = {(r["id"], r["rank"]): r for r in out.collect()}
    # doc 1: 'rare' (tf=2, df=1) outranks 'common' (tf=1, df=3)
    assert rows[(1, 1)]["term"] == "rare"
    assert rows[(1, 2)]["term"] == "common"
    # smoothed idf hand-check: tf=2, N=3, df=1 -> 2*(ln(4/2)+1)
    assert rows[(1, 1)]["score"] == round(2 * (math.log(2.0) + 1.0), 4)
    # 'common' in every doc: idf = ln(4/4)+1 = 1 -> score == tf == 1
    assert rows[(1, 2)]["score"] == 1.0
    # min_df=2 prunes the singleton vocab (rare/alpha/beta all df=1)
    pruned = tfidf_top_terms(df, "doc_id", "text", k=3, min_df=2)
    assert {r["term"] for r in pruned.collect()} == {"common"}


def test_semantic_dedup_keep_rule(spark):
    """semantic_dedup: identical/near-identical embeddings inside a cell
    collapse to the lowest id; dissimilar vectors survive; output covers
    every input row exactly once."""
    from pandas_profiling_personal_spark.operators.similarity import (
        semantic_dedup,
    )

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0, 0.0]),   # near-dup of 1
        (3, [0.0, 1.0, 0.0, 0.0]),      # orthogonal — kept
        (4, [1.0, 0.001, 0.0, 0.0]),    # near-dup of 1 too
        (5, [0.0, 0.0, 1.0, 0.0]),      # orthogonal — kept
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    # one cell: the pair/keep logic tested directly (cluster blocking off)
    out = {r["id"]: r for r in semantic_dedup(
        df, "vec_id", "embedding", n_cells=1, threshold=0.95
    ).collect()}
    assert set(out) == {1, 2, 3, 4, 5}
    assert out[1]["keep"] and out[1]["dup_of"] is None
    assert not out[2]["keep"] and out[2]["dup_of"] == 1
    assert not out[4]["keep"] and out[4]["dup_of"] == 1
    # orthogonal vectors never reach the threshold
    assert out[3]["keep"] and out[5]["keep"]

    # cluster blocking: with >1 cell, a dropped row's representative is
    # ALWAYS a lower id in the SAME cell (pairs never cross cells)
    blocked = {r["id"]: r for r in semantic_dedup(
        df, "vec_id", "embedding", n_cells=2, threshold=0.95
    ).collect()}
    for r in blocked.values():
        if not r["keep"]:
            rep = blocked[r["dup_of"]]
            assert rep["cell_id"] == r["cell_id"] and rep["id"] < r["id"]


def test_semantic_dedup_auto_cells(spark):
    """n_cells=None auto-sizes to ceil(sqrt(n)) — the SemDeDup paper's
    prescription that keeps the per-cell quadratic flat as the corpus
    grows (measured 3.7x at sf1 vs a fixed 16 cells)."""
    from pandas_profiling_personal_spark.operators.similarity import (
        semantic_dedup,
    )
    from pandas_profiling_personal_spark.sources.readers import read_parquet

    emb = read_parquet(spark, "/root/testdata/sf0.001/embeddings.parquet")
    out = semantic_dedup(emb, n_cells=None, threshold=0.3)
    rows = out.collect()
    assert len(rows) == emb.count()           # one verdict per input row
    assert len({r["cell_id"] for r in rows}) > 4  # ~sqrt(n) cells in use


def test_semantic_dedup_hot_cell_cap(spark):
    """max_cell_size: a degenerate corpus (every vector identical → one
    cell) is re-quantized into id-rank sub-cells, bounding the self-join;
    every row still gets a verdict, keeps are one-per-sub-cell, and each
    dropped row's representative sits in the SAME sub-cell (lower id,
    within max_cell_size ranks)."""
    from pandas_profiling_personal_spark.operators.similarity import (
        semantic_dedup,
    )

    rows = [(i, [1.0, 0.0, 0.0]) for i in range(1, 31)]  # one dense cell
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = semantic_dedup(
        df, "vec_id", "embedding", n_cells=1, threshold=0.95, max_cell_size=7
    ).collect()
    assert len(out) == 30                     # every input row has a verdict
    kept = sorted(r["id"] for r in out if r["keep"])
    # 30 identical vectors / sub-cells of 7 → ceil(30/7)=5 sub-cell heads
    assert kept == [1, 8, 15, 22, 29]
    for r in out:
        if not r["keep"]:
            # representative = the head of this row's own sub-cell
            assert r["dup_of"] == kept[(r["id"] - 1) // 7]
    # uncapped control: the same corpus collapses to a single keeper
    full = semantic_dedup(
        df, "vec_id", "embedding", n_cells=1, threshold=0.95,
        max_cell_size=None,
    ).collect()
    assert sorted(r["id"] for r in full if r["keep"]) == [1]


def test_embedding_stats_pathologies(spark):
    """embedding_stats: ragged dims, zero vectors, non-finite components
    and nulls all surface in one 1-row health profile."""
    from pandas_profiling_personal_spark.operators.similarity import (
        embedding_stats,
    )

    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.0, 0.0, 0.0]),                # zero vector
        (3, [1.0, float("nan"), 0.0]),       # NaN component
        (4, [1.0, 2.0]),                      # ragged dimension
        (5, None),                            # null vector
        (6, [1.0, None, 0.5]),               # NULL component: non-finite
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    r = embedding_stats(df, "embedding", exact_quantiles=True).collect()[0]
    assert r["n"] == 6 and r["n_null"] == 1
    assert (r["dim_min"], r["dim_max"]) == (2, 3)
    assert r["n_distinct_dims"] == 2
    assert r["n_zero_vectors"] == 1
    assert r["n_nonfinite_vectors"] == 2  # NaN comp + NULL comp
    assert r["norm_min"] == 0.0 and r["norm_max"] > 1.0

    # the package's own sessions run ANSI off where legacy sizeOfNull makes
    # size(NULL) = -1: the null vector must NOT corrupt dim_min/dim stats
    before = (
        spark.conf.get("spark.sql.ansi.enabled"),
        spark.conf.get("spark.sql.legacy.sizeOfNull"),
    )
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.legacy.sizeOfNull", "true")
    try:
        r2 = embedding_stats(df, "embedding", exact_quantiles=True).collect()[0]
        assert (r2["dim_min"], r2["dim_max"]) == (2, 3)
        assert r2["n_distinct_dims"] == 2
    finally:
        spark.conf.set("spark.sql.ansi.enabled", before[0])
        spark.conf.set("spark.sql.legacy.sizeOfNull", before[1])


def test_chunk_documents_coverage_invariants(spark):
    """Property-style invariants over varied doc lengths and window
    shapes: every token position is covered by at least one chunk, chunk
    starts advance by exactly stride, consecutive chunks overlap by
    exactly `overlap` tokens (except a shorter tail), and concatenating
    each chunk's post-overlap suffix reconstructs the document."""
    from pandas_profiling_personal_spark.operators.text import chunk_documents

    docs = [
        (n, " ".join(f"w{n}_{i}" for i in range(n)))
        for n in (1, 2, 5, 7, 8, 9, 63, 64, 65, 200)
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    for chunk, overlap in ((4, 1), (8, 0), (16, 5), (64, 16)):
        stride = chunk - overlap
        out = {}
        for r in chunk_documents(
            df, "doc_id", "text", chunk_tokens=chunk, overlap_tokens=overlap
        ).collect():
            out.setdefault(r["id"], []).append(
                (r["chunk_index"], r["chunk_text"].split(" "))
            )
        for n, text in docs:
            toks = text.split(" ")
            chunks = [t for _, t in sorted(out[n])]
            # starts advance by stride; windows cap at chunk tokens
            assert all(len(c) <= chunk for c in chunks)
            # coverage: the union of windows is exactly the token sequence
            rebuilt = list(chunks[0])
            for c in chunks[1:]:
                assert c[:overlap] == rebuilt[-overlap:] if overlap else True
                rebuilt.extend(c[overlap:])
            assert rebuilt == toks, (n, chunk, overlap)


def test_weighted_sample_semantics(spark):
    """Expected fraction hits the target; low temperature sharpens toward
    high scores; T→∞ approaches uniform; null/zero weights never kept;
    the selection is deterministic across runs."""
    from pandas_profiling_personal_spark.operators.sampling import (
        weighted_sample,
    )

    n = 4000
    rows = [(i, float((i % 10) + 1)) for i in range(n)]
    rows += [(n, None), (n + 1, 0.0), (n + 2, float("nan"))]
    df = spark.createDataFrame(rows, "id bigint, w double")

    kept = weighted_sample(df, "id", "w", 0.3).collect()
    ids = {r["id"] for r in kept}
    assert not {n, n + 1, n + 2} & ids           # null/zero/NaN dropped
    assert 0.25 * n < len(kept) < 0.35 * n       # expected fraction ~0.3
    # proportional (T=1): weight-10 rows kept ~10x the rate of weight-1
    by_w = {}
    for r in kept:
        by_w[r["w"]] = by_w.get(r["w"], 0) + 1
    assert by_w[10.0] > 5 * by_w.get(1.0, 1)
    # audit column present, in (0, 1]
    assert all(0 < r["keep_prob"] <= 1 for r in kept)

    # T large: approaches uniform — per-weight keep counts even out
    flat = weighted_sample(df, "id", "w", 0.3, temperature=1e9).collect()
    fw = {}
    for r in flat:
        fw[r["w"]] = fw.get(r["w"], 0) + 1
    assert max(fw.values()) < 2.5 * min(fw.values())

    # deterministic: identical row set on a re-run
    again = {r["id"] for r in weighted_sample(df, "id", "w", 0.3).collect()}
    assert again == ids

    import pytest as _pt
    with _pt.raises(ValueError, match="target_fraction"):
        weighted_sample(df, "id", "w", 0.0)
    with _pt.raises(ValueError, match="temperature"):
        weighted_sample(df, "id", "w", 0.5, temperature=0)


def test_weighted_sample_no_data_shuffle_plan(spark):
    """The sampler's only exchanges carry the 1-row scale aggregate; the
    data side is scan -> broadcast-join -> codegen filter."""
    df = spark.range(5000).selectExpr(
        "id", "cast(id % 7 + 1 as double) as w")
    from pandas_profiling_personal_spark.operators.sampling import (
        weighted_sample,
    )

    plan = weighted_sample(df, "id", "w", 0.3)._jdf.queryExecution(
    ).executedPlan().toString()
    import re
    # aggregate rollup + its single-partition side only — no
    # hash-partitioned exchange of the data rows
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 0, plan
    assert plan.count("BroadcastNestedLoopJoin") == 1
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
