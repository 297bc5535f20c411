"""Round-8 review fixes: auto band geometry, half-up rounding, string-id
packing, hardened netpbm header, EXIF key cap, decoder='auto' resolution."""

import pytest
from pyspark.sql import functions as F


def test_auto_band_geometry_scales_with_n():
    """Small corpora pick minimal-explode single-block bands; large corpora
    widen keys (Manku block combinations) because candidate pairs dominate.
    Every returned geometry keeps the pigeonhole exact-recall guarantee."""
    from pandas_profiling_personal_spark.operators.dedup import (
        auto_band_geometry,
    )

    bb_small, k_small = auto_band_geometry(100, 60, 8)
    bb_large, k_large = auto_band_geometry(50_000, 60, 8)
    for bb, k in ((bb_small, k_small), (bb_large, k_large)):
        assert 60 % bb == 0
        assert 1 <= k <= 60 // bb - 8  # pigeonhole: >=1 unperturbed key
    assert k_small == 1, "tiny corpus must not pay a wide explode"
    assert (k_large, bb_large) != (k_small, bb_small) and (
        k_large * bb_large > k_small * bb_small
    ), "50k corpus must widen the key past the single-block tier"
    # honors a caller-pinned band_bits
    bb_fix, _ = auto_band_geometry(50_000, 64, 6, band_bits=8)
    assert bb_fix == 8
    # deterministic
    assert auto_band_geometry(50_000, 60, 8) == (bb_large, k_large)
    # infeasible radius -> explicit error, not a silent bad geometry
    with pytest.raises(ValueError, match="no exact-recall"):
        auto_band_geometry(1000, 8, 64)


def test_banded_hamming_pairs_geometry_equivalence(spark):
    """The PAIR SET is a function of (signatures, max_hamming) only — every
    valid band geometry, auto or pinned, returns the identical set (the
    r7 all-pairs-rebuild guarantee, now asserted across geometries)."""
    from pandas_profiling_personal_spark.operators.dedup import (
        auto_band_geometry,
        banded_hamming_pairs,
    )

    # deterministic 60-bit signatures with planted near-dup structure
    base = spark.range(0, 120).select(
        F.col("id"),
        (
            F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 15), 16, 10)
            .cast("long")
            .bitwiseAND(F.lit((1 << 60) - 1))
        ).alias("sig"),
    )
    # plant exact + 1-bit + 3-bit neighbours of doc 0..9 as ids 1000+
    planted = base.where(F.col("id") < 10).select(
        (F.col("id") + 1000).alias("id"),
        F.col("sig").bitwiseXOR(
            F.when(F.col("id") % 3 == 0, F.lit(0))
            .when(F.col("id") % 3 == 1, F.lit(1 << 17))
            .otherwise(F.lit((1 << 3) + (1 << 31) + (1 << 55)))
        ).alias("sig"),
    )
    sig = base.unionByName(planted)

    def pairs(bb, k):
        return {
            (r["doc_a"], r["doc_b"], r["hamming"])
            for r in banded_hamming_pairs(
                sig, "id", "sig", bits=60, max_hamming=4,
                band_bits=bb, key_blocks=k,
            ).collect()
        }

    auto_bb, auto_k = auto_band_geometry(130, 60, 4)
    golden = pairs(auto_bb, auto_k)
    assert len(golden) >= 10  # all planted pairs found
    assert pairs(6, 1) == golden
    assert pairs(6, 2) == golden
    assert pairs(10, 1) == golden
    assert pairs(10, 2) == golden


def test_round_half_up_vs_bankers():
    """SQL round() (DuckDB + Spark F.round) is half-away-from-zero; Python's
    builtin is banker's. Driver-side finalizations an oracle re-derives must
    round half-up (review r8 — the embedding_drift tie hazard)."""
    from pandas_profiling_personal_spark.operators.drift import round_half_up

    # exact binary ties where banker's diverges
    assert round(0.125, 2) == 0.12  # the hazard
    assert round_half_up(0.125, 2) == 0.13
    assert round_half_up(0.375, 2) == 0.38
    assert round_half_up(2.5, 0) == 3.0
    assert round_half_up(-2.5, 0) == -3.0  # away from zero, not toward +inf
    assert round_half_up(None, 4) is None
    # non-ties unchanged
    assert round_half_up(0.1234, 2) == 0.12
    # matches Spark's own F.round on the tie
    spark_val = None
    try:
        from pyspark.sql import SparkSession

        s = SparkSession.getActiveSession()
        if s is not None:
            spark_val = s.sql("select round(0.125d, 2) v").collect()[0]["v"]
    except Exception:
        pass
    if spark_val is not None:
        assert round_half_up(0.125, 2) == spark_val


def test_pack_sequences_string_ids(spark):
    """String doc ids (explicitly supported across the dedup family) must
    pack identically to the numeric path: start_token depends only on global
    id order, which the range-partitioned bucketing reproduces (review r8 —
    the floor(id/bucket_size) path silently required numeric ids and failed
    analysis under ANSI)."""
    from pandas_profiling_personal_spark.operators.text import pack_sequences

    toks = [37, 0, 512, 2048, 1, 100, 900, 3000, 5, 64]
    num = spark.createDataFrame(
        [(i, t) for i, t in enumerate(toks)], "doc_id long, n_tokens long"
    )
    # zero-padded strings sort in the same order as the ints
    txt = spark.createDataFrame(
        [(f"doc-{i:04d}", t) for i, t in enumerate(toks)],
        "doc_id string, n_tokens long",
    )
    want = {
        f"doc-{r['doc_id']:04d}": (r["start_token"], r["seq_first"], r["seq_last"])
        for r in pack_sequences(num, context_len=1000).collect()
    }
    got = {
        r["doc_id"]: (r["start_token"], r["seq_first"], r["seq_last"])
        for r in pack_sequences(txt, context_len=1000).collect()
    }
    assert got == want
    # single partition after repartitionByRange still correct (tiny input)
    one = pack_sequences(txt.coalesce(1), context_len=1000).collect()
    assert {
        r["doc_id"]: (r["start_token"], r["seq_first"], r["seq_last"])
        for r in one
    } == want


def test_parse_netpbm_header_whitespace_hardening():
    """Binary P5/P6 require exactly one whitespace byte after maxval; a CRLF
    pair is tolerated as the single newline, anything else returns None
    instead of decoding pixels at the wrong offset (review r8 — a shifted
    raster yields a silently WRONG perceptual hash, i.e. wrong pairs)."""
    import numpy as np

    from pandas_profiling_personal_spark.operators.multimodal import (
        _parse_netpbm,
        phash_gray,
    )

    # exact-size uint8 raster (astype matters: int arithmetic would emit
    # 2-byte values and an oversized body, the genuinely ambiguous case)
    img = ((np.arange(64).reshape(8, 8) * 3) % 256).astype(np.uint8)
    body = img.tobytes()
    assert len(body) == 64
    lf = b"P5 8 8 255\n" + body
    crlf = b"P5 8 8 255\r\n" + body
    cr = b"P5 8 8 255\r" + body
    ref = _parse_netpbm(lf)
    assert ref is not None
    assert np.array_equal(_parse_netpbm(crlf), ref), "CRLF must not shift"
    assert np.array_equal(_parse_netpbm(cr), ref), "lone CR is one ws byte"
    assert phash_gray(_parse_netpbm(crlf)) == phash_gray(ref)
    # non-whitespace after maxval -> reject, don't mis-offset
    assert _parse_netpbm(b"P5 8 8 255#" + body) is None
    assert _parse_netpbm(b"P5 8 8 255x" + body) is None


def test_media_profile_exif_key_cap(spark):
    """The EXIF key rollup is driver-bounded: top-``exif_max_keys`` keys by
    count (ties by name), and exif_values only covers the kept keys — hostile
    minted metadata can't unbound the collect (review r7 item 7)."""
    from tests.test_surfaces import _exif_jpeg_fixture

    from pandas_profiling_personal_spark.operators.multimodal import (
        media_profile,
    )

    jpg = _exif_jpeg_fixture()
    df = spark.createDataFrame([(1, jpg), (2, jpg)], "id long, blob binary")
    full = media_profile(df, "blob", exif=True)
    assert set(full["exif_keys"]) == {"Make", "Model", "Orientation"}

    capped = media_profile(df, "blob", exif=True, exif_max_keys=2)
    # all three tie at count 2 -> lexicographic tiebreak keeps Make, Model
    assert capped["exif_keys"] == {"Make": 2, "Model": 2}
    assert set(capped["exif_values"]) <= {"Make", "Model"}

    # degenerate cap of 0 keys -> empty dicts, no isin([]) crash
    none = media_profile(df, "blob", exif=True, exif_max_keys=0)
    assert none["exif_keys"] == {} and none["exif_values"] == {}


def test_image_near_duplicates_auto_decoder_geometry(spark):
    """decoder='auto' must resolve to the EFFECTIVE tier before picking hash
    geometry: in a PIL-free env it decodes fake 60-bit signatures, and
    banding those at bits=64 leaves a degenerate 16-key top band that goes
    quadratic (review r8). Auto must equal the explicit fake tier."""
    from pandas_profiling_personal_spark.operators.multimodal import (
        _pil_available,
        image_near_duplicates,
    )

    if _pil_available():
        pytest.skip("PIL present: auto resolves to the real tier")
    rows = [
        (1, b"\xff\xd8\xff" + b"jpegdata" * 10),
        (2, b"\x89PNG\r\n" + b"pngdata" * 5),
        (3, b"\x89PNG\r\n" + b"pngdata" * 5),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "id long, content binary")
    auto = image_near_duplicates(df, "content", "id", decoder="auto").collect()
    fake = image_near_duplicates(df, "content", "id", decoder="fake").collect()
    assert [(r["doc_a"], r["doc_b"], r["hamming"]) for r in auto] == [
        (r["doc_a"], r["doc_b"], r["hamming"]) for r in fake
    ] == [(2, 3, 0)]


def _wav_pcm(samples, rate=16000, bits=16, channels=1):
    """Hand-built canonical RIFF/WAVE bytes from a float sample vector."""
    import numpy as np

    x = np.asarray(samples, dtype=np.float64)
    if channels > 1:
        x = np.repeat(x[:, None], channels, axis=1).ravel()
    if bits == 16:
        payload = np.clip(x, -32768, 32767).astype("<i2").tobytes()
    else:
        payload = (np.clip(x, -128, 127) + 128).astype("uint8").tobytes()
    block = channels * bits // 8
    fmt = (
        b"fmt " + (16).to_bytes(4, "little") + (1).to_bytes(2, "little")
        + channels.to_bytes(2, "little") + rate.to_bytes(4, "little")
        + (rate * block).to_bytes(4, "little") + block.to_bytes(2, "little")
        + bits.to_bytes(2, "little")
    )
    data = b"data" + len(payload).to_bytes(4, "little") + payload
    body = b"WAVE" + fmt + data
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def _audio_fixture():
    import numpy as np

    rng = np.random.default_rng(7)
    t = np.linspace(0, 2.0, 32000)
    sig = (
        8000 * np.sin(2 * np.pi * 3 * t)
        * (1 + 0.5 * np.sin(2 * np.pi * 0.7 * t))
        + 500 * rng.standard_normal(t.size)
    )
    noise = 12000 * rng.standard_normal(32000)
    return sig, noise


def test_audio_envelope_signature_invariances():
    """The envelope-gradient signature is gain-invariant (scale-free sign
    comparisons), resample-stable (relative-time windows), and mixes
    channels down — a re-encoded copy hashes identically while unrelated
    audio lands far away."""
    from pandas_profiling_personal_spark.operators.multimodal import (
        _wav_samples,
        audio_envelope_signature,
    )

    sig, noise = _audio_fixture()

    def s(b):
        return audio_envelope_signature(_wav_samples(b))

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    base = s(_wav_pcm(sig))
    assert ham(base, s(_wav_pcm(sig * 0.25))) <= 3, "gain-scaled copy"
    assert ham(base, s(_wav_pcm(sig[::2], rate=8000))) <= 3, "resampled copy"
    assert ham(base, s(_wav_pcm(sig, channels=2))) <= 3, "stereo re-encode"
    assert ham(base, s(_wav_pcm(sig / 256, bits=8))) <= 6, "8-bit re-encode"
    assert ham(base, s(_wav_pcm(noise))) > 12, "unrelated audio stays far"
    # hostile/degenerate inputs decode to None signatures, not garbage
    assert _wav_samples(b"RIFF\x10\x00\x00\x00WAVEjunkchunk") is None
    assert _wav_samples(b"not audio at all") is None
    import numpy as np

    assert audio_envelope_signature(np.array([1.0])) is None


def test_audio_near_duplicates_wav_tier(spark):
    """End-to-end distributed audio near-dup on REAL (PCM WAV) decodes:
    the gain-scaled and resampled copies pair with the original, noise and
    undecodable bytes drop out, and the keep-list collapses the perceptual
    cluster to its minimum-id representative."""
    from pandas_profiling_personal_spark.operators.multimodal import (
        audio_dedup_keep_list,
        audio_near_duplicates,
    )

    sig, noise = _audio_fixture()
    rows = [
        (1, _wav_pcm(sig)),
        (2, _wav_pcm(sig * 0.25)),
        (3, _wav_pcm(sig[::2], rate=8000)),
        (4, _wav_pcm(noise)),
        (5, b"not audio"),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "id long, blob binary")
    pairs = audio_near_duplicates(df, "blob", "id", max_hamming=7).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in pairs} == {(1, 2), (1, 3), (2, 3)}

    keep = {
        r["id"]: r["keep"]
        for r in audio_dedup_keep_list(df, "blob", "id", max_hamming=7).collect()
    }
    assert keep == {1: True, 2: False, 3: False, 4: True, 5: True, 6: True}


def _near_dup_corpus():
    """Docs with known near-dup structure: 0~1~2 a similarity chain, 3 exact
    dup of 0 arriving later, 4/5 unrelated, 6 shingle-less."""
    base = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep green forest tonight without any warning"
    )
    return [
        (0, base),
        (1, base + " again"),
        (2, base + " again and again"),
        (3, base),
        (4, "completely different words about astronomy telescopes and "
            "planetary orbits circling distant binary stars quietly"),
        (5, "unrelated content on medieval castle architecture and "
            "fortified stone walls built high above the river valley"),
        (6, None),
    ]


def test_near_dup_stream_matches_batch_incremental(spark, tmp_path):
    """Within-stream near-dup (applyInPandasWithState on band buckets): over
    a replayed stream whose ids follow arrival order and whose span fits the
    TTL horizon, the flagged set equals the batch
    incremental_minhash_dedup(df, None) greedy sweep — including chains and
    within-batch pairs — across both one-batch and file-per-batch replays."""
    import datetime as dt

    from pyspark.sql import types as T

    from pandas_profiling_personal_spark.operators.dedup import (
        incremental_minhash_dedup,
    )
    from pandas_profiling_personal_spark.streaming.dedup_stream import (
        near_dup_stream,
    )

    t0 = dt.datetime(2024, 3, 1, 12, 0, 0)
    rows = [
        (i, txt, t0 + dt.timedelta(minutes=i))
        for i, txt in _near_dup_corpus()
    ]
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ])
    kw = dict(num_hashes=16, bands=4, min_est_jaccard=0.7)

    batch_df = spark.createDataFrame(rows, schema)
    batch = {
        r["doc_id"]: r["keep"]
        for r in incremental_minhash_dedup(
            batch_df.where("text IS NOT NULL"), None, **kw
        ).collect()
    }
    expect_flagged = {d for d, keep in batch.items() if not keep}
    assert expect_flagged, "fixture must contain near-dups"

    for replay, per_file in (("one_batch", None), ("file_per_batch", 1)):
        src = tmp_path / f"nd_src_{replay}"
        if per_file is None:
            spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
                str(src)
            )
        else:
            for row in rows:  # one file per doc -> one micro-batch per doc
                spark.createDataFrame([row], schema).coalesce(
                    1
                ).write.mode("append").parquet(str(src))
        reader = spark.readStream.schema(schema)
        if per_file:
            reader = reader.option("maxFilesPerTrigger", per_file)
        stream = reader.parquet(str(src))
        out = near_dup_stream(
            stream, "text", "doc_id", "ts", watermark="1 hour", **kw
        )
        assert out.isStreaming
        name = f"t_near_dup_{replay}"
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
            verdicts = spark.table(name).collect()
        finally:
            q.stop()
        flagged = {r["doc_id"] for r in verdicts}
        assert flagged == expect_flagged, (replay, flagged, expect_flagged)
        # every verdict names a LOWER-id partner above the threshold
        for r in verdicts:
            assert r["dup_of"] < r["doc_id"]
            assert r["est_jaccard"] >= 0.7


def test_near_dup_stream_ttl_evicts_state(spark, tmp_path):
    """state_ttl_minutes bounds suppression by event time: once the
    watermark passes entry_ts + ttl, an old signature stops suppressing —
    a near-dup arriving past the horizon is NOT flagged, while one inside
    the horizon still is. Also: batch DataFrames are rejected."""
    import datetime as dt

    import pytest as _pytest
    from pyspark.sql import types as T

    from pandas_profiling_personal_spark.streaming.dedup_stream import (
        near_dup_stream,
    )

    base = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep green forest tonight without any warning"
    )
    other = (
        "completely different words about astronomy telescopes and "
        "planetary orbits circling distant binary stars quietly"
    )
    t0 = dt.datetime(2024, 3, 1, 12, 0, 0)

    def at(m):
        return t0 + dt.timedelta(minutes=m)

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ])
    # file1: doc 0 at t+0. file2: doc 10 at t+100 (advances the watermark
    # past 0's 30-min horizon). file3: doc 11 = near-dup of 0 (stale — not
    # flagged) and doc 12 = near-dup of 10 (fresh — flagged).
    files = [
        [(0, base, at(0))],
        [(10, other, at(100))],
        [(11, base + " again", at(101)), (12, other + " too", at(101))],
    ]
    src = tmp_path / "nd_ttl_src"
    for chunk in files:
        spark.createDataFrame(chunk, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = near_dup_stream(
        stream, "text", "doc_id", "ts",
        num_hashes=16, bands=4, min_est_jaccard=0.7,
        watermark="0 seconds", state_ttl_minutes=30,
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_near_dup_ttl")
        .start()
    )
    try:
        q.processAllAvailable()
        verdicts = {
            r["doc_id"]: r["dup_of"]
            for r in spark.table("t_near_dup_ttl").collect()
        }
    finally:
        q.stop()
    assert 11 not in verdicts, "stale partner must have been evicted"
    assert verdicts.get(12) == 10, "fresh partner still suppresses"

    with _pytest.raises(ValueError, match="streaming tier"):
        near_dup_stream(
            spark.createDataFrame([], schema), "text", "doc_id", "ts"
        )


def test_video_near_duplicates_frame_vote(spark):
    """video_near_duplicates: frame-vote composition over the sample_frames
    plumbing — byte-identical videos match at every sampled frame, unrelated
    ones never reach the vote, the vote threshold is honored, and the real
    codec tier stays an honest NotImplementedError (libav absent)."""
    from pandas_profiling_personal_spark.operators.multimodal import (
        video_near_duplicates,
    )

    rows = [
        (1, b"\x00\x00\x01\xba" + b"fakevideo" * 50),
        (2, b"\x00\x00\x01\xba" + b"fakevideo" * 50),  # identical -> dup
        (3, b"\x00\x00\x01\xba" + b"unrelated" * 50),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "id long, blob binary")
    pairs = video_near_duplicates(df, "blob", "id", n_frames=4).collect()
    assert [(r["doc_a"], r["doc_b"], r["n_matching_frames"]) for r in pairs] \
        == [(1, 2, 4)], pairs

    # a vote no pair can reach -> empty, not an error
    assert (
        video_near_duplicates(
            df, "blob", "id", n_frames=4, min_matching_frames=5
        ).count()
        == 0
    )

    with pytest.raises(NotImplementedError, match="libav"):
        video_near_duplicates(df, "blob", "id", decoder="real")


def test_size_estimate_and_fillna_rows(spark):
    """Close the two 'untested (trivial)' inventory rows: A22 size_estimate
    returns a positive Catalyst estimate that shrinks under column pruning,
    and P7's built-in fill path keeps the profile's null accounting honest."""
    from pandas_profiling_personal_spark.operators.order_stats import (
        size_estimate,
    )
    from pandas_profiling_personal_spark.sources.readers import read_parquet

    li = read_parquet(spark, "/root/testdata/sf0.001/lineitem.parquet")
    full = size_estimate(li)
    pruned = size_estimate(li.select("l_quantity"))
    assert full is not None and full > 0
    assert pruned is not None and 0 < pruned < full, (pruned, full)

    # P7: df.na.fill IS the operator (reference normalizes NA pre-describe);
    # a filled frame profiles with zero missing and the fill value counted
    from pandas_profiling_personal_spark.operators.missing import null_counts

    df = spark.createDataFrame(
        [(1, 2.0), (2, None), (3, 5.0)], "id long, v double"
    )
    filled = df.na.fill({"v": 0.0})
    assert null_counts(df)["v"] == 1
    assert null_counts(filled)["v"] == 0
    assert filled.where("v = 0.0").count() == 1

    # the estimate now reaches the profile's table rollup (reference
    # summary.py:217-224 memory_size/record_size)
    from pandas_profiling_personal_spark import ProfileConfig, profile

    r = profile(
        li.select("l_quantity", "l_returnflag"),
        ProfileConfig(correlations=(), duplicates=False,
                      missing_diagrams=False),
    )
    assert r.table.get("memory_size", 0) > 0
    assert r.table["record_size"] == r.table["memory_size"] / r.table["n"]


def test_incremental_hamming_dedup_two_step_equals_batch(spark):
    """Hamming signature-store dedup: shard-1 sweep -> store -> shard-2
    sweep reproduces the batch union rule EXACTLY (any lower-id partner
    within the radius — banding's pigeonhole recall means no bucket-cap
    qualification, unlike the MinHash tier), across both the generic
    operator and the WAV-tier audio wrapper."""
    from pandas_profiling_personal_spark.operators.dedup import (
        incremental_hamming_dedup,
    )
    from pandas_profiling_personal_spark.operators.multimodal import (
        incremental_audio_dedup,
    )

    # synthetic 60-bit signatures with planted near-dups (1-bit flips)
    base = spark.range(0, 60).select(
        F.col("id").alias("doc_id"),
        (
            F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 15), 16, 10)
            .cast("long")
        ).alias("signature"),
    )
    planted = base.where(F.col("doc_id") % 4 == 0).select(
        (F.col("doc_id") + 1000).alias("doc_id"),
        F.col("signature").bitwiseXOR(F.lit(1 << 13)).alias("signature"),
    )
    sigs = base.unionByName(planted)
    kw = dict(bits=60, max_hamming=4)

    batch = {
        r["doc_id"]: (r["keep"], r["dup_of"])
        for r in incremental_hamming_dedup(sigs, None, **kw).collect()
    }
    assert any(not k for k, _ in batch.values()), "fixture needs dups"

    first = incremental_hamming_dedup(
        sigs.where("doc_id < 30"), None, **kw
    )
    store = first.select("doc_id", "signature")
    second = incremental_hamming_dedup(
        sigs.where("doc_id >= 30"), store, **kw
    )
    two_step = {
        r["doc_id"]: (r["keep"], r["dup_of"]) for r in first.collect()
    } | {r["doc_id"]: (r["keep"], r["dup_of"]) for r in second.collect()}
    assert two_step == batch

    # audio wrapper: a WAV near-dup arriving in a later shard is swept
    # against the stored envelope signature of the original
    sig_w, noise = _audio_fixture()
    shard1 = spark.createDataFrame(
        [(1, _wav_pcm(sig_w)), (2, _wav_pcm(noise))], "id long, blob binary"
    )
    shard2 = spark.createDataFrame(
        [(3, _wav_pcm(sig_w * 0.5)), (4, b"not audio")],
        "id long, blob binary",
    )
    f1 = incremental_audio_dedup(shard1, None, "blob", "id", max_hamming=7)
    st = f1.select("id", "signature")
    f2 = incremental_audio_dedup(shard2, st, "blob", "id", max_hamming=7)
    out1 = {r["id"]: (r["keep"], r["dup_of"]) for r in f1.collect()}
    out2 = {r["id"]: (r["keep"], r["dup_of"]) for r in f2.collect()}
    assert out1 == {1: (True, None), 2: (True, None)}
    assert out2 == {3: (False, 1)}, out2  # 4 absent: no audio identity


def test_cli_save_state_and_drift(tmp_path):
    """CLI incremental-state modes: --save-state writes a mergeable shard
    state, --align-state reuses its histogram edges, --drift-against writes
    the incremental drift HTML — the daily pipeline's command-line loop."""
    import json
    import subprocess
    import sys

    import pandas as pd

    src_a = tmp_path / "day1.parquet"
    src_b = tmp_path / "day2.parquet"
    pd.DataFrame(
        {"v": [1.0, 2.0, 3.0, 4.0, 5.0], "cat": list("aabbc")}
    ).to_parquet(src_a)
    pd.DataFrame(
        {"v": [4.0, 4.5, 5.0, 5.0, 2.0], "cat": list("ccccb")}
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
    s1 = run(str(src_a), "--save-state", str(st_a))
    assert s1["n"] == 5 and s1["n_columns"] == 2
    s2 = run(
        str(src_b), "--save-state", str(st_b), "--align-state", str(st_a)
    )
    assert s2["aligned_to"] == str(st_a)
    s3 = run(str(src_b), str(out), "--drift-against", str(st_a))
    assert s3["n_a"] == 5 and s3["n_b"] == 5
    html = out.read_text()
    assert "<html" in html and "cat" in html

    # the two saved states merge (shared edges) and drift in-library too
    from pandas_profiling_personal_spark.plans.incremental import (
        PartialProfile,
        drift_between_partials,
        merge_partials,
    )

    pa = PartialProfile.from_json(st_a.read_text())
    pb = PartialProfile.from_json(st_b.read_text())
    merged = merge_partials([pa, pb])
    assert merged.n == 10
    assert drift_between_partials(pa, pb)["v"]["psi"] is not None


def test_parse_netpbm_cr_pixel_ambiguity():
    """Review r8 second pass: a spec-conforming P5 using a bare \\r whose
    FIRST PIXEL is 10 (0x0A) must not lose that pixel to CRLF tolerance —
    exact expected-raster-size disambiguates; CRLF writers with exact-size
    rasters still decode at the right offset."""
    import numpy as np

    from pandas_profiling_personal_spark.operators.multimodal import (
        _parse_netpbm,
    )

    img = np.array([[10, 20], [30, 40]], dtype=np.uint8)
    body = img.tobytes()
    # bare CR, first pixel 0x0A, exact size: the 0x0A is a PIXEL
    got = _parse_netpbm(b"P5 2 2 255\r" + body)
    assert got is not None and np.array_equal(got, img), got
    # CRLF writer, exact size: the 0x0A after \r is the newline
    got2 = _parse_netpbm(b"P5 2 2 255\r\n" + body)
    assert got2 is not None and np.array_equal(got2, img), got2


def test_round_half_up_nonfinite_passthrough():
    """round_half_up passes inf/NaN through like the builtin it replaced —
    an overflowed aggregate reports inf, it doesn't crash finalization."""
    import math

    from pandas_profiling_personal_spark.operators.drift import round_half_up

    assert round_half_up(float("inf"), 6) == float("inf")
    assert round_half_up(float("-inf"), 6) == float("-inf")
    assert math.isnan(round_half_up(float("nan"), 6))


def test_near_dup_stream_multi_chunk_group(spark, tmp_path):
    """Review r8: a (band, bucket) group spanning multiple Arrow chunks in
    one micro-batch must process in GLOBAL id order (chunks concatenated
    before the sort), so every doc still sees its lower-id partner."""
    import datetime as dt

    from pyspark.sql import types as T

    from pandas_profiling_personal_spark.streaming.dedup_stream import (
        near_dup_stream,
    )

    base = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep green forest tonight without any warning"
    )
    t0 = dt.datetime(2024, 3, 1, 12, 0, 0)
    rows = [(i, base, t0) for i in range(6)]  # one bucket, 6 docs
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ])
    src = tmp_path / "nd_chunks"
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(src))
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        stream = spark.readStream.schema(schema).parquet(str(src))
        out = near_dup_stream(
            stream, "text", "doc_id", "ts",
            num_hashes=16, bands=4, min_est_jaccard=0.7, watermark="1 hour",
        )
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("t_nd_chunks")
            .start()
        )
        try:
            q.processAllAvailable()
            verdicts = {
                r["doc_id"]: r["dup_of"]
                for r in spark.table("t_nd_chunks").collect()
            }
        finally:
            q.stop()
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", old
        )
    assert verdicts == {i: 0 for i in range(1, 6)}, verdicts
