"""Multimodal plumbing, streaming profile, HTML/JSON/serialize/CLI surfaces."""

import datetime as dt
import json

import pytest
from pyspark.sql import functions as F, types as T


@pytest.fixture()
def media_df(spark):
    rows = [
        (1, b"\xff\xd8\xff" + b"jpegdata" * 10),
        (2, b"\x89PNG\r\n" + b"pngdata" * 5),
        (3, b"\x89PNG\r\n" + b"pngdata" * 5),  # duplicate content
        (4, None),
    ]
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


def test_media_metadata_plumbing(spark, media_df):
    from pandas_profiling_personal_spark.operators.multimodal import media_metadata

    out = media_metadata(media_df, "content").collect()
    by_id = {r["id"]: r["meta"] for r in out}
    assert by_id[1]["format"] == "jpeg"
    assert by_id[2]["format"] == "png"
    assert by_id[4] is None
    assert by_id[2]["content_hash"] == by_id[3]["content_hash"]
    assert 64 <= by_id[1]["width"] < 256
    # determinism
    again = {r["id"]: r["meta"] for r in media_metadata(media_df, "content").collect()}
    assert again[1] == by_id[1]


def test_media_profile_and_real_decoder_gate(spark, media_df):
    from pandas_profiling_personal_spark.operators.multimodal import (
        _pil_available,
        media_metadata,
        media_profile,
    )

    prof = media_profile(media_df, "content")
    assert prof["n"] == 4
    assert prof["formats"]["png"] == 2
    assert prof["n_duplicate_contents"] == 1
    # fake tier: byte-identical contents share a phash -> one perceptual group
    assert prof["n_duplicate_perceptual"] == 1
    if not _pil_available():
        # real tier must fail up-front (driver-side), not mid-job
        with pytest.raises(ImportError, match="Pillow"):
            media_metadata(media_df, "content", decoder="real")
        # auto tier must fall back to the deterministic fake decoder
        out = {
            r["id"]: r["meta"]
            for r in media_metadata(media_df, "content", decoder="auto").collect()
        }
        assert out[1]["format"] == "jpeg" and out[1]["width"] is not None


def _pgm(m):
    """Encode a uint8-ish 2D numpy matrix as a binary PGM (P5)."""
    import numpy as np

    h, w = m.shape
    return b"P5 %d %d 255 " % (w, h) + m.astype(np.uint8).tobytes()


@pytest.fixture()
def pgm_images():
    """Hand-built resized-image fixture: a structured image, its 2x area
    downscale (the perceptual near-dup), and an unrelated noise image."""
    import numpy as np

    from pandas_profiling_personal_spark.operators.multimodal import (
        _resize_area,
    )

    y, x = np.mgrid[0:96, 0:96]
    img = (
        x * 1.5 + y * 0.9 + 40 * np.exp(-((x - 30) ** 2 + (y - 60) ** 2) / 400)
    ) % 256
    resized = _resize_area(img.astype(float), 48, 48)
    noise = np.random.default_rng(11).integers(0, 256, (96, 96))
    return img, resized, noise


def test_perceptual_hash_kernels(pgm_images):
    """pHash/dHash survive a resize (reference: summary_helpers_image.py:57-67
    groups duplicates by the perceptual imagehash.phash, not byte equality)."""
    from pandas_profiling_personal_spark.operators.multimodal import (
        _parse_netpbm,
        perceptual_hashes,
        phash_gray,
    )

    img, resized, noise = pgm_images

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    ph, dh = perceptual_hashes(_pgm(img))
    ph_r, dh_r = perceptual_hashes(_pgm(resized))
    ph_n, _ = perceptual_hashes(_pgm(noise))
    assert ham(ph, ph_r) <= 7, "resized copy must hash near-identically"
    assert ham(dh, dh_r) <= 7
    assert ham(ph, ph_n) > 12, "unrelated image must hash far away"

    # ascii P2 and binary P5 of the SAME pixels -> identical hash
    h, w = img.shape
    import numpy as np

    body = " ".join(str(int(v)) for v in np.asarray(img).flatten())
    p2 = ("P2\n# comment\n%d %d\n255\n%s" % (w, h, body)).encode()
    assert phash_gray(_parse_netpbm(p2)) == ph

    # PPM color collapses via luma; junk bytes are simply undecodable
    rgb = np.stack([img, img * 0.5 % 256, 255 - img], axis=-1)
    p6 = b"P6 %d %d 255 " % (w, h) + rgb.astype(np.uint8).tobytes()
    assert perceptual_hashes(p6)[0] is not None
    assert perceptual_hashes(b"not an image") == (None, None)
    assert perceptual_hashes(b"P5 9 9 255 short") == (None, None)


def test_image_near_duplicates_netpbm_tier(spark, pgm_images):
    """End-to-end distributed perceptual near-dup on REAL (netpbm) decodes:
    only the original/resized pair lands within the Hamming budget, and the
    banded join (pigeonhole blocking) finds it without all-pairs work."""
    from pandas_profiling_personal_spark.operators.multimodal import (
        image_near_duplicates,
        media_metadata,
    )

    img, resized, noise = pgm_images
    rows = [
        (1, _pgm(img)),
        (2, _pgm(resized)),
        (3, _pgm(noise)),
        (4, b"undecodable bytes"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "id long, content binary")

    meta = {
        r["id"]: r["meta"]
        for r in media_metadata(df, "content", decoder="netpbm").collect()
    }
    assert (meta[1]["width"], meta[1]["height"]) == (96, 96)
    assert (meta[2]["width"], meta[2]["height"]) == (48, 48)
    assert meta[1]["format"] == "pgm"
    assert meta[1]["phash"] is not None
    assert meta[4]["phash"] is None and meta[4]["width"] is None

    pairs = image_near_duplicates(
        df, "content", "id", decoder="netpbm", max_hamming=7
    ).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in pairs} == {(1, 2)}


def test_image_near_duplicates_fake_tier(spark, media_df):
    """Oracle tier: md5-derived 60-bit signatures — byte-identical contents
    pair at Hamming 0, everything else stays apart."""
    from pandas_profiling_personal_spark.operators.multimodal import (
        image_near_duplicates,
    )

    pairs = image_near_duplicates(
        media_df, "content", "id", decoder="fake",
        max_hamming=8, band_bits=6, bits=60,
    ).collect()
    assert [(r["doc_a"], r["doc_b"], r["hamming"]) for r in pairs] == [(2, 3, 0)]

    # per-decoder defaults: fake signatures are 60-bit, so defaulting
    # bits=64 would leave a degenerate 16-key top band (review r7) — the
    # bare call must resolve to the 60/6 fake geometry and still work
    dflt = image_near_duplicates(media_df, "content", "id").collect()
    assert [(r["doc_a"], r["doc_b"]) for r in dflt] == [(2, 3)]

    # Manku key_blocks=2 (wider keys, same exact-recall guarantee) finds
    # the identical pair set
    kb2 = image_near_duplicates(
        media_df, "content", "id", decoder="fake",
        max_hamming=8, band_bits=6, bits=60, key_blocks=2,
    ).collect()
    assert [(r["doc_a"], r["doc_b"], r["hamming"]) for r in kb2] == [(2, 3, 0)]


def _wav(rate=16000, channels=1, bits=16, frames=800):
    """Hand-built canonical RIFF/WAVE bytes (silence)."""
    block = channels * bits // 8
    data = b"\x00" * (frames * block)
    fmt = (
        b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * block).to_bytes(4, "little")
        + block.to_bytes(2, "little") + bits.to_bytes(2, "little")
    )
    body = b"WAVE" + fmt + b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def test_audio_metadata_wav_tier(spark):
    """audio_metadata: the pure RIFF/WAVE parser yields real sample-rate/
    channels/frames/duration with zero dependencies; non-WAV bytes keep the
    sniffed format with null audio fields; the fake tier is deterministic."""
    from pandas_profiling_personal_spark.operators.multimodal import (
        audio_metadata,
    )

    rows = [
        (1, _wav(rate=16000, channels=1, bits=16, frames=8000)),
        (2, _wav(rate=44100, channels=2, bits=8, frames=44100)),
        (3, b"\xff\xd8\xffnot audio"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "id long, content binary")
    got = {
        r["id"]: r["audio_meta"]
        for r in audio_metadata(df, "content").collect()
    }
    assert got[1]["format"] == "wav"
    assert got[1]["sample_rate"] == 16000 and got[1]["channels"] == 1
    assert got[1]["n_frames"] == 8000 and got[1]["duration_s"] == 0.5
    assert got[2]["sample_rate"] == 44100 and got[2]["channels"] == 2
    assert got[2]["bits_per_sample"] == 8 and got[2]["duration_s"] == 1.0
    assert got[3]["format"] == "jpeg" and got[3]["sample_rate"] is None
    assert got[4] is None

    fake = {
        r["id"]: r["audio_meta"]
        for r in audio_metadata(df, "content", decoder="fake").collect()
    }
    again = {
        r["id"]: r["audio_meta"]
        for r in audio_metadata(df, "content", decoder="fake").collect()
    }
    assert fake == again  # deterministic
    assert 8000 <= fake[1]["sample_rate"] < 48000


def test_image_dedup_keep_list_transitive(spark, pgm_images):
    """image_dedup_keep_list: a resize CHAIN (96 ≈ 64 ≈ 48) collapses to one
    kept representative via connected components, even if the chain's ends
    drift apart in Hamming space; unrelated and undecodable rows are kept."""
    import numpy as np

    from pandas_profiling_personal_spark.operators.multimodal import (
        _resize_area,
        image_dedup_keep_list,
    )

    img, resized48, noise = pgm_images
    resized64 = _resize_area(img.astype(float), 64, 64)
    rows = [
        (1, _pgm(img)),
        (2, _pgm(np.asarray(resized64))),
        (3, _pgm(np.asarray(resized48))),
        (4, _pgm(noise)),
        (5, b"not an image"),
    ]
    df = spark.createDataFrame(rows, "id long, content binary")
    out = {
        r["id"]: r["keep"]
        for r in image_dedup_keep_list(
            df, "content", "id", decoder="netpbm", max_hamming=7
        ).collect()
    }
    assert out == {1: True, 2: False, 3: False, 4: True, 5: True}


def test_banded_hamming_pairs_guard(spark):
    """bits/band_bits <= max_hamming cannot guarantee recall -> refused."""
    from pandas_profiling_personal_spark.operators.dedup import (
        banded_hamming_pairs,
    )

    sig = spark.createDataFrame([(1, 5)], "id long, sig long")
    with pytest.raises(ValueError, match="pigeonhole"):
        banded_hamming_pairs(sig, "id", "sig", 64, 32, 3)


@pytest.mark.skipif(
    not __import__(
        "pandas_profiling_personal_spark.operators.multimodal",
        fromlist=["_pil_available"],
    )._pil_available(),
    reason="Pillow not installed in this environment",
)
def test_media_metadata_real_decoder_pil(spark):
    """Real-tier decode: a valid 1x1 PNG produced by PIL itself must come back
    with exact dimensions and truncated=False."""
    import io

    from PIL import Image

    from pandas_profiling_personal_spark.operators.multimodal import media_metadata

    buf = io.BytesIO()
    Image.new("RGB", (3, 2)).save(buf, format="PNG")
    df = spark.createDataFrame(
        [(1, buf.getvalue())],
        T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("content", T.BinaryType()),
            ]
        ),
    )
    meta = media_metadata(df, "content", decoder="real").collect()[0]["meta"]
    assert meta["format"] == "png"
    assert (meta["width"], meta["height"]) == (3, 2)
    assert meta["truncated"] is False


def test_sample_frames(spark, media_df):
    from pandas_profiling_personal_spark.operators.multimodal import sample_frames

    out = sample_frames(media_df.where(F.col("content").isNotNull()),
                        "content", n_frames=3).collect()
    assert len(out) == 9  # 3 docs x 3 frames
    assert {r["frame"]["frame_index"] for r in out} == {0, 1, 2}


def test_streaming_profile_batch_equivalence(spark, tmp_path):
    """The streaming aggregation runs as a real stream (file source -> memory
    sink) and matches the same plan run in batch mode."""
    from pandas_profiling_personal_spark.streaming.profile_stream import (
        profile_stream,
    )

    rows = [
        (dt.datetime(2024, 1, 1, 0, i % 10, 0), float(i % 7), f"u{i % 3}")
        for i in range(100)
    ]
    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("user", T.StringType()),
        ]
    )
    src = tmp_path / "stream_src"
    spark.createDataFrame(rows, schema).write.parquet(str(src))

    batch = profile_stream(spark.read.parquet(str(src)), "ts", window="5 minutes")
    batch_rows = {
        (str(r["window"]), r["column"]): (r["count"], r["n_missing"], r["mean"])
        for r in batch.collect()
    }

    stream_df = spark.readStream.schema(schema).parquet(str(src))
    agg = profile_stream(stream_df, "ts", window="5 minutes")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("t_prof")
        .start()
    )
    try:
        q.processAllAvailable()
        stream_rows = {
            (str(r["window"]), r["column"]): (r["count"], r["n_missing"], r["mean"])
            for r in spark.table("t_prof").collect()
        }
    finally:
        q.stop()
    assert stream_rows == batch_rows
    assert len(stream_rows) == 4  # 2 windows x 2 columns


def test_streaming_minhash_matches_batch(spark):
    """The stateless per-row HOF signature must be bit-identical to the batch
    explode+groupBy MinHash (so stream and backfill dedup agree)."""
    from pandas_profiling_personal_spark.operators.dedup import minhash_signatures
    from pandas_profiling_personal_spark.streaming.dedup_stream import (
        signature_stream,
    )
    from pandas_profiling_personal_spark.sources.readers import read_parquet

    docs = read_parquet(spark, "/root/testdata/sf0.001/documents.parquet").limit(
        50
    )
    batch = {
        r["doc_id"]: [r[f"m{i}"] for i in range(8)]
        for r in minhash_signatures(docs, "doc_id", "text", num_hashes=8).collect()
    }
    stream_form = {
        r["doc_id"]: list(r["minhash"])
        for r in signature_stream(docs, "doc_id", "text", num_hashes=8).collect()
    }
    assert batch == stream_form and len(batch) == 50


def test_streaming_exact_dedup_first_seen_wins(spark, tmp_path):
    """exact_dedup_stream on a real file stream: duplicates (by normalized
    text) collapse to one kept row across micro-batches."""
    from pandas_profiling_personal_spark.streaming.dedup_stream import (
        exact_dedup_stream,
    )

    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    batch1 = [
        (t0, 1, "alpha beta gamma"),
        (t0, 2, "  ALPHA   beta GAMMA "),  # dup of 1 after normalization
        (t0, 3, "something else entirely"),
    ]
    batch2 = [
        (t0 + dt.timedelta(minutes=1), 4, "alpha beta gamma"),  # dup of 1
        (t0 + dt.timedelta(minutes=1), 5, "fresh content here"),
    ]
    src = tmp_path / "dedup_src"
    spark.createDataFrame(batch1, schema).write.parquet(str(src))
    spark.createDataFrame(batch2, schema).write.mode("append").parquet(str(src))

    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(src))
    out = exact_dedup_stream(stream, "text", ts_col="ts", watermark="1 hour")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_dedup")
        .start()
    )
    try:
        q.processAllAvailable()
        kept = {r["doc_id"] for r in spark.table("t_dedup").collect()}
    finally:
        q.stop()
    # one representative for the alpha-beta-gamma group, plus the two uniques
    assert len(kept) == 3
    assert 3 in kept and 5 in kept and len(kept & {1, 2, 4}) == 1

    # batch fallback path: same semantics without a stream/state store
    allrows = spark.createDataFrame(batch1 + batch2, schema)
    b = exact_dedup_stream(allrows, "text")
    assert b.count() == 3


def test_streaming_exact_dedup_vs_store(spark, tmp_path):
    """exact_dedup_stream_vs_store: a persisted fingerprint store
    suppresses historical duplicates via a stream-static anti join, the
    watermarked dedup handles within-stream duplicates, and the kept set
    matches the batch incremental operator over the same split."""
    import datetime as dt

    from pandas_profiling_personal_spark.operators.dedup import (
        dedup_store_update,
        incremental_exact_dedup,
    )
    from pandas_profiling_personal_spark.streaming.dedup_stream import (
        exact_dedup_stream_vs_store,
    )

    hist = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "old news item"), (3, None)],
        "doc_id bigint, text string",
    )
    store = dedup_store_update(None, incremental_exact_dedup(hist, None))

    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    t0 = dt.datetime(2024, 1, 2, 0, 0, 0)
    rows = [
        (t0, 10, "  ALPHA   beta GAMMA "),   # dup of history 1
        (t0, 11, "brand new document"),      # kept
        (t0, 12, "brand new document"),      # within-stream dup of 11
        (t0, 13, None),                      # null text — history 3 kept it
        (t0, 14, "old news item"),           # dup of history 2
    ]
    src = tmp_path / "store_dedup_src"
    spark.createDataFrame(rows, schema).write.parquet(str(src))
    stream = spark.readStream.schema(schema).parquet(str(src))
    out = exact_dedup_stream_vs_store(
        stream, "text", store, ts_col="ts", watermark="1 hour"
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_store_dedup")
        .start()
    )
    try:
        q.processAllAvailable()
        kept = {r["doc_id"] for r in spark.table("t_store_dedup").collect()}
    finally:
        q.stop()
    assert kept & {11, 12} and len(kept & {11, 12}) == 1
    assert kept.isdisjoint({10, 13, 14})

    # batch equivalence: same split through the incremental operator
    new_docs = spark.createDataFrame(
        [(r[1], r[2]) for r in rows], "doc_id bigint, text string"
    )
    batch_kept = {
        r["doc_id"]
        for r in incremental_exact_dedup(new_docs, store).collect()
        if r["keep"]
    }
    assert batch_kept == {11}  # min-id wins in batch; stream keeps first-seen


def test_streaming_near_dup_vs_store(spark, tmp_path):
    """near_dup_stream_vs_store: a persisted SIGNATURE store suppresses
    historical near-duplicates (not just exact copies) via banded
    stream-static anti joins, and the surviving set matches the batch
    incremental operator's history-suppression decisions."""
    from pandas_profiling_personal_spark.operators.dedup import (
        incremental_minhash_dedup,
    )
    from pandas_profiling_personal_spark.streaming.dedup_stream import (
        near_dup_stream_vs_store,
    )

    base = (
        "the quick brown fox jumps over the lazy dog and then runs "
        "far away into the deep green forest tonight"
    )
    other = (
        "completely different words about astronomy telescopes and "
        "planetary orbits circling distant binary stars quietly"
    )
    hist = spark.createDataFrame(
        [(1, base), (2, other)], "doc_id bigint, text string"
    )
    kw = dict(num_hashes=16, bands=4, min_est_jaccard=0.7)
    store = incremental_minhash_dedup(hist, None, **kw).select(
        "doc_id", *[f"m{i}" for i in range(16)]
    )
    store_path = tmp_path / "sig_store"
    store.write.parquet(str(store_path))
    static_store = spark.read.parquet(str(store_path))

    rows = [
        (10, base + " again"),  # near-dup of history 1 -> suppressed
        (11, other),            # exact dup of history 2 -> suppressed
        (12, "unrelated content on medieval castle architecture and "
             "fortified stone walls built visibly high"),  # kept
        (13, None),             # no shingles: passes through (exact tier's job)
    ]
    src = tmp_path / "near_dup_src"
    schema = "doc_id bigint, text string"
    spark.createDataFrame(rows, schema).write.parquet(str(src))
    stream = spark.readStream.schema(
        "doc_id bigint, text string"
    ).parquet(str(src))
    out = near_dup_stream_vs_store(stream, static_store, "text", **kw)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_near_dup_store")
        .start()
    )
    try:
        q.processAllAvailable()
        kept = {r["doc_id"] for r in spark.table("t_near_dup_store").collect()}
    finally:
        q.stop()
    assert kept == {12, 13}

    # batch parity on the shingled docs: same keep/drop vs the store
    new_docs = spark.createDataFrame(rows, schema).where("text IS NOT NULL")
    batch = {
        r["doc_id"]: r["keep"]
        for r in incremental_minhash_dedup(new_docs, static_store, **kw).collect()
    }
    assert batch == {10: False, 11: False, 12: True}


def test_streaming_minhash_foreach_batch_equals_two_step(spark, tmp_path):
    """minhash_dedup_foreach_batch: micro-batches through the store
    round-trip reproduce the batch two-step run EXACTLY (same keep/dup_of,
    store grows by every signature), and a replayed micro-batch overwrites
    its own output instead of duplicating store rows."""
    from pandas_profiling_personal_spark.operators.dedup import (
        incremental_minhash_dedup,
    )
    from pandas_profiling_personal_spark.streaming.dedup_stream import (
        minhash_dedup_foreach_batch,
    )

    base = (
        "the quick brown fox jumps over the lazy dog and then runs "
        "far away into the deep green forest tonight"
    )
    nearA = base + " again"
    other = (
        "completely different words about astronomy telescopes and "
        "planetary orbits circling distant binary stars quietly"
    )
    shard_a = spark.createDataFrame(
        [(1, base), (2, nearA), (3, other)], "doc_id bigint, text string"
    )
    shard_b = spark.createDataFrame(
        [(10, base + " today"), (11, nearA),
         (12, "unrelated content on medieval castle architecture and "
              "fortified stone walls built visibly high")],
        "doc_id bigint, text string",
    )
    kw = dict(num_hashes=16, bands=4, min_est_jaccard=0.7)
    store_path = str(tmp_path / "fb_store")
    out_path = str(tmp_path / "fb_out")
    process = minhash_dedup_foreach_batch(store_path, out_path, **kw)
    process(shard_a, 0)
    # retried FIRST batch: the store read must filter out batch 0's own
    # failed-attempt signatures (review r7 — counting this batch's docs
    # twice inflates band buckets and can flip flags vs a clean run)
    process(shard_a, 0)
    process(shard_b, 1)
    process(shard_b, 1)  # retried micro-batch: overwrite, not duplicate

    got = {
        r["doc_id"]: (r["keep"], r["dup_of"])
        for r in spark.read.parquet(out_path).collect()
    }

    # reference: the batch two-step over the same shard split
    fa = incremental_minhash_dedup(shard_a, None, **kw)
    store = fa.select("doc_id", *[f"m{i}" for i in range(16)])
    fb = incremental_minhash_dedup(shard_b, store, **kw)
    want = {
        r["doc_id"]: (r["keep"], r["dup_of"])
        for r in fa.unionByName(fb).collect()
    }
    assert got == want
    assert not want[10][0] and want[10][1] == 1  # sanity: near-dup caught

    # store holds one signature row per document, kept or dropped
    assert spark.read.parquet(store_path).count() == 6


def test_html_json_serialize_roundtrip(spark, tmp_path):
    from pandas_profiling_personal_spark import ProfileConfig, profile
    from pandas_profiling_personal_spark.report import html as H
    from pandas_profiling_personal_spark.report import serialize as SER

    df = spark.createDataFrame(
        [(1, 2.0, "a"), (2, 3.0, "b"), (3, None, "a")], "k int, x double, s string"
    )
    cfg = ProfileConfig(exact=True)
    r = profile(df, cfg)

    page = H.render_html(r, title="T<est>")
    assert "T&lt;est&gt;" in page and "Variables" in page
    assert "data-chart='histogram'" in page
    out = tmp_path / "report.html"
    H.to_file(r, str(out))
    assert out.stat().st_size > 1000

    j = json.loads(r.to_json())
    assert j["table"]["n"] == 3 and "x" in j["variables"]

    fp = SER.df_fingerprint(df)
    blob = SER.dumps(r, cfg, fp)
    back = SER.loads(blob, fp)
    assert back["result"]["table"]["n"] == 3
    with pytest.raises(ValueError, match="fingerprint"):
        SER.loads(blob, "wrong")


def test_dataset_metadata_and_style_surface(spark, tmp_path):
    """Reference parity: dataset.{description,creator,author,url,copyright}
    + variables.descriptions render in the report and survive the JSON
    roundtrip (config_default.yaml:5-17, overview.py:73-114); the style
    knobs (primary_color / logo / navbar / full_width,
    config_default.yaml:172-194) reach the page."""
    from pandas_profiling_personal_spark import ProfileConfig, profile
    from pandas_profiling_personal_spark.report import html as H

    df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "k int, s string")
    cfg = ProfileConfig(
        exact=True,
        title="Ti<tle>",
        dataset_description="Synthetic <rows>",
        dataset_creator="QA",
        dataset_url="https://example.com/ds?a=1&b=2",
        dataset_copyright_holder="ACME",
        dataset_copyright_year="2026",
        variable_descriptions=(("k", "the key"), ("ghost", "gone")),
        html_primary_color="#aa0000",
        html_logo="data:image/png;base64,AAAA",
        html_full_width=True,
    )
    r = profile(df, cfg)
    meta = r.metadata
    assert meta["dataset"]["description"] == "Synthetic <rows>"
    assert meta["variable_descriptions"] == {"k": "the key", "ghost": "gone"}
    assert meta["unknown_variable_descriptions"] == ["ghost"]
    assert meta["style"]["primary_color"] == "#aa0000"

    page = H.render_html(r)  # title comes from metadata
    assert "Ti&lt;tle&gt;" in page
    assert "Synthetic &lt;rows&gt;" in page and "(c) ACME 2026" in page
    assert "https://example.com/ds?a=1&amp;b=2" in page
    assert "the key" in page and "data-section='dataset'" in page
    assert "#aa0000" in page and "img class='logo'" in page
    assert ".wrap{max-width:none}" in page
    assert H.render_html(r, title="Override")  # explicit arg still wins

    j = json.loads(r.to_json())
    assert j["metadata"]["dataset"]["creator"] == "QA"

    # navbar off drops the sticky nav; show_variable_description=False
    # drops captions but keeps the overview map
    r2 = profile(df, cfg.with_(html_navbar=False,
                               show_variable_description=False))
    page2 = H.render_html(r2)
    assert "data-section='nav'" not in page2
    assert "class='vardesc'" not in page2

    # from_dict accepts the reference's mapping shape
    c3 = ProfileConfig.from_dict(
        {"variable_descriptions": {"s": "text col"}, "title": "X"})
    assert c3.variable_descriptions == (("s", "text col"),)
    assert c3.title == "X"

    # dark theme (reference html.style.theme): inverted surfaces appended
    # after the base sheet; unknown themes refuse by name
    dark = profile(df, cfg.with_(html_theme="dark"))
    pd_ = H.render_html(dark)
    assert "background:#14181f" in pd_
    with pytest.raises(ValueError, match="unknown html theme"):
        H.render_html(profile(df, cfg.with_(html_theme="solarized")))


def test_report_sections_every_variable_type(spark):
    """VERDICT r2 #2: the report must carry the reference's full section
    structure (report/structure/report.py:229-314) — nav, overview, alerts,
    one marked section per variable with per-type detail tabs (histogram SVG,
    frequency table with Other/Missing rows, extreme-value tables), missing
    diagrams (bar SVG, heatmap, dendrogram), correlations, interactions,
    samples, duplicates."""
    import datetime as dt

    from pyspark.sql import types as T

    from pandas_profiling_personal_spark import ProfileConfig, profile
    from pandas_profiling_personal_spark.report import html as H

    schema = T.StructType(
        [
            T.StructField("num", T.DoubleType()),
            T.StructField("num2", T.DoubleType()),
            T.StructField("cat", T.StringType()),
            T.StructField("flag", T.BooleanType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("gappy", T.DoubleType()),
            T.StructField("gappy2", T.DoubleType()),
        ]
    )
    rows = []
    for i in range(40):
        rows.append(
            (
                float(i % 13),
                float((i * 7) % 11),
                f"v{i % 4}",
                i % 2 == 0,
                dt.datetime(2024, 1, 1) + dt.timedelta(hours=i),
                None if i % 3 == 0 else float(i),
                None if i % 4 == 0 else float(i * 2),
            )
        )
    rows.append(rows[0])  # a duplicate row for the duplicates section
    df = spark.createDataFrame(rows, schema)
    r = profile(
        df,
        ProfileConfig(
            exact=True,
            interactions=True,
            correlations=("pearson", "spearman"),
            samples_tail=5,
        ),
    )
    page = H.render_html(r, title="full surface")

    # nav + top-level sections
    for marker in (
        "data-section='nav'",
        "data-section='overview'",
        "data-section='alerts'",
        "data-section='variables'",
        "data-section='interactions'",
        "data-section='correlations'",
        "data-section='missing'",
        "data-section='sample'",
        "data-section='duplicates'",
    ):
        assert marker in page, marker
    # one marked section per variable, typed
    for name in ("num", "num2", "cat", "flag", "ts", "gappy", "gappy2"):
        assert f"id='var-{name}'" in page, name
    for vtype in ("Numeric", "Categorical", "Boolean", "DateTime"):
        assert f"data-var-type='{vtype}'" in page, vtype
    # per-type detail content
    assert "data-chart='histogram'" in page  # numeric + datetime histograms
    assert "data-table='frequency'" in page
    assert "data-table='extreme'" in page
    assert ">Minimum values<" in page and ">Maximum values<" in page
    assert "Other values" in page or "(Missing)" in page
    # missing diagrams
    assert "data-chart='missing-bar'" in page
    assert "data-table='dendrogram'" in page or "Heatmap" in page
    # interactions raster + correlation tabs
    assert "data-chart='scatter'" in page
    assert ">pearson<" in page and ">spearman<" in page
    # samples incl. the opt-in tail (K3)
    assert ">First rows<" in page and ">Random sample<" in page
    assert ">Last rows<" in page
    assert "tail" in r.sample and len(r.sample["tail"]) == 5


def test_notebook_iframe_embed(spark):
    """reference: profile_report.py:332-343 — the report embeds as an iframe
    whose srcdoc is the full escaped page (no CSS leakage)."""
    from pandas_profiling_personal_spark import ProfileConfig, profile
    from pandas_profiling_personal_spark.report.notebook import (
        iframe_html,
        to_notebook_iframe,
    )

    df = spark.createDataFrame([(1, "a"), (2, "b")], "k int, s string")
    r = profile(df, ProfileConfig(exact=True))
    frame = iframe_html(r, title="embed me", height="640px")
    assert frame.startswith("<iframe")
    assert "srcdoc=" in frame and "data-report='profile'" in frame
    assert "height='640px'" in frame
    # the page is escaped INTO the attribute — raw tags must not appear
    assert "<body>" not in frame and "&lt;body&gt;" in frame
    obj = to_notebook_iframe(r, title="embed me")
    # IPython may or may not be importable; both contracts hold the iframe
    payload = obj if isinstance(obj, str) else obj.data
    assert "srcdoc=" in payload


def test_widget_spec_and_to_widgets(spark):
    """to_widgets surface (reference profile_report.py:433-451): the spec
    tree carries every report section with per-column children; without
    ipywidgets the callable degrades to the iframe/HTML fallback, with it
    the tree materializes (exercised when the env has it)."""
    from pandas_profiling_personal_spark import (
        ProfileConfig,
        profile,
        to_widgets,
        widget_spec,
    )

    df = spark.createDataFrame(
        [(i % 4, f"s{i % 3}", None if i % 5 == 0 else float(i)) for i in range(60)],
        "a int, s string, x double",
    )
    r = profile(df, ProfileConfig(exact=True))
    spec = widget_spec(r, title="T")
    assert spec["type"] == "tab" and spec["title"] == "T"
    titles = [c["title"] for c in spec["children"]]
    assert titles[0] == "Overview"
    assert titles[1] == "Variables"
    assert any(t == "Missing" for t in titles)
    assert any(t == "Samples" for t in titles)
    assert any(t.startswith("Alerts") for t in titles)
    var_children = spec["children"][1]["children"]
    assert len(var_children) == 3
    assert {c["title"].split(" ")[0] for c in var_children} == {"a", "s", "x"}
    assert all("<table" in c["html"] for c in var_children)

    out = to_widgets(r)
    try:
        import ipywidgets

        assert isinstance(out, ipywidgets.Tab)
    except ImportError:
        # graceful fallback: iframe HTML (str) or IPython HTML object
        body = out if isinstance(out, str) else getattr(out, "data", "")
        assert "iframe" in body


def test_tail_sample_order_semantics(spark):
    """K3: tail returns the LAST n rows of the sorted frame."""
    from pandas_profiling_personal_spark.operators.sampling import tail

    df = spark.createDataFrame([(i,) for i in range(100)], "k int")
    rows = tail(df, 3, order_by=["k"])
    assert [r["k"] for r in rows] == [97, 98, 99]


def test_cli_end_to_end(tmp_path):
    """Drive the real CLI surface in a subprocess (its session lifecycle must not
    touch the shared test session) on a parquet file."""
    import subprocess
    import sys

    import pandas as pd

    src = tmp_path / "data.parquet"
    pd.DataFrame({"a": range(50), "b": [f"v{i % 5}" for i in range(50)]}).to_parquet(src)
    out = tmp_path / "report.html"
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "pandas_profiling_personal_spark.cli",
            str(src),
            str(out),
            "--minimal",
            "--master",
            "local[2]",
            "--title",
            "CLI Meta",
            "--description",
            "fifty rows",
            "--dataset-url",
            "https://example.com/src",
            "--var-description",
            "a=row index",
            "--primary-color",
            "#123456",
        ],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    status = json.loads(proc.stdout.strip().splitlines()[-1])
    assert status["n_rows"] == 50 and status["n_vars"] == 2
    assert out.stat().st_size > 500
    page = out.read_text(encoding="utf-8")
    assert "CLI Meta" in page and "fifty rows" in page
    assert "row index" in page and "#123456" in page


def test_read_binary_files(spark, tmp_path):
    from pandas_profiling_personal_spark.operators.multimodal import (
        media_metadata,
        read_binary_files,
    )

    (tmp_path / "a.jpg").write_bytes(b"\xff\xd8\xff" + b"x" * 50)
    (tmp_path / "b.png").write_bytes(b"\x89PNG\r\n" + b"y" * 30)
    (tmp_path / "c.txt").write_text("not media")
    df = read_binary_files(spark, str(tmp_path), glob="*.{jpg,png}")
    rows = df.collect()
    assert len(rows) == 2
    assert {r["length"] for r in rows} == {53, 36}
    meta = media_metadata(df, "content").select("path", "meta.format").collect()
    formats = {r["path"].rsplit("/", 1)[-1]: r["format"] for r in meta}
    assert formats == {"a.jpg": "jpeg", "b.png": "png"}


def test_file_stats_local_tier(spark, tmp_path):
    """A19 full tier: st_size/mtime/ctime/atime per path via mapInPandas,
    file: URIs stripped, unstattable paths -> null struct."""
    import os

    from pandas_profiling_personal_spark.operators.multimodal import (
        file_stats,
        read_binary_files,
    )

    p = tmp_path / "x.bin"
    p.write_bytes(b"z" * 77)
    df = read_binary_files(spark, str(tmp_path)).select("path")
    df = df.unionAll(spark.createDataFrame([("/no/such/file",)], ["path"]))
    rows = {r["path"]: r["file_stat"] for r in file_stats(df).collect()}
    st = os.stat(p)
    got = rows[[k for k in rows if k.endswith("x.bin")][0]]
    assert got["st_size"] == 77
    assert abs(got["st_mtime"] - st.st_mtime) < 2
    assert got["st_ctime"] is not None and got["st_atime"] is not None
    assert rows["/no/such/file"] is None


def test_file_stats_uri_encoded_path(spark, tmp_path):
    """ADVICE r3: a filename with spaces/# must still stat whether the
    binaryFile source emits it raw (Spark 4.1 behavior, measured) or
    percent-encoded (other Hadoop versions)."""
    from pandas_profiling_personal_spark.operators.multimodal import (
        file_stats,
        read_binary_files,
    )

    p = tmp_path / "has space #1.bin"
    p.write_bytes(b"q" * 11)
    df = read_binary_files(spark, str(tmp_path)).select("path")
    (row,) = file_stats(df).collect()
    assert "%20" in row["path"] or " " in row["path"]
    assert row["file_stat"] is not None
    assert row["file_stat"]["st_size"] == 11

    # percent-encoded form (what other Hadoop versions emit) also resolves
    from urllib.parse import quote

    enc = spark.createDataFrame([("file:" + quote(str(p)),)], ["path"])
    (row2,) = file_stats(enc).collect()
    assert row2["file_stat"] is not None
    assert row2["file_stat"]["st_size"] == 11

    # read_paths_bytes shares the stripping + percent-decode fallback: any
    # path that stats also READS (no stat-ok/read-null skew between tiers)
    from pandas_profiling_personal_spark.operators.multimodal import (
        read_paths_bytes,
    )

    for pdf in (df, enc):
        (rb,) = read_paths_bytes(pdf, "path").collect()
        assert rb["content"] == b"q" * 11, rb["path"]


def test_corpus_overlap_empty_side_null_contract(spark):
    """ADVICE r3: empty corpora must yield explicit NULL ratios, not an ANSI
    divide-by-zero throw."""
    from pandas_profiling_personal_spark.operators.dedup import corpus_overlap

    a = spark.createDataFrame([(1, "alpha beta")], "doc_id long, text string")
    empty = spark.createDataFrame([], "doc_id long, text string")
    row = corpus_overlap(empty, a, "text", unit="token").collect()[0]
    assert row["n_a"] == 0 and row["n_overlap"] == 0
    assert row["containment_a_in_b"] is None
    row2 = corpus_overlap(empty, empty, "text", unit="token").collect()[0]
    assert row2["jaccard"] is None and row2["containment_a_in_b"] is None


def _exif_jpeg_fixture() -> bytes:
    """Minimal-but-valid JPEG byte stream carrying an APP1 EXIF segment
    (IFD0: Make/Model/Orientation ASCII+SHORT entries, little-endian TIFF),
    built by hand from the public JPEG/TIFF container layout — no Pillow."""
    import struct

    def entry(tag, typ, cnt, value_bytes):
        return struct.pack("<HHI", tag, typ, cnt) + value_bytes.ljust(4, b"\0")

    make = b"TestCam\0"  # 8 bytes -> stored out-of-line
    model = b"X1\0"  # 3 bytes -> inline
    # TIFF block: header(8) + count(2) + 3*12 entries + next-IFD(4) = 50,
    # out-of-line Make data starts at offset 50
    tiff = (
        b"II*\x00" + struct.pack("<I", 8)  # little-endian, IFD0 at 8
        + struct.pack("<H", 3)
        + entry(0x010F, 2, len(make), struct.pack("<I", 50))  # Make, offset
        + entry(0x0110, 2, len(model), model)  # Model, inline
        + entry(0x0112, 3, 1, struct.pack("<H", 6))  # Orientation SHORT
        + struct.pack("<I", 0)  # no next IFD
        + make
    )
    app1_payload = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + struct.pack(">H", len(app1_payload) + 2) + app1_payload
    # SOI + APP1 + minimal scan + EOI (decoders need not accept the scan;
    # the EXIF walk stops at SOS anyway)
    return b"\xff\xd8" + app1 + b"\xff\xda\x00\x02\x00" + b"\xff\xd9"


def test_exif_extraction_and_profile(spark):
    """A20 EXIF tier (reference summary_helpers_image.py:84-107 +
    summary_helpers.py:208-237): per-object tag map and the distributed
    key-count/value-count aggregation, on a hand-crafted JPEG fixture via the
    pure-Python APP1 parser (Pillow absent in this env; with Pillow the PIL
    tier returns the same tags for this fixture)."""
    from pandas_profiling_personal_spark.operators.multimodal import (
        _parse_jpeg_exif,
        media_metadata,
        media_profile,
    )

    jpg = _exif_jpeg_fixture()
    assert _parse_jpeg_exif(jpg) == {
        "Make": "TestCam",
        "Model": "X1",
        "Orientation": "6",
    }
    assert _parse_jpeg_exif(b"\x89PNG not a jpeg") == {}

    rows = [(1, jpg), (2, jpg), (3, b"\x89PNG\r\n\x1a\nnope")]
    df = spark.createDataFrame(rows, "id long, blob binary")
    meta = media_metadata(df, "blob", decoder="fake", exif=True)
    got = {r["id"]: r["exif"] for r in meta.collect()}
    assert got[1]["Make"] == "TestCam" and got[1]["Orientation"] == "6"
    assert got[3] == {}
    # meta struct stable (oracle safety): existing fields in place, the r7
    # perceptual hashes appended AFTER them (additive only)
    assert [f.name for f in meta.schema["meta"].dataType.fields] == [
        "n_bytes", "format", "width", "height", "truncated", "content_hash",
        "phash", "dhash",
    ]

    prof = media_profile(df, "blob", exif=True)
    assert prof["exif_keys"] == {"Make": 2, "Model": 2, "Orientation": 2}
    assert prof["exif_values"]["Make"] == {"TestCam": 2}
    # exif=False keeps the legacy shape
    assert "exif_keys" not in media_profile(df, "blob")


def test_write_table_and_deduplicated(spark, tmp_path):
    """Sink round-trip: partitioned layout on disk, maxRecordsPerFile honored,
    and the deduplicated-corpus materialization keeps exactly the keep-list."""
    import os

    from pyspark.sql import functions as F

    from pandas_profiling_personal_spark.operators import dedup as DD
    from pandas_profiling_personal_spark.sources.readers import read_parquet
    from pandas_profiling_personal_spark.sources import writers as W

    docs = read_parquet(spark, "/root/testdata/sf0.001/documents.parquet")
    n = docs.count()

    out = str(tmp_path / "by_lang")
    flagged = docs.withColumn("bucket", (F.col("doc_id") % 3).cast("int"))
    W.write_table(
        flagged,
        out,
        partition_by=["bucket"],
        sort_within_partitions=["doc_id"],
        target_file_rows=50,
    )
    assert sorted(
        d for d in os.listdir(out) if d.startswith("bucket=")
    ) == ["bucket=0", "bucket=1", "bucket=2"]
    back = spark.read.parquet(out)
    assert back.count() == n
    # maxRecordsPerFile: no parquet file holds more than 50 rows
    per_file = back.groupBy(F.input_file_name()).count().agg(F.max("count")).first()[0]
    assert per_file <= 50

    pairs = DD.jaccard_similarity(
        docs, "doc_id", "text", 3, min_jaccard=0.1, max_shingle_df=None
    )
    keep = DD.dedup_keep_list(docs, pairs, "doc_id")
    dedup_out = str(tmp_path / "deduped")
    W.write_deduplicated(docs, keep, "doc_id", dedup_out)
    kept_ids = {
        r["doc_id"] for r in spark.read.parquet(dedup_out).select("doc_id").collect()
    }
    expected = {r["doc_id"] for r in keep.where(F.col("keep")).collect()}
    assert kept_ids == expected and len(kept_ids) < n

    try:
        W.write_table(docs, str(tmp_path / "x"), fmt="avro")
        raise AssertionError("expected ValueError for unsupported format")
    except ValueError:
        pass


def test_write_training_shards_deterministic(spark, tmp_path):
    """Training-export sink: exactly n_shards shard directories, shard
    membership and within-shard order pure functions of md5(key) — two
    writes produce identical shards regardless of input partitioning."""
    import os

    from pyspark.sql import functions as F

    from pandas_profiling_personal_spark.sources.readers import read_parquet
    from pandas_profiling_personal_spark.sources import writers as W

    docs = read_parquet(spark, "/root/testdata/sf0.001/documents.parquet")
    out_a = str(tmp_path / "shards_a")
    out_b = str(tmp_path / "shards_b")
    W.write_training_shards(docs, out_a, key="doc_id", n_shards=5)
    # different input layout, same deterministic output
    W.write_training_shards(
        docs.repartition(13).sortWithinPartitions("lang"),
        out_b, key="doc_id", n_shards=5,
    )
    assert sorted(
        d for d in os.listdir(out_a) if d.startswith("__shard=")
    ) == [f"__shard={i}" for i in range(5)]

    def snapshot(path):
        back = spark.read.parquet(path)
        rows = back.select(
            "__shard", F.input_file_name().alias("f"), "doc_id"
        ).collect()
        by_shard = {}
        for r in rows:
            by_shard.setdefault(r["__shard"], []).append(r["doc_id"])
        files_per_shard = {
            s: len({r["f"] for r in rows if r["__shard"] == s})
            for s in by_shard
        }
        return by_shard, files_per_shard

    shards_a, files_a = snapshot(out_a)
    shards_b, _ = snapshot(out_b)
    assert shards_a == shards_b  # identical membership AND order
    assert all(nf == 1 for nf in files_a.values())  # one file per shard
    assert sum(len(v) for v in shards_a.values()) == docs.count()
    # the global shuffle actually decorrelates: no shard is a doc_id run
    assert any(
        v != sorted(v) for v in shards_a.values()
    ), "shards are in ingestion order — not shuffled"


def test_streaming_quality_filter_matches_batch(spark, tmp_path):
    """quality_filter is a pure codegen'd projection, so it runs UNCHANGED on
    an unbounded stream — same rows, same keep flags, same typed reject
    reasons as the batch run over identical data. This pins that property
    (no aggregate/sort sneaks into the operator and silently breaks
    stream-validity)."""
    import pyspark.sql.types as T

    from pandas_profiling_personal_spark.operators.text import quality_filter

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    src = tmp_path / "qf_src"
    docs.write.parquet(str(src))

    batch = {
        (r["doc_id"], r["keep"], tuple(r["reject_reasons"]))
        for r in quality_filter(docs, "text", "doc_id").select(
            "doc_id", "keep", "reject_reasons"
        ).collect()
    }
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    out = quality_filter(stream, "text", "doc_id").select(
        "doc_id", "keep", "reject_reasons"
    )
    assert out.isStreaming
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_qf")
        .start()
    )
    try:
        q.processAllAvailable()
        streamed = {
            (r["doc_id"], r["keep"], tuple(r["reject_reasons"]))
            for r in spark.table("t_qf").collect()
        }
    finally:
        q.stop()
    assert streamed == batch and batch


def test_streaming_apply_mixture_matches_batch(spark, tmp_path):
    """apply_mixture is a stream-static left join (broadcast plan) plus a
    deterministic md5 copy-count — it must run UNCHANGED on an unbounded
    corpus stream and keep exactly the rows (and epochs) the batch run
    keeps. This is the shape a continuous-ingest mixture would use: plan
    recomputed periodically in batch, applied to the stream."""
    from pandas_profiling_personal_spark.operators.mixture import (
        apply_mixture,
        mixture_plan,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    targets = {"en": 0.5, "zh": 0.2, "fr": 0.2, "de": 0.1}
    plan = mixture_plan(docs, "lang", targets, "n_chars", max_repeats=2.0)

    batch = {
        (r["doc_id"], r["epoch"])
        for r in apply_mixture(docs, plan, "lang", "doc_id")
        .select("doc_id", "epoch")
        .collect()
    }
    src = tmp_path / "mix_src"
    docs.write.parquet(str(src))
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    out = apply_mixture(stream, plan, "lang", "doc_id").select(
        "doc_id", "epoch"
    )
    assert out.isStreaming
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_mix")
        .start()
    )
    try:
        q.processAllAvailable()
        streamed = {
            (r["doc_id"], r["epoch"])
            for r in spark.table("t_mix").collect()
        }
    finally:
        q.stop()
    assert streamed == batch and batch
    assert any(e > 1 for _, e in batch)  # upsampling epochs survive the stream


def test_to_app_headless_fallback(spark, tmp_path):
    """to_app without PyQt5 (this container) must still produce a usable
    artifact: a written HTML file whose path is returned; no browser launch
    in headless mode."""
    import os

    from pandas_profiling_personal_spark import ProfileConfig, profile
    from pandas_profiling_personal_spark.report.notebook import to_app

    df = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    r = profile(df, ProfileConfig(exact=True, correlations=()))
    path = to_app(r, open_browser=False)
    assert os.path.exists(path) and path.endswith(".html")
    content = open(path).read()
    assert "<html" in content and "n_name" in content
    os.unlink(path)


def test_profile_report_attach(spark):
    """Opt-in DataFrame.profile_report() attach (reference monkey-patches
    pandas at import, controller/pandas_decorator.py:1-20; here it is an
    explicit attach()/detach() pair): kwargs are config-field overrides,
    unknown keys raise the reference's error, config= + kwargs is rejected,
    and the result round-trips to JSON."""
    from pyspark.sql import DataFrame

    from pandas_profiling_personal_spark import ProfileConfig, attach, detach

    assert not hasattr(DataFrame, "profile_report")
    attach()
    attach()  # idempotent
    try:
        df = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
        r = df.profile_report(preset="minimal", correlations=())
        d = json.loads(r.to_json())
        assert {"n_nationkey", "n_name", "n_regionkey"} <= set(d["variables"])
        # ready-made config object still accepted
        r2 = df.profile_report(config=ProfileConfig(exact=True, correlations=()))
        assert r2.table["n"] == r.table["n"] == 25

        with pytest.raises(ValueError, match="do not exist"):
            df.profile_report(not_a_real_option=1)
        with pytest.raises(ValueError, match="not both"):
            df.profile_report(config=ProfileConfig(), preset="minimal")
    finally:
        detach()
    assert not hasattr(DataFrame, "profile_report")


def test_file_image_path_refinement(spark, tmp_path):
    """Explorative profile() refines a string column of existing image paths
    path -> file -> image (reference typeset.py:129-183): existence check on
    the already-fetched top-K sample, then one executor-side stat pass
    (file_stats) and one bounded header-read pass (image_stats); both render
    as tabs in the HTML report."""
    from pandas_profiling_personal_spark import EXPLORATIVE, profile
    from pandas_profiling_personal_spark.report.html import render_html

    png_magic = b"\x89PNG\r\n\x1a\n" + b"\x00" * 24
    paths = []
    for i in range(6):
        p = tmp_path / f"img_{i}.png"
        p.write_bytes(png_magic + bytes([i]) * (10 + i))
        paths.append(str(p))
    df = spark.createDataFrame([(p,) for p in paths], "img_path string")

    r = profile(df, EXPLORATIVE.with_(correlations=(), duplicates=False))
    v = r.variables["img_path"]
    assert v["type_refined"] == "image"
    assert v["file_stats"]["n_paths"] == 6
    assert v["file_stats"]["n_existing"] == 6
    assert v["file_stats"]["min_size"] == 42  # 32 magic + 10 payload
    assert v["image_stats"]["n_decoded"] == 6
    assert v["image_stats"]["format_dist"] == {"png": 6}
    page = render_html(r)
    assert ">File<" in page and ">Image<" in page

    # non-existing paths stay plain "path" (no stat pass triggered)
    df2 = spark.createDataFrame(
        [(f"/no/such/dir/f_{i}.txt",) for i in range(6)], "p string"
    )
    r2 = profile(df2, EXPLORATIVE.with_(correlations=(), duplicates=False))
    v2 = r2.variables["p"]
    assert v2["type_refined"] == "path"
    assert "file_stats" not in v2


def test_segment_by_profile_surface(spark):
    """segment_by= renders a per-segment tier: top-N segments by count,
    per-segment numeric summaries and categorical top-K, bounded and
    json/HTML-round-trippable; redact suppresses it (labels are values)."""
    from pandas_profiling_personal_spark import ProfileConfig, profile
    from pandas_profiling_personal_spark.report.html import render_html
    from pandas_profiling_personal_spark.sources.readers import read_parquet

    docs = read_parquet(spark, "/root/testdata/sf0.001/documents.parquet")
    cfg = ProfileConfig(
        correlations=(), duplicates=False, segment_by="lang", segment_top_n=3
    )
    r = profile(docs, cfg)
    seg = r.segments
    assert seg["by"] == "lang"
    assert 1 <= len(seg["segments"]) <= 3
    assert "en" in seg["segments"]  # dominant language in the testdata
    summary_groups = {row["group"] for row in seg["summary"]}
    assert summary_groups <= set(seg["segments"])
    assert {row["column"] for row in seg["summary"]} >= {"n_chars"}
    # top-K bounded: rank <= 5 per (group, column)
    assert all(row["rank"] <= 5 for row in seg.get("top_values", []))
    page = render_html(r)
    assert "Segments" in page and "by lang" in page
    json.loads(r.to_json())

    # unknown column is a loud error, not a silent no-op
    with pytest.raises(ValueError, match="segment_by"):
        profile(docs, ProfileConfig(correlations=(), segment_by="nope"))

    # redact: no segment surface
    r2 = profile(
        docs,
        ProfileConfig(
            correlations=(), duplicates=False, segment_by="lang", redact=True
        ),
    )
    assert r2.segments == {}


def test_compare_profiles_surface(spark):
    """compare_profiles diffs two snapshots driver-side: table deltas,
    added/removed/type-changed columns, per-variable field diffs with
    relative deltas, alert new/resolved sets; renders standalone HTML."""
    from pandas_profiling_personal_spark import (
        ProfileConfig,
        compare_profiles,
        comparison_to_html,
        profile,
    )
    from pandas_profiling_personal_spark.sources.readers import read_parquet

    cfg = ProfileConfig(exact=True, correlations=(), duplicates=False)
    li = read_parquet(spark, "/root/testdata/sf0.001/lineitem.parquet")
    a = profile(li, cfg)
    b = profile(
        li.where(F.col("l_quantity") > 10).drop("l_comment", "l_tax")
        .withColumn("new_col", F.lit("x")),
        cfg,
    )
    cmp = compare_profiles(a, b, labels=("r1", "r2"))
    assert cmp["table"]["n"]["delta"] < 0          # candidate filtered rows
    assert "new_col" in cmp["variables"]["added"]
    assert "l_tax" in cmp["variables"]["removed"]
    # the filter shifts l_quantity's mean up; diff captured with rel delta
    q = cmp["variables"]["changed"]["l_quantity"]
    assert q["mean"]["delta"] > 0 and q["mean"]["rel"] > 0
    page = comparison_to_html(cmp, title="r1 vs r2")
    assert "r1 vs r2" in page and "l_quantity" in page and "new_col" in page

    # self-comparison is empty-ish: no added/removed/changed, no alert delta
    same = compare_profiles(a, a)
    assert not same["variables"]["added"]
    assert not same["variables"]["removed"]
    assert not same["variables"]["changed"]
    assert not same["alerts"]["new"] and not same["alerts"]["resolved"]


def test_streaming_embedding_drift(spark, tmp_path):
    """embedding_drift_stream: per-window norm-PSI + centroid cosine vs a
    static baseline on a real file stream — the matching window reads ~0
    PSI / cosine ~1, the scaled+shifted window reads large PSI and lower
    cosine; batch mode produces identical rows for the same data."""
    import datetime as dt
    import random

    from pandas_profiling_personal_spark.streaming.drift_stream import (
        embedding_drift_stream,
    )

    rng = random.Random(13)
    base_vecs = [[rng.gauss(0, 1) for _ in range(8)] for _ in range(600)]
    baseline = spark.createDataFrame(
        [(v,) for v in base_vecs], "v array<double>"
    )

    t0 = dt.datetime(2024, 3, 1, 0, 0, 0)
    t1 = t0 + dt.timedelta(minutes=10)
    rows = (
        # window 1: drawn like the baseline
        [(t0, [rng.gauss(0, 1) for _ in range(8)]) for _ in range(300)]
        # window 2: scaled + shifted — norm AND direction move
        + [
            (t1, [x * 1.8 + 1.0 for x in [rng.gauss(0, 1) for _ in range(8)]])
            for _ in range(300)
        ]
        + [(t0, None), (t0, [1.0, 2.0])]  # invalid: excluded
    )
    schema = "ts timestamp, v array<double>"
    src = tmp_path / "emb_drift_src"
    spark.createDataFrame(rows, schema).write.parquet(str(src))

    stream = spark.readStream.schema(schema).parquet(str(src))
    out = embedding_drift_stream(
        stream, baseline, "v", "ts", window="5 minutes", watermark="1 hour"
    )
    # complete mode for the finite test source: append only emits once the
    # watermark passes a window's end, which never happens after the last
    # micro-batch of a bounded test stream
    q = (
        out.writeStream.outputMode("complete")
        .format("memory")
        .queryName("t_emb_drift")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r["window"]["start"]: r
            for r in spark.table("t_emb_drift").collect()
        }
    finally:
        q.stop()
    assert got[t0]["n"] == 300 and got[t1]["n"] == 300
    assert abs(got[t0]["norm_psi"]) < 0.15, got[t0]
    # (no cosine assertion for the matching window: both its mean and the
    # baseline mean are near-zero random vectors, so the angle is noise)
    assert got[t1]["norm_psi"] > 1.0, got[t1]
    assert got[t1]["centroid_cosine"] is not None

    # batch mode: identical plan minus the watermark -> identical rows
    batch = {
        r["window"]["start"]: r
        for r in embedding_drift_stream(
            spark.read.parquet(str(src)), baseline, "v", "ts",
            window="5 minutes",
        ).collect()
    }
    assert {k: (v["n"], v["norm_psi"], v["centroid_cosine"])
            for k, v in got.items()} == \
           {k: (v["n"], v["norm_psi"], v["centroid_cosine"])
            for k, v in batch.items()}


def test_streaming_drift_psi(spark, tmp_path):
    """drift_stream: per-window PSI vs a static baseline runs as a real
    stream (file source -> memory sink, append mode — ONE stateful op) and
    matches the identical plan in batch mode; a window drawn from the
    baseline distribution reads ~0, a shifted window reads large."""
    import random

    from pandas_profiling_personal_spark.streaming.drift_stream import (
        drift_stream,
    )

    rng = random.Random(5)
    baseline = spark.createDataFrame(
        [(rng.gauss(0, 1), rng.uniform(0, 10)) for _ in range(4000)],
        "x double, u double",
    )
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    # window 1: same distribution as baseline; window 2: x shifted +2
    rows = [
        (t0 + dt.timedelta(seconds=i % 240), rng.gauss(0, 1), rng.uniform(0, 10))
        for i in range(2000)
    ] + [
        (
            t0 + dt.timedelta(minutes=10, seconds=i % 240),
            rng.gauss(2, 1),
            rng.uniform(0, 10),
        )
        for i in range(2000)
    ]
    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("x", T.DoubleType()),
            T.StructField("u", T.DoubleType()),
        ]
    )
    src = tmp_path / "drift_src"
    spark.createDataFrame(rows, schema).write.parquet(str(src))

    batch = {
        (str(r["window"]["start"]), r["column"]): (r["n"], r["psi"])
        for r in drift_stream(
            spark.read.parquet(str(src)), baseline, ["x", "u"], "ts",
            window="5 minutes",
        ).collect()
    }

    stream = spark.readStream.schema(schema).parquet(str(src))
    out = drift_stream(stream, baseline, ["x", "u"], "ts", window="5 minutes")
    assert out.isStreaming
    # complete mode for the finite test source: append only emits once the
    # watermark passes a window's end, which never happens after the last
    # micro-batch of a bounded test stream
    q = (
        out.writeStream.outputMode("complete")
        .format("memory")
        .queryName("t_drift")
        .start()
    )
    try:
        q.processAllAvailable()
        streamed = {
            (str(r["window"]["start"]), r["column"]): (r["n"], r["psi"])
            for r in spark.table("t_drift").collect()
        }
    finally:
        q.stop()
    assert streamed == batch and len(batch) == 4  # 2 windows x 2 columns

    by_col = {}
    for (w, c), (n, psi) in batch.items():
        by_col.setdefault(c, []).append((w, psi))
    x_psis = [p for _, p in sorted(by_col["x"])]
    u_psis = [p for _, p in sorted(by_col["u"])]
    assert x_psis[0] < 0.05 and x_psis[1] > 0.5, x_psis  # shift detected
    assert all(p < 0.05 for p in u_psis), u_psis          # no false alarm

    # all-null baseline column: loud error
    import pytest as _pytest

    null_base = spark.createDataFrame([(None,)] * 5, "x double")
    with _pytest.raises(ValueError, match="all-null"):
        drift_stream(
            spark.read.parquet(str(src)), null_base, ["x"], "ts"
        )

    # a window in which a monitored column goes entirely null still emits an
    # explicit (window, column, n=0, psi=null) row — a monitor keyed on
    # (window, column) sees the break, not a silent gap (same plan batch and
    # streaming, so the batch run pins the contract)
    gap_rows = [(t0, 0.5, 1.0)] * 5 + [
        (t0 + dt.timedelta(minutes=10), 0.5, None)
    ] * 5
    gap = drift_stream(
        spark.createDataFrame(gap_rows, schema), baseline, ["x", "u"], "ts",
        window="5 minutes",
    ).collect()
    assert len(gap) == 4  # 2 windows x 2 columns, no dropped group
    broken = [
        r for r in gap
        if r["column"] == "u" and r["window"]["start"].minute == 10
    ]
    assert len(broken) == 1
    assert broken[0]["n"] == 0 and broken[0]["psi"] is None


def test_cli_compare_and_segment(tmp_path):
    """CLI --compare writes a comparison report between two inputs;
    --segment-by feeds the per-segment tier (subprocess, real session)."""
    import subprocess
    import sys

    import pandas as pd

    a = tmp_path / "a.parquet"
    b = tmp_path / "b.parquet"
    pd.DataFrame(
        {"x": range(60), "seg": [f"s{i % 3}" for i in range(60)]}
    ).to_parquet(a)
    pd.DataFrame(
        {"x": range(100, 130), "seg": ["s0"] * 30, "extra": [1.0] * 30}
    ).to_parquet(b)
    out = tmp_path / "cmp.html"
    proc = subprocess.run(
        [
            sys.executable, "-m", "pandas_profiling_personal_spark.cli",
            str(a), str(out),
            "--minimal", "--compare", str(b), "--segment-by", "seg",
            "--master", "local[2]",
        ],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    status = json.loads(proc.stdout.strip().splitlines()[-1])
    assert status["added"] == ["extra"]
    assert status["changed"] >= 1  # x's range moved
    page = out.read_text()
    assert "extra" in page and "Changed variables" in page


def test_streaming_sessionize_stateful(spark, tmp_path):
    """sessionize_stream: custom stateful operator (applyInPandasWithState).
    Closed sessions from a real stream match the batch lag+cumsum
    sessionizer exactly; open sessions close via event-time timeout once
    the watermark passes their gap horizon."""
    from pandas_profiling_personal_spark.operators.sessions import sessionize
    from pandas_profiling_personal_spark.streaming.session_stream import (
        sessionize_stream,
    )

    t0 = dt.datetime(2024, 3, 1, 12, 0, 0)

    def ev(user, minutes):
        return (user, t0 + dt.timedelta(minutes=minutes))

    # user a: sessions {0,5,10}, {60,62}, {240} / user b: {0}, {100,105}
    early = [
        ev("a", 0), ev("a", 5), ev("a", 10),
        ev("a", 60), ev("a", 62),
        ev("b", 0), ev("b", 100), ev("b", 105),
        ("a", None),  # null timestamp: ignored, never a year-1677 session
    ]
    late = [ev("a", 240), ev("b", 600)]  # far future: advances the watermark
    schema = T.StructType(
        [
            T.StructField("user_id", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    src = tmp_path / "sess_src"
    spark.createDataFrame(early, schema).coalesce(1).write.parquet(str(src))
    spark.createDataFrame(late, schema).coalesce(1).write.mode("append").parquet(
        str(src)
    )

    # batch reference: per-(user, session) spans from the window sessionizer
    # (null-ts rows excluded — they are non-events by the operator contract)
    batch_df = sessionize(
        spark.read.parquet(str(src)).where(F.col("ts").isNotNull()),
        "user_id", "ts", gap_minutes=30,
    )
    rows = batch_df.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("s"), F.max("ts").alias("e"),
        F.count(F.lit(1)).alias("n"),
    ).collect()
    batch_sessions = {
        (r["user_id"], r["s"], r["e"], r["n"]) for r in rows
    }

    # bounded batch mode of the SAME operator: closed sessions only (each
    # user's final session stays in state — no timeout clock in batch)
    closed = {
        (r["user_key"], r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize_stream(
            spark.read.parquet(str(src)), "user_id", "ts", gap_minutes=30
        ).collect()
    }
    last_per_user = {
        u: max(s for s in batch_sessions if s[0] == u) for u in ("a", "b")
    }
    assert closed == batch_sessions - set(last_per_user.values())

    # real stream, one file per micro-batch: the late file advances the
    # watermark past every earlier session's gap horizon, so the event-time
    # TIMEOUT closes them — everything but the final per-user sessions emits
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = sessionize_stream(stream, "user_id", "ts", gap_minutes=30,
                            watermark="0 seconds")
    assert out.isStreaming
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_sessions")
        .start()
    )
    try:
        q.processAllAvailable()
        streamed = {
            (r["user_key"], r["session_start"], r["session_end"],
             r["n_events"])
            for r in spark.table("t_sessions").collect()
        }
    finally:
        q.stop()
    # every closed session matches the batch sessionizer byte-for-byte.
    # user a's final session (16:00) closes via the EVENT-TIME TIMEOUT —
    # user b's 22:00 event pushes the watermark past a's 16:30 gap horizon
    # — while b's own final session stays open (nothing ever advances the
    # watermark past it): the state store self-reaps, the last key waits.
    assert streamed == batch_sessions - {last_per_user["b"]}
    assert last_per_user["a"] in streamed


def test_session_stream_utc_timeout_conversion():
    """The event-time timeout must be UTC epoch ms regardless of the Spark
    session timezone (Arrow hands the kernel session-LOCAL naive
    timestamps; feeding them to setTimeoutTimestamp directly would shift
    the timeout by the UTC offset and west-of-UTC zones would set
    timeouts below the watermark, killing the query)."""
    import pandas as pd

    from pandas_profiling_personal_spark.streaming.session_stream import (
        _utc_timeout_ms,
    )

    # 2024-03-01 12:00:00 session-local, gap 30 min
    local_us = int(pd.Timestamp("2024-03-01 12:00:00").value) // 1000
    gap_ms = 30 * 60 * 1000
    utc = _utc_timeout_ms(local_us, "UTC", gap_ms)
    la = _utc_timeout_ms(local_us, "America/Los_Angeles", gap_ms)
    tokyo = _utc_timeout_ms(local_us, "Asia/Tokyo", gap_ms)
    assert la - utc == 8 * 3600 * 1000    # LA noon is 8h later in UTC (PST)
    assert utc - tokyo == 9 * 3600 * 1000  # Tokyo noon is 9h earlier
    assert utc == local_us // 1000 + gap_ms


def test_cli_prepare_corpus(tmp_path):
    """CLI --prepare-corpus: funnel counts on stdout, surviving corpus (or
    chunk shards) written to the output dir (subprocess, real session)."""
    import subprocess
    import sys

    import pandas as pd

    good = (
        "The quick brown fox jumps over the lazy dog every single day.\n"
        "It is a fine dog and the fox is in the house with you and it."
    )
    near = good + " Extra tail words here."
    src = tmp_path / "docs.parquet"
    pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [good, good, "short.", None, near],
            "source": ["w", "w2", "w", "w", "w"],
        }
    ).to_parquet(src)
    outdir = tmp_path / "clean"
    proc = subprocess.run(
        [
            sys.executable, "-m", "pandas_profiling_personal_spark.cli",
            str(src), "--prepare-corpus", str(outdir),
            "--chunk", "8", "--overlap", "2", "--shards", "2",
            "--near-dup-jaccard", "0.5",
            "--master", "local[2]",
        ],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    status = json.loads(proc.stdout.strip().splitlines()[-1])
    assert status["n_docs"] == 5
    assert status["n_pass_dedup"] == 2   # doc 2 deduped, 3/4 rejected
    assert status["n_pass_near_dup"] == 1  # doc 5 near-dups doc 1
    # shard layout on disk with chunk rows inside
    import glob

    shard_dirs = sorted(glob.glob(str(outdir / "__shard=*")))
    assert len(shard_dirs) == 2
    import pandas as pd2

    chunks = pd.concat(
        [pd2.read_parquet(p) for p in shard_dirs], ignore_index=True
    )
    assert set(chunks["id"]) == {1}
    assert (chunks["n_chunk_tokens"] <= 8).all()


def test_corpus_profile_report(spark, tmp_path):
    """corpus_profile: the one-call corpus report — language mix,
    quality/duplication/PII/repetition/packing — with a standalone HTML
    renderer. Values cross-checked against the underlying operators."""
    from pandas_profiling_personal_spark.plans.corpus import (
        corpus_profile,
        corpus_report_html,
    )
    from pandas_profiling_personal_spark.sources.readers import read_parquet

    docs = read_parquet(spark, "/root/testdata/sf0.001/documents.parquet")
    rep = corpus_profile(docs, "doc_id", "text", context_len=256)
    n = docs.count()
    assert rep["table"]["n_docs"] == n
    assert rep["table"]["n_null_docs"] == 0
    assert sum(m["n"] for m in rep["language_mix"].values()) == n
    assert abs(sum(m["share"] for m in rep["language_mix"].values()) - 1.0) < 0.01
    assert 0.0 <= rep["quality"]["mean"] <= 1.0
    assert rep["duplication"]["p_duplicates"] >= 0.0
    assert rep["pii"]["n_docs"] == n
    assert rep["packing"]["n_docs"] == n
    assert rep["packing"]["min_sequences"] <= rep["packing"]["naive_sequences"]
    # JSON-serializable end to end
    json.dumps(rep, default=str)

    page = corpus_report_html(rep, "docs corpus")
    out = tmp_path / "corpus.html"
    out.write_text(page)
    assert "Language mix" in page and "Duplication" in page
    assert "docs corpus" in page

    # a planted exact duplicate moves the duplication section
    import pandas as pd

    dup_df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": ["same text here ok", "same text here ok", "other"],
            }
        )
    )
    rep2 = corpus_profile(dup_df, "doc_id", "text")
    assert rep2["duplication"]["n_duplicate_docs"] == 1
    assert rep2["duplication"]["n_duplicate_groups"] == 1


def test_corpus_profile_segments(spark, tmp_path):
    """segment_by: per-segment docs/tokens/quality/duplication/language
    rollups — totals reconcile with the global sections, per-segment dup
    counts match a direct per-segment computation, truncation is loud."""
    from pandas_profiling_personal_spark.plans.corpus import (
        corpus_profile,
        corpus_report_html,
    )
    from pandas_profiling_personal_spark.sources.readers import read_parquet

    docs = read_parquet(spark, "/root/testdata/sf0.001/documents.parquet")
    rep = corpus_profile(docs, "doc_id", "text", segment_by="source")
    sg = rep["segments"]
    assert sg["by"] == "source" and not sg["truncated"]
    seg_counts = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert {k: v["n_docs"] for k, v in sg["rows"].items()} == seg_counts
    assert sum(v["total_tokens"] for v in sg["rows"].values()) == \
        rep["table"]["total_tokens"]
    for v in sg["rows"].values():
        assert 0.0 <= (v["mean_quality"] or 0.0) <= 1.0
        assert v["languages"]  # every segment reports a language mix
        assert 0.0 <= v["p_below_threshold"] <= 1.0
    # per-segment exact-dup: cross-check one segment directly
    seg0 = sorted(seg_counts)[0]
    from pandas_profiling_personal_spark.operators.text import fingerprint

    direct = (
        docs.where(F.col("source") == seg0)
        .select(fingerprint(F.col("text")).alias("fp"))
        .where(F.col("fp").isNotNull())
        .groupBy("fp").count().where("count > 1")
        .agg(F.sum(F.col("count") - 1)).collect()[0][0]
    )
    assert sg["rows"][seg0]["n_duplicate_docs"] == int(direct or 0)
    json.dumps(rep, default=str)
    page = corpus_report_html(rep)
    assert "Segments by source" in page and seg0 in page

    # non-default id column (review r6: the rollup join must use the
    # caller's id name, not a hardcoded doc_id)
    rep_id = corpus_profile(
        docs.withColumnRenamed("doc_id", "did"), "did", "text",
        segment_by="source",
    )
    assert {k: v["n_docs"] for k, v in rep_id["segments"]["rows"].items()} \
        == seg_counts

    # loud truncation: cap below the segment count
    rep_t = corpus_profile(
        docs, "doc_id", "text", segment_by="source",
        max_segments=max(1, len(seg_counts) - 1),
    )
    sgt = rep_t["segments"]
    assert sgt["truncated"] and sgt["n_segments"] == len(seg_counts)
    assert len(sgt["rows"]) == max(1, len(seg_counts) - 1)
    assert "largest" in corpus_report_html(rep_t)


def test_canonical_url(spark):
    """canonical_url: the URL-dedup normalization — case, default ports,
    tracker params, param order, trailing slash and fragment all collapse;
    non-default ports and real params survive."""
    from pandas_profiling_personal_spark.operators.strings import (
        canonical_url,
    )

    cases = [
        ("HTTPS://Example.COM:443/a/b/?utm_source=x&b=2&a=1#frag",
         "https://example.com/a/b?a=1&b=2"),
        ("https://example.com/a/b?a=1&b=2",
         "https://example.com/a/b?a=1&b=2"),  # already canonical: fixpoint
        ("http://site.org:8080/path/", "http://site.org:8080/path"),
        ("http://site.org:80/", "http://site.org"),
        ("https://a.com/?fbclid=xyz&gclid=1&UTM_CAMPAIGN=2", "https://a.com"),
        ("not a url", None),
        (None, None),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r[0] for r in df.select(canonical_url(F.col("url"))).collect()]
    assert got == [want for _, want in cases]


def test_registered_domain_and_domain_segments(spark):
    """registered_domain: public-suffix-lite collapse on seeded URLs, and
    corpus_profile(domain_from=) rolls the corpus up per registered domain
    (the C4/RefinedWeb curation view) through the ordinary segment tier."""
    from pandas_profiling_personal_spark.operators.strings import (
        registered_domain,
    )
    from pandas_profiling_personal_spark.plans.corpus import corpus_profile

    cases = [
        ("https://www.bbc.co.uk/news/uk", "bbc.co.uk"),
        ("http://sub.deep.example.com/a?b=c", "example.com"),
        ("https://example.com/", "example.com"),
        ("http://blog.site.com.au/x", "site.com.au"),
        ("http://a.b.user.ac.jp/page", "user.ac.jp"),
        ("http://192.168.1.10:8080/admin", "192.168.1.10"),
        ("http://localhost/x", "localhost"),
        ("http://example.com./page", "example.com"),  # absolute-FQDN dot
        ("not a url at all", None),  # try_parse_url: NULL, no ANSI throw
        (None, None),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r[0] for r in df.select(registered_domain(F.col("url"))).collect()]
    assert got == [want for _, want in cases]

    docs = spark.createDataFrame(
        [
            (1, "solid quality document text for the corpus report",
             "https://www.bbc.co.uk/news/a"),
            (2, "another bbc article body with enough words in it",
             "https://sport.bbc.co.uk/football"),
            (3, "an example dot com page body with plain text words",
             "http://blog.example.com/post"),
            (4, "unattributed document with a broken source url", "nope"),
        ],
        "doc_id bigint, text string, url string",
    )
    rep = corpus_profile(docs, "doc_id", "text", domain_from="url")
    sg = rep["segments"]
    assert sg["by"] == "domain"
    assert sg["rows"]["bbc.co.uk"]["n_docs"] == 2
    assert sg["rows"]["example.com"]["n_docs"] == 1
    # explicit segment_by wins over the derived default
    rep2 = corpus_profile(
        docs.withColumn("src", F.lit("all")),
        "doc_id", "text", domain_from="url", segment_by="src",
    )
    assert rep2["segments"]["by"] == "src"


def test_corpus_profile_media_section(spark):
    """media_col: the corpus report answers the multimodal questions too —
    media_profile's rollup (incl. exact AND perceptual duplicate counts)
    lands as a 'media' section and renders in the HTML page."""
    from pandas_profiling_personal_spark.plans.corpus import (
        corpus_profile,
        corpus_report_html,
    )

    docs = spark.createDataFrame(
        [
            (1, "document text body one", b"\x89PNG\r\n" + b"imgdata" * 9),
            (2, "document text body two", b"\x89PNG\r\n" + b"imgdata" * 9),
            (3, "document text body three", b"\xff\xd8\xff" + b"jpeg" * 7),
            (4, "document with no media", None),
        ],
        "doc_id bigint, text string, blob binary",
    )
    rep = corpus_profile(docs, "doc_id", "text", media_col="blob")
    med = rep["media"]
    assert med["n"] == 4
    assert med["formats"]["png"] == 2
    assert med["n_duplicate_contents"] == 1
    assert med["n_duplicate_perceptual"] == 1
    json.dumps(rep, default=str)
    page = corpus_report_html(rep, "media corpus")
    assert "Media" in page and "n_duplicate_perceptual" in page


def test_cli_corpus_report(tmp_path):
    """CLI --corpus-report writes the corpus HTML + a JSON status line."""
    import subprocess
    import sys

    import pandas as pd

    src = tmp_path / "docs.parquet"
    pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "the quick brown fox and the lazy dog are in the house",
                "the quick brown fox and the lazy dog are in the house",
                "le chien et le chat sont dans la maison pour que tu es la",
            ],
            "source": ["web", "web", "books"],
        }
    ).to_parquet(src)
    out = tmp_path / "corpus.html"
    proc = subprocess.run(
        [
            sys.executable, "-m", "pandas_profiling_personal_spark.cli",
            str(src), str(out), "--corpus-report",
            "--segment-by", "source", "--master", "local[2]",
        ],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    status = json.loads(proc.stdout.strip().splitlines()[-1])
    assert status["n_docs"] == 3
    assert status["p_duplicates"] > 0  # docs 1+2 are identical
    page = out.read_text()
    assert "Language mix" in page
    assert "Segments by source" in page and "books" in page


def test_streaming_hamming_dedup_vs_store(spark, tmp_path):
    """hamming_dedup_stream_vs_store: a persisted bit-signature store
    (image phash / audio envelope / SimHash) suppresses historical
    near-duplicates via per-block stream-static anti joins with the exact
    Hamming verify as join residual; null signatures pass through; the
    surviving set matches the batch incremental operator on
    arrival-ordered ids."""
    from pandas_profiling_personal_spark.operators.dedup import (
        incremental_hamming_dedup,
    )
    from pandas_profiling_personal_spark.streaming.dedup_stream import (
        hamming_dedup_stream_vs_store,
    )

    base = 0x0123456789ABCDEF
    other = 0x7EDCBA9876543210
    store_rows = [(1, base), (2, other)]
    store_path = tmp_path / "ham_store"
    spark.createDataFrame(
        store_rows, "doc_id bigint, signature bigint"
    ).write.parquet(str(store_path))
    static_store = spark.read.parquet(str(store_path))

    flip3 = base ^ 0b10100001  # 3 bits away from history 1 -> suppressed
    far = base ^ ((1 << 40) - 1)  # 40 bits away -> kept
    rows = [
        (10, flip3),
        (11, other),  # exact copy of history 2 -> suppressed
        (12, far),
        (13, None),  # no signature: passes through (exact tier's job)
    ]
    src = tmp_path / "ham_src"
    schema = "doc_id bigint, signature bigint"
    spark.createDataFrame(rows, schema).write.parquet(str(src))
    stream = spark.readStream.schema(schema).parquet(str(src))
    out = hamming_dedup_stream_vs_store(
        stream, static_store, "signature", bits=64, max_hamming=7
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_ham_store")
        .start()
    )
    try:
        q.processAllAvailable()
        kept = {r["doc_id"] for r in spark.table("t_ham_store").collect()}
    finally:
        q.stop()
    assert kept == {12, 13}

    # batch parity on the signed docs (arrival-order ids > store ids)
    batch = {
        r["doc_id"]: r["keep"]
        for r in incremental_hamming_dedup(
            spark.createDataFrame(rows, schema).where(
                "signature IS NOT NULL"
            ),
            static_store,
            bits=64,
            max_hamming=7,
            key_blocks=1,
            band_bits=8,
        ).collect()
    }
    assert batch == {10: False, 11: False, 12: True}

    # geometry guard: too few blocks for the radius refuses
    import pytest as _pytest

    with _pytest.raises(ValueError, match="pigeonhole"):
        hamming_dedup_stream_vs_store(
            stream, static_store, "signature", bits=64,
            max_hamming=7, band_bits=16,
        )


def test_dataset_card_markdown(spark, tmp_path):
    """The Markdown dataset card carries metadata, stats, variables with
    descriptions, alerts, and layout advice; CLI writes it for .md
    outputs; pipes in values stay table-safe."""
    import subprocess
    import sys

    import pandas as pd

    from pandas_profiling_personal_spark import (
        ProfileConfig, dataset_card, profile,
    )

    df = spark.createDataFrame(
        [(f"r{i % 4}", i, "x") for i in range(40)],
        "region string, id int, `pi|ped` string")
    r = profile(df, ProfileConfig(
        exact=True, title="Card T", dataset_description="Desc here",
        dataset_url="https://example.com",
        variable_descriptions=(("id", "row id | key"),),
        layout_advice=True, layout_join_keys=("id",),
        correlations=(), duplicates=False))
    card = dataset_card(r)
    assert card.startswith("# Card T")
    assert "Desc here" in card and "https://example.com" in card
    assert "| id |" in card and "row id \\| key" in card
    assert "pi\\|ped" in card                 # pipe escaping in names
    assert "## Suggested write layout" in card
    assert "bucketBy" in card

    src = tmp_path / "d.parquet"
    pd.DataFrame({"x": range(30)}).to_parquet(src)
    out = tmp_path / "card.md"
    proc = subprocess.run(
        [sys.executable, "-m", "pandas_profiling_personal_spark.cli",
         str(src), str(out), "--minimal", "--title", "CLI Card",
         "--master", "local[2]"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    text = out.read_text(encoding="utf-8")
    assert text.startswith("# CLI Card") and "| x |" in text


def test_profile_progress_callback(spark):
    """The (stage, i, n) progress hook (reference progress_bar,
    config_default.yaml + model/describe.py:100-190): events fire in
    execution order with 1-based i up to the planned n; optional stages
    extend the plan; a raising callback propagates (VERDICT r11 #6)."""
    import pytest as _pt

    from pandas_profiling_personal_spark import ProfileConfig, profile
    from pandas_profiling_personal_spark.plans.profile import _CORE_STAGES

    rows = [(float(i), f"v{i % 4}") for i in range(100)]
    df = spark.createDataFrame(rows, "x double, c string")

    events = []
    profile(df, ProfileConfig(exact=True),
            progress=lambda s, i, n: events.append((s, i, n)))
    stages = [e[0] for e in events]
    assert stages == list(_CORE_STAGES)
    assert [e[1] for e in events] == list(range(1, len(events) + 1))
    assert all(e[2] == len(_CORE_STAGES) for e in events)

    # optional stages extend the plan: relevance_target adds its pass
    events2 = []
    profile(df, ProfileConfig(exact=True, relevance_target="x"),
            progress=lambda s, i, n: events2.append((s, i, n)))
    assert events2[-1][0] == "target_relevance"
    assert events2[-1][1] == events2[-1][2] == len(_CORE_STAGES) + 1

    # r12 ADVICE (low): timeseries marks even on a NO-NUMERIC frame —
    # the stage is planned whenever the ts col is set, so progress must
    # reach i == n rather than looking permanently stuck one short
    df_ts = spark.createDataFrame(
        [("a", "2024-01-01 00:00:00")], "c string, t string"
    ).selectExpr("c", "cast(t as timestamp) as t")
    events3 = []
    profile(df_ts, ProfileConfig(exact=True, timeseries_ts_col="t"),
            progress=lambda s, i, n: events3.append((s, i, n)))
    assert events3[-1][0] == "timeseries"
    assert events3[-1][1] == events3[-1][2]

    # a monitoring hook that raises stops the run, not swallowed
    def boom(s, i, n):
        raise RuntimeError("hook failure")

    with _pt.raises(RuntimeError, match="hook failure"):
        profile(df, ProfileConfig(exact=True), progress=boom)


def test_cli_verbose_progress(tmp_path):
    """--verbose renders [i/n] stage lines to stderr (stdout stays the
    machine-parseable status line); --quiet suppresses them."""
    import re
    import subprocess
    import sys

    import pandas as pd

    src = tmp_path / "data.parquet"
    pd.DataFrame({"a": range(30)}).to_parquet(src)
    out = tmp_path / "r.html"
    base = [
        sys.executable, "-m", "pandas_profiling_personal_spark.cli",
        str(src), str(out), "--minimal", "--master", "local[2]",
    ]
    proc = subprocess.run(
        base + ["--verbose"], capture_output=True, text=True,
        timeout=300, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = re.findall(r"\[(\d+)/(\d+)\] (\w+)", proc.stderr)
    assert lines, proc.stderr[-1000:]
    assert lines[0][2] == "setup_types"
    assert [int(i) for i, _, _ in lines] == list(range(1, len(lines) + 1))
    json.loads(proc.stdout.strip().splitlines()[-1])  # stdout intact

    proc2 = subprocess.run(
        base + ["--verbose", "--quiet"], capture_output=True, text=True,
        timeout=300, cwd="/root/repo",
    )
    assert proc2.returncode == 0
    assert not re.findall(r"\[\d+/\d+\]", proc2.stderr)


def test_pie_chart_for_low_cardinality(spark):
    """Composition donut (reference plot.pie.max_unique: 10,
    visualisation/plot.py:191-216): data-chart='pie' renders for a
    low-cardinality categorical and a boolean, NOT for a high-cardinality
    one; slices cover values + missing; both themes (VERDICT r11 #7)."""
    from pandas_profiling_personal_spark import ProfileConfig, profile
    from pandas_profiling_personal_spark.report.html import render_html

    rows = [
        ("abc"[i % 3] if i % 7 else None, f"id{i}", i % 2 == 0)
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "low string, high string, flag boolean")
    r = profile(df, ProfileConfig(exact=True))
    page = render_html(r)
    # one pie for `low`, one for `flag`, none for the 120-distinct `high`
    assert page.count("data-chart='pie'") == 2
    assert "(Missing)" in page
    lowsec = page.split("data-chart='pie'")[1]
    assert "— " in lowsec and "%" in lowsec  # legend with percents

    r_dark = profile(df, ProfileConfig(exact=True, html_theme="dark"))
    assert "data-chart='pie'" in render_html(r_dark)

    # high-cardinality only -> no pie anywhere
    r2 = profile(df.select("high"), ProfileConfig(exact=True))
    assert "data-chart='pie'" not in render_html(r2)
