"""Real video tier: pure-Python YUV4MPEG2 frame extraction (the WAV/PGM
pattern applied to the last fake-only modality) — parser unit behavior,
sample_frames(decoder='y4m') slot semantics, and video_near_duplicates
end-to-end on hand-built fixtures: identical / re-encoded clips match,
unrelated clips don't, compressed payloads still raise naming libav."""

import numpy as np
import pytest

from pandas_profiling_personal_spark.operators.multimodal import (
    _parse_y4m,
    _y4m_gray_frame,
    phash_gray,
    sample_frames,
    video_near_duplicates,
)


def _blocky(seed: int, h: int = 48, w: int = 64) -> np.ndarray:
    """Low-frequency test frame: an 6x8 random grid upsampled 8x — strong,
    well-separated DCT signs, so the phash is stable under small pixel
    noise (the re-encode simulation below)."""
    r = np.random.default_rng(seed)
    small = r.integers(0, 256, size=(h // 8, w // 8))
    return np.kron(small, np.ones((8, 8))).astype(np.uint8)


def _y4m(frames: list[np.ndarray], cs: str = "420", fps: str = "25:1",
         frame_params: bytes = b"") -> bytes:
    h, w = frames[0].shape
    out = [f"YUV4MPEG2 W{w} H{h} F{fps} Ip A1:1 C{cs}\n".encode()]
    chroma = {
        "420": ((w + 1) // 2) * ((h + 1) // 2) * 2,
        "444": 2 * w * h,
        "mono": 0,
    }[cs]
    for f in frames:
        out.append(b"FRAME" + frame_params + b"\n")
        out.append(f.astype(np.uint8).tobytes())
        out.append(bytes(chroma))  # zeroed chroma planes
    return b"".join(out)


def test_parse_y4m_header_frames_and_truncation():
    frames = [_blocky(s) for s in (1, 2, 3)]
    data = _y4m(frames)
    hdr, offs = _parse_y4m(data)
    assert (hdr["width"], hdr["height"]) == (64, 48)
    assert (hdr["fps_num"], hdr["fps_den"]) == (25, 1)
    assert hdr["colorspace"] == "420"
    assert hdr["n_frames"] == 3 and not hdr["truncated"]
    # Y plane roundtrips exactly for every frame
    for k, f in enumerate(frames):
        assert np.array_equal(_y4m_gray_frame(data, hdr, offs[k]), f)

    # mono and 444 geometries parse too, with identical Y planes
    for cs in ("mono", "444"):
        h2, o2 = _parse_y4m(_y4m(frames, cs=cs))
        assert h2["n_frames"] == 3
        assert np.array_equal(_y4m_gray_frame(_y4m(frames, cs=cs), h2, o2[0]), frames[0])

    # FRAME params (e.g. interlacing hints) are skipped, not miscounted
    hp, op = _parse_y4m(_y4m(frames, frame_params=b" Xsome=param"))
    assert hp["n_frames"] == 3
    assert np.array_equal(
        _y4m_gray_frame(_y4m(frames, frame_params=b" Xsome=param"), hp, op[1]),
        frames[1],
    )

    # payload cut mid-frame: valid prefix salvaged, truncation flagged
    cut = data[: offs[2] + 100]
    hc, oc = _parse_y4m(cut)
    assert hc["n_frames"] == 2 and hc["truncated"]
    assert oc == offs[:2]

    # non-Y4M, 10-bit colorspace, and header-only streams
    assert _parse_y4m(b"\x00\x00\x00\x18ftypmp42 not a y4m") is None
    bad10 = _y4m(frames).replace(b"C420", b"C420p10", 1)
    assert _parse_y4m(bad10) is None
    hdr_only = data[: data.find(b"\n") + 1]
    ho, oo = _parse_y4m(hdr_only)
    assert ho["n_frames"] == 0 and oo == []


def test_sample_frames_y4m_slots(spark):
    five = _y4m([_blocky(s) for s in range(5)])
    two = _y4m([_blocky(s) for s in (7, 8)])
    df = spark.createDataFrame(
        [(1, bytearray(five)), (2, bytearray(two))],
        "vid long, payload binary",
    )
    rows = sample_frames(df, "payload", n_frames=4, decoder="y4m").collect()
    by_vid = {}
    for r in rows:
        by_vid.setdefault(r["vid"], []).append(r["frame"])
    # every video emits exactly n_frames slots, indexes 0..3
    assert {len(v) for v in by_vid.values()} == {4}
    assert sorted(f["frame_index"] for f in by_vid[1]) == [0, 1, 2, 3]
    # 5-frame clip at 4 slots reads sources 0,1,2,3 (k*5//4) — distinct
    hashes5 = [f["frame_hash"] for f in sorted(by_vid[1], key=lambda f: f["frame_index"])]
    expect5 = [
        format(phash_gray(_blocky(s).astype(np.float64)) & ((1 << 64) - 1), "016x")
        for s in (0, 1, 2, 3)
    ]
    assert hashes5 == expect5
    # 2-frame clip repeats: sources 0,0,1,1 — slot votes stay comparable
    hashes2 = [f["frame_hash"] for f in sorted(by_vid[2], key=lambda f: f["frame_index"])]
    assert hashes2[0] == hashes2[1] and hashes2[2] == hashes2[3]
    assert hashes2[0] != hashes2[2]

    # compressed container: loud NotImplementedError naming libav
    mp4 = spark.createDataFrame(
        [(9, bytearray(b"\x00\x00\x00\x18ftypmp42" + bytes(64)))],
        "vid long, payload binary",
    )
    with pytest.raises(Exception, match="libav"):
        sample_frames(mp4, "payload", 4, decoder="y4m").collect()


def test_video_near_duplicates_y4m_end_to_end(spark):
    base = [_blocky(100 + f) for f in range(4)]
    r = np.random.default_rng(42)
    # "re-encode": brightness shift + small pixel noise on every frame
    noisy = [
        np.clip(f.astype(np.int64) + 6 + r.integers(-2, 3, f.shape), 0, 255)
        .astype(np.uint8)
        for f in base
    ]
    unrelated = [_blocky(900 + f) for f in range(4)]
    clips = {
        1: _y4m(base),
        2: _y4m(noisy),
        3: _y4m(unrelated),
        4: _y4m(base, cs="444"),  # chroma-format change, identical luma
    }
    df = spark.createDataFrame(
        [(vid, bytearray(data)) for vid, data in clips.items()],
        "vid long, payload binary",
    )
    pairs = {
        (p["doc_a"], p["doc_b"])
        for p in video_near_duplicates(
            df, "payload", "vid", n_frames=4, decoder="y4m"
        ).collect()
    }
    assert pairs == {(1, 2), (1, 4), (2, 4)}

    # decoder='auto' resolves to the y4m tier (libav absent)
    pairs_auto = {
        (p["doc_a"], p["doc_b"])
        for p in video_near_duplicates(
            df, "payload", "vid", n_frames=4, decoder="auto"
        ).collect()
    }
    assert pairs_auto == pairs


def test_video_metadata_tiers(spark):
    from pandas_profiling_personal_spark.operators.multimodal import (
        video_metadata,
    )

    frames = [_blocky(s) for s in (1, 2, 3)]
    clip = _y4m(frames, fps="30:1")
    hdr, offs = _parse_y4m(clip)
    cut = clip[: offs[2] + 5]  # mid-frame: 2 whole frames + damage flag
    df = spark.createDataFrame(
        [
            (1, bytearray(clip)),
            (2, bytearray(cut)),
            (3, bytearray(b"\x89PNG not a video")),
            (4, None),
        ],
        "vid long, payload binary",
    )
    out = {
        r["vid"]: r["video_meta"]
        for r in video_metadata(df, "payload").collect()
    }
    m = out[1]
    assert (m["width"], m["height"]) == (64, 48)
    assert (m["fps_num"], m["fps_den"]) == (30, 1)
    assert m["colorspace"] == "420"
    assert m["n_frames"] == 3 and m["truncated"] is False
    assert m["duration_s"] == 0.1
    assert m["format"] == "y4m" and m["n_bytes"] == len(clip)
    assert out[2]["n_frames"] == 2 and out[2]["truncated"] is True
    # non-video bytes: sniffed format, null video fields — report, not raise
    assert out[3]["format"] == "png"
    assert out[3]["width"] is None and out[3]["n_frames"] is None
    assert out[4] is None

    # fake tier: md5-hex arithmetic, engine-reproducible
    import hashlib

    fk = {
        r["vid"]: r["video_meta"]
        for r in video_metadata(df, "payload", decoder="fake").collect()
    }
    h = int(hashlib.md5(clip).hexdigest()[:8], 16)
    assert fk[1]["width"] == 64 + h % 1216
    assert fk[1]["height"] == 64 + (h >> 2) % 656
    assert fk[1]["fps_num"] == 24 + h % 37
    assert fk[1]["n_frames"] == int(
        hashlib.md5(clip).hexdigest()[8:16], 16
    ) % 100_000


def test_video_metadata_rejects_unknown_decoder(spark):
    from pandas_profiling_personal_spark.operators.multimodal import (
        video_metadata,
    )

    df = spark.createDataFrame([(1, bytearray(b"x"))], "vid long, payload binary")
    with pytest.raises(ValueError, match="decoder"):
        video_metadata(df, "payload", decoder="Fake")
    with pytest.raises(ValueError, match="decoder"):
        video_metadata(df, "payload", decoder="real")


def test_profile_binary_media_refinement(spark):
    """profile(explorative): BinaryType columns get a full-data format mix
    (pure-SQL magic sniff — never decodes) and, when one media family
    dominates, REAL header stats from a bounded sample through the
    no-dependency parsers (Y4M / netpbm here). Unknown blobs keep
    binary_stats but no refinement."""
    import numpy as np

    from pandas_profiling_personal_spark import ProfileConfig, profile

    clips = [_y4m([_blocky(s + k) for k in range(2)]) for s in (1, 2, 3)]

    def pgm(seed, w=20, h=10):
        r = np.random.default_rng(seed)
        raster = r.integers(0, 256, size=(h, w)).astype(np.uint8)
        return f"P5 {w} {h} 255\n".encode() + raster.tobytes()

    def wav(n=160, rate=8000):
        import struct

        data = bytes(n)  # n 8-bit samples of silence
        fmt = struct.pack("<HHIIHH", 1, 1, rate, rate, 1, 8)
        body = (
            b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
        )
        return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body

    def ppm(seed, w=6, h=4):
        r = np.random.default_rng(seed)
        raster = r.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
        return f"P6 {w} {h} 255\n".encode() + raster.tobytes()

    # mixed column: pgm + ppm + unknown — the IMAGE family (2/3) dominates
    # even though no single format reaches 50%, and the sampled pass must
    # spend its budget on the parseable rows, not the unknown blob
    mixed = [pgm(7), ppm(8), b"no magic here" * 4]
    rows = [
        (
            bytearray(clips[i]),
            bytearray(pgm(i)),
            bytearray(wav()),
            bytearray(b"\x01\x02" * 9),
            bytearray(mixed[i]),
        )
        for i in range(3)
    ] + [(None, None, None, None, None)]
    df = spark.createDataFrame(
        rows,
        "clip binary, img binary, snd binary, blob binary, mixed binary",
    )
    res = profile(
        df,
        ProfileConfig(
            binary_refinement=True, correlations=(), duplicates=False,
            media_sample_n=8,
        ),
    )

    clip = res.variables["clip"]
    assert clip["binary_stats"]["format_dist"] == {"y4m": 3}
    assert clip["type_refined"] == "video"
    assert clip["media_stats"]["n_parsed"] == 3
    assert clip["media_stats"]["min_width"] == 64
    assert clip["media_stats"]["max_height"] == 48
    assert clip["media_stats"]["min_n_frames"] == 2

    img = res.variables["img"]
    assert img["binary_stats"]["format_dist"] == {"pgm": 3}
    assert img["type_refined"] == "image"
    assert img["media_stats"]["n_parsed"] == 3
    assert img["media_stats"]["min_width"] == 20
    assert img["media_stats"]["max_height"] == 10

    snd = res.variables["snd"]
    assert snd["binary_stats"]["format_dist"] == {"riff": 3}
    assert snd["type_refined"] == "audio"
    assert snd["media_stats"]["n_parsed"] == 3
    assert snd["media_stats"]["min_sample_rate"] == 8000
    assert snd["media_stats"]["max_duration_s"] == 0.02

    blob = res.variables["blob"]
    assert blob["binary_stats"]["format_dist"] == {"unknown": 3}
    assert blob["binary_stats"]["min_bytes"] == 18
    assert "type_refined" not in blob and "media_stats" not in blob

    # family-level dominance (review r9 third pass): 1 pgm + 1 ppm + 1
    # unknown = image family 2/3, no single format at 50%; the sample is
    # format-filtered so both image rows parse
    mx = res.variables["mixed"]
    assert mx["binary_stats"]["format_dist"] == {
        "pgm": 1, "ppm": 1, "unknown": 1,
    }
    assert mx["type_refined"] == "image"
    assert mx["media_stats"]["n_sampled"] == 2
    assert mx["media_stats"]["n_parsed"] == 2
    assert mx["media_stats"]["min_width"] == 6
    assert mx["media_stats"]["max_width"] == 20


def test_binary_refinement_html_tab(spark):
    """The HTML report renders the binary refinement: a Video tab with the
    format mix and sampled header stats."""
    from pandas_profiling_personal_spark import ProfileConfig, profile
    from pandas_profiling_personal_spark.report.html import render_html

    clips = [_y4m([_blocky(s + k) for k in range(2)]) for s in (1, 2)]
    df = spark.createDataFrame(
        [(bytearray(c),) for c in clips], "clip binary"
    )
    res = profile(
        df,
        ProfileConfig(
            binary_refinement=True, correlations=(), duplicates=False,
            media_sample_n=4,
        ),
    )
    html = render_html(res)
    assert "Video" in html and "y4m" in html
    assert "Min width" in html and "Max n frames" in html
