"""Round 10 review fixes (ADVICE r9, all three items):

1. The media/audio/video metadata oracles now rebuild the Spark fake
   tier's FULL ``_sniff_format`` branch set — including the
   ``chr(0)x3 -> 'mp4?'`` branch (NUL-prefixed parquet strings are
   legal) and the ``YUV4MPEG2 -> 'y4m'`` branch — so a corpus that
   exercises those prefixes still hash-matches.
2. The binary-refinement header-stat sample is DETERMINISTIC: ordered
   by content hash before the limit (TakeOrderedAndProject), so
   media_stats no longer depend on partition layout.
3. ``--save-state --align-state`` refuses an explicit
   ``--categorical-pairs`` that disagrees with the aligned state's
   declared pairs — by name, mirroring the ``--drift-against`` check —
   instead of dying later inside merge_partials.
"""

from __future__ import annotations

import hashlib
import shutil

import pandas as pd

from tests.conftest import SF_DIR
from tests.oracle_harness import TABLES, compare, duck_connection

#: one text per sniff branch the metadata oracles must reproduce
#: (no netpbm prefixes here: the Python parser would out-vote the
#: sniff on a VALID header, which is a different tier by design)
_PLANTED_TEXTS = [
    "\x00\x00\x00 pseudo mp4 ftyp box",  # mp4?  (the r10 fix)
    "GIF87a not really a gif",  # gif
    "RIFF....WAVE not really",  # riff
    "YUV4MPEG2 W64 H48 F25:1",  # y4m   (the r10 fix, media/audio)
    "plain english text with no magic",  # unknown
]


def _sf_dir_with_planted_docs(tmp_path):
    d = tmp_path / "sf"
    d.mkdir()
    for t in TABLES:
        shutil.copyfile(f"{SF_DIR}/{t}.parquet", d / f"{t}.parquet")
    texts = _PLANTED_TEXTS + [None]
    pd.DataFrame(
        {
            "doc_id": pd.array(range(len(texts)), dtype="int64"),
            "text": pd.array(texts, dtype="object"),
            "lang": ["en"] * len(texts),
            "source": ["planted"] * len(texts),
            "n_chars": pd.array(
                [len(t) if t else 0 for t in texts], dtype="int64"
            ),
        }
    ).to_parquet(d / "documents.parquet")
    return str(d)


def test_metadata_oracles_cover_all_sniff_branches(spark, tmp_path):
    """video/media/audio metadata specs hash-match on a corpus that fires
    EVERY branch of the Spark fake tier's magic sniff — including the
    NUL-prefix 'mp4?' branch the video oracle omitted (ADVICE r9 #1)."""
    from pandas_profiling_personal_spark import parity_pipeline as PP

    sf = _sf_dir_with_planted_docs(tmp_path)
    con = duck_connection(sf)
    specs = {
        "video": (PP.video_metadata_query(), PP.video_metadata_sql()),
        "media": (PP.media_metadata_query(), PP.media_metadata_sql()),
        "audio": (PP.audio_metadata_query(), PP.audio_metadata_sql()),
    }
    for name, (q, sql) in specs.items():
        sdf = q(spark, sf)
        problems = compare(sdf, con, sql)
        assert not problems, f"{name}: {problems}"
        fmts = {r["format"] for r in sdf.select("format").collect()}
        assert fmts == {"mp4?", "gif", "riff", "y4m", "unknown"}, (
            f"{name}: planted corpus did not fire every branch: {fmts}"
        )


def test_media_sample_deterministic_across_layouts(spark):
    """The bounded header-stat sample is picked by content-hash order, not
    partition order (ADVICE r9 #2): with more parseable payloads than
    media_sample_n, media_stats equal the md5-least subset exactly and do
    not move when the partition layout changes."""
    import numpy as np

    from pandas_profiling_personal_spark import ProfileConfig, profile

    def pgm(seed, w, h=10):
        r = np.random.default_rng(seed)
        raster = r.integers(0, 256, size=(h, w)).astype(np.uint8)
        return f"P5 {w} {h} 255\n".encode() + raster.tobytes()

    widths = list(range(20, 40, 2))  # 10 distinct widths
    payloads = [pgm(i, w) for i, w in enumerate(widths)]
    sample_n = 4
    chosen = sorted(payloads, key=lambda b: hashlib.md5(b).hexdigest())[
        :sample_n
    ]
    exp_widths = [int(p.split(b" ")[1]) for p in chosen]

    cfg = ProfileConfig(
        binary_refinement=True,
        correlations=(),
        duplicates=False,
        media_sample_n=sample_n,
    )
    stats = []
    for parts in (1, 7):
        df = spark.createDataFrame(
            [(bytearray(p),) for p in payloads], "img binary"
        ).repartition(parts)
        v = profile(df, cfg).variables["img"]
        assert v["type_refined"] == "image"
        stats.append(v["media_stats"])
    assert stats[0] == stats[1]
    assert stats[0]["n_parsed"] == sample_n
    assert stats[0]["min_width"] == min(exp_widths)
    assert stats[0]["max_width"] == max(exp_widths)


def test_cli_align_pair_flag_validation(tmp_path):
    """--align-state with an explicit --categorical-pairs that disagrees
    with the stored state's declared pairs refuses by name (ADVICE r9 #3)
    — same contract as --drift-against; a matching explicit flag and a
    dropped flag both proceed."""
    import subprocess
    import sys

    src = tmp_path / "day.parquet"
    pd.DataFrame(
        {"v": [1.0, 2.0], "lang": ["a", "b"], "src": ["x", "y"]}
    ).to_parquet(src)
    st = tmp_path / "st.json"

    def run(*argv):
        return subprocess.run(
            [sys.executable, "-m", "pandas_profiling_personal_spark.cli",
             *argv, "--master", "local[2]"],
            capture_output=True, text=True, timeout=300, cwd="/root/repo",
        )

    assert run(str(src), "--save-state", str(st),
               "--categorical-pairs", "lang:src").returncode == 0

    # disagreeing flag -> named refusal, not a merge_partials traceback
    st2 = tmp_path / "st2.json"
    p = run(str(src), "--save-state", str(st2), "--align-state", str(st),
            "--categorical-pairs", "v:lang")
    assert p.returncode != 0
    msg = p.stderr + p.stdout
    assert "disagrees with the aligned state" in msg
    assert "Traceback" not in p.stderr

    # matching flag and dropped flag both proceed
    assert run(str(src), "--save-state", str(st2), "--align-state", str(st),
               "--categorical-pairs", "lang:src").returncode == 0
    assert run(str(src), "--save-state", str(st2),
               "--align-state", str(st)).returncode == 0
