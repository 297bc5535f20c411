"""Round-9 review fixes, pinned.

Each test names the defect it guards against (review r9 / ADVICE round 8):
sign-following remainder dropping cross-sign video pairs, silent long
overflow in the frame-id encoding, and the netpbm CRLF fall-through.
"""

import pytest


def test_video_near_dup_negative_ids_pair(spark):
    """Cross-sign video pairs must survive: the same-index filter used
    Spark's sign-following %, so a negative-id video never index-matched a
    positive-id one (review r9) — pmod + exact integral decode fix it."""
    from pandas_profiling_personal_spark.operators.multimodal import (
        video_near_duplicates,
    )

    rows = [
        (-3, b"\x00\x00\x01\xba" + b"fakevideo" * 50),
        (1, b"\x00\x00\x01\xba" + b"fakevideo" * 50),  # identical -> dup
        (7, b"\x00\x00\x01\xba" + b"unrelated" * 50),
    ]
    df = spark.createDataFrame(rows, "id long, blob binary")
    pairs = video_near_duplicates(df, "blob", "id", n_frames=4).collect()
    assert [(r["doc_a"], r["doc_b"], r["n_matching_frames"]) for r in pairs] \
        == [(-3, 1, 4)], pairs


def test_video_near_dup_huge_id_fails_fast(spark):
    """An id whose encoded frame id would overflow long arithmetic must
    raise BEFORE the job, naming the surrogate-id fix — not surface an ANSI
    arithmetic error mid-join (review r9)."""
    from pandas_profiling_personal_spark.operators.multimodal import (
        video_near_duplicates,
    )

    huge = (1 << 63) - 2  # > (2^63-1-(K-1))/K for every K > 1
    df = spark.createDataFrame(
        [(huge, b"\x00\x00\x01\xbax" * 20)], "id long, blob binary"
    )
    with pytest.raises(ValueError, match="surrogate"):
        video_near_duplicates(df, "blob", "id", n_frames=4)


def test_netpbm_crlf_oversized_payload_single_ws_reading():
    """Oversized P5 payloads with a CR after maxval take the spec single-
    whitespace reading (the 0x0A is the first pixel): the old 'only the
    CRLF reading has enough bytes' branch was unsatisfiable and is gone
    (review r9) — pin the fall-through behavior it claimed to handle."""
    import numpy as np

    from pandas_profiling_personal_spark.operators.multimodal import (
        _parse_netpbm,
    )

    w, h = 3, 2
    raster = bytes([10, 1, 2, 3, 4, 5])  # first pixel IS 10 (LF byte)
    # CR + raster + two trailing junk bytes: neither reading fits exactly
    # (one junk byte would make the CRLF reading exact), so the parser
    # must fall through to the spec single-ws reading
    data = b"P5 %d %d 255\r" % (w, h) + raster + b"\xff\xff"
    px = _parse_netpbm(data)
    assert px is not None and px.shape == (h, w)
    assert np.array_equal(
        px.ravel(), np.frombuffer(raster, np.uint8).astype(np.float64)
    )


def test_video_near_dup_huge_id_explicit_geometry_plan_guard(spark):
    """Review r9 second pass: the caller-supplied-geometry path must not
    pay a sizing scan — the overflow bound is enforced plan-side instead,
    raising a NAMED error at execution the moment an oversized id is seen."""
    from pandas_profiling_personal_spark.operators.multimodal import (
        video_near_duplicates,
    )

    huge = (1 << 63) - 2
    df = spark.createDataFrame(
        [(huge, b"\x00\x00\x01\xbax" * 20)], "id long, blob binary"
    )
    out = video_near_duplicates(
        df, "blob", "id", n_frames=4, key_blocks=2, band_bits=6
    )  # no error at plan time: zero extra actions on this path
    with pytest.raises(Exception, match="surrogate"):
        out.collect()

    # null ids still flow to a null frame id (dropped by banding), not a
    # raise — same behavior as before the guard
    df2 = spark.createDataFrame(
        [(None, b"\x00\x00\x01\xbax" * 20), (1, b"\x00\x00\x01\xbax" * 20)],
        "id long, blob binary",
    )
    assert video_near_duplicates(
        df2, "blob", "id", n_frames=4, key_blocks=2, band_bits=6
    ).count() == 0


def test_drift_association_degenerate_v_alerts():
    """Review r9 second pass: a Cramér's V that collapses to None on ONE
    side (column lost enough levels for a degenerate table) must alert,
    not vanish — that is exactly the total-association-change event the
    surface exists to catch. None on BOTH sides stays silent."""
    from pandas_profiling_personal_spark.operators.drift import drift_alerts

    rows = [
        {"column": "lang×src", "v_a": 0.9, "v_b": None, "delta_v": None},
        {"column": "a×b", "v_a": None, "v_b": None, "delta_v": None},
        {"column": "c×d", "v_a": 0.5, "v_b": 0.48, "delta_v": -0.02},
    ]
    alerts = drift_alerts(association_rows=rows)
    assert len(alerts) == 1
    a = alerts[0]
    assert a["type"] == "DRIFT_ASSOCIATION" and a["column"] == "lang×src"
    assert a["degenerate"] is True and a["delta_v"] is None


def test_ann_lsh_recall_degenerate_corpus(spark):
    """Review r9 second pass: a query with zero exact neighbors must emit
    (id, 0, true) — a silently absent row reads as 'no failure' for a
    recall gate."""
    from pandas_profiling_personal_spark.operators.similarity import (
        ann_lsh_recall,
    )

    one = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    rows = ann_lsh_recall(one, one, dim=4, k=3).collect()
    assert [(r["query_id"], r["n_exact"], r["recall_ok"]) for r in rows] \
        == [(0, 0, True)]
