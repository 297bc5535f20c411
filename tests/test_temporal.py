"""Temporal alignment + time-series operators (round 10).

Semantics are pinned on hand-built frames (expected values written out by
hand); the DuckDB cross-engine rows live in parity.py specs
(asof_state_events / range_join_events / acf_events / rolling_trend_events
/ seasonal_profile_events). Plan gates assert the scale contracts: the
as-of join is ONE hash exchange with no join operator at all, and the
range join is a hash/broadcast equi-join — never BroadcastNestedLoopJoin.
"""

from __future__ import annotations

import datetime as dt
import hashlib

import pytest
from pyspark.sql import functions as F

from pandas_profiling_personal_spark.operators.temporal import (
    asof_join,
    range_join,
)
from pandas_profiling_personal_spark.operators.timeseries import (
    acf,
    resample,
    rolling_trend,
    seasonal_profile,
)


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


@pytest.fixture()
def quotes(spark):
    # per-key snapshots: key a at 01:00/02:00, key b at 05:00 only
    return spark.createDataFrame(
        [
            ("a", _ts(1), 100.0),
            ("a", _ts(2), 200.0),
            ("b", _ts(5), 7.0),
        ],
        "k string, ts timestamp, px double",
    )


@pytest.fixture()
def trades(spark):
    return spark.createDataFrame(
        [
            ("a", _ts(0, 30), 1),  # before any snapshot
            ("a", _ts(1, 30), 2),  # between the two
            ("a", _ts(2, 0), 3),   # EXACTLY on a snapshot ts (inclusive)
            ("a", _ts(9, 0), 4),   # long after the last
            ("b", _ts(4, 0), 5),   # before b's only snapshot
            ("b", _ts(6, 0), 6),   # after it
        ],
        "k string, ts timestamp, qty int",
    )


def test_asof_backward_semantics(quotes, trades):
    out = {
        r["qty"]: (r["px"], r["matched_ts"])
        for r in asof_join(trades, quotes, on="ts", by="k").collect()
    }
    assert out[1] == (None, None)
    assert out[2] == (100.0, _ts(1))
    assert out[3] == (200.0, _ts(2))  # equal ts matches (inclusive)
    assert out[4] == (200.0, _ts(2))
    assert out[5] == (None, None)
    assert out[6] == (7.0, _ts(5))


def test_asof_forward_and_tolerance(quotes, trades):
    fwd = {
        r["qty"]: r["px"]
        for r in asof_join(
            trades, quotes, on="ts", by="k", direction="forward"
        ).collect()
    }
    assert fwd == {1: 100.0, 2: 200.0, 3: 200.0, 4: None, 5: 7.0, 6: None}

    # 1h tolerance: qty=4 sits 7h after its backward match -> nulled,
    # row SURVIVES (left-join shape); qty=2 is 30min after -> kept
    tol = {
        r["qty"]: r["px"]
        for r in asof_join(
            trades, quotes, on="ts", by="k", tolerance_s=3600
        ).collect()
    }
    assert tol[2] == 100.0 and tol[3] == 200.0
    assert tol[4] is None and 4 in tol


def test_asof_numeric_axis_collision_and_errors(spark):
    left = spark.createDataFrame(
        [(1, 5, 9), (1, 11, 9)], "k int, t int, v int"
    )
    right = spark.createDataFrame(
        [(1, 4, 100), (1, 10, 200)], "k int, t int, v int"
    )
    out = asof_join(left, right, on="t", by=["k"]).collect()
    got = {r["t"]: r["v_right"] for r in out}  # collision -> suffixed
    assert got == {5: 100, 11: 200}
    # numeric tolerance is in the column's own units
    tol = {
        r["t"]: r["v_right"]
        for r in asof_join(
            left, right, on="t", by=["k"], tolerance_s=1
        ).collect()
    }
    assert tol == {5: 100, 11: 200}

    with pytest.raises(ValueError, match="at least one equality key"):
        asof_join(left, right, on="t", by=[])
    with pytest.raises(ValueError, match="backward|forward|nearest"):
        asof_join(left, right, on="t", by=["k"], direction="sideways")
    with pytest.raises(ValueError, match="lacks"):
        asof_join(left, right, on="t", by=["k"], value_cols=["nope"])


def test_asof_plan_one_exchange_no_join(quotes, trades):
    """The union-tag as-of is NO join at all: one hash exchange on the key
    feeds a window — the plan that survives any events-per-key ratio."""
    plan = _plan(asof_join(trades, quotes, on="ts", by="k"))
    assert "Join" not in plan, plan
    assert "rangepartitioning" not in plan, plan  # no global sort
    import re

    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
    assert "hashpartitioning(k" in plan, plan

    # nearest: both directional fills reuse the ONE exchange (two sorts,
    # two windows, still zero joins)
    near = _plan(
        asof_join(trades, quotes, on="ts", by="k", direction="nearest")
    )
    assert "Join" not in near, near
    assert len(re.findall(r"\(\d+\) Exchange", near)) == 1, near
    assert len(re.findall(r"\(\d+\) Window", near)) == 2, near


def test_range_join_bounds_and_left(spark):
    pts = spark.createDataFrame(
        [(i, float(i)) for i in range(11)], "pid int, x double"
    )
    ivs = spark.createDataFrame(
        [(100, 2.0, 4.0), (200, 4.0, 7.0), (300, 9.5, 9.6)],
        "iid int, lo double, hi double",
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in range_join(pts, ivs, "x", "lo", "hi").collect()
    )
    assert got == [(2, 100), (3, 100), (4, 200), (5, 200), (6, 200)]

    closed = sorted(
        (r["pid"], r["iid"])
        for r in range_join(pts, ivs, "x", "lo", "hi", closed="[]").collect()
    )
    assert closed == [
        (2, 100), (3, 100), (4, 100), (4, 200), (5, 200), (6, 200), (7, 200)
    ]

    left = range_join(pts, ivs, "x", "lo", "hi", how="left")
    rows = {r["pid"]: r["iid"] for r in left.collect()}
    assert left.count() == 11 and rows[0] is None and rows[10] is None

    # sub-bucket-width interval (300) still matches nothing silently wrong
    hit = range_join(
        pts.where(F.col("x") > 9.4), ivs, "x", "lo", "hi", closed="[]"
    ).collect()
    assert [(r["pid"], r["iid"]) for r in hit] == []


def test_range_join_matches_bruteforce_and_guard(spark):
    import random

    rnd = random.Random(7)
    pts = spark.createDataFrame(
        [(i, rnd.uniform(0, 100)) for i in range(300)], "pid int, x double"
    )
    raw = []
    for j in range(40):
        lo = rnd.uniform(0, 95)
        raw.append((j, lo, lo + rnd.uniform(0.1, 8)))
    ivs = spark.createDataFrame(raw, "iid int, lo double, hi double")

    fast = sorted(
        (r["pid"], r["iid"])
        for r in range_join(pts, ivs, "x", "lo", "hi").collect()
    )
    brute = sorted(
        (r["pid"], r["iid"])
        for r in pts.crossJoin(ivs)
        .where((F.col("x") >= F.col("lo")) & (F.col("x") < F.col("hi")))
        .collect()
    )
    assert fast == brute
    # explicit narrow width also exact (intervals span many buckets)
    fast2 = sorted(
        (r["pid"], r["iid"])
        for r in range_join(
            pts, ivs, "x", "lo", "hi", bucket_width=0.5
        ).collect()
    )
    assert fast2 == brute

    with pytest.raises(ValueError, match="buckets of width"):
        range_join(
            pts, ivs, "x", "lo", "hi",
            bucket_width=0.001, max_buckets_per_interval=100,
        )
    plan = _plan(range_join(pts, ivs, "x", "lo", "hi"))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_resample_fill_and_acf_matches_pandas(spark):
    # hourly series with a deliberate gap at hour 3
    rows = [
        (_ts(h), float(v))
        for h, v in [(0, 1), (1, 2), (2, 4), (4, 3), (5, 5), (6, 6), (7, 4)]
    ]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    grid = resample(df, "ts", "value", fill=True).orderBy("t").collect()
    assert len(grid) == 8  # densified 0..7
    assert grid[3]["v"] is None and grid[3]["n"] == 0

    out = {
        r["lag"]: (r["n_pairs"], r["acf_value"])
        for r in acf(df, "ts", "value", lags=[1, 2]).collect()
    }
    # pandas-twin check: Pearson over overlapping (t, t-k) pairs, gap rows
    # absent from the grid (not imputed)
    import pandas as pd

    s = pd.Series(
        {h: v for h, v in [(0, 1), (1, 2), (2, 4), (4, 3), (5, 5), (6, 6), (7, 4)]},
        dtype=float,
    )
    for k in (1, 2):
        pairs = [
            (s[h], s[h - k]) for h in s.index if (h - k) in s.index
        ]
        exp = pd.DataFrame(pairs).corr().iloc[0, 1]
        n, got = out[k]
        assert n == len(pairs)
        assert abs(got - exp) < 1e-12


def test_rolling_trend_and_seasonal(spark):
    rows = [(_ts(h), float(h)) for h in range(6)]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    tr = {r["t"].hour: r["trend"] for r in rolling_trend(df, "ts", "value", 4).collect()}
    # centered window rowsBetween(-2, 1): hour 2 -> mean(0,1,2,3) = 1.5
    assert tr[2] == pytest.approx(1.5)
    assert tr[0] == pytest.approx(0.5)  # mean(0, 1)

    sp = {
        r["period"]: (r["n"], r["mean_value"])
        for r in seasonal_profile(df, "ts", "value").collect()
    }
    assert sp[3] == (1, 3.0)
    with pytest.raises(ValueError, match="period"):
        seasonal_profile(df, "ts", "value", period="fortnight")
    with pytest.raises(ValueError, match="granularity"):
        resample(df, "ts", "value", granularity="parsec")
    with pytest.raises(ValueError, match="lags"):
        acf(df, "ts", "value", lags=[0])


def test_timeseries_profile_tier_and_alerts(spark):
    """profile(timeseries_ts_col=): ACF / trend / seasonality for every
    numeric column from ONE grid aggregate; TS_* alerts fire on the right
    columns; JSON + HTML surfaces render; bad configs refuse by name."""
    import json
    import math

    from pandas_profiling_personal_spark import ProfileConfig, profile
    from pandas_profiling_personal_spark.report.html import render_html

    rows = []
    for h in range(240):  # 10 days, hourly, 2 rows per bucket
        ts = dt.datetime(2024, 1, 1) + dt.timedelta(hours=h)
        seasonal = math.sin(2 * math.pi * (h % 24) / 24) * 10.0
        trending = float(h)
        noise = (
            float(int(hashlib.md5(str(h).encode()).hexdigest()[:8], 16) % 97)
            - 48.0
        )  # md5 pseudo-noise: no calendar or lag structure
        for j in (0, 1):
            rows.append((ts, seasonal + j * 0.1, trending + j, noise + j))
    df = spark.createDataFrame(
        rows, "ts timestamp, seasonal double, trending double, noise double"
    )
    cfg = ProfileConfig(
        correlations=(), duplicates=False, timeseries_ts_col="ts",
        timeseries_lags=25,
    )
    res = profile(df, cfg)
    ts = res.timeseries
    assert ts["ts_col"] == "ts" and ts["n_buckets"] == 240
    assert ts["empty_buckets"] == 0
    cols = ts["columns"]
    assert set(cols) == {"seasonal", "trending", "noise"}

    s = cols["seasonal"]
    assert s["seasonal_strength"] > 0.99  # hour-of-day explains ~all of it
    assert s["acf"][23]["lag"] == 24 and s["acf"][23]["value"] > 0.99
    assert abs(s["trend_r"]) < 0.1
    assert len(s["seasonal"]) == 24 and s["seasonal"][0]["n"] == 20

    t = cols["trending"]
    assert t["trend_r"] > 0.999
    n = cols["noise"]
    assert abs(n["trend_r"]) < 0.4 and (n["seasonal_strength"] or 0) < 0.3

    kinds = {(a["type"], a.get("column")) for a in res.alerts}
    assert ("TS_SEASONAL", "seasonal") in kinds
    assert ("TS_TRENDING", "trending") in kinds
    assert ("TS_AUTOCORRELATED", "seasonal") in kinds
    # no STRUCTURAL alerts on the noise column (TS_ANOMALIES may
    # legitimately fire — random noise can contain a local 3-sigma
    # outlier; structure alerts must not)
    structural = {"TS_SEASONAL", "TS_TRENDING", "TS_AUTOCORRELATED"}
    assert not any(k in structural and c == "noise" for k, c in kinds)

    d = json.loads(res.to_json())
    assert d["timeseries"]["columns"]["trending"]["trend_r"] > 0.999
    page = render_html(res)
    assert "Time series" in page and "Seasonality" in page

    with pytest.raises(ValueError, match="not found"):
        profile(df, cfg.with_(timeseries_ts_col="nope"))
    with pytest.raises(ValueError, match="not a timestamp"):
        profile(df, cfg.with_(timeseries_ts_col="noise"))
    with pytest.raises(ValueError, match="granularity"):
        profile(df, cfg.with_(timeseries_granularity="parsec"))


def test_timeseries_profile_gaps_and_nulls(spark):
    """Grid gaps are counted, all-null columns survive with empty
    diagnostics, NaN values are excluded like nulls."""
    from pandas_profiling_personal_spark.operators.timeseries import (
        timeseries_profile,
    )

    rows = []
    for h in [0, 1, 2, 5, 6]:  # hours 3-4 missing
        ts = dt.datetime(2024, 1, 1, h)
        rows.append((ts, float(h), None, float("nan")))
    df = spark.createDataFrame(
        rows, "ts timestamp, v double, dead double, nans double"
    )
    out = timeseries_profile(df, "ts", ["v", "dead", "nans"], lags=2)
    assert out["n_buckets"] == 5 and out["empty_buckets"] == 2
    assert out["columns"]["v"]["n_buckets"] == 5
    # lag-1 pairs skip the gap: (1,0),(2,1),(6,5) -> 3 pairs
    assert out["columns"]["v"]["acf"][0]["n_pairs"] == 3
    assert out["columns"]["dead"]["n_buckets"] == 0
    assert out["columns"]["nans"]["n_buckets"] == 0


def test_asof_null_ts_semantics(spark):
    """DuckDB/pandas contract: a NULL timestamp never matches — null-ts
    snapshots must not be carried forward, null-ts events must match
    nothing in EITHER direction (review r10: a null-ts snapshot sorted
    first under asc order and leaked into every later event; a null-ts
    event sorted last under desc order and wrongly matched forward)."""
    left = spark.createDataFrame(
        [("a", _ts(1), 1), ("a", None, 2)], "k string, ts timestamp, q int"
    )
    right = spark.createDataFrame(
        [("a", None, 666.0), ("a", _ts(0), 100.0)],
        "k string, ts timestamp, px double",
    )
    back = {r["q"]: r["px"] for r in
            asof_join(left, right, on="ts", by="k").collect()}
    assert back == {1: 100.0, 2: None}
    fwd = {r["q"]: r["px"] for r in
           asof_join(left, right, on="ts", by="k",
                     direction="forward").collect()}
    assert fwd == {1: None, 2: None}


def test_reserved_and_collision_guards(spark):
    left = spark.createDataFrame([(1, 2, 3)], "k int, t int, __snap int")
    right = spark.createDataFrame([(1, 2, 3)], "k int, t int, v int")
    with pytest.raises(ValueError, match="reserved"):
        asof_join(left, right, on="t", by=["k"])
    with pytest.raises(ValueError, match="__bucket is reserved"):
        range_join(
            left.withColumnRenamed("__snap", "__bucket"),
            spark.createDataFrame([(0, 5)], "lo int, hi int"),
            "t", "lo", "hi",
        )
    # right payload columns colliding with left names get suffixed
    pts = spark.createDataFrame([(1, 3.0, "L")], "pid int, x double, tag string")
    ivs = spark.createDataFrame(
        [(9, 2.0, 4.0, "R")], "iid int, lo double, hi double, tag string"
    )
    row = range_join(pts, ivs, "x", "lo", "hi").collect()[0]
    assert row["tag"] == "L" and row["tag_right"] == "R"


def test_range_join_stream_matches_batch(spark, tmp_path):
    """range_join_stream: streaming points land in static intervals via
    the stateless bucketized stream-static join; pair set equals the
    batch operator on the same rows; guards refuse wrong-side frames."""
    from pandas_profiling_personal_spark.streaming.temporal_stream import (
        range_join_stream,
    )

    wins = spark.createDataFrame(
        [(100, _ts(1), _ts(2)), (200, _ts(3), _ts(5))],
        "win_id int, lo timestamp, hi timestamp",
    )
    rows = [
        (1, _ts(0, 30)),  # before everything
        (2, _ts(1, 30)),  # in win 100
        (3, _ts(2, 0)),   # ON win 100's hi: [) excludes
        (4, _ts(4, 0)),   # in win 200
    ]
    schema = "event_id int, ts timestamp"
    src = tmp_path / "rj_src"
    spark.createDataFrame(rows, schema).write.parquet(str(src))
    stream = spark.readStream.schema(schema).parquet(str(src))

    out = range_join_stream(stream, wins, "ts", "lo", "hi")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_rjs")
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(
            (r["event_id"], r["win_id"])
            for r in spark.table("t_rjs").collect()
        )
    finally:
        q.stop()
    assert got == [(2, 100), (4, 200)]

    batch = sorted(
        (r["event_id"], r["win_id"])
        for r in range_join(
            spark.createDataFrame(rows, schema), wins, "ts", "lo", "hi"
        ).collect()
    )
    assert got == batch

    with pytest.raises(ValueError, match="must be a streaming"):
        range_join_stream(
            spark.createDataFrame(rows, schema), wins, "ts", "lo", "hi"
        )
    with pytest.raises(ValueError, match="must be STATIC"):
        range_join_stream(stream, stream, "ts", "lo", "hi")


def test_asof_foreach_batch_store_loop(spark, tmp_path):
    """asof_foreach_batch: micro-batches as-of join against the parquet
    snapshot store; missing store + schema gives the all-null-match shape
    from batch zero; missing store without a schema fails loudly."""
    from pandas_profiling_personal_spark.streaming.temporal_stream import (
        asof_foreach_batch,
    )

    store_path = tmp_path / "snap_store"
    out_path = tmp_path / "asof_out"
    schema = "event_id int, user_id int, ts timestamp"
    rows = [(1, 7, _ts(1, 30)), (2, 7, _ts(0, 10)), (3, 8, _ts(2))]
    src = tmp_path / "asof_src"
    spark.createDataFrame(rows, schema).write.parquet(str(src))

    # store exists: real matches
    spark.createDataFrame(
        [(7, _ts(1), 100.0), (8, _ts(1), 5.0)],
        "user_id int, ts timestamp, state double",
    ).write.parquet(str(store_path))
    stream = spark.readStream.schema(schema).parquet(str(src))
    q = (
        stream.writeStream.foreachBatch(
            asof_foreach_batch(
                str(store_path), str(out_path), "ts", ["user_id"],
                value_cols=["state"],
            )
        )
        .option("checkpointLocation", str(tmp_path / "ckpt1"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r["event_id"]: r["state"]
        for r in spark.read.parquet(f"{out_path}/batch=0").collect()
    }
    assert got == {1: 100.0, 2: None, 3: 5.0}

    # missing store + schema -> stable null-match output; no schema -> loud
    proc = asof_foreach_batch(
        str(tmp_path / "no_store"), str(tmp_path / "out2"), "ts",
        ["user_id"], value_cols=["state"],
        store_schema="user_id int, ts timestamp, state double",
    )
    proc(spark.createDataFrame(rows, schema), 0)
    empty = spark.read.parquet(str(tmp_path / "out2" / "batch=0"))
    assert empty.count() == 3
    assert {r["state"] for r in empty.collect()} == {None}

    bad = asof_foreach_batch(
        str(tmp_path / "no_store2"), str(tmp_path / "out3"), "ts",
        ["user_id"], value_cols=["state"],
    )
    with pytest.raises(ValueError, match="store_schema"):
        bad(spark.createDataFrame(rows, schema), 0)


def test_pacf_ar1_structure_and_cli_timeseries(spark, tmp_path):
    """PACF (Durbin–Levinson over classical ACF): an AR(1) series shows
    pacf(1) ~ rho and pacf(k>=2) ~ 0 — the cut that identifies AR order;
    the CLI --timeseries-col flag renders the Time series section."""
    import subprocess
    import sys

    import pandas as pd

    # deterministic AR(1): x_t = 0.8 x_{t-1} + md5-noise
    xs = [0.0]
    for h in range(1, 400):
        eps = (int(hashlib.md5(str(h).encode()).hexdigest()[:8], 16) % 1000) / 500.0 - 1.0
        xs.append(0.8 * xs[-1] + eps)
    rows = [
        (dt.datetime(2024, 1, 1) + dt.timedelta(hours=h), xs[h])
        for h in range(400)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    from pandas_profiling_personal_spark.operators.timeseries import (
        timeseries_profile,
    )

    out = timeseries_profile(df, "ts", ["v"], lags=6)
    pacf = {p["lag"]: p["value"] for p in out["columns"]["v"]["pacf"]}
    assert 0.6 < pacf[1] < 0.95
    assert all(abs(pacf[k]) < 0.2 for k in (2, 3, 4, 5, 6))

    # CLI surface
    src = tmp_path / "ts.parquet"
    pd.DataFrame(
        {"ts": [r[0] for r in rows], "v": [r[1] for r in rows]}
    ).to_parquet(src)
    html_out = tmp_path / "rep.html"
    p = subprocess.run(
        [sys.executable, "-m", "pandas_profiling_personal_spark.cli",
         str(src), str(html_out), "--timeseries-col", "ts",
         "--master", "local[2]"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert p.returncode == 0, p.stderr[-2000:]
    page = html_out.read_text()
    assert "Time series" in page and "Autocorrelation" in page


def test_mergeable_timeseries_state(spark):
    """TimeseriesState: 3-shard merge finalizes EXACTLY like the
    whole-table tsmode pass (additive cells, shared finalization);
    JSON round-trips; mismatched specs refuse by name."""
    import json as _json
    import math

    from pandas_profiling_personal_spark.operators.timeseries import (
        timeseries_profile,
    )
    from pandas_profiling_personal_spark.plans.incremental import (
        TimeseriesState,
        merge_timeseries_states,
        timeseries_of,
        timeseries_partial,
    )

    rows = []
    for h in range(120):
        ts = dt.datetime(2024, 1, 1) + dt.timedelta(hours=h)
        v = math.sin(2 * math.pi * (h % 24) / 24) * 5 + (h % 7)
        rows.append((ts, v, float(h)))
    df = spark.createDataFrame(rows, "ts timestamp, a double, b double")

    whole = timeseries_profile(df, "ts", ["a", "b"], lags=8)
    shards = [
        timeseries_partial(
            df.where(F.hour("ts") % 3 == i), "ts", ["a", "b"]
        )
        for i in range(3)
    ]
    # JSON round-trip each shard before merging (the daily loop's shape)
    shards = [
        TimeseriesState.from_json(s.to_json()) for s in shards
    ]
    merged = merge_timeseries_states(shards)
    got = timeseries_of(merged, lags=8)

    assert got["n_buckets"] == whole["n_buckets"]
    assert got["empty_buckets"] == whole["empty_buckets"]
    for c in ("a", "b"):
        w, g = whole["columns"][c], got["columns"][c]
        assert g["n_buckets"] == w["n_buckets"]
        assert abs(g["trend_r"] - w["trend_r"]) < 1e-12
        assert abs(g["seasonal_strength"] - w["seasonal_strength"]) < 1e-12
        for ga, wa in zip(g["acf"], w["acf"]):
            assert ga["n_pairs"] == wa["n_pairs"]
            assert (ga["value"] is None) == (wa["value"] is None)
            if ga["value"] is not None:
                assert abs(ga["value"] - wa["value"]) < 1e-12
        for gp, wp in zip(g.get("pacf", []), w.get("pacf", [])):
            assert abs(gp["value"] - wp["value"]) < 1e-12
    _json.loads(merged.to_json())

    other = timeseries_partial(df, "ts", ["a", "b"], granularity="day")
    with pytest.raises(ValueError, match="disagree"):
        merge_timeseries_states([shards[0], other])


def test_cli_timeseries_state_loop(tmp_path):
    """CLI daily loop for the time-series sidecar: --save-state writes
    STATE.ts; --align-state carries the stored spec forward and refuses
    explicit disagreement; --drift-against reports structure deltas and
    flags the column whose trend flipped."""
    import json as _json
    import subprocess
    import sys

    import pandas as pd

    def mk(path, rising):
        ts = [dt.datetime(2024, 1, 1) + dt.timedelta(hours=h)
              for h in range(96)]
        v = [float(h) if rising else float(96 - h) for h in range(96)]
        pd.DataFrame({"ts": ts, "v": v}).to_parquet(path)

    day1 = tmp_path / "d1.parquet"
    day2 = tmp_path / "d2.parquet"
    mk(day1, rising=True)
    mk(day2, rising=False)  # trend reversed -> trend_r delta ~ -2
    st = tmp_path / "st.json"

    def run(*argv):
        return subprocess.run(
            [sys.executable, "-m", "pandas_profiling_personal_spark.cli",
             *argv, "--master", "local[2]"],
            capture_output=True, text=True, timeout=300, cwd="/root/repo",
        )

    p = run(str(day1), "--save-state", str(st), "--timeseries-col", "ts")
    assert p.returncode == 0, p.stderr[-2000:]
    info = _json.loads(p.stdout.strip().splitlines()[-1])
    assert info["timeseries_state"] == str(st) + ".ts"

    # align: stored spec carried forward without re-declaring the flag
    st2 = tmp_path / "st2.json"
    p2 = run(str(day2), "--save-state", str(st2), "--align-state", str(st))
    assert p2.returncode == 0, p2.stderr[-2000:]
    assert _json.loads(
        p2.stdout.strip().splitlines()[-1]
    )["timeseries_state"] == str(st2) + ".ts"

    # explicit disagreement refuses by name
    p3 = run(str(day2), "--save-state", str(st2), "--align-state", str(st),
             "--timeseries-col", "v")
    assert p3.returncode != 0
    assert "disagrees with the aligned state's sidecar column" in (
        p3.stderr + p3.stdout
    )

    # drift: reversed trend flags the column
    out = tmp_path / "drift.html"
    p4 = run(str(day2), str(out), "--drift-against", str(st))
    assert p4.returncode == 0, p4.stderr[-2000:]
    summary = _json.loads(p4.stdout.strip().splitlines()[-1])
    assert summary["timeseries_flagged"] == ["v"]
    d = summary["timeseries_drift"]["v"]
    assert d["trend_r_a"] > 0.99 and d["trend_r_b"] < -0.99
    page = out.read_text()
    assert "Time-series structure" in page
    assert "DRIFT_TS_STRUCTURE" in page

    # drift with an explicit flag but no sidecar refuses by name
    st3 = tmp_path / "st3.json"
    assert run(str(day1), "--save-state", str(st3)).returncode == 0
    p5 = run(str(day2), str(out), "--drift-against", str(st3),
             "--timeseries-col", "ts")
    assert p5.returncode != 0
    assert "has no .ts sidecar" in (p5.stderr + p5.stdout)


def test_ts_drift_in_report_and_alerts(tmp_path):
    """DRIFT_TS_STRUCTURE flows through drift_alerts and the drift HTML:
    the flagged metric is named on the alert, the report renders a
    Time-series structure table; the CLI drift HTML carries it too."""
    from pandas_profiling_personal_spark.operators.drift import (
        drift_alerts,
        drift_report_html,
    )

    rows = [
        {
            "column": "v",
            "acf1_a": 0.1, "acf1_b": 0.15, "acf1_delta": 0.05,
            "trend_r_a": 0.99, "trend_r_b": -0.99, "trend_r_delta": -1.98,
            "seasonal_strength_a": 0.0, "seasonal_strength_b": 0.05,
            "seasonal_strength_delta": 0.05,
            "flagged": True,
        },
        {
            "column": "w",
            "acf1_a": 0.2, "acf1_b": 0.21, "acf1_delta": 0.01,
            "trend_r_a": 0.0, "trend_r_b": 0.02, "trend_r_delta": 0.02,
            "seasonal_strength_a": 0.5, "seasonal_strength_b": 0.48,
            "seasonal_strength_delta": -0.02,
            "flagged": False,
        },
    ]
    alerts = drift_alerts(timeseries_rows=rows)
    assert len(alerts) == 1
    a = alerts[0]
    assert a["type"] == "DRIFT_TS_STRUCTURE" and a["column"] == "v"
    assert "trend_r_delta" in a and "acf1_delta" not in a

    page = drift_report_html(timeseries_rows=rows)
    assert "Time-series structure" in page and "DRIFT_TS_STRUCTURE" in page


def test_asof_all_directions_match_pandas(spark):
    """Randomized equivalence against pandas.merge_asof itself for all
    three directions (+ tolerance): 400 events x 120 snapshots over 5
    keys, exact match of matched values including the nearest tie rule
    (ties go backward)."""
    import random

    import pandas as pd

    rnd = random.Random(42)
    left_rows = [
        (i, rnd.randrange(5), rnd.randrange(0, 100000))
        for i in range(400)
    ]
    right_rows = [
        (rnd.randrange(5), rnd.randrange(0, 100000) , j)
        for j in range(120)
    ]
    # unique (k, t) on the right — merge_asof needs a deterministic winner
    seen = set()
    right_rows = [
        (k, t, j) for k, t, j in right_rows
        if not ((k, t) in seen or seen.add((k, t)))
    ]
    ldf = spark.createDataFrame(left_rows, "eid int, k int, t long")
    rdf = spark.createDataFrame(right_rows, "k int, t long, v int")

    lp = pd.DataFrame(left_rows, columns=["eid", "k", "t"]).sort_values("t")
    rp = pd.DataFrame(right_rows, columns=["k", "t", "v"]).sort_values("t")
    for direction, tol in [
        ("backward", None), ("forward", None),
        ("nearest", None), ("nearest", 500),
    ]:
        exp = pd.merge_asof(
            lp, rp, on="t", by="k", direction=direction,
            tolerance=tol,
        ).set_index("eid")["v"]
        got = {
            r["eid"]: r["v"]
            for r in asof_join(
                ldf, rdf, on="t", by=["k"], value_cols=["v"],
                direction=direction, tolerance_s=tol,
            ).collect()
        }
        for eid, want in exp.items():
            have = got[eid]
            want_v = None if pd.isna(want) else int(want)
            assert have == want_v, (
                f"{direction} tol={tol} eid={eid}: spark={have} "
                f"pandas={want_v}"
            )


def test_detect_anomalies_planted_spike(spark):
    """detect_anomalies: a planted 50x spike is flagged, its neighbours
    are not (the baseline EXCLUDES self so the spike cannot mask itself);
    low-support edge buckets return NULL; the exact-integer stable tier
    agrees with the float tier."""
    from pandas_profiling_personal_spark.operators.timeseries import (
        detect_anomalies,
    )

    rows = []
    for h in range(48):
        v = 10.0 + (h % 5) * 0.1  # calm series
        if h == 24:
            v = 500.0  # the spike
        rows.append((dt.datetime(2024, 1, 1) + dt.timedelta(hours=h), v))
    df = spark.createDataFrame(rows, "ts timestamp, value double")

    for stable in (False, True):
        out = {
            r["t"].day * 100 + r["t"].hour: (r["flagged"], r["baseline_n"])
            for r in detect_anomalies(
                df, "ts", "value", window_buckets=12, min_support=8,
                stable=stable,
            ).collect()
        }
        flagged = {k for k, (f, _) in out.items() if f}
        assert flagged == {200}, (stable, flagged)  # day 2 hour 0 == h 24
        # first buckets: baseline support below min_support -> NULL
        assert out[100][0] is None and out[100][1] < 8
        # a calm mid-series bucket is explicitly False, not NULL
        assert out[112][0] is False

    with pytest.raises(ValueError, match="window_buckets"):
        detect_anomalies(df, "ts", "value", window_buckets=1)


def test_timeseries_state_all_null_bucket_consistency(spark):
    """A bucket whose every tracked column is null counts the same in the
    batch tsmode pass and the merged state (review r10: the batch path
    counted raw grid rows, the state stores only n>0 cells — coverage is
    defined as buckets with >=1 tracked observation on BOTH paths)."""
    from pandas_profiling_personal_spark.operators.timeseries import (
        timeseries_profile,
    )
    from pandas_profiling_personal_spark.plans.incremental import (
        merge_timeseries_states,
        timeseries_of,
        timeseries_partial,
    )

    rows = [
        (_ts(0), 1.0, 2.0),
        (_ts(1), None, None),  # ts rows exist, every value null
        (_ts(2), 3.0, None),
        (_ts(5), 4.0, 5.0),  # hours 3-4 truly empty
    ]
    df = spark.createDataFrame(rows, "ts timestamp, a double, b double")
    whole = timeseries_profile(df, "ts", ["a", "b"], lags=2)
    merged = merge_timeseries_states(
        [
            timeseries_partial(df.where(F.hour("ts") % 2 == i), "ts", ["a", "b"])
            for i in range(2)
        ]
    )
    got = timeseries_of(merged, lags=2)
    assert whole["n_buckets"] == got["n_buckets"] == 3
    assert whole["empty_buckets"] == got["empty_buckets"] == 3


def test_asof_date_axis_and_stream_range_by_keys(spark, tmp_path):
    """DATE on-columns work through the epoch-micros view; the streaming
    range join honors equality keys; the CLI granularity disagreement
    refuses by name."""
    import subprocess
    import sys

    import pandas as pd

    from pandas_profiling_personal_spark.streaming.temporal_stream import (
        range_join_stream,
    )

    d = dt.date
    left = spark.createDataFrame(
        [(1, "a", d(2024, 1, 5)), (2, "a", d(2024, 1, 1))],
        "eid int, k string, t date",
    )
    right = spark.createDataFrame(
        [("a", d(2024, 1, 3), 7.0)], "k string, t date, v double"
    )
    got = {
        r["eid"]: r["v"]
        for r in asof_join(left, right, on="t", by=["k"]).collect()
    }
    assert got == {1: 7.0, 2: None}

    # streaming range join with a by key: only same-key windows match
    wins = spark.createDataFrame(
        [("a", 0, 10, 100), ("b", 0, 10, 200)],
        "k string, lo int, hi int, win_id int",
    )
    rows = [(1, "a", 5), (2, "b", 5), (3, "a", 50)]
    schema = "eid int, k string, x int"
    src = tmp_path / "rjk_src"
    spark.createDataFrame(rows, schema).write.parquet(str(src))
    stream = spark.readStream.schema(schema).parquet(str(src))
    q = (
        range_join_stream(stream, wins, "x", "lo", "hi", by=["k"])
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_rjk")
        .start()
    )
    try:
        q.processAllAvailable()
        pairs = sorted(
            (r["eid"], r["win_id"]) for r in spark.table("t_rjk").collect()
        )
    finally:
        q.stop()
    assert pairs == [(1, 100), (2, 200)]

    # CLI: explicit granularity disagreeing with the aligned sidecar
    day1 = tmp_path / "g1.parquet"
    ts = [dt.datetime(2024, 1, 1) + dt.timedelta(hours=h) for h in range(30)]
    pd.DataFrame({"ts": ts, "v": [float(h) for h in range(30)]}).to_parquet(day1)
    st = tmp_path / "g_st.json"

    def run(*argv):
        return subprocess.run(
            [sys.executable, "-m", "pandas_profiling_personal_spark.cli",
             *argv, "--master", "local[2]"],
            capture_output=True, text=True, timeout=300, cwd="/root/repo",
        )

    assert run(str(day1), "--save-state", str(st),
               "--timeseries-col", "ts").returncode == 0
    p = run(str(day1), "--save-state", str(tmp_path / "g_st2.json"),
            "--align-state", str(st), "--timeseries-granularity", "day")
    assert p.returncode != 0
    assert "disagrees with the aligned sidecar's granularity" in (
        p.stderr + p.stdout
    )


def test_grid_cap_refuses_loudly(spark):
    """grid_cells refuses when the bucket count exceeds the driver-collect
    cap, naming the fix — never a silent driver OOM."""
    from pandas_profiling_personal_spark.operators.timeseries import (
        grid_cells,
    )

    rows = [
        (dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m), float(m))
        for m in range(0, 240)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    with pytest.raises(ValueError, match="coarser granularity"):
        grid_cells(df, "ts", ["v"], "minute", max_grid_rows=100)
    # under the cap: full result
    cells = grid_cells(df, "ts", ["v"], "minute", max_grid_rows=240)
    assert len(cells["v"]) == 240


def test_tsmode_anomalies_in_profile(spark):
    """profile(timeseries_ts_col=) surfaces anomalous buckets: a planted
    spike shows up in the column's anomalies list, fires TS_ANOMALIES,
    and renders an Anomalies tab; calm columns carry none."""
    from pandas_profiling_personal_spark import ProfileConfig, profile
    from pandas_profiling_personal_spark.report.html import render_html

    rows = []
    for h in range(72):
        v = 10.0 + (h % 3) * 0.1
        if h == 36:
            v = 400.0
        rows.append(
            (dt.datetime(2024, 1, 1) + dt.timedelta(hours=h), v, 1.0)
        )
    df = spark.createDataFrame(rows, "ts timestamp, spiky double, calm double")
    res = profile(
        df,
        ProfileConfig(
            correlations=(), duplicates=False, timeseries_ts_col="ts"
        ),
    )
    sp = res.timeseries["columns"]["spiky"]
    assert sp["n_anomalies"] == 1
    assert sp["anomalies"][0]["t"].day == 2 and sp["anomalies"][0]["t"].hour == 12
    assert res.timeseries["columns"]["calm"]["n_anomalies"] == 0
    kinds = {(a["type"], a.get("column")) for a in res.alerts}
    assert ("TS_ANOMALIES", "spiky") in kinds
    assert not any(k == "TS_ANOMALIES" and c == "calm" for k, c in kinds)
    page = render_html(res)
    assert "Anomalies" in page and "400" in page


def test_asof_null_by_key_matches_nothing(spark):
    """NULL by-keys match nothing (pandas merge_asof / SQL equality
    semantics) — a Spark window would otherwise PARTITION null keys
    together and match null-key events to null-key snapshots."""
    left = spark.createDataFrame(
        [(1, "a", 10), (2, None, 10)], "eid int, k string, t int"
    )
    right = spark.createDataFrame(
        [("a", 5, 1.0), (None, 5, 666.0)], "k string, t int, v double"
    )
    got = {
        r["eid"]: r["v"]
        for r in asof_join(left, right, on="t", by=["k"]).collect()
    }
    assert got == {1: 1.0, 2: None}


def test_asof_composite_keys(spark):
    """Multiple equality keys: matches require BOTH keys equal; the plan
    still hashes once on the composite."""
    left = spark.createDataFrame(
        [(1, "a", 1, 10), (2, "a", 2, 10), (3, "b", 1, 10)],
        "eid int, k1 string, k2 int, t int",
    )
    right = spark.createDataFrame(
        [("a", 1, 5, 1.0), ("a", 2, 5, 2.0), ("b", 2, 5, 3.0)],
        "k1 string, k2 int, t int, v double",
    )
    got = {
        r["eid"]: r["v"]
        for r in asof_join(
            left, right, on="t", by=["k1", "k2"], value_cols=["v"]
        ).collect()
    }
    assert got == {1: 1.0, 2: 2.0, 3: None}


def test_tsmode_skipped_under_redact(spark):
    """redact skips the time-series tier (the segments rule): bucket
    means of single-row buckets and anomaly values ARE data values."""
    from pandas_profiling_personal_spark import ProfileConfig, profile

    rows = [
        (dt.datetime(2024, 1, 1) + dt.timedelta(hours=h), float(h))
        for h in range(30)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    res = profile(
        df,
        ProfileConfig(
            correlations=(), duplicates=False,
            timeseries_ts_col="ts", redact=True,
        ),
    )
    assert res.timeseries == {}
    assert not any(a["type"].startswith("TS_") for a in res.alerts)


def test_seasonal_decompose_identity_and_centering(spark):
    """v = trend + seasonal + resid holds per bucket; the period effects
    are centered (sum ~0); a planted diurnal pattern over a linear level
    lands in the seasonal component, not the residual."""
    from pandas_profiling_personal_spark.operators.timeseries import (
        seasonal_decompose,
    )

    # 8 days hourly: linear trend + a deterministic hour-of-day effect
    rows = []
    for h in range(24 * 8):
        t = dt.datetime(2024, 3, 1) + dt.timedelta(hours=h)
        season = 10.0 if (h % 24) == 12 else 0.0
        rows.append((t, 0.05 * h + season))
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    out = seasonal_decompose(df, "ts", "v", window_buckets=24)
    got = {r["t"]: r.asDict() for r in out.collect()}
    assert len(got) == 24 * 8
    for r in got.values():
        assert r["resid"] == pytest.approx(
            r["v"] - r["trend"] - r["seasonal"], abs=1e-9)
    # period effects centered
    by_pos = {}
    for r in got.values():
        by_pos[r["period_pos"]] = r["seasonal"]
    assert sum(by_pos.values()) == pytest.approx(0.0, abs=1e-9)
    # the planted noon spike dominates the seasonal component and the
    # mid-series (full-window) residuals stay small
    assert by_pos[12] == pytest.approx(10.0 - 10.0 / 24, abs=0.2)
    mid = [
        r for r in got.values()
        if r["trend_support"] == 24 and r["period_pos"] != 12
    ]
    assert mid and max(abs(r["resid"]) for r in mid) < 1.0

    # constant series: seasonal and resid are ~0 everywhere
    const = spark.createDataFrame(
        [(dt.datetime(2024, 3, 1) + dt.timedelta(hours=h), 5.0)
         for h in range(48)], "ts timestamp, v double")
    for r in seasonal_decompose(const, "ts", "v", 24).collect():
        assert r["seasonal"] == pytest.approx(0.0, abs=1e-9)
        assert r["resid"] == pytest.approx(0.0, abs=1e-9)

    with pytest.raises(ValueError, match="period must be one of"):
        seasonal_decompose(df, "ts", "v", period="fortnight")


def test_seasonal_decompose_of_state_matches_batch(spark):
    """The state-mode decomposition equals the batch operator bucket for
    bucket — including when the state was built from merged shards — and
    costs zero Spark jobs."""
    from pandas_profiling_personal_spark.plans.incremental import (
        merge_timeseries_states, seasonal_decompose_of, timeseries_partial,
    )
    from pandas_profiling_personal_spark.operators.timeseries import (
        seasonal_decompose,
    )

    rows = [
        (dt.datetime(2024, 3, 1) + dt.timedelta(hours=h),
         0.05 * h + (7.0 if h % 24 == 9 else 0.0))
        for h in range(24 * 6)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    batch = {r["t"]: r.asDict()
             for r in seasonal_decompose(df, "ts", "v", 24).collect()}

    # two shards split mid-series, merged
    cut = dt.datetime(2024, 3, 4)
    st = merge_timeseries_states([
        timeseries_partial(df.where(F.col("ts") < cut), "ts", ["v"]),
        timeseries_partial(df.where(F.col("ts") >= cut), "ts", ["v"]),
    ])
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    state_rows = seasonal_decompose_of(st, "v", 24)
    assert len(tracker.getJobIdsForGroup(None) or []) == before
    assert len(state_rows) == len(batch)
    for r in state_rows:
        b = batch[r["t"]]
        assert r["period_pos"] == b["period_pos"]
        assert r["n"] == b["n"]
        for k in ("v", "trend", "seasonal", "resid"):
            assert r[k] == pytest.approx(b[k], abs=1e-9), (r["t"], k)
        assert r["trend_support"] == b["trend_support"]

    with pytest.raises(ValueError, match="not in state"):
        seasonal_decompose_of(st, "ghost")
    with pytest.raises(ValueError, match="period must be"):
        seasonal_decompose_of(st, "v", period="fortnight")
