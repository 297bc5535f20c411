"""Declarative constraint suite (operators/checks.py).

Semantics pinned against hand-computed values on crafted frames; the
suggestion property (suggested checks pass on the profiled frame); plan gates
for the one-scan / one-shuffle-per-family compilation contract."""

import pytest

from pandas_profiling_personal_spark.operators import checks as C
from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        # id, val, cat, fk
        (1, 10.0, "a", 100),
        (2, 20.0, "b", 100),
        (3, None, "a", 200),
        (4, -5.0, "zzz", 999),   # out of range, out of set, dangling fk
        (4, 40.0, "b", None),    # duplicate id; NULL fk passes vacuously
        (6, 60.0, None, 200),
    ]
    return spark.createDataFrame(rows, "id int, val double, cat string, fk int")


@pytest.fixture(scope="module")
def parent(spark):
    return spark.createDataFrame([(100,), (200,), (200,)], "pk int")


def _by_name(df, refs=None):
    return {r["check_name"]: r.asDict() for r in df.collect()}


def test_scalar_semantics(frame):
    res = C.check_suite(frame, [
        C.completeness("val", 0.8, name="comp"),
        C.in_range("val", 0, 100, name="rng"),
        C.is_in_set("cat", ["a", "b"], name="set"),
        C.matches("cat", "^[ab]$", name="re"),
        C.non_negative("val", name="nn"),
        C.mean_between("val", 20, 30, name="mean"),
        C.sum_between("val", 125, 125, name="sum"),
        C.min_between("val", -5, -5, name="mn"),
        C.max_between("val", None, 60, name="mx"),
        C.row_count_between(6, 6, name="rc"),
        C.quantile_between("val", 0.5, 19, 21, name="med"),
        C.satisfies("val > 0 AND id < 5", "sat", min_ratio=0.5),
    ])
    r = _by_name(res)
    assert r["comp"]["value"] == pytest.approx(5 / 6, abs=1e-4)
    assert r["comp"]["passed"]
    # compliance over NON-NULL rows: 4/5 in range
    assert r["rng"]["value"] == pytest.approx(4 / 5, abs=1e-4)
    assert not r["rng"]["passed"]
    # cat: 5 non-null, 4 in {a,b}
    assert r["set"]["value"] == pytest.approx(4 / 5, abs=1e-4)
    assert r["re"]["value"] == pytest.approx(4 / 5, abs=1e-4)
    assert r["nn"]["value"] == pytest.approx(4 / 5, abs=1e-4)
    assert r["mean"]["value"] == pytest.approx(25.0)
    assert r["mean"]["passed"]
    assert r["sum"]["value"] == pytest.approx(125.0)
    assert r["sum"]["passed"]
    assert r["mn"]["passed"] and r["mx"]["passed"]
    assert r["rc"]["value"] == 6.0 and r["rc"]["passed"]
    assert r["med"]["value"] == pytest.approx(20.0)
    assert r["med"]["passed"]
    # satisfies counts ALL rows in the denominator: rows 1,2 and the (4,40)
    # duplicate → 3/6; NULL predicate counts as not satisfied
    assert r["sat"]["value"] == pytest.approx(3 / 6, abs=1e-4)
    assert r["sat"]["passed"]


def test_key_family_semantics(frame):
    res = C.check_suite(frame, [
        C.uniqueness("id", name="uniq"),
        C.distinctness("id", name="dist"),
        C.primary_key("id", name="pk_id"),
        C.primary_key("cat", name="pk_cat"),
        C.uniqueness(["id", "cat"], name="uniq2"),
    ])
    r = _by_name(res)
    # id: 6 rows, groups {1,2,3,4x2,6} → 4 singleton rows
    assert r["uniq"]["value"] == pytest.approx(4 / 6, abs=1e-4)
    assert not r["uniq"]["passed"]
    assert r["dist"]["value"] == pytest.approx(5 / 6, abs=1e-4)
    assert not r["pk_id"]["passed"]
    # cat has a NULL component → primary_key forced to 0
    assert r["pk_cat"]["value"] == 0.0 and not r["pk_cat"]["passed"]
    # (id,cat): (4,'zzz') and (4,'b') differ → all 6 keys distinct... except
    # none repeat → uniqueness 1.0
    assert r["uniq2"]["value"] == 1.0 and r["uniq2"]["passed"]


def test_foreign_key_and_fd(frame, parent):
    res = C.check_suite(frame, [
        C.foreign_key("fk", "parent", "pk", name="fk0"),
        C.foreign_key("fk", "parent", "pk", max_violation_ratio=0.25, name="fk25"),
        C.functional_dependency("id", "cat", name="fd_bad"),
        C.functional_dependency("fk", "val", name="fd_fk"),
    ], refs={"parent": parent})
    r = _by_name(res)
    # 5 non-null fk rows, 999 dangles → 1/5
    assert r["fk0"]["value"] == pytest.approx(0.2, abs=1e-4)
    assert not r["fk0"]["passed"]
    assert r["fk25"]["passed"]
    # id groups: {1,2,3,6} one cat each; {4}: {'zzz','b'} violates → 4/5
    assert r["fd_bad"]["value"] == pytest.approx(4 / 5, abs=1e-4)
    assert not r["fd_bad"]["passed"]
    # fk groups: 100→{10,20}, 200→{None?,60}: val None counts as a value →
    # 200→{NULL,60} violates; NULL fk group → {40}; 999→{-5}
    assert r["fd_fk"]["value"] == pytest.approx(2 / 4, abs=1e-4)


def test_fk_missing_ref_and_bad_suite(frame):
    with pytest.raises(ValueError, match="references frame"):
        C.check_suite(frame, [C.foreign_key("fk", "nope", "pk")])
    with pytest.raises(ValueError, match="duplicate check names"):
        C.check_suite(frame, [C.completeness("val"), C.completeness("val")])
    with pytest.raises(ValueError, match="empty check list"):
        C.check_suite(frame, [])
    with pytest.raises(ValueError, match="different lengths"):
        C.foreign_key(["a", "b"], "p", "pk")


def test_empty_frame_vacuous(spark):
    empty = spark.createDataFrame([], "id int, val double")
    res = C.check_suite(empty, [
        C.completeness("val", name="comp"),
        C.in_range("val", 0, 1, name="rng"),
        C.mean_between("val", 0, 1, name="mean"),
        C.row_count_between(None, 0, name="rc"),
    ])
    r = _by_name(res)
    # ratios over zero rows are NULL → vacuous pass; row_count is real
    assert r["comp"]["value"] is None and r["comp"]["passed"]
    assert r["rng"]["value"] is None and r["rng"]["passed"]
    assert r["mean"]["value"] is None and r["mean"]["passed"]
    assert r["rc"]["value"] == 0.0 and r["rc"]["passed"]


def test_all_null_column_compliance_vacuous(spark):
    df = spark.createDataFrame([(None,), (None,)], "v double")
    r = _by_name(C.check_suite(df, [C.in_range("v", 0, 1, name="rng")]))
    assert r["rng"]["value"] is None and r["rng"]["passed"]


def test_summary_and_alerts(frame):
    res = C.check_suite(frame, [
        C.completeness("val", 1.0, name="comp"),
        C.uniqueness("id", name="uniq"),
    ])
    s = C.validation_summary(res)
    assert s["n_checks"] == 2 and s["n_failed"] == 2 and not s["passed"]
    alerts = C.check_alerts(s)
    assert {a["alert_type"] for a in alerts} == {"CHECK_FAILED"}
    assert {a["check_name"] for a in alerts} == {"comp", "uniq"}


def test_suggestion_property(spark):
    """Every check suggested from a profile passes on the profiled frame."""
    from pandas_profiling_personal_spark.plans.profile import profile

    df = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    result = profile(df)
    suggested = C.suggest_checks(result.variables)
    assert suggested, "expected non-empty suggestions"
    kinds = {c.kind for c in suggested}
    assert {"completeness", "in_range"} <= kinds
    res = C.check_suite(df, suggested)
    failed = [r["check_name"] for r in res.collect() if not r["passed"]]
    assert failed == []
    # o_orderkey is unique → a uniqueness check must be among the suggestions
    assert any(
        c.kind == "uniqueness" and c.columns == ("o_orderkey",) for c in suggested
    )
    # with the frame's schema, a schema contract leads the suite and the
    # suggestion property still holds on the profiled frame
    with_schema = C.suggest_checks(result.variables, spark_schema=df.schema)
    assert with_schema[0].kind == "schema"
    rows2 = C.check_suite(df, with_schema).collect()
    assert all(r["passed"] for r in rows2)
    # the contract actually bites: a re-typed column fails it
    retyped = df.withColumn(
        "o_orderkey", df["o_orderkey"].cast("string"))
    r3 = {r["check_name"]: r for r in
          C.check_suite(retyped, [with_schema[0]]).collect()}
    assert not r3["schema"]["passed"]


def test_plan_scalar_single_scan_no_python(spark):
    df = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    res = C.check_suite(df, [
        C.completeness("o_custkey"),
        C.in_range("o_totalprice", 0, 1e9),
        C.is_in_set("o_orderstatus", ["F", "O", "P"]),
        C.mean_between("o_totalprice", 0, 1e9),
        C.row_count_between(1, None),
    ])
    p = _plan(res)
    # formatted explain prints each node twice (tree + details): ONE scan
    assert p.count("Scan parquet") == 2, "scalar suite must be a single scan"
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "partial_count" in p or "partial_avg" in p


def test_plan_key_family_one_melt_shuffle(spark):
    df = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    res = C.check_suite(df, [
        C.uniqueness("o_orderkey"),
        C.distinctness("o_orderstatus"),
        C.primary_key(["o_orderkey", "o_custkey"]),
    ])
    p = _plan(res)
    assert p.count("Scan parquet") == 2, "key family shares one melt scan"
    # one hashpartitioning exchange on (sid,key), one on sid, plus the final
    # orderBy range exchange — no per-subset scans or joins
    assert "Join" not in p
    assert p.count("Arguments: hashpartitioning") == 2


def test_plan_fk_distinct_parent_join(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    customer = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    res = C.check_suite(
        orders,
        [C.foreign_key("o_custkey", "customer", "c_custkey")],
        refs={"customer": customer},
    )
    p = _plan(res)
    # ONE scan per side (formatted explain prints each node twice): the
    # violation and total counts ride the same conditional aggregate over a
    # single left join; the parent deduplicates to key cardinality first and
    # the child scan prunes to the key column
    assert p.count("Scan parquet") == 4
    assert p.count("Join type: LeftOuter") == 1
    assert "HashAggregate" in p
    for line in (l for l in p.splitlines() if "ReadSchema" in l):
        assert "o_totalprice" not in line


# ---------------------------------------------------------------------------
# incremental tier: checks_of(state) vs batch check_suite
# ---------------------------------------------------------------------------


def _merged_state(spark, with_hist=False):
    from pyspark.sql import functions as F
    from pandas_profiling_personal_spark.plans.incremental import (
        merge_partials, partial_profile,
    )

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    shards = [orders.filter(F.col("o_orderkey") % 3 == i) for i in range(3)]
    return orders, merge_partials([partial_profile(s) for s in shards])


def test_checks_of_exact_kinds_match_batch(spark):
    from pandas_profiling_personal_spark.plans.incremental import checks_of

    orders, merged = _merged_state(spark)
    suite = [
        C.completeness("o_custkey", 1.0, name="comp"),
        C.row_count_between(1, None, name="rc"),
        C.mean_between("o_totalprice", 0, 1e9, name="mean"),
        C.sum_between("o_totalprice", 0, None, name="sum"),
        C.min_between("o_totalprice", 0, None, name="mn"),
        C.max_between("o_totalprice", None, 1e9, name="mx"),
        C.stddev_between("o_totalprice", 0, 1e9, name="sd"),
    ]
    state_rows = {r["check_name"]: r for r in checks_of(merged, suite)}
    batch_rows = {r["check_name"]: r.asDict()
                  for r in C.check_suite(orders, suite).collect()}
    for name in state_rows:
        sr, br = state_rows[name], batch_rows[name]
        assert sr["passed"] == br["passed"], name
        assert sr["exact"] is True
        if br["value"] is None:
            assert sr["value"] is None, name
        else:
            # sum rides m1*count (FP ~1e-12 rel); everything else identical
            tol = abs(br["value"]) * 1e-9 + 1e-9
            assert abs(sr["value"] - br["value"]) <= max(tol, 5e-4), name


def test_checks_of_decidable_in_range(spark):
    from pandas_profiling_personal_spark.plans.incremental import checks_of

    _, merged = _merged_state(spark)
    rows = {r["check_name"]: r for r in checks_of(merged, [
        C.in_range("o_totalprice", 0, 1e9, name="fits"),
        C.in_range("o_totalprice", 0, 100, name="breaks"),
        C.non_negative("o_totalprice", name="nn"),
    ])}
    assert rows["fits"]["value"] == 1.0 and rows["fits"]["passed"]
    assert rows["breaks"]["value"] is None and not rows["breaks"]["passed"]
    assert rows["nn"]["passed"]
    for r in rows.values():
        assert r["exact"] is True


def test_checks_of_sketch_kinds(spark):
    from pandas_profiling_personal_spark.plans.incremental import checks_of

    orders, merged = _merged_state(spark)
    exact_med = orders.selectExpr(
        "percentile(o_totalprice, 0.5) AS m").collect()[0]["m"]
    n = orders.count()
    rows = {r["check_name"]: r for r in checks_of(merged, [
        C.quantile_between("o_totalprice", 0.5, 0, 1e9, name="med"),
        C.distinctness("o_orderkey", 0.99, name="dist"),
    ], spark=spark)}
    assert rows["med"]["exact"] is False
    assert rows["med"]["value"] == pytest.approx(exact_med, rel=0.05)
    assert rows["med"]["passed"]
    assert rows["dist"]["exact"] is False
    assert rows["dist"]["value"] == pytest.approx(1.0, rel=0.05)
    assert rows["dist"]["passed"]
    assert n == merged.n


def test_checks_of_refusals(spark):
    from pandas_profiling_personal_spark.plans.incremental import checks_of

    _, merged = _merged_state(spark)
    with pytest.raises(ValueError, match="needs a scan"):
        checks_of(merged, [C.uniqueness("o_orderkey")])
    with pytest.raises(ValueError, match="min_ratio < 1.0"):
        checks_of(merged, [C.in_range("o_totalprice", 0, 1e9, min_ratio=0.9)])
    with pytest.raises(ValueError, match="not in state"):
        checks_of(merged, [C.completeness("nope")])
    with pytest.raises(ValueError, match="NUMERIC state column"):
        checks_of(merged, [C.mean_between("o_orderstatus", 0, 1)])
    with pytest.raises(ValueError, match="pass the SparkSession"):
        checks_of(merged, [C.quantile_between("o_totalprice", 0.5, 0, 1)])


# ---------------------------------------------------------------------------
# CLI loop: suggest -> gate -> gate-from-state
# ---------------------------------------------------------------------------


def test_cli_checks_loop(tmp_path):
    import json
    import subprocess
    import sys

    import pandas as pd

    src = tmp_path / "day.parquet"
    pd.DataFrame({
        "id": list(range(30)),
        "price": [float(10 + i % 7) for i in range(30)],
        "status": ["F" if i % 2 else "O" for i in range(30)],
    }).to_parquet(src)

    def run(*argv, expect=0):
        proc = subprocess.run(
            [sys.executable, "-m", "pandas_profiling_personal_spark.cli",
             *argv, "--master", "local[2]"],
            capture_output=True, text=True, timeout=300, cwd="/root/repo",
        )
        assert proc.returncode == expect, (proc.returncode, proc.stderr[-2000:])
        return proc

    # 1. suggest a suite from the profile
    suite_path = tmp_path / "suite.json"
    out = run(str(src), "--minimal", "--suggest-checks", str(suite_path))
    meta = json.loads(out.stdout.strip().splitlines()[-1])
    assert meta["n_checks"] > 0 and "completeness" in meta["kinds"]

    # 2. the suggested suite passes on the data it was profiled from
    out = run(str(src), "--checks", str(suite_path))
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["passed"] and summary["n_failed"] == 0

    # 3. a breaking bound exits 4 with the failure named
    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"checks": [
        {"kind": "in_range", "column": "price", "lo": 0, "hi": 5},
    ]}))
    out = run(str(src), "--checks", str(bad), expect=4)
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert not summary["passed"]
    assert summary["failed"][0]["check_name"] == "in_range(price)"

    # 4. foreign_key via --checks-refs
    parent = tmp_path / "parent.parquet"
    pd.DataFrame({"pid": list(range(25))}).to_parquet(parent)  # 25..29 dangle
    fk = tmp_path / "fk.json"
    fk.write_text(json.dumps({"checks": [
        {"kind": "foreign_key", "columns": ["id"], "ref": "parent",
         "ref_cols": ["pid"], "max_violation_ratio": 0.2},
    ]}))
    out = run(str(src), "--checks", str(fk),
              "--checks-refs", f"parent={parent}")
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["passed"]  # 5/30 = 0.1667 <= 0.2

    # 5. gate against a SAVED STATE with zero rescans
    state = tmp_path / "STATE.json"
    run(str(src), "--save-state", str(state))
    statesuite = tmp_path / "statesuite.json"
    statesuite.write_text(json.dumps({"checks": [
        {"kind": "completeness", "column": "price"},
        {"kind": "in_range", "column": "price", "lo": 0, "hi": 100},
        {"kind": "row_count_between", "lo": 30, "hi": 30},
    ]}))
    out = run(str(state), "--checks", str(statesuite), "--checks-from-state")
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["passed"] and summary["from_state"]

    # 6. scan-needing checks refuse by name in state mode (exit 1)
    scs = tmp_path / "scansuite.json"
    scs.write_text(json.dumps({"checks": [
        {"kind": "uniqueness", "columns": ["id"]},
    ]}))
    proc = run(str(state), "--checks", str(scs), "--checks-from-state",
               expect=1)
    assert "needs a scan" in proc.stderr


# ---------------------------------------------------------------------------
# streaming tier: windowed check evaluation (stream == batch per window)
# ---------------------------------------------------------------------------


def test_checks_stream_batch_equivalence(spark, tmp_path):
    import datetime as dt

    from pyspark.sql import types as T

    from pandas_profiling_personal_spark.streaming.checks_stream import (
        checks_stream, failed_checks_stream,
    )

    rows = []
    for i in range(120):
        # window 0 (minutes 0-4): clean; window 1 (minutes 5-9): nulls + a
        # negative outlier so completeness and in_range fail there
        minute = i % 10
        bad = minute >= 5
        rows.append((
            dt.datetime(2024, 1, 1, 0, minute, i // 10),
            None if (bad and i % 3 == 0) else (-5.0 if (bad and i % 3 == 1)
                                               else float(i % 7)),
        ))
    schema = T.StructType([
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ])
    src = tmp_path / "checks_stream_src"
    spark.createDataFrame(rows, schema).write.parquet(str(src))

    suite = [
        C.completeness("value", 0.95, name="comp"),
        C.in_range("value", 0, 10, name="rng"),
        C.mean_between("value", -10, 10, name="mean"),
        C.row_count_between(1, None, name="rc"),
    ]

    def key(r):
        return (str(r["window_start"]), r["check_name"])

    batch = checks_stream(spark.read.parquet(str(src)), suite, "ts")
    batch_rows = {key(r): (r["value"], r["passed"]) for r in batch.collect()}
    assert len(batch_rows) == 2 * len(suite)  # 2 windows x 4 checks

    stream_df = spark.readStream.schema(schema).parquet(str(src))
    agg = checks_stream(stream_df, suite, "ts")
    q = (agg.writeStream.outputMode("complete").format("memory")
         .queryName("t_checks").start())
    try:
        q.processAllAvailable()
        stream_rows = {key(r): (r["value"], r["passed"])
                       for r in spark.table("t_checks").collect()}
    finally:
        q.stop()
    assert stream_rows == batch_rows

    # the bad window fails exactly comp + rng; per-window values match a
    # batch check_suite run on that window's slice
    from pyspark.sql import functions as F

    bad_fails = {k[1] for k, v in batch_rows.items()
                 if not v[1] and "00:05:00" in k[0]}
    assert bad_fails == {"comp", "rng"}
    good_fails = {k[1] for k, v in batch_rows.items()
                  if not v[1] and "00:00:00" in k[0]}
    assert good_fails == set()
    sliced = spark.read.parquet(str(src)).filter(
        F.minute("ts") >= 5)
    sliced_rows = {r["check_name"]: (r["value"], r["passed"])
                   for r in C.check_suite(sliced, suite).collect()}
    for k, v in batch_rows.items():
        if "00:05:00" in k[0]:
            assert sliced_rows[k[1]] == v, k

    # failed-only projection
    failed = failed_checks_stream(batch).collect()
    assert {r["check_name"] for r in failed} == {"comp", "rng"}


def test_checks_stream_refusals(spark, tmp_path):
    from pandas_profiling_personal_spark.streaming.checks_stream import (
        checks_stream,
    )

    df = spark.range(5).selectExpr(
        "timestamp'2024-01-01' as ts", "id as value")
    with pytest.raises(ValueError, match="foreachBatch"):
        checks_stream(df, [C.uniqueness("value")], "ts")
    with pytest.raises(ValueError, match="foreachBatch"):
        checks_stream(df, [C.quantile_between("value", 0.5, 0, 1)], "ts")
    with pytest.raises(ValueError, match="empty check list"):
        checks_stream(df, [], "ts")
    with pytest.raises(ValueError, match="duplicate check names"):
        checks_stream(
            df, [C.completeness("value"), C.completeness("value")], "ts")


# ---------------------------------------------------------------------------
# Benford first-digit diagnostic
# ---------------------------------------------------------------------------


def test_benford_profile_semantics(spark):
    rows = [(1234.0, 0.03), (2.5, 0.03), (0.0456, None), (-70.0, 0.03),
            (None, 0.03), (0.0, 0.03), (float("nan"), 0.03)]
    df = spark.createDataFrame(rows, "a double, b double")
    res = C.benford_profile(df, ["a", "b"]).collect()
    a = {r["digit"]: (int(r["n"]), r["observed_p"])
         for r in res if r["col_name"] == "a"}
    # eligible a-values: 1234 (1), 2.5 (2), 0.0456 (4), -70 (7);
    # null/zero/NaN excluded
    assert sorted(a) == list(range(1, 10))
    assert a[1] == (1, 0.25) and a[2] == (1, 0.25)
    assert a[4] == (1, 0.25) and a[7] == (1, 0.25)
    assert a[3] == (0, 0.0) and a[9] == (0, 0.0)
    b = {r["digit"]: int(r["n"]) for r in res if r["col_name"] == "b"}
    assert b[3] == 6 and sum(b.values()) == 6
    # expected_p is the Benford law value
    exp = {r["digit"]: r["expected_p"] for r in res if r["col_name"] == "a"}
    assert exp[1] == pytest.approx(0.301, abs=1e-4)
    assert exp[9] == pytest.approx(0.0458, abs=1e-4)
    # column b is a single-digit spike: far from Benford -> alert fires with
    # a forensic threshold; column a (4 values) stays under it
    alerts = C.benford_alerts(res, chi2_threshold=15.0)
    assert [al["column"] for al in alerts] == ["b"]
    assert alerts[0]["alert_type"] == "BENFORD_DEVIATION"
    assert alerts[0]["n"] == 6


def test_benford_single_scan_plan(spark):
    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    res = C.benford_profile(df, ["l_extendedprice", "l_quantity"])
    p = _plan(res)
    assert p.count("Scan parquet") == 2  # formatted prints each node twice
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_suggestion_from_state_property(spark):
    """Checks suggested from a MERGED STATE pass on the original frame —
    and the state shape (approx distinct, tuple tops, no n_unique) never
    suggests the exact-visibility kinds (uniqueness / is_in_set)."""
    from pandas_profiling_personal_spark.plans.incremental import (
        finalize_partial,
    )

    orders, merged = _merged_state(spark)
    variables = finalize_partial(merged, spark)["variables"]
    suggested = C.suggest_checks(variables)
    kinds = {c.kind for c in suggested}
    assert {"completeness", "in_range"} <= kinds
    assert "uniqueness" not in kinds and "is_in_set" not in kinds
    res = C.check_suite(orders, suggested)
    failed = [r["check_name"] for r in res.collect() if not r["passed"]]
    assert failed == []


def test_approx_distinct_between_all_tiers(spark):
    """The approximate member of the scalar family runs in the batch scan,
    the streaming window, and from a saved state's HLL — same check object."""
    from pandas_profiling_personal_spark.plans.incremental import checks_of
    from pandas_profiling_personal_spark.streaming.checks_stream import (
        checks_stream,
    )

    orders, merged = _merged_state(spark)
    n = orders.count()
    chk = C.approx_distinct_between("o_orderkey", n * 0.9, n * 1.1,
                                    name="adist")
    # batch: rides the single-scan pass
    r = _by_name(C.check_suite(orders, [chk]))["adist"]
    assert r["passed"] and r["value"] == pytest.approx(n, rel=0.1)
    # spec roundtrip
    assert C.checks_from_spec(C.checks_to_spec([chk])) == [chk]
    # state: HLL estimate with exact=False
    sr = {x["check_name"]: x for x in checks_of(merged, [chk], spark=spark)}
    assert sr["adist"]["exact"] is False
    assert sr["adist"]["value"] == pytest.approx(n, rel=0.1)
    assert sr["adist"]["passed"]
    # streaming: accepted by the windowed tier (declarative aggregate)
    df = orders.selectExpr("timestamp'2024-01-01' as ts", "o_orderkey")
    wr = checks_stream(df, [chk], "ts").collect()
    assert len(wr) == 1 and wr[0]["passed"]


def test_checks_foreach_batch_gate(spark, tmp_path):
    """Per-micro-batch full-suite gate: real file stream, per-batch
    visibility, FK refs re-read per batch, batch=<id> overwrite layout."""
    from pyspark.sql import types as T

    from pandas_profiling_personal_spark.streaming.checks_stream import (
        checks_foreach_batch,
    )

    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("fk", T.LongType()),
    ])
    src = tmp_path / "src"
    # one file => one micro-batch: ids unique inside, one dangling fk
    spark.createDataFrame(
        [(1, 100), (2, 100), (3, 999)], schema).write.parquet(str(src))
    parent = tmp_path / "parent.parquet"
    spark.createDataFrame([(100,)], "pid long").write.parquet(str(parent))

    suite = [
        C.uniqueness("id", name="uniq"),
        C.foreign_key("fk", "parent", "pid", max_violation_ratio=0.5,
                      name="fk"),
    ]
    out = tmp_path / "out"
    q = (
        spark.readStream.schema(schema).parquet(str(src))
        .writeStream.foreachBatch(
            checks_foreach_batch(suite, str(out), {"parent": str(parent)}))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {r["check_name"]: r.asDict()
            for r in spark.read.parquet(f"{out}/batch=0").collect()}
    assert rows["uniq"]["passed"] and rows["uniq"]["value"] == 1.0
    assert rows["fk"]["value"] == pytest.approx(1 / 3, abs=1e-4)
    assert rows["fk"]["passed"]  # 0.3333 <= 0.5


# ---------------------------------------------------------------------------
# review fixes: empty-frame totality, rounding-vs-pass, spec errors, benford
# sub-1e-10, state distinctness null group
# ---------------------------------------------------------------------------


def test_key_and_fd_checks_survive_empty_frame(spark):
    """An empty day's load must still emit one row per declared check —
    a vanished row would make the CI gate pass with n_checks=0."""
    empty = spark.createDataFrame([], "id int, cat string")
    res = C.check_suite(empty, [
        C.uniqueness("id", name="uniq"),
        C.distinctness("id", name="dist"),
        C.primary_key("id", name="pk"),
        C.functional_dependency("id", "cat", name="fd"),
    ])
    r = _by_name(res)
    assert sorted(r) == ["dist", "fd", "pk", "uniq"]
    for row in r.values():
        assert row["value"] is None and row["passed"], row


def test_pass_rule_uses_unrounded_ratio(spark):
    """40k rows with one violation: the ratio ROUNDS to 1.0 but the
    min_ratio=1.0 gate must still fail — rounding is display-only."""
    from pyspark.sql import functions as F

    df = spark.range(40000).select(
        F.when(F.col("id") == 0, -1.0).otherwise(1.0).alias("v"))
    r = _by_name(C.check_suite(df, [C.in_range("v", 0, 1, name="rng")]))
    assert r["rng"]["value"] == 1.0       # rounded display value
    assert not r["rng"]["passed"]         # unrounded 0.999975 < 1.0


def test_nan_metric_fails_bounded_checks_batch_and_state(spark):
    """A NaN aggregate must FAIL a lower-bound-only gate: Spark orders NaN
    above every numeric, so `raw >= lo` alone would silently PASS — and
    diverge from the state path, which compares in Python (NaN >= lo is
    False). NULL stays vacuous; NaN is a failure, in BOTH modes."""
    from pyspark.sql import functions as F

    from pandas_profiling_personal_spark.plans.incremental import (
        checks_of, partial_profile,
    )

    df = spark.range(3).select(
        F.when(F.col("id") == 0, float("nan")).otherwise(1.0).alias("v"))
    chks = [C.mean_between("v", 0.0, None, name="m"),
            C.sum_between("v", 0.0, None, name="s")]
    batch = _by_name(C.check_suite(df, chks))
    assert not batch["m"]["passed"]
    assert not batch["s"]["passed"]
    state = {r["check_name"]: r for r in checks_of(partial_profile(df), chks)}
    assert batch["m"]["passed"] == state["m"]["passed"]
    assert batch["s"]["passed"] == state["s"]["passed"]
    # NULL aggregate (empty column) still passes vacuously
    empty = spark.createDataFrame([], "v double")
    vac = _by_name(C.check_suite(empty, [C.mean_between("v", 0.0, None,
                                                        name="m")]))
    assert vac["m"]["passed"] and vac["m"]["value"] is None


def test_all_null_column_state_matches_batch(spark):
    """Sketch-backed kinds on an all-null column: no KLL/HLL exists in the
    state, but the batch gate yields concrete values (approx distinct 0;
    distinctness counts the NULL key group) — the state path must synthesize
    the same instead of passing vacuously."""
    from pandas_profiling_personal_spark.plans.incremental import (
        checks_of, partial_profile,
    )

    df = spark.createDataFrame([(None,), (None,), (None,)], "v double")
    chks = [C.approx_distinct_between("v", 1, None, name="ad"),
            C.distinctness("v", 0.5, name="d")]
    batch = _by_name(C.check_suite(df, chks))
    state = {r["check_name"]: r
             for r in checks_of(partial_profile(df), chks, spark=spark)}
    # batch: approx_count_distinct = 0 fails lo=1; distinctness 1/3 fails 0.5
    assert not batch["ad"]["passed"] and batch["ad"]["value"] == 0.0
    assert not batch["d"]["passed"]
    assert state["ad"]["passed"] == batch["ad"]["passed"]
    assert state["ad"]["value"] == batch["ad"]["value"]
    assert state["d"]["passed"] == batch["d"]["passed"]
    assert state["d"]["value"] == pytest.approx(batch["d"]["value"])
    # quantile on all-null: NULL in batch, vacuous in both modes
    q = [C.quantile_between("v", 0.5, 0.0, None, name="q")]
    bq = _by_name(C.check_suite(df, q))
    sq = checks_of(partial_profile(df), q, spark=spark)[0]
    assert bq["q"]["passed"] and bq["q"]["value"] is None
    assert sq["passed"] and sq["value"] is None


def test_key_encoding_injective_on_control_characters(spark):
    """Values containing the key separator (\\x1f), the escape (\\x1e), or
    the literal NULL sentinel must not merge or split composite keys."""
    rows = [
        ("a\x1fb", "c"),       # separator inside a value
        ("a", "b\x1fc"),       # same concat bytes pre-escape, different tuple
        ("\x1eN", "x"),        # component equal to the NULL sentinel literal
        (None, "x"),           # a real NULL — must differ from the row above
        ("p\x1eq", "r"),       # escape char round-trips
        ("p\x1eq", "r"),       # true duplicate tuple
    ]
    df = spark.createDataFrame(rows, "a string, b string")
    r = _by_name(C.check_suite(df, [
        C.uniqueness(["a", "b"], name="u"),
        C.distinctness(["a", "b"], name="d"),
    ]))
    # 5 distinct tuples over 6 rows: 4 singletons / 6 rows
    assert r["u"]["value"] == pytest.approx(4 / 6, abs=1e-4)
    assert r["d"]["value"] == pytest.approx(5 / 6, abs=1e-4)
    # FD: dependent equal to the sentinel differs from a NULL dependent
    fd = spark.createDataFrame(
        [("k", "\x1eN"), ("k", None)], "det string, dep string")
    fr = _by_name(C.check_suite(fd, [
        C.functional_dependency("det", "dep", name="fd")]))
    assert fr["fd"]["value"] == 0.0   # 1 group, 2 distinct dep values


def test_spec_errors_are_named(spark):
    with pytest.raises(ValueError, match="bad or missing field"):
        C.checks_from_spec({"checks": [{"kind": "uniqueness"}]})
    with pytest.raises(ValueError, match="missing field"):
        C.checks_from_spec({"checks": [{"kind": "in_range", "column": "x"}]})
    with pytest.raises(ValueError, match="unknown kind"):
        C.checks_from_spec({"checks": [{"kind": "nope"}]})
    # satisfies with columns round-trips (column attribution survives)
    chk = C.satisfies("a > 0", "pos", columns=("a",))
    assert C.checks_from_spec(C.checks_to_spec([chk])) == [chk]


def test_benford_sub_1e10_magnitudes(spark):
    df = spark.createDataFrame(
        [(7e-11,), (4e-11,), (2.5e-300,)], "x double")
    rows = {r["digit"]: int(r["n"])
            for r in C.benford_profile(df, ["x"]).collect()}
    assert rows[7] == 1 and rows[4] == 1 and rows[2] == 1
    assert sum(rows.values()) == 3


def test_suggest_checks_skips_nonfinite_extremes(spark):
    suggested = C.suggest_checks({
        "inf_col": {"count": 3, "n_missing": 0, "min": 1.0,
                    "max": float("inf")},
        "nan_col": {"count": 3, "n_missing": 0, "min": float("nan"),
                    "max": 2.0},
        "ok_col": {"count": 3, "n_missing": 0, "min": 1.0, "max": 2.0},
    })
    ranged = {c.columns[0] for c in suggested if c.kind == "in_range"}
    assert ranged == {"ok_col"}


def test_checks_of_distinctness_counts_null_group(spark):
    """State distinctness mirrors the batch NULL-as-a-value rule."""
    from pandas_profiling_personal_spark.plans.incremental import (
        checks_of, partial_profile,
    )

    df = spark.createDataFrame(
        [("a",), ("b",), (None,), (None,)], "k string")
    state = partial_profile(df)
    sr = checks_of(state, [C.distinctness("k", 0.0, name="d")],
                   spark=spark)[0]
    # batch: groups {a, b, NULL} / 4 rows = 0.75
    batch = _by_name(C.check_suite(df, [C.distinctness("k", 0.0, name="d")]))
    assert batch["d"]["value"] == pytest.approx(0.75)
    assert sr["value"] == pytest.approx(0.75, rel=0.05)
    with pytest.raises(ValueError, match="duplicate check names"):
        checks_of(state, [C.completeness("k", name="x"),
                          C.row_count_between(0, None, name="x")])


def test_check_suite_by_segments(spark):
    rows = [
        ("en", 10.0), ("en", 20.0), ("en", None),
        ("de", 5.0), ("de", -1.0),
        (None, 7.0),
    ]
    df = spark.createDataFrame(rows, "lang string, v double")
    res = C.check_suite_by(df, [
        C.completeness("v", 1.0, name="comp"),
        C.non_negative("v", name="nn"),
        C.row_count_between(1, None, name="rc"),
        C.quantile_between("v", 0.5, 0, 100, name="med"),
    ], by="lang")
    out = {(r["lang"], r["check_name"]): r.asDict() for r in res.collect()}
    assert len(out) == 12  # 3 segments x 4 checks; NULL lang is a group
    assert out[("en", "comp")]["value"] == pytest.approx(2 / 3, abs=1e-4)
    assert not out[("en", "comp")]["passed"]
    assert out[("de", "comp")]["passed"]
    assert out[("de", "nn")]["value"] == pytest.approx(0.5)
    assert not out[("de", "nn")]["passed"]
    assert out[(None, "rc")]["value"] == 1.0
    assert out[("en", "med")]["value"] == pytest.approx(15.0)
    with pytest.raises(ValueError, match="uniqueness"):
        C.check_suite_by(df, [C.uniqueness("v")], by="lang")
    # ONE grouped pass for the declarative suite
    p = _plan(C.check_suite_by(df, [C.completeness("v"), C.non_negative("v")],
                               by="lang"))
    assert "Join" not in p


def test_validation_report_html(frame):
    res = C.check_suite(frame, [
        C.completeness("val", 1.0, name="comp"),
        C.max_between("val", None, 100, name="mx"),
    ])
    html = C.validation_report_html(res, title="gate")
    assert "FAILED (1 of 2)" in html and "comp" in html
    assert "<b>FAIL</b>" in html and "pass" in html
    ok = C.check_suite(frame, [C.max_between("val", None, 100, name="mx")])
    assert "PASSED" in C.validation_report_html(ok)


def test_cli_checks_html_output(tmp_path):
    import json
    import subprocess
    import sys

    import pandas as pd

    src = tmp_path / "d.parquet"
    pd.DataFrame({"x": [1.0, 2.0, None]}).to_parquet(src)
    suite = tmp_path / "s.json"
    suite.write_text(json.dumps({"checks": [
        {"kind": "completeness", "column": "x"},
    ]}))
    out = tmp_path / "gate.html"
    proc = subprocess.run(
        [sys.executable, "-m", "pandas_profiling_personal_spark.cli",
         str(src), str(out), "--checks", str(suite), "--master", "local[2]"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert proc.returncode == 4, proc.stderr[-1500:]
    html = out.read_text()
    assert "FAILED (1 of 1)" in html and "completeness(x)" in html


def test_checks_of_pass_rule_unrounded(spark):
    """The state tier gates on the unrounded metric exactly like the batch
    engine — 39999/40000 completeness rounds to 1.0 but must fail."""
    from pyspark.sql import functions as F

    from pandas_profiling_personal_spark.plans.incremental import (
        checks_of, partial_profile,
    )

    df = spark.range(40000).select(
        F.when(F.col("id") == 0, None).otherwise(F.col("id"))
        .cast("double").alias("v"))
    state = partial_profile(df)
    r = checks_of(state, [C.completeness("v", 1.0, name="comp")])[0]
    assert r["value"] == 1.0 and not r["passed"]


def test_metric_anomalies_unit():
    history = [
        [{"check_name": "comp", "column": "x", "metric": "completeness",
          "value": 0.99 + 0.001 * (i % 2)}] for i in range(6)
    ]
    today_ok = [{"check_name": "comp", "column": "x",
                 "metric": "completeness", "value": 0.9905}]
    assert C.metric_anomalies(history, today_ok) == []
    today_bad = [{"check_name": "comp", "column": "x",
                  "metric": "completeness", "value": 0.97}]
    out = C.metric_anomalies(history, today_bad)
    assert len(out) == 1
    a = out[0]
    assert a["alert_type"] == "CHECK_METRIC_ANOMALY"
    assert a["check_name"] == "comp" and a["n_history"] == 6
    assert a["deviation_sigmas"] > 3
    # constant history: std floors, ANY change flags
    const = [[{"check_name": "rc", "value": 100.0}]] * 5
    assert C.metric_anomalies(const, [{"check_name": "rc", "value": 101.0}])
    # short history: insufficient evidence is NOT "no anomaly" — skipped
    assert C.metric_anomalies(history[:3], today_bad) == []
    # null today value: vacuous
    assert C.metric_anomalies(history, [{"check_name": "comp",
                                         "value": None}]) == []


def test_cli_checks_log_history_loop(tmp_path):
    import json
    import subprocess
    import sys

    import pandas as pd

    suite = tmp_path / "s.json"
    suite.write_text(json.dumps({"checks": [
        {"kind": "completeness", "column": "x", "min_ratio": 0.9},
    ]}))
    log = tmp_path / "metrics.jsonl"

    def run(vals, expect=0, extra=(), log_path=None):
        src = tmp_path / "day.parquet"
        pd.DataFrame({"x": vals}).to_parquet(src)
        proc = subprocess.run(
            [sys.executable, "-m", "pandas_profiling_personal_spark.cli",
             str(src), "--checks", str(suite),
             "--checks-log", str(log_path or log),
             *extra, "--master", "local[2]"],
            capture_output=True, text=True, timeout=300, cwd="/root/repo",
        )
        assert proc.returncode == expect, proc.stderr[-1500:]
        return json.loads(proc.stdout.strip().splitlines()[-1])

    # five clean days build the history (completeness 1.0 each run)
    for _ in range(5):
        out = run([1.0, 2.0, 3.0, 4.0])
        assert out["passed"]
    # the anomalous day runs against a pristine COPY of the history so both
    # exit modes see identical five-clean-day context (each run appends
    # its own rows to its log)
    import shutil

    anomalous = [float(i) for i in range(19)] + [None]
    log2 = tmp_path / "metrics2.jsonl"
    shutil.copy(log, log2)
    # day six: completeness drops to 0.95 — above the declared 0.9 floor
    # (gate passes, exit 0) but anomalous vs its own constant-1.0 history
    out = run(anomalous)
    assert out["passed"]
    assert out["metric_anomalies"], out
    assert out["metric_anomalies"][0]["check_name"] == "completeness(x)"
    # same day with --fail-on-anomaly: the history gate becomes a real CI
    # gate — exit 5 even though every declared bound passed
    out = run(anomalous, expect=5, extra=("--fail-on-anomaly",),
              log_path=log2)
    assert out["passed"] and out["metric_anomalies"]
    # a clean day with the flag still exits 0
    out = run([1.0, 2.0, 3.0, 4.0], extra=("--fail-on-anomaly",),
              log_path=log2)
    assert out["passed"]


def test_cli_suggest_from_state(tmp_path):
    """suggest a suite from a SAVED STATE (zero rescans), then the suite
    passes when gated against both the state and the original data."""
    import json
    import subprocess
    import sys

    import pandas as pd

    src = tmp_path / "day.parquet"
    pd.DataFrame({"x": [float(i) for i in range(40)],
                  "s": ["a" if i % 2 else "b" for i in range(40)]}
                 ).to_parquet(src)

    def run(*argv, expect=0):
        proc = subprocess.run(
            [sys.executable, "-m", "pandas_profiling_personal_spark.cli",
             *argv, "--master", "local[2]"],
            capture_output=True, text=True, timeout=300, cwd="/root/repo",
        )
        assert proc.returncode == expect, (proc.returncode, proc.stderr[-1500:])
        return json.loads(proc.stdout.strip().splitlines()[-1])

    state = tmp_path / "STATE.json"
    run(str(src), "--save-state", str(state))
    suite = tmp_path / "suite.json"
    meta = run(str(state), "--suggest-checks", str(suite),
               "--checks-from-state")
    assert meta["n_checks"] > 0
    assert set(meta["kinds"]) <= {"completeness", "in_range"}
    out = run(str(state), "--checks", str(suite), "--checks-from-state")
    assert out["passed"]
    out = run(str(src), "--checks", str(suite))
    assert out["passed"]


def test_check_violations_semantics(spark, frame, parent):
    """Row-level violation sampling: which VALUES break each gate."""
    res = C.check_violations(frame, [
        C.in_range("val", 0, 100, name="rng"),
        C.is_in_set("cat", ["a", "b"], name="set"),
        C.completeness("val", name="comp"),
        C.satisfies("val > 0 AND id < 5", "sat", columns=("id", "val")),
        C.uniqueness("id", name="uniq"),
        C.primary_key("cat", name="pk"),
        C.foreign_key("fk", "parents", "pk", name="fkc"),
        C.functional_dependency("fk", "cat", name="fd"),
    ], refs={"parents": parent}, limit=5)
    rows = {}
    for r in res.collect():
        rows.setdefault(r["check_name"], []).append(
            (r["violation"], r["n_rows"]))
    assert rows["rng"] == [("-5.0", 1)]
    assert rows["set"] == [("zzz", 1)]
    assert rows["comp"] == [("NULL", 1)]
    # violating sat rows: id=3 (val NULL), id=4 twice (-5 / id>=5? no:
    # id=4 val=-5 fails val>0; id=4 val=40 passes both... id<5 ok) — and
    # id=6 (id<5 false). Ties broken by violation string asc.
    assert ("3,NULL", 1) in rows["sat"] and ("4,-5.0", 1) in rows["sat"]
    assert ("6,60.0", 1) in rows["sat"]
    assert rows["uniq"] == [("4", 2)]        # id=4 occurs twice
    # pk on cat: 'a' occurs 2x (dupe) and NULL component (1 row)
    assert ("a", 2) in rows["pk"] and ("NULL", 1) in rows["pk"]
    assert rows["fkc"] == [("999", 1)]       # dangling fk; NULL fk vacuous
    # fd: fk=100 -> {a, b}, fk=200 -> {a, NULL}: both 2 distinct dependents
    assert rows["fd"] == [("100", 2), ("200", 2)]

    # determinism + limit: heaviest first, ties by value asc
    big = spark.createDataFrame(
        [("x", 1)] * 5 + [("y", 1)] * 3 + [("z", 1)] * 3 + [("ok", 99)],
        "v string, n int")
    out = C.check_violations(
        big, [C.is_in_set("v", ["ok"], name="s")], limit=2).collect()
    assert [(r["violation"], r["n_rows"]) for r in out] == [
        ("x", 5), ("y", 3)]

    with pytest.raises(ValueError, match="aggregate-metric"):
        C.check_violations(frame, [C.mean_between("val", 0, 1, name="m")])
    with pytest.raises(ValueError, match="declares no columns"):
        C.check_violations(frame, [C.satisfies("val > 0", "s2")])
    with pytest.raises(ValueError, match="refs"):
        C.check_violations(frame, [C.foreign_key("fk", "nope", "pk")])
    with pytest.raises(ValueError, match="limit"):
        C.check_violations(frame, [C.completeness("val")], limit=0)


def test_cli_checks_violations(tmp_path):
    """--violations N: a failed gate also reports the heaviest violating
    values per failed row-level check."""
    import json
    import subprocess
    import sys

    import pandas as pd

    src = tmp_path / "d.parquet"
    pd.DataFrame({"x": [1.0, 2.0, -3.0, -3.0, 50.0]}).to_parquet(src)
    suite = tmp_path / "s.json"
    suite.write_text(json.dumps({"checks": [
        {"kind": "in_range", "column": "x", "lo": 0, "hi": 10,
         "name": "rng"},
        {"kind": "completeness", "column": "x", "name": "comp"},
    ]}))
    proc = subprocess.run(
        [sys.executable, "-m", "pandas_profiling_personal_spark.cli",
         str(src), "--checks", str(suite), "--violations", "5",
         "--master", "local[2]"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert proc.returncode == 4, proc.stderr[-1500:]   # gate failed
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    v = {(r["check_name"], r["violation"]): r["n_rows"]
         for r in out["violations"]}
    # only the FAILED check (rng) is sampled; comp passed
    assert v == {("rng", "-3.0"): 2, ("rng", "50.0"): 1}
    # the HTML report renders the violating values
    html_out = tmp_path / "v.html"
    proc = subprocess.run(
        [sys.executable, "-m", "pandas_profiling_personal_spark.cli",
         str(src), str(html_out), "--checks", str(suite),
         "--violations", "5", "--master", "local[2]"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert proc.returncode == 4, proc.stderr[-1500:]
    page = html_out.read_text(encoding="utf-8")
    assert "Violating values" in page and "-3.0" in page


def test_schema_matches_contract(spark, frame):
    """Declared schema gate: zero Spark jobs, fails by name on missing /
    re-typed / (optionally) unexpected columns; spec round-trips."""
    ok = C.schema_matches(
        {"id": "int", "val": "double", "cat": "string", "fk": "int"},
        allow_extra=False, name="schema_exact")
    partial = C.schema_matches(
        {"id": "int", "val": "decimal(10,2)", "ghost": "string"},
        name="schema_bad")
    extra_ok = C.schema_matches({"id": "INT "}, name="schema_loose")

    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    res = C.check_suite(frame, [ok, partial, extra_ok])
    r = _by_name(res)
    # the collect itself is a job over the tiny local frame; the schema
    # evaluation added no scan of `frame`
    assert r["schema_exact"]["passed"] and r["schema_exact"]["value"] == 1.0
    assert not r["schema_bad"]["passed"]
    assert r["schema_bad"]["value"] == pytest.approx(1 / 3, abs=1e-4)
    assert r["schema_loose"]["passed"]  # type normalized, extras allowed
    del before, tracker

    # allow_extra=False fails when unexpected columns appear, and the
    # metric reconstructs the verdict: extras dilute the denominator so
    # value < lower=1.0 exactly when passed is False (r11 ADVICE)
    strict = C.schema_matches({"id": "int"}, allow_extra=False, name="st")
    sr = _by_name(C.check_suite(frame, [strict]))
    n_actual = len(frame.columns)
    assert sr["st"]["value"] == pytest.approx(1 / n_actual, abs=1e-4)
    assert not sr["st"]["passed"] and sr["st"]["value"] < 1.0

    # spec round-trip
    spec = C.checks_to_spec([ok, partial])
    back = C.checks_from_spec(spec)
    assert C.checks_to_spec(back) == spec

    # state mode refuses by name (spark types are not in a PartialProfile)
    from pandas_profiling_personal_spark.plans.incremental import (
        checks_of, partial_profile,
    )
    with pytest.raises(ValueError, match="schema_exact"):
        checks_of(partial_profile(frame), [ok])

    with pytest.raises(ValueError, match="empty column map"):
        C.schema_matches({})


def test_check_violations_plan_bounded_topn(spark):
    """Each check's sample is a TakeOrderedAndProject (bounded per-check
    top-N), never a global sort, with no Python in the plan."""
    from pyspark.sql import functions as F

    df = spark.range(1000).select(
        (F.col("id") % 50).alias("k"), F.col("id"))
    out = C.check_violations(df, [
        C.in_range("id", 0, 900, name="rng"),
        C.uniqueness("k", name="u"),
    ], limit=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("TakeOrderedAndProject") == 2, plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_discover_fds(spark):
    """FD discovery: the relationship-mining step before a declared
    functional_dependency — holds/fails verdicts with the declared
    check's dependency_ratio metric, HLL pruning (near-unique and
    constant determinants out, cardinality necessary condition), NULL
    semantics (NULL determinant is a group; NULL dependent is a value),
    named refusals, and an all-built-in two-exchange plan."""
    rows = [
        (i, f"city{i % 6}", f"country{(i % 6) % 3}", "const",
         None if i % 5 == 0 else f"v{i % 2}")
        for i in range(60)
    ]
    df = spark.createDataFrame(
        rows, "id int, city string, country string, c string, nul string")

    got = {(r["determinant"], r["dependent"]): r
           for r in C.discover_fds(
               df, max_determinant_distinct=20).collect()}
    # city -> country holds (6 cities map to 3 countries); inverse pruned
    # by the cardinality necessary condition (3 < 0.9*6)
    assert got[("city", "country")]["holds"]
    assert got[("city", "country")]["dependency_ratio"] == 1.0
    assert got[("city", "country")]["n_groups"] == 6
    assert got[("city", "country")]["exact"] is True
    assert ("country", "city") not in got
    # HLL-screened rows keep a row — holds=NULL ("not verified", never
    # "refuted": the screen is probabilistic, ADVICE r12), exact=False,
    # NULL ratio (never melted); a held FD with a NULL determinant group
    # survives the screen (struct-cardinality, not NULL-dropping count)
    assert got[("city", "nul")]["exact"] is False
    assert got[("city", "nul")]["holds"] is None
    assert got[("city", "nul")]["dependency_ratio"] is None
    assert got[("nul", "c")]["exact"] is True and got[("nul", "c")]["holds"]
    assert got[("nul", "c")]["n_groups"] == 3  # NULL det is a group
    # near-unique id determinant pruned; constant determinant pruned;
    # id as DEPENDENT is still scored (and fails from any determinant)
    assert not any(d == "id" for d, _ in got)
    assert not any(d == "c" for d, _ in got)
    assert ("city", "id") not in got  # 6 < 0.9*60: cannot hold exactly
    # prune=False scores the necessary-condition failures too
    allpairs = {(r["determinant"], r["dependent"]): r
                for r in C.discover_fds(
                    df, prune=False,
                    columns=["city", "country"]).collect()}
    assert not allpairs[("country", "city")]["holds"]
    assert allpairs[("country", "city")]["n_violating"] == 3

    # NULL semantics: NULL determinant is its own group; a NULL dependent
    # counts as a distinct value (a {NULL, 'x'} group violates)
    byhand = C.discover_fds(df, candidates=[("nul", "c"), ("city", "nul")])
    r = {(x["determinant"], x["dependent"]): x for x in byhand.collect()}
    assert r[("nul", "c")]["holds"]       # every nul-group maps to 'const'
    assert r[("nul", "c")]["n_groups"] == 3   # v0, v1, NULL
    assert not r[("city", "nul")]["holds"]    # cities mix NULL + values

    # ratio agrees with the declared check on the same pair
    declared = C.check_suite(
        df, [C.functional_dependency("city", "country", name="d")]
    ).collect()[0]
    assert declared["value"] == got[("city", "country")]["dependency_ratio"]

    # refusals
    with pytest.raises(ValueError, match="not in frame"):
        C.discover_fds(df, columns=["city", "ghost"])
    with pytest.raises(ValueError, match="at least 2"):
        C.discover_fds(df, columns=["city"])
    with pytest.raises(ValueError, match="self-pair"):
        C.discover_fds(df, candidates=[("city", "city")])
    with pytest.raises(ValueError, match="no candidate pairs"):
        C.discover_fds(df.select("c", "id"), max_determinant_distinct=5)

    # plan: one melt -> two-level groupBy, no Python, bounded exchanges
    plan = C.discover_fds(
        df, candidates=[("city", "country"), ("country", "city")]
    )._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange hashpartitioning") <= 4  # 2 levels x2 print


def test_cli_discover_fds_into_suggested_suite(tmp_path):
    """--discover-fds with --suggest-checks: mined exact holds become
    declared functional_dependency checks in the emitted suite, and the
    suite then passes on the data it was mined from; flag misuse refuses
    by name."""
    import json
    import subprocess
    import sys

    import pandas as pd

    src = tmp_path / "t.parquet"
    pd.DataFrame({
        "city": [f"c{i % 6}" for i in range(60)],
        "country": [f"n{(i % 6) % 3}" for i in range(60)],
        "price": [float(i % 9) for i in range(60)],
    }).to_parquet(src)

    def run(*argv, expect=0):
        proc = subprocess.run(
            [sys.executable, "-m", "pandas_profiling_personal_spark.cli",
             *argv, "--master", "local[2]"],
            capture_output=True, text=True, timeout=300, cwd="/root/repo",
        )
        assert proc.returncode == expect, (proc.returncode, proc.stderr[-2000:])
        return proc

    suite_path = tmp_path / "suite.json"
    out = run(str(src), "--minimal", "--suggest-checks", str(suite_path),
              "--discover-fds")
    meta = json.loads(out.stdout.strip().splitlines()[-1])
    assert meta["discovered_fds"] >= 1
    assert "functional_dependency" in meta["kinds"]
    spec = json.loads(suite_path.read_text())
    fds = [(c["determinant"], c["dependent"]) for c in spec["checks"]
           if c["kind"] == "functional_dependency"]
    assert (["city"], "country") in fds
    # the inverse (country -> city) must NOT be declared
    assert (["country"], "city") not in fds

    # mined contracts pass on the data they were mined from
    out = run(str(src), "--checks", str(suite_path))
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["passed"]

    # standalone --discover-fds is the PROFILE mode: the report gains the
    # Relationships section with the mined holds; --discover-keys adds
    # the key-candidates table to the same section
    html_out = tmp_path / "rep.html"
    run(str(src), str(html_out), "--minimal", "--discover-fds",
        "--discover-keys")
    page = html_out.read_text(encoding="utf-8")
    assert "Relationships" in page and "city" in page
    assert "Key candidates" in page

    # cross-table mining: --discover-fks declares contained references
    parent = tmp_path / "countries.parquet"
    pd.DataFrame({"code": [f"n{k}" for k in range(5)]}).to_parquet(parent)
    suite2 = tmp_path / "suite2.json"
    out = run(str(src), "--minimal", "--suggest-checks", str(suite2),
              "--discover-fks", f"countries={parent}")
    meta2 = json.loads(out.stdout.strip().splitlines()[-1])
    assert meta2["discovered_fks"] >= 1
    spec2 = json.loads(suite2.read_text())
    fks = [(c["columns"], c["ref"], c["ref_cols"])
           for c in spec2["checks"] if c["kind"] == "foreign_key"]
    assert (["country"], "countries", ["code"]) in fks
    # the mined reference gates with --checks-refs
    out = run(str(src), "--checks", str(suite2),
              "--checks-refs", f"countries={parent}")
    assert json.loads(out.stdout.strip().splitlines()[-1])["passed"]
    bad2 = run(str(src), "--suggest-checks", str(suite2),
               "--discover-fks", "nopath", expect=1)
    assert "bad entry" in bad2.stderr

    # --fd-min-ratio (VERDICT r12 #7): a near-FD lands in the suite with
    # its measured bound; exact holds stay min_ratio=1
    near = tmp_path / "near.parquet"
    ncity = [f"c{i % 6}" for i in range(100)]
    ncountry = [f"n{(i % 6) % 3}" for i in range(100)]
    # poison ONE city group with a second country: 5/6 groups clean
    ncountry[0] = "nX"
    pd.DataFrame({
        "city": ncity, "country": ncountry,
        "price": [float(i % 9) for i in range(100)],
    }).to_parquet(near)
    suiten = tmp_path / "suiten.json"
    outn = run(str(near), "--minimal", "--suggest-checks", str(suiten),
               "--discover-fds", "--fd-min-ratio", "0.8")
    metan = json.loads(outn.stdout.strip().splitlines()[-1])
    specn = json.loads(suiten.read_text())
    fdsn = {(tuple(c["determinant"]), c["dependent"]): c["min_ratio"]
            for c in specn["checks"]
            if c["kind"] == "functional_dependency"}
    # the poisoned pair is declared at its measured level (5/6 = 0.8333)
    assert fdsn[(("city",), "country")] == pytest.approx(0.8333)
    assert metan["discovered_fds"] >= 1
    # and the learned suite passes on the frame it was mined from
    outn2 = run(str(near), "--checks", str(suiten))
    assert json.loads(outn2.stdout.strip().splitlines()[-1])["passed"]
    # flag misuse refuses by name
    badn = run(str(near), "--fd-min-ratio", "0.8", expect=2)
    assert "--fd-min-ratio needs" in badn.stderr
    badn2 = run(str(near), "--minimal", "--suggest-checks", str(suiten),
                "--discover-fds", "--fd-min-ratio", "1.5", expect=2)
    assert "must be in (0, 1]" in badn2.stderr

    # --fks-catalog: the N-table report mode prints ranked containments
    # without declaring contracts
    cat_parent = tmp_path / "countries2.parquet"
    pd.DataFrame({"code": [f"n{k}" for k in range(5)] + ["nX"]}
                 ).to_parquet(cat_parent)
    outc = run(str(near), "--fks-catalog", f"countries={cat_parent}")
    metac = json.loads(outc.stdout.strip().splitlines()[-1])
    assert set(metac["tables"]) == {"input", "countries"}
    contained = {(r["child_table"], r["child_column"],
                  r["parent_table"], r["parent_column"])
                 for r in metac["contained"]}
    assert ("input", "country", "countries", "code") in contained
    badc = run(str(near), "--fks-catalog", "nopath", expect=1)
    assert "bad entry" in badc.stderr

    # --discover-keys: mined unique column combinations become declared
    # primary_key (null-free) contracts and the suite still passes on
    # the data it was mined from
    kdata = tmp_path / "k.parquet"
    pd.DataFrame({
        "ka": [i % 10 for i in range(100)],
        "kb": [i // 10 for i in range(100)],
        "payload": [f"p{i % 4}" for i in range(100)],
    }).to_parquet(kdata)
    suitek = tmp_path / "suitek.json"
    outk = run(str(kdata), "--minimal", "--suggest-checks", str(suitek),
               "--discover-keys")
    metak = json.loads(outk.stdout.strip().splitlines()[-1])
    assert metak["discovered_keys"] >= 1
    speck = json.loads(suitek.read_text())
    pks = [c["columns"] for c in speck["checks"]
           if c["kind"] == "primary_key"]
    assert ["ka", "kb"] in pks
    outk2 = run(str(kdata), "--checks", str(suitek))
    assert json.loads(outk2.stdout.strip().splitlines()[-1])["passed"]

    # r12 ADVICE (low): "nothing survives the prune" (every determinant
    # constant — nd < 2 fails the cardinality gate) is ZERO discovered
    # contracts and a clean exit, not a raw ValueError traceback
    ids = tmp_path / "ids.parquet"
    pd.DataFrame({
        "id_a": [1] * 400,
        "id_b": [2] * 400,
    }).to_parquet(ids)
    suite3 = tmp_path / "suite3.json"
    out3 = run(str(ids), "--minimal", "--suggest-checks", str(suite3),
               "--discover-fds")
    meta3 = json.loads(out3.stdout.strip().splitlines()[-1])
    assert meta3["discovered_fds"] == 0
    # no type-compatible cross-table pairs: same graceful zero
    strp = tmp_path / "strs.parquet"
    pd.DataFrame({"name": [f"s{i}" for i in range(10)]}).to_parquet(strp)
    suite4 = tmp_path / "suite4.json"
    out4 = run(str(ids), "--minimal", "--suggest-checks", str(suite4),
               "--discover-fks", f"strs={strp}")
    meta4 = json.loads(out4.stdout.strip().splitlines()[-1])
    assert meta4["discovered_fks"] == 0


def test_discover_fds_precomputed_rider(spark):
    """VERDICT r12 #8: precomputed cardinalities replace BOTH screen
    scans — discover_fds(precomputed=...) runs exactly the job count of
    the survivors' melt, returns the same rows as the self-scanning
    path, and profile(discover_fds=True) folds the pair-struct HLLs
    into pass 1 so in-profile discovery costs zero extra scans."""
    rows = [(f"c{i % 6}", f"n{(i % 6) % 3}", float(i % 9), i)
            for i in range(120)]
    df = spark.createDataFrame(rows, "city string, country string,"
                                     " price double, id int")
    cols = ["city", "country", "price"]

    base = {(r["determinant"], r["dependent"]): r
            for r in C.discover_fds(df, columns=cols).collect()}

    # hand-build the precomputed map the way profile() does
    from pyspark.sql import functions as F2
    from itertools import combinations as _comb
    agg = [F2.count(F2.lit(1)).alias("n")]
    for i, c in enumerate(cols):
        agg.append(F2.approx_count_distinct(F2.col(c)).alias(f"c{i}"))
        agg.append(F2.max(F2.col(c).isNull().cast("int")).alias(f"h{i}"))
    pairs = [tuple(sorted(p)) for p in _comb(cols, 2)]
    for k, (a, b) in enumerate(pairs):
        agg.append(F2.approx_count_distinct(
            F2.struct(F2.col(a), F2.col(b))).alias(f"p{k}"))
    row = df.agg(*agg).collect()[0]
    pre = {
        "nd": {c: row[f"c{i}"] for i, c in enumerate(cols)},
        "has_null": {c: bool(row[f"h{i}"]) for i, c in enumerate(cols)},
        "pair_nd": {p: row[f"p{k}"] for k, p in enumerate(pairs)},
    }

    tracker = spark.sparkContext.statusTracker()

    def jobs() -> int:
        return len(tracker.getJobIdsForGroup(None) or [])

    j0 = jobs()
    got = {(r["determinant"], r["dependent"]): r
           for r in C.discover_fds(
               df, columns=cols, precomputed=pre).collect()}
    melt_jobs = jobs() - j0
    # same verdicts/rows as the self-scanning path
    assert set(got) == set(base)
    for k, r in got.items():
        assert (r["holds"], r["exact"], r["dependency_ratio"]) == (
            base[k]["holds"], base[k]["exact"],
            base[k]["dependency_ratio"]), k
    # the only Spark work is the survivors' melt itself: identical job
    # count to scoring the surviving candidates directly
    survivors = [(k[0], k[1]) for k, r in got.items() if r["exact"]]
    j1 = jobs()
    C.discover_fds(df, candidates=survivors).collect()
    assert melt_jobs == jobs() - j1
    # incomplete precomputed refuses by name
    with pytest.raises(ValueError, match="precomputed"):
        C.discover_fds(df, columns=cols,
                       precomputed={"nd": {"city": 6}})

    # in-profile: the rider produces the same relationships as the
    # standalone operator on the same frame
    from pandas_profiling_personal_spark import ProfileConfig, profile
    r = profile(df, ProfileConfig(exact=True, discover_fds=True,
                                  correlations=(), duplicates=False))
    mined = {(x["determinant"], x["dependent"]):
             (x["holds"], x["exact"]) for x in r.relationships}
    want = {(r2["determinant"], r2["dependent"]):
            (r2["holds"], r2["exact"])
            for r2 in C.discover_fds(
                df, columns=cols + ["id"],
                max_determinant_distinct=100).collect()}
    assert mined == want


def test_discover_keys(spark):
    """Unique-column-combination discovery — the key miner completing
    the FD/inclusion triad: unary + composite keys, TANE minimality
    (supersets of verified keys never generated), HLL screen tiers with
    is_key=NULL on screened rows, NULL-sentinel semantics, refusals,
    and agreement with the declared uniqueness check."""
    rows = [
        (i, i % 7, f"u{i}", None if i % 3 == 0 else f"g{i // 2}", i // 2)
        for i in range(100)
    ]
    df = spark.createDataFrame(
        rows, "id int, m int, uid string, g string, half int")

    got = {r["key"]: r for r in C.discover_keys(df).collect()}
    # unary keys found and exactly verified
    for k in ("id", "uid"):
        assert got[k]["is_key"] and got[k]["exact"]
        assert got[k]["uniqueness_ratio"] == 1.0
        assert got[k]["null_free"] and got[k]["n_groups"] == 100
    # composite key found: (half, m) is a key (i = 7*(i//7)+i%7 style
    # decomposition: half in 0..49, m in 0..6 — each (half, m) unique)
    assert got["half,m"]["is_key"] and got["half,m"]["exact"]
    # TANE minimality: no pair containing a verified unary key appears
    assert not any("," in k and ("id" in k.split(",") or
                                 "uid" in k.split(",")) for k in got)
    # (g, half) survives the HLL screens but is exactly refuted
    gh = got["g,half"]
    assert gh["exact"] and gh["is_key"] is False
    assert gh["null_free"] is False  # g has NULLs
    # low-cardinality singles are screened: is_key=NULL means "not
    # verified", never "refuted" (the FD screen's ADVICE r12 semantics)
    for k in ("m", "half", "g"):
        assert got[k]["exact"] is False and got[k]["is_key"] is None
        assert got[k]["uniqueness_ratio"] is None
    # the product bound pruned (g, m): nd ~34 * 7 < 0.85 * 100... holds
    # only if small; (g,m) has 34*7=238 >= 85 so it reaches the struct
    # screen and is screened there (69 distinct pairs < 85)
    assert got["g,m"]["exact"] is False and got["g,m"]["is_key"] is None

    # NULL keys are sentinel VALUES: a column of 50 distinct non-null +
    # repeated NULLs is not a key; a column where every value including
    # one NULL appears once IS a key
    df2 = spark.createDataFrame(
        [(None if i == 7 else i,) for i in range(40)], "x int")
    r2 = C.discover_keys(df2).collect()[0]
    assert r2["is_key"] and not r2["null_free"]  # key, but not PK-able

    # candidates path: scored verbatim, including non-minimal supersets
    cand = {r["key"]: r for r in C.discover_keys(
        df, candidates=["m", ("id", "m"), ("g", "half")]).collect()}
    assert cand["m"]["exact"] and cand["m"]["is_key"] is False
    assert cand["id,m"]["is_key"]  # superset of a key: scored as asked
    assert cand["g,half"]["is_key"] is False

    # agreement with the declared uniqueness check's metric
    declared = C.check_suite(
        df, [C.uniqueness(["g", "half"], name="u")]).collect()[0]
    assert declared["value"] == cand["g,half"]["uniqueness_ratio"]

    # empty frame: vacuous — NULL ratio and NULL is_key
    empty = spark.createDataFrame([], "a int, b int")
    for r in C.discover_keys(empty).collect():
        assert r["is_key"] is None and r["uniqueness_ratio"] is None

    # refusals, loud and named
    with pytest.raises(ValueError, match="not in frame"):
        C.discover_keys(df, columns=["ghost"])
    with pytest.raises(ValueError, match="candidate columns"):
        C.discover_keys(df, candidates=[("id", "ghost")])
    with pytest.raises(ValueError, match="duplicate column"):
        C.discover_keys(df, candidates=[("id", "id")])
    with pytest.raises(ValueError, match="max_arity"):
        C.discover_keys(df, max_arity=3)
    with pytest.raises(ValueError, match="never silently sampled"):
        C.discover_keys(df, max_candidates=1)

    # prune=False scores every set exactly — the screen tiers are an
    # optimization, not a semantics change
    full = {r["key"]: r for r in C.discover_keys(
        df, columns=["m", "half"], prune=False).collect()}
    assert all(r["exact"] for r in full.values())
    assert full["half,m"]["is_key"] and full["m"]["is_key"] is False

    # plan: one melt, no Python eval nodes
    plan = C.discover_keys(
        df, candidates=["id", ("m", "half")]
    )._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    import re as _re
    # ONE explode melt for all sets (formatted explain numbers each
    # physical node exactly once in the detail section)
    assert len(_re.findall(r"\(\d+\) Generate", plan)) == 1


def test_discover_inclusions(spark):
    """Unary inclusion-dependency discovery — the cross-table FK miner:
    containment verdicts over distinct VALUES, type-family candidate
    generation, min/max + HLL screening with screened rows kept, NULL
    child vacuity, numeric canonicalization across int widths, named
    refusals, and a values-not-rows anti-join plan."""
    child = spark.createDataFrame(
        [(i % 20, float(i % 20), f"u{i}", None) for i in range(100)],
        "fk int, fkd double, uid string, dead int")
    parent = spark.createDataFrame(
        [(int(k), f"p{k}") for k in range(25)],
        "pk bigint, name string")

    got = {(r["child_column"], r["parent_column"]): r
           for r in C.discover_inclusions(child, parent).collect()}
    # fk in {0..19} is contained in pk {0..24}; int vs bigint canonical
    r = got[("fk", "pk")]
    assert r["contained"] and r["exact"]
    assert r["containment_ratio"] == 1.0 and r["n_child_distinct"] == 20
    # double 0.0..19.0 also matches through the numeric canonical form
    assert got[("fkd", "pk")]["contained"]
    # uid (100 distinct strings) vs name (25): screened by cardinality
    assert got[("uid", "name")]["exact"] is False
    assert not got[("uid", "name")]["contained"]
    assert got[("uid", "name")]["containment_ratio"] is None
    # an ALL-NULL child column is vacuously contained, NULL ratio
    d = got[("dead", "pk")]
    assert d["contained"] and d["n_child_distinct"] == 0
    assert d["containment_ratio"] is None
    # no string/int cross-family candidates were generated
    assert ("fk", "name") not in got and ("uid", "pk") not in got

    # the reverse direction fails by value, not by screen: pk {0..24}
    # vs fk {0..19} — survives cardinality (25 <= 1.1*20 false → actually
    # screened; use explicit candidates for the exact reverse check)
    rev = C.discover_inclusions(
        parent, child, candidates=[("pk", "fk")]).collect()[0]
    assert rev["exact"] and not rev["contained"]
    assert rev["n_missing_distinct"] == 5
    assert rev["containment_ratio"] == pytest.approx(20 / 25, abs=1e-4)

    # refusals
    with pytest.raises(ValueError, match="not in frame"):
        C.discover_inclusions(child, parent, child_cols=["ghost"])
    with pytest.raises(ValueError, match="candidate columns"):
        C.discover_inclusions(child, parent, candidates=[("fk", "ghost")])
    with pytest.raises(ValueError, match="no type-compatible"):
        C.discover_inclusions(child.select("uid"), parent.select("pk"))

    # plan: distinct values ride the anti join, never raw rows — both
    # sides aggregate to distinct (pid, val) before the join; no Python
    plan = C.discover_inclusions(
        child, parent, candidates=[("fk", "pk"), ("fkd", "pk")]
    )._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "LeftAnti" in plan

    # the declared check agrees: a contained pair passes foreign_key
    suite = C.check_suite(
        child, [C.foreign_key("fk", "parent", "pk", name="fk")],
        refs={"parent": parent})
    assert suite.collect()[0]["passed"]


def test_discover_inclusions_catalog(spark):
    """VERDICT r12 #4: the warehouse hunt — N tables in ONE call, one
    stats scan per TABLE (not per pair), both true TPC-H references
    mined, self-pairs skipped, incompatible table pairs skipped, and
    the precomputed-stats contract refuses missing columns by name."""
    from pandas_profiling_personal_spark.sources.readers import read_parquet

    sf = "/root/testdata/sf0.001"
    tabs = {
        t: read_parquet(spark, f"{sf}/{t}.parquet")
        for t in ("orders", "customer", "nation")
    }
    rows = C.discover_inclusions_catalog(tabs).collect()
    got = {
        (r["child_table"], r["child_column"],
         r["parent_table"], r["parent_column"]): r
        for r in rows
    }
    # both genuine foreign keys mined in the one call
    fk1 = got[("orders", "o_custkey", "customer", "c_custkey")]
    fk2 = got[("customer", "c_nationkey", "nation", "n_nationkey")]
    for fk in (fk1, fk2):
        assert fk["contained"] and fk["exact"]
        assert fk["containment_ratio"] == 1.0
    # a cardinality-impossible direction is screened, kept as a row
    # (150 customer keys cannot live inside 25 nation keys)
    scr = got[("customer", "c_custkey", "nation", "n_nationkey")]
    assert scr["exact"] is False and not scr["contained"]
    assert scr["containment_ratio"] is None
    # self-pairs never generated
    assert not any(k[0] == k[2] for k in got)
    # every row carries table context and the exact/screened split
    assert all(r["exact"] in (True, False) for r in rows)

    # one stats scan per table: the job count scales with N tables,
    # not N^2 pairs — count jobs for the prune stage only
    tracker = spark.sparkContext.statusTracker()
    j0 = len(tracker.getJobIdsForGroup(None) or [])
    C.discover_inclusions_catalog(tabs)  # lazy: only the stats collect runs
    stats_jobs = len(tracker.getJobIdsForGroup(None) or []) - j0
    # AQE may split one aggregate into 2 jobs; the invariant is
    # N-proportional (3 tables), NOT pair-proportional (6 ordered pairs
    # x 2 per-frame stats = 12 the naive loop would pay)
    assert stats_jobs <= 2 * len(tabs)

    # refusals
    with pytest.raises(ValueError, match="at least 2 tables"):
        C.discover_inclusions_catalog({"one": tabs["orders"]})
    with pytest.raises(ValueError, match="precomputed_stats missing"):
        C.discover_inclusions(
            tabs["orders"], tabs["customer"],
            precomputed_stats=({}, {}),
        )
    # a catalog with NO type-compatible pair anywhere refuses by name
    s1 = spark.createDataFrame([("x",)], "a string")
    s2 = spark.createDataFrame([(1,)], "b int")
    with pytest.raises(ValueError, match="anywhere in the catalog"):
        C.discover_inclusions_catalog({"s1": s1, "s2": s2})


def test_discover_inclusions_lossless_canon(spark):
    """ADVICE r12 (medium): the value canonicalization must be lossless
    for 64-bit integer keys above 2^53 (snowflake-style ids collide after
    a double round-trip) and must give the time family ONE rendering so a
    date genuinely contained in a timestamp column matches."""
    import datetime as dt

    base = 2**53  # 9007199254740992: +1 is unrepresentable as a double
    child = spark.createDataFrame(
        [(base + 1,), (base + 3,)], "id bigint")
    parent = spark.createDataFrame(
        [(base,), (base + 2,), (base + 4,)], "pk bigint")
    # every child id is ABSENT from the parent; the double round-trip
    # collapses all five values to 9007199254740992.0 and reports a
    # dangling reference as contained=True
    r = C.discover_inclusions(
        child, parent, candidates=[("id", "pk")]).collect()[0]
    assert r["exact"] and not r["contained"]
    assert r["n_missing_distinct"] == 2 and r["containment_ratio"] == 0.0

    # int 5 == bigint 5 == double 5.0 still canonicalize together, and
    # fractional doubles stay distinct from their floor
    c2 = spark.createDataFrame([(5, 5.0), (6, 6.5)], "i int, d double")
    p2 = spark.createDataFrame([(5,), (6,)], "pk bigint")
    got = {(r["child_column"], r["parent_column"]): r
           for r in C.discover_inclusions(
               c2, p2, candidates=[("i", "pk"), ("d", "pk")]).collect()}
    assert got[("i", "pk")]["contained"]
    d = got[("d", "pk")]
    assert not d["contained"] and d["n_missing_distinct"] == 1  # 6.5

    # date-in-timestamp: genuinely contained must report contained=True
    dchild = spark.createDataFrame(
        [(dt.date(2024, 1, 2),), (dt.date(2024, 1, 3),)], "d date")
    tparent = spark.createDataFrame(
        [(dt.datetime(2024, 1, 2),), (dt.datetime(2024, 1, 3),),
         (dt.datetime(2024, 1, 4, 5, 0),)], "ts timestamp")
    row = C.discover_inclusions(
        dchild, tparent, candidates=[("d", "ts")]).collect()[0]
    assert row["contained"] and row["exact"]
    # and a timestamp with a time-of-day is NOT contained in dates
    rev = C.discover_inclusions(
        tparent, dchild, candidates=[("ts", "d")]).collect()[0]
    assert rev["exact"] and not rev["contained"]
    assert rev["n_missing_distinct"] == 1  # only the 05:00 row dangles


def test_profile_relationships_section(spark):
    """discover_fds=True on profile(): mined FDs attach as
    ProfileResult.relationships, ride the JSON, render a Relationships
    section (redact-safe: names + counts only), and the progress plan
    grows by the fd_discovery stage."""
    from pandas_profiling_personal_spark import ProfileConfig, profile
    from pandas_profiling_personal_spark.report.html import render_html

    rows = [(f"c{i % 6}", f"n{(i % 6) % 3}", float(i % 9))
            for i in range(120)]
    df = spark.createDataFrame(rows, "city string, country string, v double")

    events = []
    r = profile(df, ProfileConfig(exact=True, discover_fds=True),
                progress=lambda s, i, n: events.append((s, i, n)))
    byp = {(x["determinant"], x["dependent"]): x for x in r.relationships}
    assert byp[("city", "country")]["holds"]
    assert events[-1][0] == "fd_discovery"
    import json as _json
    assert _json.loads(r.to_json())["relationships"]

    page = render_html(r)
    assert "Relationships" in page and "data-section='relationships'" in page

    # redact keeps the section (no data values in it)
    r2 = profile(df, ProfileConfig(exact=True, discover_fds=True,
                                   redact=True))
    assert r2.relationships
    # default off
    r3 = profile(df, ProfileConfig(exact=True))
    assert r3.relationships == []


def test_profile_key_candidates_section(spark):
    """discover_keys=True on profile(): mined unique column combinations
    attach as ProfileResult.key_candidates, ride the JSON, render under
    the Relationships section (redact-safe: names + counts only), and
    the progress plan grows by the key_discovery stage."""
    from pandas_profiling_personal_spark import ProfileConfig, profile
    from pandas_profiling_personal_spark.report.html import render_html

    rows = [(i, f"c{i % 6}", float(i % 9)) for i in range(120)]
    df = spark.createDataFrame(rows, "id int, city string, v double")

    events = []
    r = profile(df, ProfileConfig(exact=True, discover_keys=True),
                progress=lambda s, i, n: events.append((s, i, n)))
    byk = {x["key"]: x for x in r.key_candidates}
    assert byk["id"]["is_key"] and byk["id"]["null_free"]
    # TANE minimality: no pair containing the verified id key
    assert not any("," in k and "id" in k.split(",") for k in byk)
    assert events[-1][0] == "key_discovery"
    import json as _json
    assert _json.loads(r.to_json())["key_candidates"]

    page = render_html(r)
    assert "Key candidates" in page
    assert "data-section='key-candidates'" in page

    # redact keeps the section (no data values in it); default off
    r2 = profile(df, ProfileConfig(exact=True, discover_keys=True,
                                   redact=True))
    assert r2.key_candidates
    r3 = profile(df, ProfileConfig(exact=True))
    assert r3.key_candidates == []


def test_discover_fds_composite_level(spark):
    """max_arity=2: the composite lattice level with TANE pruning — a
    genuinely 2-ary FD ((a, b) -> c where neither column alone
    determines c) is found; composites implied by a held unary FD are
    NOT generated; near-unique combined keys are dropped like tier 1;
    the lattice cap refuses loudly; composite candidates= score through
    the same kernel as the declared composite check."""
    rows = []
    for i in range(180):
        a, b = i % 6, (i // 6) % 5
        rows.append((
            f"a{a}", f"b{b}",
            float(a * 10 + b),          # c = f(a, b): 2-ary FD
            f"n{a % 3}",                # d = f(a): unary FD from a
            f"u{i}",                    # near-unique
        ))
    df = spark.createDataFrame(rows, "a string, b string, c double,"
                               " d string, u string")

    res = C.discover_fds(df, columns=["a", "b", "c", "d"],
                         max_determinant_distinct=40, max_arity=2)
    got = {(r["determinant"], r["dependent"]): r for r in res.collect()}
    comp = got[("a,b", "c")]
    assert comp["holds"] and comp["exact"]
    assert comp["n_groups"] == 30 and comp["dependency_ratio"] == 1.0
    # TANE prune: a -> d holds at level 1, so (a, b) -> d is implied and
    # must not be generated
    assert got[("a", "d")]["holds"]
    assert ("a,b", "d") not in got
    # every generated level-2 candidate is accounted for: scored exact or
    # screened, never silently lost — (b, d) -> c does not hold and must
    # appear with a verdict either way
    assert ("b,d", "c") in got and not got[("b,d", "c")]["holds"]
    # the declared composite check agrees with the mined ratio
    declared = C.check_suite(
        df, [C.functional_dependency(["a", "b"], "c", name="x")]
    ).collect()[0]
    assert declared["value"] == comp["dependency_ratio"]

    # composite candidates= (tuple determinant) score verbatim
    byhand = C.discover_fds(
        df, candidates=[(("a", "b"), "c"), (("b",), "c")])
    r2 = {(x["determinant"], x["dependent"]): x for x in byhand.collect()}
    assert r2[("a,b", "c")]["holds"] and not r2[("b", "c")]["holds"]

    # lattice cap refuses loudly, never samples
    with pytest.raises(ValueError, match="level-2 candidates exceed"):
        C.discover_fds(df, columns=["a", "b", "c", "d"],
                       max_determinant_distinct=40, max_arity=2,
                       max_level2_candidates=1)
    with pytest.raises(ValueError, match="max_arity"):
        C.discover_fds(df, columns=["a", "b"], max_arity=3)

    # near-unique composite determinants are dropped (no row), like the
    # unary tier-1 gate: (a, b) x u pairs would be key-like — u itself is
    # already out via the unary gate, and no "u" determinant appears
    assert not any("u" in k[0].split(",") for k in got)
