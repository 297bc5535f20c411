"""Property-based tests for the temporal family (hypothesis): generated
integer axes against ground truth — brute-force crossJoin for range_join,
pandas.merge_asof for asof_join. The reference has no property-based
testing at all (SURVEY.md §5); these cover the edge shapes hand-written
fixtures miss: duplicate points, empty sides, zero-width intervals,
ties on the time axis, keys present on only one side.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from pandas_profiling_personal_spark.operators.temporal import (
    asof_join,
    range_join,
)

points_strategy = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 50)),  # (key, x)
    min_size=0,
    max_size=25,
)
intervals_strategy = st.lists(
    st.tuples(
        st.integers(0, 3), st.integers(0, 50), st.integers(0, 12)
    ),  # (key, lo, width) -> [lo, lo+width)
    min_size=1,
    max_size=12,
)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pts=points_strategy, ivs=intervals_strategy)
def test_range_join_equals_bruteforce(spark, pts, ivs):
    left = spark.createDataFrame(
        [(i, k, x) for i, (k, x) in enumerate(pts)],
        "pid int, k int, x int",
    )
    right = spark.createDataFrame(
        [(j, k, lo, lo + w) for j, (k, lo, w) in enumerate(ivs)],
        "iid int, k int, lo int, hi int",
    )
    fast = sorted(
        (r["pid"], r["iid"])
        for r in range_join(
            left, right, "x", "lo", "hi", by=["k"]
        ).collect()
    )
    brute = sorted(
        (r["pid"], r["iid"])
        for r in left.alias("l")
        .crossJoin(right.alias("r"))
        .where(
            (F.col("l.k") == F.col("r.k"))
            & (F.col("l.x") >= F.col("r.lo"))
            & (F.col("l.x") < F.col("r.hi"))
        )
        .select(F.col("l.pid"), F.col("r.iid"))
        .collect()
    )
    assert fast == brute


asof_left = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 40)),
    min_size=1,
    max_size=20,
)
asof_right = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 40)),
    min_size=0,
    max_size=15,
)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lrows=asof_left,
    rrows=asof_right,
    direction=st.sampled_from(["backward", "forward", "nearest"]),
)
def test_asof_equals_pandas(spark, lrows, rrows, direction):
    import pandas as pd

    # dedupe right (key, t): merge_asof semantics need one winner
    seen: set = set()
    rr = [
        (k, t, 100 + i)
        for i, (k, t) in enumerate(rrows)
        if not ((k, t) in seen or seen.add((k, t)))
    ]
    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(lrows)],
        "eid int, k int, t int",
    )
    rdf = spark.createDataFrame(rr, "k int, t int, v int") if rr else (
        spark.createDataFrame([], "k int, t int, v int")
    )
    got = {
        r["eid"]: r["v"]
        for r in asof_join(
            ldf, rdf, on="t", by=["k"], value_cols=["v"],
            direction=direction,
        ).collect()
    }
    lp = pd.DataFrame(
        [(i, k, t) for i, (k, t) in enumerate(lrows)],
        columns=["eid", "k", "t"],
    ).sort_values("t")
    rp = pd.DataFrame(rr, columns=["k", "t", "v"]).sort_values("t")
    if rr:
        exp = pd.merge_asof(
            lp, rp, on="t", by="k", direction=direction
        ).set_index("eid")["v"]
        for eid, want in exp.items():
            want_v = None if pd.isna(want) else int(want)
            assert got[eid] == want_v, (direction, eid, got[eid], want_v)
    else:
        assert set(got.values()) == {None}
