"""Layout advisor (operators/layout.py): stats semantics on crafted frames,
the partition/bucket/salt rules, and the one-exchange plan gate."""

import pytest
from pyspark.sql import functions as F

from pandas_profiling_personal_spark.operators.layout import (
    layout_stats,
    suggest_layout,
)


def _by_col(df):
    return {r["column"]: r.asDict() for r in df.collect()}


def test_layout_stats_semantics(spark):
    rows = [
        ("a", 1, None),
        ("a", 2, None),
        ("a", 3, None),
        ("b", 4, None),
        (None, 5, None),
    ]
    df = spark.createDataFrame(rows, "cat string, id int, dead string")
    s = _by_col(layout_stats(df))
    cat = s["cat"]
    # 4 non-null rows, groups {a:3, b:1}
    assert cat["n_rows"] == 5 and cat["n_null"] == 1
    assert cat["n_distinct"] == 2 and cat["max_group"] == 3
    assert cat["mean_group"] == pytest.approx(2.0)
    assert cat["skew_ratio"] == pytest.approx(1.5)   # 3 / (4/2)
    assert cat["top_share"] == pytest.approx(0.75)
    uid = s["id"]
    assert uid["n_distinct"] == 5 and uid["skew_ratio"] == pytest.approx(1.0)
    # all-null column: NULL skew fields, no division error
    dead = s["dead"]
    assert dead["n_null"] == 5 and dead["n_distinct"] == 0
    assert dead["max_group"] is None and dead["skew_ratio"] is None


def test_layout_stats_single_exchange_plan(spark):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("g"),
        F.col("id").cast("string").alias("s"))
    plan = layout_stats(df)._jdf.queryExecution().executedPlan().toString()
    # one DATA exchange keyed (cid, v) + the per-column rollup exchange
    # (carries |cols| partial-aggregate rows, not data)
    assert plan.count("Exchange") == 2, plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_suggest_layout_rules(spark):
    import pandas as pd

    n = 5000
    pdf = pd.DataFrame({
        # good partition column: 10 distinct, uniform, never null
        "region": [f"r{i % 10}" for i in range(n)],
        # high-cardinality join key with one hot value (50% of rows)
        "user_id": [0 if i % 2 == 0 else i for i in range(n)],
        # unique key — partition-rejected (small files), best bucket
        "row_id": list(range(n)),
        # constant — rejected
        "const": ["x"] * n,
        # nullable beyond the threshold — rejected
        "half_null": [None if i % 2 == 0 else f"v{i % 3}" for i in range(n)],
    })
    df = spark.createDataFrame(pdf)
    adv = suggest_layout(
        df, join_keys=["user_id"],
        max_partitions=100, target_rows_per_bucket=500,
    )
    assert adv["n_rows"] == n
    part_cols = [e["column"] for e in adv["partition_by"]]
    assert part_cols == ["region"]
    rej = {e["column"]: e["reason"] for e in adv["rejected_partition"]}
    assert "small-file problem" in rej["row_id"]
    assert rej["const"] == "constant"
    assert "null" in rej["half_null"]
    assert "user_id" in rej  # hot high-cardinality key is no partition col
    # a skewed-but-partition-sized column is rejected on skew specifically
    # skew_ratio = 500 / (510/11) = 10.8 > the default 10.0 gate
    skew_df = spark.createDataFrame(
        [("hot",)] * 500 + [(f"v{i}",) for i in range(10)], "k string")
    adv_skew = suggest_layout(skew_df)
    srej = {e["column"]: e["reason"]
            for e in adv_skew["rejected_partition"]}
    assert "dominant value" in srej["k"]
    # declared join key wins the bucket slot even though row_id has more
    # distinct values; 5000/500 -> 8 buckets (pow2)
    assert adv["bucket_by"]["column"] == "user_id"
    assert adv["bucket_by"]["n_buckets"] == 8
    # the hot key triggers salting advice: skew = 2500 / (5000/2501)
    assert adv["salt"] and adv["salt"][0]["column"] == "user_id"
    assert adv["salt"][0]["salt_factor"] >= 2
    assert any("adaptive" in note for note in adv["notes"])

    # without declared join keys, bucket falls to the highest-cardinality
    # column and no salt advice is issued
    adv2 = suggest_layout(df, target_rows_per_bucket=500)
    assert adv2["bucket_by"]["column"] == "row_id"
    assert adv2["salt"] == []

    with pytest.raises(ValueError, match="join_keys"):
        suggest_layout(df, join_keys=["nope"])
    with pytest.raises(ValueError, match="no columns"):
        layout_stats(df.select())


def test_suggest_layout_from_profile_zero_jobs(spark):
    """The same rules over an existing ProfileResult cost ZERO Spark jobs
    and agree with the scan-based advisor on the exact tier (where
    n_distinct and top_values are exact)."""
    from pandas_profiling_personal_spark import ProfileConfig, profile
    from pandas_profiling_personal_spark.operators.layout import (
        suggest_layout_from_profile,
    )

    rows = [(f"r{i % 10}", i, "x") for i in range(200)]
    df = spark.createDataFrame(rows, "region string, id int, const string")
    r = profile(df, ProfileConfig(exact=True))

    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    adv = suggest_layout_from_profile(r, join_keys=["id"],
                                      target_rows_per_bucket=50,
                                      max_partitions=100)
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before  # pure driver arithmetic
    assert [e["column"] for e in adv["partition_by"]] == ["region"]
    rej = {e["column"]: e["reason"] for e in adv["rejected_partition"]}
    assert rej["const"] == "constant" and "small-file" in rej["id"]
    assert adv["bucket_by"]["column"] == "id"
    assert adv["salt"] == []  # id is uniform

    scan = suggest_layout(df, join_keys=["id"],
                          target_rows_per_bucket=50, max_partitions=100)
    assert ([e["column"] for e in scan["partition_by"]]
            == [e["column"] for e in adv["partition_by"]])
    assert scan["bucket_by"]["n_buckets"] == adv["bucket_by"]["n_buckets"]

    # r11 ADVICE (low): a redacted profile withholds top_values, so the
    # candidate's skew is UNKNOWN — still accepted (documented limitation)
    # but the reason says so instead of interpolating "skew None"
    rr = profile(df, ProfileConfig(exact=True, redact=True))
    adv_r = suggest_layout_from_profile(rr, join_keys=["id"],
                                        target_rows_per_bucket=50,
                                        max_partitions=100)
    cand = {e["column"]: e for e in adv_r["partition_by"]}
    assert cand["region"]["skew_ratio"] is None
    assert "skew unknown (top values withheld)" in cand["region"]["reason"]
    assert "None" not in cand["region"]["reason"]


def test_apply_layout_path_and_table(spark, tmp_path):
    """apply_layout executes the advice: path -> partitioned directories
    (bucket half reported as skipped), table -> bucketed catalog table."""
    import os

    from pandas_profiling_personal_spark.operators.layout import apply_layout

    rows = [(f"r{i % 4}", i) for i in range(100)]
    df = spark.createDataFrame(rows, "region string, id int")
    adv = suggest_layout(df, join_keys=["id"], max_partitions=50,
                         target_rows_per_bucket=25)
    assert adv["partition_by"][0]["column"] == "region"
    assert adv["bucket_by"]["column"] == "id"

    out = str(tmp_path / "t1")
    applied = apply_layout(df, adv, path=out)
    assert applied["partition_by"] == ["region"]
    assert applied["bucket_by"] is None
    assert any("bucketing needs a catalog table" in s
               for s in applied["skipped"])
    assert sorted(
        d for d in os.listdir(out) if d.startswith("region=")
    ) == [f"region=r{i}" for i in range(4)]
    assert spark.read.parquet(out).count() == 100

    tbl = "layout_apply_test_tbl"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    try:
        applied = apply_layout(df, adv, table=tbl, mode="overwrite")
        assert applied["bucket_by"] == ["id"]
        assert applied["n_buckets"] == adv["bucket_by"]["n_buckets"]
        desc = spark.sql(f"DESCRIBE TABLE EXTENDED {tbl}").collect()
        txt = "\n".join(f"{r.col_name} {r.data_type}" for r in desc)
        assert "id" in txt and "Bucket" in txt
        assert spark.table(tbl).count() == 100
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")

    with pytest.raises(ValueError, match="exactly one"):
        apply_layout(df, adv)
    with pytest.raises(ValueError, match="exactly one"):
        apply_layout(df, adv, path="x", table="y")


def test_layout_advice_in_profile_and_report(spark):
    """layout_advice=True attaches the zero-scan advice to the result and
    the HTML gains a Layout section; absent join keys are dropped."""
    from pandas_profiling_personal_spark import ProfileConfig, profile
    from pandas_profiling_personal_spark.report.html import render_html

    rows = [(f"r{i % 5}", i) for i in range(100)]
    df = spark.createDataFrame(rows, "region string, id int")
    r = profile(df, ProfileConfig(
        exact=True, layout_advice=True,
        layout_join_keys=("id", "ghost_col")))
    # both qualify; id (100 distinct) ranks closer to the 1000-partition
    # ideal than region (5 distinct)
    assert ([e["column"] for e in r.layout["partition_by"]]
            == ["id", "region"])
    assert r.layout["bucket_by"]["column"] == "id"
    page = render_html(r)
    assert "data-section='layout'" in page and "Layout advice" in page
    assert "region" in page and "adaptive" in page

    j = __import__("json").loads(r.to_json())
    assert j["layout"]["bucket_by"]["column"] == "id"

    # default: off, no section
    r2 = profile(df, ProfileConfig(exact=True))
    assert r2.layout == {}
    assert "data-section='layout'" not in render_html(r2)


def test_suggest_layout_byte_sized_buckets(spark):
    """target_bucket_mb sizes buckets from Catalyst's bytes-per-row
    estimate instead of a row count."""
    df = spark.range(10000).select(
        F.col("id"), F.concat(F.lit("x" * 200),
                              F.col("id").cast("string")).alias("payload"))
    adv = suggest_layout(df, join_keys=["id"], target_bucket_mb=0.25)
    # ~210 bytes/row x 10k rows ≈ 2 MiB -> ~8 buckets at 0.25 MiB each;
    # the Catalyst estimate is approximate, so pin the pow2 range not the
    # exact value — and that it differs from the row-target default (4)
    assert adv["bucket_by"]["column"] == "id"
    assert adv["bucket_by"]["n_buckets"] in (4, 8, 16, 32)
    row_default = suggest_layout(df, join_keys=["id"])
    assert row_default["bucket_by"]["n_buckets"] == 4  # min_buckets floor


def test_suggest_layout_from_state(spark):
    """The advisor's state mode: yesterday's PartialProfile prices today's
    layout with no data rescans (one sketch-literal job for cardinality)."""
    from pandas_profiling_personal_spark.operators.layout import (
        suggest_layout_from_state,
    )
    from pandas_profiling_personal_spark.plans.incremental import (
        partial_profile,
    )

    rows = [(f"r{i % 6}", i, None) for i in range(300)]
    df = spark.createDataFrame(rows, "region string, id int, dead string")
    part = partial_profile(df)

    adv = suggest_layout_from_state(part, join_keys=["id"], spark=spark,
                                    max_partitions=50,
                                    target_rows_per_bucket=100)
    part_cols = [e["column"] for e in adv["partition_by"]]
    assert part_cols == ["region"]
    rej = {e["column"]: e["reason"] for e in adv["rejected_partition"]}
    assert "dead" in rej and rej["dead"] == "all null"
    assert "id" in rej  # ~300 distinct > max_partitions=50
    assert adv["bucket_by"]["column"] == "id"

    # stats carry the state's skew view: categorical has a max_group from
    # top_values, numeric skew is unknown (no top list) — documented
    by = {r["column"]: r for r in adv["stats"]}
    assert by["region"]["max_group"] == 50
    assert by["id"]["max_group"] is None

    with pytest.raises(ValueError, match="SparkSession"):
        suggest_layout_from_state(part, spark=None)
