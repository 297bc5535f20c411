"""Bench-artifact invariants (VERDICT r12 #5): the ">3 s => labeled or
declared production shape" rule is CODE, not a review convention.

bench.py re-derives ``slow_unlabeled`` every sweep and records it in
BENCH_FULL.json; this test asserts the committed artifact satisfies the
rule, and re-derives the classification independently from the artifact's
own fields so a bench.py bug can't self-certify.
"""

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_full():
    path = os.path.join(REPO, "BENCH_FULL.json")
    with open(path) as fh:
        return json.load(fh)


def test_slow_rows_labeled_or_production():
    full = _load_full()
    if "slow_unlabeled" not in full:
        import pytest

        pytest.skip("committed BENCH_FULL.json predates the invariant "
                    "fields; the next sweep records them")
    # independent re-derivation from the artifact's own fields — always
    # enforced: a bench.py bug must not self-certify
    thr = full["slow_threshold_sec"]
    tiers = set(full["query_tiers"])
    prod = set(full["production_shapes"])
    rederived = sorted(
        q for q, t in full["queries"].items()
        if isinstance(t, (int, float)) and t > thr
        and q not in tiers and q not in prod
    )
    assert rederived == full["slow_unlabeled"]
    # the empty-list rule is calibrated for a CLEAN sf0.1 sweep — a
    # loaded host inflates absolute wall times across the board, which
    # the artifact's own contamination markers witness; those sweeps
    # record the list honestly but are not a labeling violation. The
    # cleanliness signal is the CPU canaries (host_load_1m is
    # self-polluted by the 32-thread session by design)
    sf = full.get("sf")
    canaries = [
        full.get(k) for k in
        ("cpu_canary_sec", "cpu_canary_mid_sec", "cpu_canary_end_sec")
        if isinstance(full.get(k), (int, float))
    ]
    # r14: the CPU canaries are single-thread and miss windows where
    # per-core speed is normal but the container's PARALLEL throughput
    # collapses (observed: flagship attempts 16-70 s at canaries 0.7-0.9).
    # The spark canaries are the 32-thread counterpart: a >2x spread
    # between the sweep's own samples marks a window, so the sweep is not
    # clean even with fast CPU canaries.
    sparkies = [
        full.get(k) for k in
        ("spark_canary_sec", "spark_canary_mid_sec", "spark_canary_end_sec")
        if isinstance(full.get(k), (int, float)) and full.get(k) > 0
    ]
    parallel_steady = (
        not sparkies or max(sparkies) <= 2.0 * min(sparkies)
    )
    clean = (
        isinstance(sf, (int, float)) and sf >= 0.1
        and not (full.get("throttle") or {}).get("throttled")
        and canaries and max(canaries) < 1.5
        and parallel_steady
    )
    if not clean:
        import pytest

        pytest.skip("committed artifact is not a clean sf>=0.1 sweep; "
                    "self-consistency asserted above")
    assert full["slow_unlabeled"] == [], (
        "bench rows exceeded the slow threshold without a query_tiers "
        f"label or a PRODUCTION_SHAPES entry: {full['slow_unlabeled']}"
    )


def test_slow_rule_is_host_portable():
    """VERDICT r13 #2: equal-canary hosts show 20-50% wall variance, so
    the slow threshold scales with the sweep's own flagship ratio. The
    invariant must hold on BOTH the committed artifact and a synthetic
    sweep 1.5x slower across the board (the r13 driver-host scenario)."""
    import sys

    sys.path.insert(0, REPO)
    import bench

    full = _load_full()
    tiers = bench.QUERY_TIERS  # the live rule, not the artifact snapshot
    for factor in (1.0, 1.5):
        timings = {
            q: t * factor for q, t in full["queries"].items()
            if isinstance(t, (int, float))
        }
        thr = bench.slow_threshold_sec(
            timings.get("full_profile_lineitem"), full.get("sf")
        )
        assert bench.derive_slow_unlabeled(timings, tiers, thr) == [], (
            f"slow rows unlabeled at host-slowdown factor {factor}"
        )
    # the scaling never RELAXES the rule on a fast host: a sweep whose
    # flagship beats the reference keeps the base threshold
    assert bench.slow_threshold_sec(0.5 * bench.SLOW_REF_FLAGSHIP_SEC, 0.1) \
        == bench.SLOW_SEC


def test_slow_scale_capped_at_regression_bound():
    """ADVICE r14: without a cap, a genuine flagship regression would
    proportionally relax the slow-labeling rule for every other row. A
    >2x flagship-vs-reference ratio is a regression or a throttle window,
    not host variance — the threshold must stop scaling there."""
    import sys

    sys.path.insert(0, REPO)
    import bench

    assert bench.slow_threshold_sec(
        10.0 * bench.SLOW_REF_FLAGSHIP_SEC, 0.1
    ) == round(bench.SLOW_SEC * 2.0, 3)


# VERDICT r14 #9: the label lists are FROZEN. Growing them shrinks the
# bench's bite — any addition must show up as a diff to these constants
# with a VERDICT/ADVICE citation in the commit message.
_FROZEN_QUERY_TIERS = [
    "ann_lsh_recall_embeddings",
    "asof_state_events",
    "benford_lineitem",
    "check_violations_lineitem",
    "drift_psi_lineitem",
    "embedding_drift_embeddings",
    "fk_catalog_tpch",
    "incremental_cramers_v_lineitem",
    "incremental_drift_lineitem",
    "incremental_embedding_drift_embeddings",
    "incremental_image_dedup_documents",
    "incremental_pearson_lineitem",
    "incremental_target_relevance_lineitem",
    "mad_lineitem",
    "numeric_summary_lineitem",
    "numeric_summary_nation",
    "phik_mixed_contingency_lineitem",
    "rolling_trend_events",
    "seasonal_decompose_events",
    "spearman_lineitem",
    "ts_anomaly_events",
]
_FROZEN_PRODUCTION_SHAPES = [
    "audio_near_dup_documents",
    "corpus_funnel_documents",
    "full_profile_events",
    "full_profile_lineitem",
    "full_profile_wide100",
    "image_dedup_keep_list_documents",
    "incremental_minhash_dedup_documents",
    "kendall_customer",
    "semantic_dedup_embeddings",
    "video_near_dup_documents",
]


def test_label_lists_frozen():
    """VERDICT r14 #9: QUERY_TIERS / PRODUCTION_SHAPES membership equals
    the committed constant above — silent label creep is a test failure."""
    import sys

    sys.path.insert(0, REPO)
    import bench

    assert sorted(bench.QUERY_TIERS) == _FROZEN_QUERY_TIERS
    assert sorted(bench.PRODUCTION_SHAPES) == _FROZEN_PRODUCTION_SHAPES


def test_production_shapes_and_tiers_name_real_specs():
    """Every label/production entry names a spec that exists (or a bench-
    only synthetic like full_profile_*): a renamed spec must not leave a
    stale label behind that silently re-opens the rule."""
    import sys

    sys.path.insert(0, REPO)
    import bench
    import __spark_entry__ as E

    specs = set(E.queries())
    bench_only = {q for q in bench.PRODUCTION_SHAPES if
                  q.startswith(("full_profile", "pipeline_"))}
    for q in bench.PRODUCTION_SHAPES:
        assert q in specs or q in bench_only, q
    full = _load_full()
    for q in full.get("query_tiers", {}):
        assert q in specs or q.startswith(("full_profile", "pipeline_")), q
