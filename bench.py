#!/usr/bin/env python3
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": sec, "unit": "sec", "queries": {name: sec}, "sf": ...}

``value`` is the wall-clock of the flagship full profile of lineitem (constant
job-count pipeline, default approximate tier — the 100 TB configuration);
``queries`` adds per-operator timings of every oracle-parity query (exact tier).
"""

from __future__ import annotations

import json
import os
import time


def _loadavg() -> float:
    try:
        with open("/proc/loadavg") as fh:
            return float(fh.read().split()[0])
    except Exception:
        return -1.0


def _cpu_canary() -> float:
    """Single-thread CPU canary, run BEFORE the Spark session exists: a fixed
    20M-iteration loop. Measured range on this container: 0.77 s (fast
    state) to 2.0 s (slow state) for IDENTICAL code — the host's effective
    CPU speed swings ~2.5x between sessions. Unlike loadavg (self-polluted
    once the 32-thread session is running), this isolates that multiplier:
    compare canaries before comparing sweeps."""
    t0 = time.time()
    s = 0
    for i in range(20_000_000):
        s += i
    return round(time.time() - t0, 2)


# genuine production shapes that legitimately exceed SLOW_SEC at sf0.1 on
# this 32-thread container — named HERE (not just in review prose) so the
# rule "every >SLOW_SEC row carries a query_tiers label or is a declared
# production shape" is CODE, not convention (VERDICT r12 #5):
# tests/test_bench_invariants.py asserts slow_unlabeled == [] on the
# committed BENCH_FULL.json, and every sweep re-derives it
SLOW_SEC = 3.0
# committed clean-sweep flagship wall (sf0.1, canaries < 1.0): the
# host-speed yardstick. Hosts at equal canary readings still show
# 20-50% wall variance (the r13 driver sweep read the flagship at 8.3 s
# vs 8.3 committed but four 2.0-2.5 s rows at 3.1-5.0 s), so the slow
# threshold scales with the sweep's OWN flagship-vs-reference ratio —
# never below SLOW_SEC, so a fast host cannot relax the rule.
SLOW_REF_FLAGSHIP_SEC = 8.3
PRODUCTION_SHAPES = {
    "full_profile_lineitem": "flagship multi-pass profile",
    "full_profile_wide100": "flagship 100-column profile",
    "full_profile_events": "flagship profile",
    "semantic_dedup_embeddings": (
        "real SemDeDup: k-means quantization + per-cell dedup IS the "
        "production operation being priced"
    ),
    "video_near_dup_documents": (
        "real decode + frame-signature + banded join pipeline"
    ),
    "audio_near_dup_documents": (
        "real decode + audio-fingerprint + banded join pipeline (the "
        "audio twin of video_near_dup; codec boundary is the cost)"
    ),
    "image_dedup_keep_list_documents": (
        "full phash + band-join + keep-list materialization"
    ),
    "corpus_funnel_documents": (
        "full sequential-filter funnel over every document (language, "
        "quality, C4, repetition, PII, exact + near dedup flags) — the "
        "production pre-training data pipeline being priced"
    ),
    "incremental_minhash_dedup_documents": (
        "full daily store round trip by design (signature pass + banded "
        "store join + store update) — this IS the incremental operation "
        "being priced"
    ),
    "kendall_customer": (
        "distributed exact tau-b production path: bounded per-bucket "
        "applyInPandas kernels (retires the reference's all-data-on-one-"
        "worker shape); exactness is the product, not a test tier"
    ),
}


def _spark_canary(spark) -> float:
    """Fixed parallel canary: one codegen'd 64M-row range aggregate using
    every core. The single-thread CPU canary misses the r14-observed
    failure mode — single-thread speed normal while the container's
    PARALLEL throughput collapses (external load on the host): sweeps in
    such a window read 2-10x slow on every multi-core stage with clean
    CPU canaries. This canary is the 32-thread counterpart; compare
    start/mid/end readings to date a window."""
    t0 = time.time()
    spark.range(64_000_000).selectExpr(
        "count(if(id % 7 = 0, 1, null))"
    ).collect()
    return round(time.time() - t0, 3)


def slow_threshold_sec(flagship_sec: float | None, sf) -> float:
    """Effective slow threshold for one sweep: SLOW_SEC scaled by the
    sweep's own flagship-vs-committed-reference ratio (sf0.1 only — the
    reference is an sf0.1 wall), floored at SLOW_SEC so fast hosts keep
    the strict rule. Makes the ">SLOW_SEC => labeled" invariant portable
    across hosts whose clean-canary walls differ 20-50%.

    The scale is CAPPED at 2.0 (ADVICE r14): without the cap a genuine
    flagship regression would proportionally relax the labeling rule for
    every other row — a >2x flagship ratio is a regression or a throttle
    window, not host variance, and must not buy unlabeled-slow amnesty."""
    scale = 1.0
    if (
        isinstance(flagship_sec, (int, float))
        and flagship_sec > 0
        and isinstance(sf, (int, float))
        and abs(sf - 0.1) < 1e-9
    ):
        scale = min(2.0, max(1.0, flagship_sec / SLOW_REF_FLAGSHIP_SEC))
    return round(SLOW_SEC * scale, 3)


def derive_slow_unlabeled(timings: dict, query_tiers: dict, thr: float) -> list:
    """The invariant's classification, shared by the sweep and the unit
    tests: rows above ``thr`` with neither a tier label nor a declared
    production shape."""
    return sorted(
        q for q, t in timings.items()
        if isinstance(t, (int, float)) and t > thr
        and q not in query_tiers and q not in PRODUCTION_SHAPES
    )


# tier labels (VERDICT r8 #6): specs that deliberately run a TEST-tier
# plan — their sweep numbers price the parity harness, not the
# production path; read these before calling a number a regression
QUERY_TIERS = {
    "spearman_lineitem": (
        "oracle tier: method='window' (single-partition rank join for "
        "cross-engine determinism); production default method='ml' "
        "measured ~2.5x faster on the same data"
    ),
    "incremental_pearson_lineitem": (
        "test harness: 3 full partial_profile passes + merge — the "
        "Pearson increment itself rides the existing moment aggregate "
        "(zero extra jobs; sf1 scale point in PERFORMANCE.md)"
    ),
    "incremental_cramers_v_lineitem": (
        "test harness: 3 full partial_profile passes + merge — the "
        "contingency state is one melt shuffle per shard"
    ),
    "incremental_target_relevance_lineitem": (
        "test harness: 3 full partial_profile passes (correlations + "
        "group-moment cells) + merge + finalize — the production mode "
        "ranks from persisted daily states with zero jobs (sf1 point "
        "flat, PERFORMANCE.md r12)"
    ),
    "incremental_drift_lineitem": (
        "test harness: profiles BOTH shards then drifts the states; "
        "the production mode drifts two persisted states with zero jobs"
    ),
    "incremental_embedding_drift_embeddings": (
        "test harness: builds both embedding states in-spec; production "
        "drifts persisted states"
    ),
    "incremental_image_dedup_documents": (
        "full two-step store round trip by design — this IS the daily "
        "operation being priced"
    ),
    "ann_lsh_recall_embeddings": (
        "gate tier: runs the exact scan AND the LSH path to measure "
        "recall; production ANN is ann_lsh_topk / pipeline_ann_lsh"
    ),
    "rolling_trend_events": (
        "oracle tier: stable=True grid (exact DECIMAL bucket means) + "
        "scaled-BIGINT window sums for cross-engine bit-equality; "
        "production default uses plain avg (codegen, no decimals)"
    ),
    "ts_anomaly_events": (
        "oracle tier: stable=True grid + exact scaled-integer "
        "threshold (the flag boolean is the hash-matched quantity); "
        "production default computes the same rule in doubles"
    ),
    "asof_state_events": (
        "spec builds the snapshot table in-query (hourly groupBy) "
        "before the as-of itself — the union-tag window is the priced "
        "operator"
    ),
    "phik_mixed_contingency_lineitem": (
        "oracle tier: EXACT decile edges (F.percentile) for "
        "cross-engine bit-equality; production phik_matrix uses GK "
        "approx edges on the same one-shuffle contingency"
    ),
    "seasonal_decompose_events": (
        "oracle tier: stable DECIMAL grid + scaled-BIGINT window "
        "sums, aggregated per period for the hash gate; production "
        "decomposition is plain doubles on the same bounded grid "
        "(sf1 point: flat, PERFORMANCE.md)"
    ),
    "check_violations_lineitem": (
        "diagnostic tier by design: one bounded TakeOrderedAndProject "
        "job per check — run on the failed handful, not the suite "
        "(the gate itself stays one-scan-per-family)"
    ),
    "numeric_summary_nation": (
        "25-row table: wall is pure fixed overhead, not operator cost"
    ),
    "numeric_summary_lineitem": (
        "oracle tier: exact percentiles (sort-based F.percentile second "
        "scan) + exact distincts for cross-engine bit-equality; the "
        "production default tier is GK approx_percentile + HLL riding "
        "the single scalar scan"
    ),
    "benford_lineitem": (
        "oracle tier: printf-decimal first-digit extraction (string "
        "arithmetic chosen because it is engine-identical where "
        "log10/pow float arithmetic is not); spread has always been "
        "~2x on this container (GC-adjacent)"
    ),
    "embedding_drift_embeddings": (
        "test harness: builds BOTH halves' embedding profiles in-spec "
        "before drifting them; production drifts two persisted states "
        "with zero rescans (kin incremental_embedding_drift)"
    ),
    "fk_catalog_tpch": (
        "oracle tier: prune=False so EVERY type-compatible pair "
        "(16 anti-joins across 3 tables) verifies exactly for the "
        "DuckDB catalog rebuild; production prunes with one "
        "min/max/HLL stats scan per table and anti-joins survivors "
        "only"
    ),
    "drift_psi_lineitem": (
        "test harness: builds BOTH the baseline and the shifted "
        "candidate profile in-spec before the PSI compare (the same "
        "shape its kin embedding_drift_embeddings labels); production "
        "drifts persisted states with zero rescans"
    ),
    "mad_lineitem": (
        "oracle tier: exact-percentile pass (median-of-medians rides "
        "the same sort-based F.percentile scan numeric_summary pins); "
        "production MAD uses GK approx percentiles on the single "
        "scalar scan"
    ),
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    canary = _cpu_canary()  # before the JVM exists: pure host signal

    from pandas_profiling_personal_spark.session import get_session

    spark = get_session(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E
    from pandas_profiling_personal_spark import ProfileConfig, profile
    from pandas_profiling_personal_spark.sources.readers import read_parquet

    # warm up the JVM / whole-stage codegen on a small slice so the timings below
    # measure steady-state throughput, not first-call compilation. sf0.01 (not
    # sf0.001) on purpose: interpreted higher-order-function paths (shingling)
    # need enough row volume for the JIT to compile the hot evaluator loops —
    # measured on this container, a cold HOF query runs 10-20x slower for its
    # first TWO full-scale executions, then settles (13.8s / 21.6s / 3.3s /
    # 0.8s for the same shingle count).
    warm_dir = "/root/testdata/sf0.01"
    try:
        profile(read_parquet(spark, f"{warm_dir}/lineitem.parquet"))
    except Exception:
        pass
    # NOTE (r12): the old warm-up ran EVERY query here, up front — but
    # Spark's generated-class cache holds 100 entries (CodeGenerator
    # LRU), so with 105 specs the early warm-ups were EVICTED before the
    # sweep reached their specs, which then recompiled + re-JIT'd inside
    # their timed attempts (r12 first sweep: histogram 1.0 s steady read
    # 4.6 s, hourly_rollup 0.57 -> 4.0, dedup_keep_list 2.5 -> 9.3, all
    # with consistent attempt lists — a cache artifact, not a plan
    # change; isolated re-runs matched r11). Each spec now warms at
    # sf0.01 immediately before ITS timed attempts (in the query loop),
    # so the generated classes are compiled and cached when timing
    # starts, exactly like steady-state production.

    # parallel Spark canary (r14): dates the container's PARALLEL
    # throughput at sweep start — the single-thread canaries miss windows
    # where per-core speed is normal but multi-core throughput collapses
    spark_canary = _spark_canary(spark)

    # flagship: full default-tier profile of lineitem (approx estimators — the
    # configuration that scales; exact tier is for the oracle gate)
    from pyspark.sql import functions as F

    # per-attempt times for the three flagships go into BENCH_FULL verbatim:
    # the r7 driver sweep recorded the lineitem flagship at 28.1 s inside a
    # host-throttle window while the same commit measured 11.5 s min-of-3 —
    # with the attempts recorded, a throttle window is self-evident from the
    # artifact (one 40 s outlier next to two ~11 s runs) instead of needing
    # after-the-fact adjudication
    attempts: dict[str, list[float]] = {}
    # kept re-runnable: if the post-flagship canary shows a throttle window
    # opened DURING the flagship set, each entry gets extra attempts below
    flagship_runs: list[tuple[str, object]] = []

    def flagship_wall(name: str, run, n: int = 3) -> float:
        flagship_runs.append((name, run))
        best = float("inf")
        attempts[name] = []
        for _ in range(n):
            t0 = time.time()
            run()
            el = time.time() - t0
            attempts[name].append(round(el, 3))
            best = min(best, el)
        # VERDICT r11 #3: a >2x attempt spread IS a throttle signature even
        # when the canaries stayed fast through it (r11 recorded [10.9,
        # 43.4, 10.6] with throttled:false) — take up to two extra attempts
        # so the min includes post-window executions; the outlier stays in
        # the recorded list and sets the per-flagship marker below
        while (
            max(attempts[name]) > 2.0 * min(attempts[name])
            and len(attempts[name]) < n + 2
        ):
            t0 = time.time()
            run()
            attempts[name].append(round(time.time() - t0, 3))
            best = min(best, attempts[name][-1])
        return best

    df = read_parquet(spark, f"{sf_dir}/lineitem.parquet")
    flagship = flagship_wall(
        "full_profile_lineitem", lambda: profile(df, ProfileConfig(exact=False))
    )

    timings: dict[str, float] = {"full_profile_lineitem": round(flagship, 3)}

    # wide-table proof (VERDICT r2 #4): 100-column profile — the shared
    # builder in benchmarks.py (ONE definition for bench + A/B adjudication;
    # review r7). Records that the one-pass wide agg survives 100+ columns
    # with no per-column job growth (asserted in tests/test_plan_quality.py)
    # and no codegen cliff.
    from pandas_profiling_personal_spark.benchmarks import wide100_frame

    # warm the 100-col plan SHAPE at sf0.01: the generated aggregate classes
    # for a 900-expression pass are their own JIT surface — the 11-column
    # warmup above does not touch them, and a cold first wide run reads 2-3x
    # its steady state (stage-metric attribution in PERFORMANCE.md)
    try:
        profile(
            wide100_frame(read_parquet(spark, f"{warm_dir}/lineitem.parquet")),
            ProfileConfig(exact=False),
        )
    except Exception:
        pass
    wide = wide100_frame(df)
    # min-of-3 like the other flagships: host-level throttle windows (see
    # PERFORMANCE.md variance caveat) can inflate a single 50 s run 2-3x
    wide_wall = flagship_wall(
        "full_profile_wide100", lambda: profile(wide, ProfileConfig(exact=False))
    )
    timings["full_profile_wide100"] = round(wide_wall, 3)

    # breadth: the events table (nano-timestamp ingestion, datetime describer,
    # JSON/string columns) through the same default-tier pipeline. min-of-2
    # like the other flagships — r6 recorded this one at 1.61x its steady
    # state precisely because it was the only single-shot flagship and the
    # sweep ran inside a host-throttle window (PERFORMANCE.md r7)
    ev = read_parquet(spark, f"{sf_dir}/events.parquet")
    ev_wall = flagship_wall(
        "full_profile_events", lambda: profile(ev, ProfileConfig(exact=False))
    )
    timings["full_profile_events"] = round(ev_wall, 3)

    # throttle-aware flagship re-run (VERDICT r10 #8): the pre-JVM canary
    # dates the host speed at sweep START; when the post-flagship canary
    # reads >1.5x that, a throttle window opened during the flagship set and
    # the min-of-3 numbers above may never have seen a fast execution —
    # re-measure each flagship twice so the recorded min includes at least
    # one attempt outside the window. The artifact always carries an
    # explicit marker either way, so the judge reads the state off the
    # record instead of inferring it from attempt spreads.
    canary_after_flagships = _cpu_canary()
    flagship_rerun = False
    if canary > 0 and canary_after_flagships > 1.5 * canary:
        flagship_rerun = True
        for fname, frun in flagship_runs:
            for _ in range(2):
                t0 = time.time()
                frun()
                attempts[fname].append(round(time.time() - t0, 3))
            timings[fname] = round(min(attempts[fname]), 3)
        flagship = timings["full_profile_lineitem"]
    throttle_info = {
        "cpu_canary_after_flagships_sec": canary_after_flagships,
        "throttled": bool(canary > 0
                          and canary_after_flagships > 1.5 * canary),
        "flagship_rerun": flagship_rerun,
        "flagship_spread": {
            n_: round(max(a_) / min(a_), 2)
            for n_, a_ in attempts.items() if a_ and min(a_) > 0
        },
        # per-flagship throttle marker fired by SPREAD alone (VERDICT r11
        # #3): true when a >2x outlier sits in the attempt list even though
        # the canaries read fast — the min is post-window (extra attempts
        # above), the marker says the window happened
        "flagship_throttled_by_spread": {
            n_: bool(max(a_) > 2.0 * min(a_))
            for n_, a_ in attempts.items() if a_ and min(a_) > 0
        },
    }

    # per-query attempt lists (BENCH_FULL only — the headline stays short):
    # r8's sweep recorded min-of-2 values but NOT the attempts, so four
    # phantom 2-5x "regressions" still needed manual A/B adjudication
    # (VERDICT r8 #4) — with the attempts in the artifact, a throttle window
    # is self-evident (one slow attempt next to a normal one) and a REAL
    # regression shows as consistently-slow attempts
    query_attempts: dict[str, list[float]] = {}

    # specs whose plan crosses the Arrow/Python-worker boundary
    # (mapInPandas codec decode in operators/multimodal.py, applyInPandas
    # Kendall kernels in operators/correlations.py). The sf0.01 warm-up at
    # sweep start does touch them, but ~60 queries later the Python worker
    # pool has gone cold again and the FIRST timed attempt eats an ~8 s
    # spin-up while the second is still warming (r11 media_metadata
    # recorded [7.75, 4.25] against a ~0.7-0.9 s steady state) — so these
    # get one untimed full-scale execution immediately before timing
    # (VERDICT r11 #2)
    ARROW_WARM = {
        "media_metadata_documents",
        "audio_metadata_documents",
        "video_metadata_documents",
        "binary_format_mix_documents",
        "image_near_dup_documents",
        "audio_near_dup_documents",
        "video_near_dup_documents",
        "image_dedup_keep_list_documents",
        "incremental_image_dedup_documents",
        "kendall_customer",
    }

    def timed(run, name: str | None = None) -> float:
        # min-of-2 ALWAYS: this container shows 2-8 s stop-the-world pauses
        # (GC/codegen) on queries whose steady state is sub-second, so a
        # single sweep routinely reads 2-4x slow — r3's four "regressions"
        # (simhash/cosine_topk/embedding_near_dup/media_metadata) were all
        # exactly this artifact (interleaved A/B re-measurement, 7 runs each,
        # put every median at or below the r2 level; see PERFORMANCE.md).
        tries = query_attempts.setdefault(name, []) if name else []
        if name in ARROW_WARM:
            run()  # untimed: absorb the Python-worker/Arrow spin-up
        elapsed = float("inf")
        for _ in range(2):
            t0 = time.time()
            run()
            el = time.time() - t0
            tries.append(round(el, 3))
            elapsed = min(elapsed, el)
        # rare longer pauses (10-40 s), cold interpreted-HOF paths that
        # need TWO full-scale runs to JIT, and >2x attempt disagreement
        # (min-of-2 never reached steady state — VERDICT r11 #2): keep
        # re-measuring up to two extra attempts
        for _ in range(2):
            if elapsed <= 5.0 and (
                not tries or max(tries) <= 2.0 * min(tries)
            ):
                break
            t0 = time.time()
            run()
            el = time.time() - t0
            tries.append(round(el, 3))
            elapsed = min(elapsed, el)
        return round(elapsed, 3)

    qitems = list(E.queries().items())
    canary_mid = None
    spark_canary_mid = None
    for i, (name, fn) in enumerate(qitems):
        if i == len(qitems) // 2:
            # mid-sweep canary: the pre-JVM canary dates the host's speed at
            # sweep START; a throttle window opening mid-sweep (the r7
            # artifact) is only visible from a second sample. Polluted by the
            # live 32-thread session, so compare mid-to-mid across runs, not
            # mid-to-pre — a 3x+ mid/pre ratio next to a normal pre canary
            # is the throttle signature
            canary_mid = _cpu_canary()
            spark_canary_mid = _spark_canary(spark)
        try:
            # per-spec warm-up at sf0.01: compiles + caches THIS spec's
            # generated classes (and spins the Python worker pool for
            # Arrow specs) right before its timed attempts — see the
            # codegen-cache eviction note at the old warm loop's site
            fn(spark, warm_dir).collect()
        except Exception:
            pass
        timings[name] = timed(lambda: fn(spark, sf_dir).collect(), name)

    # pipeline headliners at bench scale (not oracle-tier params): near-dup
    # detection over all documents and ANN over all embeddings
    from pandas_profiling_personal_spark.operators import (
        dedup as DD,
        similarity as SIM,
        text as TX,
    )

    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    emb = read_parquet(spark, f"{sf_dir}/embeddings.parquet")
    timings["pipeline_text_profile"] = timed(
        lambda: TX.text_profile(docs, "text", "doc_id").count(),
        "pipeline_text_profile",
    )
    timings["pipeline_minhash_dedup"] = timed(
        lambda: DD.minhash_dedup(
            docs, "doc_id", "text", num_hashes=32, bands=8, hash_fn="xxhash64"
        ).count(),
        "pipeline_minhash_dedup",
    )
    timings["pipeline_ann_lsh"] = timed(
        lambda: SIM.ann_topk_lsh(
            emb, emb.where(F.col("vec_id") < 50), dim=64, k=10
        ).count(),
        "pipeline_ann_lsh",
    )

    # r6 headliner: the daily-incremental dedup round trip (store = first
    # half of the corpus by id, new shard = second half) — the operating
    # mode the 100 TB story leans on, so its wall belongs in the
    # driver-recorded headline
    mid = docs.agg(F.expr("percentile(doc_id, 0.5)")).first()[0]

    def _inc_dedup() -> None:
        fa = DD.incremental_exact_dedup(
            docs.where(F.col("doc_id") < mid), None
        )
        store = DD.dedup_store_update(None, fa)
        DD.incremental_exact_dedup(
            docs.where(F.col("doc_id") >= mid), store
        ).where("keep").count()

    timings["pipeline_incremental_dedup"] = timed(
        _inc_dedup, "pipeline_incremental_dedup"
    )

    # end-of-sweep canary: the pre-JVM canary dates the host at start and
    # the mid-loop canary at the query-map midpoint, but the pipeline
    # headliners above run AFTER both — r11 observed a throttle window
    # opening exactly there (late documents-family numbers 2x their
    # steady state while both recorded canaries read fast). A third
    # sample brackets the whole sweep so a late window is self-evident
    # from the artifact.
    canary_end = _cpu_canary()
    spark_canary_end = _spark_canary(spark)

    query_tiers = QUERY_TIERS
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # the ">threshold => labeled or declared production shape" invariant,
    # re-derived every sweep and recorded in the artifact so it cannot
    # drift silently again (VERDICT r12 #5); the threshold is scaled by
    # this sweep's flagship-vs-reference ratio so equal-canary hosts with
    # 20-50% wall variance do not flag borderline rows (VERDICT r13 #2)
    slow_thr = slow_threshold_sec(timings.get("full_profile_lineitem"), sf_val)
    slow_unlabeled = derive_slow_unlabeled(timings, query_tiers, slow_thr)
    # contamination markers: cpu_canary_sec (measured BEFORE the JVM started;
    # 0.77-2.0 s observed for identical code — the host CPU-speed multiplier
    # for this sweep) and end-of-sweep loadavg (self-polluted by the 32-thread
    # session, but >12 implies external load on top)
    full = {
        "metric": "lineitem_full_profile_wall",
        "value": round(flagship, 3),
        "unit": "sec",
        "queries": timings,
        "flagship_attempts": attempts,
        "query_attempts": query_attempts,
        "query_tiers": query_tiers,
        "sf": sf_val,
        "host_load_1m": _loadavg(),
        "cpu_canary_sec": canary,
        "cpu_canary_mid_sec": canary_mid,
        "cpu_canary_end_sec": canary_end,
        "spark_canary_sec": spark_canary,
        "spark_canary_mid_sec": spark_canary_mid,
        "spark_canary_end_sec": spark_canary_end,
        "throttle": throttle_info,
        "production_shapes": PRODUCTION_SHAPES,
        "slow_threshold_sec": slow_thr,
        "slow_threshold_base_sec": SLOW_SEC,
        "slow_ref_flagship_sec": SLOW_REF_FLAGSHIP_SEC,
        "slow_unlabeled": slow_unlabeled,
    }
    # the full 60+-query map makes one very long line that the driver's tail
    # capture truncated in r4 ("parsed": null) — so the full record goes to a
    # FILE (+ an early stdout line for humans), and the LAST line printed is a
    # compact headline the driver's tail/parse always succeeds on
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_FULL.json"),
            "w",
        ) as fh:
            json.dump(full, fh, indent=1)
    except Exception:
        pass
    print(json.dumps(full))
    headline = {
        "metric": "lineitem_full_profile_wall",
        "value": round(flagship, 3),
        "unit": "sec",
        "queries": {
            k: timings[k]
            for k in (
                "full_profile_lineitem",
                "full_profile_wide100",
                "full_profile_events",
                "pipeline_minhash_dedup",
                "pipeline_ann_lsh",
                "pipeline_incremental_dedup",
            )
            if k in timings
        },
        "sf": sf_val,
        "flagship_attempts": attempts.get("full_profile_lineitem"),
        "host_load_1m": _loadavg(),
        "cpu_canary_sec": canary,
        "cpu_canary_mid_sec": canary_mid,
        "cpu_canary_end_sec": canary_end,
        "spark_canary_sec": spark_canary,
        "spark_canary_mid_sec": spark_canary_mid,
        "spark_canary_end_sec": spark_canary_end,
        "throttled": throttle_info["throttled"],
        "flagship_throttled_by_spread": any(
            throttle_info["flagship_throttled_by_spread"].values()
        ),
        "flagship_rerun": flagship_rerun,
        "slow_unlabeled": slow_unlabeled,
        "full_map": "BENCH_FULL.json",
    }
    print(json.dumps(headline))
    spark.stop()


if __name__ == "__main__":
    main()
