#!/usr/bin/env python3
"""Interleaved re-measurement of the four r2->r3 bench regressions (VERDICT r3 #1).

Runs the four suspect oracle queries (plus two stable control queries) at sf0.1
repeatedly in a rotated order, after the standard sf0.01 warmup, and prints one
JSON line per run so the steady-state distribution can be compared against the
single-shot numbers recorded in BENCH_r02/BENCH_r03.

Hypothesis under test (VERDICT + PERFORMANCE.md): interpreted-HOF / Arrow paths
need up to two full-scale executions to JIT, so a single cold measurement in
bench.py's sequential sweep can read 2-4x slow.  If the medians here sit at the
r2 level, the regressions were measurement artifacts; if they sit at the r3
level, something real changed.
"""

from __future__ import annotations

import json
import os
import sys
import time

SUSPECTS = [
    "simhash_documents",
    "cosine_topk_embeddings",
    "embedding_near_dup_embeddings",
    "media_metadata_documents",
]
CONTROLS = ["url_parts_events", "mad_lineitem"]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(os.environ.get("AB_ROUNDS", "7"))

    sys.path.insert(0, "/root/repo")
    from pandas_profiling_personal_spark.session import get_session

    spark = get_session(app_name="ab_measure")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    qs = dict(E.queries())

    # the three bench flagships as first-class A/B entries (VERDICT r6 #3:
    # they are the headline numbers, so regression adjudication must be able
    # to rotate them like any oracle query) — same configurations bench.py
    # times, expressed as (spark, sf_dir) callables
    from pandas_profiling_personal_spark import ProfileConfig, profile
    from pandas_profiling_personal_spark.benchmarks import wide100_frame
    from pandas_profiling_personal_spark.sources.readers import read_parquet

    def _fp_lineitem(spark, d):
        profile(read_parquet(spark, f"{d}/lineitem.parquet"),
                ProfileConfig(exact=False))
        return spark.range(0)

    def _fp_events(spark, d):
        profile(read_parquet(spark, f"{d}/events.parquet"),
                ProfileConfig(exact=False))
        return spark.range(0)

    def _fp_wide100(spark, d):
        # the SHARED builder (benchmarks.py) — bench.py times the identical
        # frame, so adjudication can never drift from the headline workload
        profile(
            wide100_frame(read_parquet(spark, f"{d}/lineitem.parquet")),
            ProfileConfig(exact=False),
        )
        return spark.range(0)

    qs["full_profile_lineitem"] = _fp_lineitem
    qs["full_profile_events"] = _fp_events
    qs["full_profile_wide100"] = _fp_wide100

    # AB_QUERIES=name1,name2 overrides the suspect set — any queries() key
    # or flagship name works, so future bench-regression attribution needs
    # no code edit
    override = os.environ.get("AB_QUERIES")
    names = (
        ([n.strip() for n in override.split(",") if n.strip()] + CONTROLS)
        if override
        else SUSPECTS + CONTROLS
    )

    # same warmup as bench.py: sf0.01 pass over every query
    warm_dir = "/root/testdata/sf0.01"
    for n in names:
        try:
            qs[n](spark, warm_dir).collect()
        except Exception as exc:  # pragma: no cover
            print(json.dumps({"warmup_error": n, "err": str(exc)}), flush=True)

    results: dict[str, list[float]] = {n: [] for n in names}
    for r in range(rounds):
        # rotate the order each round so position effects average out
        order = names[r % len(names):] + names[: r % len(names)]
        for n in order:
            t0 = time.time()
            qs[n](spark, sf_dir).collect()
            dt = round(time.time() - t0, 3)
            results[n].append(dt)
            with open("/proc/loadavg") as fh:
                load = float(fh.read().split()[0])
            print(
                json.dumps(
                    {"round": r, "query": n, "sec": dt, "host_load_1m": load}
                ),
                flush=True,
            )

    summary = {
        n: {
            "runs": v,
            "min": min(v),
            "median": sorted(v)[len(v) // 2],
            "max": max(v),
        }
        for n, v in results.items()
    }
    print(json.dumps({"summary": summary}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
