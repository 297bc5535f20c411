#!/usr/bin/env python3
"""Isolated flagship + pipeline measurement with canaries (VERDICT r14 #1).

Times the six headline queries exactly as bench.py does (same warm-ups,
per-query blocks, min-of-N with spread-based extra attempts) and brackets
the set with canaries so the window itself is certified clean inside the
output. Standalone (no bench.py import) so it runs unchanged in an r13
worktree for same-host A/B. One JSON line.

REPO_ROOT env selects which checkout to measure (default /root/repo).
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.environ.get("REPO_ROOT", "/root/repo")
sys.path.insert(0, REPO)


def _loadavg() -> float:
    try:
        with open("/proc/loadavg") as fh:
            return float(fh.read().split()[0])
    except Exception:
        return -1.0


def _cpu_canary() -> float:
    t0 = time.time()
    s = 0
    for i in range(20_000_000):
        s += i
    return round(time.time() - t0, 2)


def _spark_canary(spark) -> float:
    t0 = time.time()
    spark.range(64_000_000).selectExpr(
        "count(if(id % 7 = 0, 1, null))"
    ).collect()
    return round(time.time() - t0, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = int(os.environ.get("FLAG_N", "3"))

    cpu0 = _cpu_canary()

    from pandas_profiling_personal_spark.session import get_session

    spark = get_session(app_name="flagship_isolate")
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from pandas_profiling_personal_spark import ProfileConfig, profile
    from pandas_profiling_personal_spark.benchmarks import wide100_frame
    from pandas_profiling_personal_spark.operators import dedup as DD
    from pandas_profiling_personal_spark.operators import similarity as SIM
    from pandas_profiling_personal_spark.sources.readers import read_parquet

    warm_dir = "/root/testdata/sf0.01"
    try:
        profile(read_parquet(spark, f"{warm_dir}/lineitem.parquet"))
    except Exception:
        pass

    sc0 = _spark_canary(spark)

    df = read_parquet(spark, f"{sf_dir}/lineitem.parquet")
    ev = read_parquet(spark, f"{sf_dir}/events.parquet")
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    emb = read_parquet(spark, f"{sf_dir}/embeddings.parquet")
    mid = docs.agg(F.expr("percentile(doc_id, 0.5)")).first()[0]

    def _inc_dedup() -> None:
        fa = DD.incremental_exact_dedup(docs.where(F.col("doc_id") < mid), None)
        store = DD.dedup_store_update(None, fa)
        DD.incremental_exact_dedup(
            docs.where(F.col("doc_id") >= mid), store
        ).where("keep").count()

    attempts: dict[str, list[float]] = {}

    def block(name: str, run, extra_warm=None) -> None:
        # bench.py flagship_wall: n back-to-back attempts + up to 2 extra
        # while spread > 2x
        if extra_warm is not None:
            try:
                extra_warm()
            except Exception:
                pass
        a = attempts.setdefault(name, [])
        for _ in range(n):
            t0 = time.time()
            run()
            a.append(round(time.time() - t0, 3))
        while max(a) > 2.0 * min(a) and len(a) < n + 2:
            t0 = time.time()
            run()
            a.append(round(time.time() - t0, 3))

    block("full_profile_lineitem",
          lambda: profile(df, ProfileConfig(exact=False)))
    wide = wide100_frame(df)
    block("full_profile_wide100",
          lambda: profile(wide, ProfileConfig(exact=False)),
          extra_warm=lambda: profile(
              wide100_frame(read_parquet(spark, f"{warm_dir}/lineitem.parquet")),
              ProfileConfig(exact=False)))
    block("full_profile_events",
          lambda: profile(ev, ProfileConfig(exact=False)))
    block("pipeline_minhash_dedup",
          lambda: DD.minhash_dedup(
              docs, "doc_id", "text", num_hashes=32, bands=8,
              hash_fn="xxhash64").count())
    block("pipeline_ann_lsh",
          lambda: SIM.ann_topk_lsh(
              emb, emb.where(F.col("vec_id") < 50), dim=64, k=10).count())
    block("pipeline_incremental_dedup", _inc_dedup)

    sc1 = _spark_canary(spark)
    cpu1 = _cpu_canary()

    out = {
        "repo": REPO,
        "queries": {k: min(v) for k, v in attempts.items()},
        "attempts": attempts,
        "cpu_canary": [cpu0, cpu1],
        "spark_canary": [sc0, sc1],
        "spark_canary_spread": round(max(sc0, sc1) / min(sc0, sc1), 2),
        "load_1m": _loadavg(),
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
