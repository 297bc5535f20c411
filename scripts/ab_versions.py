#!/usr/bin/env python3
"""Interleaved cross-version flagship A/B (VERDICT r14 #1).

The container's parallel throughput swings 2-4x in multi-minute windows,
so sweep-vs-sweep walls cannot settle the r13-vs-r14 flagship direction.
This driver alternates fresh processes of each version (A, B, A, B, ...),
each process profiling lineitem and wide100 ONCE after the standard
sf0.01 warm-up and printing walls + per-pass durations; paired rounds
land in adjacent windows, so per-round deltas (and the min-of-N across
rounds) compare like-for-like.

Usage: python scripts/ab_versions.py /tmp/r13tree /root/repo [rounds]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["REPO_ROOT"])
from pandas_profiling_personal_spark.session import get_session
spark = get_session(app_name="ab_versions")
spark.sparkContext.setLogLevel("ERROR")
from pandas_profiling_personal_spark import ProfileConfig, profile
from pandas_profiling_personal_spark.benchmarks import wide100_frame
from pandas_profiling_personal_spark.sources.readers import read_parquet
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
warm = "/root/testdata/sf0.01"
out = {}
def spark_canary():
    t0 = time.time()
    spark.range(64_000_000).selectExpr("count(if(id % 7 = 0, 1, null))").collect()
    return round(time.time() - t0, 3)
for table, mk in (
    ("lineitem", lambda d: read_parquet(spark, f"{d}/lineitem.parquet")),
    ("wide100", lambda d: wide100_frame(read_parquet(spark, f"{d}/lineitem.parquet"))),
):
    try:
        profile(mk(warm), ProfileConfig(exact=False))
    except Exception:
        pass
    frame = mk(sf_dir)
    t0 = time.time()
    res = profile(frame, ProfileConfig(exact=False))
    wall = round(time.time() - t0, 3)
    an = res.analysis if hasattr(res, "analysis") else {}
    out[table] = {"wall": wall,
                  "passes": dict(an.get("pass_durations_sec", {}))}
out["spark_canary"] = spark_canary()
print("ABRESULT " + json.dumps(out))
spark.stop()
"""


def main() -> None:
    a, b = sys.argv[1], sys.argv[2]
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    results: dict[str, list] = {a: [], b: []}
    for r in range(rounds):
        for repo in (a, b):
            env = dict(os.environ, REPO_ROOT=repo)
            t0 = time.time()
            p = subprocess.run(
                [sys.executable, "-c", CHILD], env=env,
                capture_output=True, text=True,
            )
            rec = None
            for line in p.stdout.splitlines():
                if line.startswith("ABRESULT "):
                    rec = json.loads(line[len("ABRESULT "):])
            if rec is None:
                rec = {"error": p.stderr[-500:]}
            rec["proc_wall"] = round(time.time() - t0, 1)
            rec["round"] = r
            results[repo].append(rec)
            print(json.dumps({"repo": repo, **rec}), flush=True)
    # summary: per-table min wall per version
    summary = {}
    for repo, recs in results.items():
        summary[repo] = {
            t: min(
                (x[t]["wall"] for x in recs if t in x), default=None
            )
            for t in ("lineitem", "wide100")
        }
    print("SUMMARY " + json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
