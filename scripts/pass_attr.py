#!/usr/bin/env python3
"""Per-pass attribution of one flagship profile, min-of-N, for REPO_ROOT.

Prints one JSON line: per-attempt walls + per-pass min across attempts.
TABLE env picks lineitem (default) / wide100 / events.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.environ.get("REPO_ROOT", "/root/repo")
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = int(os.environ.get("FLAG_N", "5"))
    table = os.environ.get("TABLE", "lineitem")

    from pandas_profiling_personal_spark.session import get_session

    spark = get_session(app_name="pass_attr")
    spark.sparkContext.setLogLevel("ERROR")

    from pandas_profiling_personal_spark import ProfileConfig, profile
    from pandas_profiling_personal_spark.benchmarks import wide100_frame
    from pandas_profiling_personal_spark.sources.readers import read_parquet

    warm_dir = "/root/testdata/sf0.01"

    if table == "wide100":
        frame = wide100_frame(read_parquet(spark, f"{sf_dir}/lineitem.parquet"))
        warm = wide100_frame(read_parquet(spark, f"{warm_dir}/lineitem.parquet"))
    elif table == "events":
        frame = read_parquet(spark, f"{sf_dir}/events.parquet")
        warm = read_parquet(spark, f"{warm_dir}/events.parquet")
    else:
        frame = read_parquet(spark, f"{sf_dir}/lineitem.parquet")
        warm = read_parquet(spark, f"{warm_dir}/lineitem.parquet")

    try:
        profile(warm, ProfileConfig(exact=False))
    except Exception:
        pass

    walls = []
    passes_all = []
    for _ in range(n):
        t0 = time.time()
        res = profile(frame, ProfileConfig(exact=False))
        walls.append(round(time.time() - t0, 3))
        an = res.analysis if hasattr(res, "analysis") else res.get("analysis", {})
        pd_ = dict(an.get("pass_durations_sec", {}))
        passes_all.append({k: round(float(v), 3) for k, v in pd_.items()})

    keys = sorted({k for p in passes_all for k in p})
    pass_min = {k: min(p.get(k, float("inf")) for p in passes_all) for k in keys}
    out = {
        "repo": REPO,
        "table": table,
        "walls": walls,
        "wall_min": min(walls),
        "pass_min": pass_min,
        "pass_attempts": passes_all,
        "load_1m": open("/proc/loadavg").read().split()[0],
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
