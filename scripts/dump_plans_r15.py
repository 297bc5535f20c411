#!/usr/bin/env python3
"""Dump .explain('formatted') for declared queries into plans/r15/.

Usage: python scripts/dump_plans_r15.py [suffix] [only_prefix...]

Writes plans/r15/<query>_<suffix>.txt (suffix defaults to 'before').
Building a query may itself run bounded Spark jobs (some oracle tiers
compute exact edges at build time); the explain itself only plans.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans", "r15")
    os.makedirs(out_dir, exist_ok=True)

    from pandas_profiling_personal_spark.session import get_session

    spark = get_session(app_name="dump_plans_r15")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    for name, fn in E.queries().items():
        if only and not any(name.startswith(p) for p in only):
            continue
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        import contextlib
        import io

        buf = io.StringIO()
        try:
            df = fn(spark, sf_dir)
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as exc:  # record the failure, keep sweeping
            plan = buf.getvalue() + f"\nEXPLAIN FAILED: {exc}"
        with open(path, "w") as fh:
            fh.write(plan)
        print(name, "->", path)
    spark.stop()


if __name__ == "__main__":
    main()
