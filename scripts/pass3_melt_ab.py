#!/usr/bin/env python3
"""A/B the pass-3 histogram melt key shape (VERDICT r14 #10).

Variants over the SAME persisted wide100 frame (sf0.1), interleaved
min-of-N, noop-equivalent collect of the tiny aggregate:
  struct_str - explode(array(struct(name:string, bucket:int))) +
               groupBy(column, bucket)            (current shape)
  posexp_int - posexplode(array(bucket ints)) + groupBy(pos, bucket)
               (column id = array position; narrower group key, no
               per-row string, mapping back driver-side)
Prints one JSON line with attempts and min/median per variant.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = int(os.environ.get("AB_N", "5"))

    from pandas_profiling_personal_spark.session import get_session

    spark = get_session(app_name="pass3_melt_ab")
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from pandas_profiling_personal_spark.benchmarks import wide100_frame
    from pandas_profiling_personal_spark.functions import stats as S
    from pandas_profiling_personal_spark.sources.readers import read_parquet
    from pandas_profiling_personal_spark.types import (
        VariableType as VT,
        variable_types,
    )

    df = wide100_frame(read_parquet(spark, f"{sf_dir}/lineitem.parquet"))
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    df.count()

    types = variable_types(df)
    num_cols = [c for c, vt in types.items() if vt is VT.NUMERIC]
    # representative bin specs (pass 1 would supply real ones)
    specs = {c: (50, 0.0, 1100.0) for c in num_cols}

    structs, buckets = [], []
    for name, (bins, lo, hi) in specs.items():
        c = S.col(name)
        b = S.bucket_index(c.cast("double"), F.lit(lo), F.lit(hi), bins)
        structs.append(
            F.struct(
                F.lit(name).alias("column"),
                F.when(c.isNotNull(), b).alias("bucket"),
            )
        )
        buckets.append(F.when(c.isNotNull(), b))

    def struct_str():
        (
            df.select(F.explode(F.array(*structs)).alias("kv"))
            .select("kv.column", "kv.bucket")
            .where(F.col("bucket").isNotNull())
            .groupBy("column", "bucket")
            .agg(F.count(F.lit(1)).alias("count"))
            .collect()
        )

    def posexp_int():
        (
            df.select(
                F.posexplode(F.array(*buckets)).alias("cid", "bucket")
            )
            .where(F.col("bucket").isNotNull())
            .groupBy("cid", "bucket")
            .agg(F.count(F.lit(1)).alias("count"))
            .collect()
        )

    variants = {"struct_str": struct_str, "posexp_int": posexp_int}
    for fn in variants.values():
        fn()
    att: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(n):
        for name, fn in variants.items():
            t0 = time.time()
            fn()
            att[name].append(round(time.time() - t0, 3))
    print(json.dumps({
        "n_cols": len(specs),
        "attempts": att,
        "min": {k: min(v) for k, v in att.items()},
        "median": {k: sorted(v)[len(v) // 2] for k, v in att.items()},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
