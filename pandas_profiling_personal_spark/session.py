"""SparkSession helper with scale-sane defaults for the profiling workload."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_session(
    app_name: str = "pandas_profiling_personal_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus
    # local mode = single JVM: driver memory IS executor memory. The 1g default
    # OOMs on wide aggregations; size generously (only applies if this call
    # actually creates the JVM).
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g")
    return (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.driver.memory", driver_mem)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # let the planner pick shuffled-hash join when its size conditions
        # hold (guide baseline; r14 interleaved A/B at sf0.1: join_fanout
        # -22%, dedup_keep_list -20%, corpus_funnel -17%, incremental
        # minhash -13%, semantic_dedup -6%, no regressions). Still
        # size-GATED per partition by the planner — sort-merge remains the
        # fallback wherever the build side estimate is large, and every
        # equi-join in this engine carries bounded key-count/distinct-value
        # tables, not raw rows. SPARK_GRAFT_PREFER_SMJ=1 restores the
        # Spark default for pathological inputs.
        .config(
            "spark.sql.join.preferSortMergeJoin",
            "true" if os.environ.get("SPARK_GRAFT_PREFER_SMJ") else "false",
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        # the profiler is read-mostly aggregation; ANSI off so bad cells degrade
        # to null instead of failing a 100 TB job half-way
        .config("spark.sql.ansi.enabled", "false")
        .getOrCreate()
    )
