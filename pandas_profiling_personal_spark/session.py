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
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        # the profiler is read-mostly aggregation; ANSI off so bad cells degrade
        # to null instead of failing a 100 TB job half-way
        .config("spark.sql.ansi.enabled", "false")
        .getOrCreate()
    )
