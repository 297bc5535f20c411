"""Physical-parallelism guard for compute-heavy narrow operators.

FileSourceScan splits input by BYTES (``spark.sql.files.maxPartitionBytes``),
which undersizes parallelism when per-row compute dominates row size: a 600 KB
documents file is one split, so tokenize/shingle/hash higher-order functions —
interpreted per element, the known CPU hot spot (PERFORMANCE.md §5) — run on a
single core while the rest of the cluster idles. Measured on local[32] at
sf0.1: the shingle stage alone drops ~9 s → sub-second once spread.

``parallelize_narrow`` round-robin-repartitions ONLY when the scan produced
fewer partitions than the session's default parallelism. At real scale (100 TB
⇒ input splits ≫ cores) the guard is a no-op and no extra exchange appears in
the plan; at small-file scale it trades one cheap shuffle of raw rows for
full-width execution of the expensive generate/aggregate above it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def parallelize_narrow(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` up to ``min_partitions`` (default: the session's
    ``sparkContext.defaultParallelism``) iff it currently has fewer partitions.
    Use ahead of per-row-expensive narrow work (HOF shingling, hashing,
    vector math); never changes results, only physical parallelism."""
    try:
        spark = df.sparkSession
        target = min_partitions or spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < target:
            return df.repartition(target)
    except Exception:
        # Connect-style sessions without an SC, or un-plannable inputs: leave
        # the physical shape to the engine.
        pass
    return df
