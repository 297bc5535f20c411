"""Shared benchmark workload builders.

The flagship workloads bench.py times and scripts/ab_measure.py adjudicates
MUST stay byte-identical — a drifted copy silently adjudicates regressions
against a stale workload (review r7) — so the one definition lives here and
both harnesses import it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def wide100_frame(lineitem: DataFrame) -> DataFrame:
    """The 100-column wide-table flagship: 75 derived numeric + 25
    categorical expressions over a deterministic 1/8 slice of lineitem
    (the reference's own harness sweeps to 50 columns —
    reference: tests/performance/timings.py:75-87; this doubles it)."""
    from pandas_profiling_personal_spark.operators.sampling import (
        deterministic_sample,
    )

    wcols = [
        (
            (F.col("l_extendedprice") * (i + 1) + F.col("l_quantity"))
            % F.lit(1000 + i)
        ).alias(f"num_{i}")
        for i in range(75)
    ] + [
        F.concat(F.col("l_returnflag"), F.lit(str(i % 7))).alias(f"cat_{i}")
        for i in range(25)
    ]
    return deterministic_sample(lineitem, "l_orderkey", mod=8, bucket=0).select(
        *wcols
    )
