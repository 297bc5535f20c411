"""Streaming profiling — windowed per-column statistics over a stream.

The reference is strictly batch (SURVEY.md §2.12); this is the Structured
Streaming extension: the same scalar statistics the batch engine computes in
pass 1, maintained per event-time window with watermarked late-data handling.
Approximate estimators only (approx_count_distinct; no exact percentiles in
update mode) — the correct trade-off for unbounded data.

Usage shape::

    q = (profile_stream(stream_df, ts_col="ts", window="5 minutes")
         .writeStream.outputMode("append").format("memory")
         .queryName("profile").start())

Each output row = (window, column, count, n_missing, approx_distinct, mean,
std, min, max, n_zeros) for one numeric/boolean/string column — the melt
pattern from the batch engine applied streaming-side so ONE streaming
aggregation covers every column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pandas_profiling_personal_spark.functions import stats as S
from pandas_profiling_personal_spark.types import VariableType as VT, variable_types


def profile_stream(
    df: DataFrame,
    ts_col: str,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
    columns: list[str] | None = None,
) -> DataFrame:
    """Windowed profiling aggregation over a (possibly streaming) DataFrame.

    Works identically on a batch DataFrame (for tests and backfills — the same
    plan, minus the watermark clock). Numeric stats are computed on a
    ``try_cast`` of the melted value so one schema serves all columns."""
    types = variable_types(df)
    columns = columns or [
        c
        for c, vt in types.items()
        if c != ts_col and vt in (VT.NUMERIC, VT.BOOLEAN, VT.CATEGORICAL)
    ]
    is_streaming = df.isStreaming
    if is_streaming:
        df = df.withWatermark(ts_col, watermark)

    structs = []
    for c in columns:
        col = S.col(c)
        num = (
            col.cast("double")
            if types[c] in (VT.NUMERIC, VT.BOOLEAN)
            else F.lit(None).cast("double")
        )
        structs.append(
            F.struct(
                F.lit(c).alias("column"),
                col.cast("string").alias("value"),
                num.alias("num"),
            )
        )
    melted = df.select(
        S.col(ts_col).alias("__ts"), F.explode(F.array(*structs)).alias("kv")
    ).select("__ts", "kv.column", "kv.value", "kv.num")

    win = (
        F.window("__ts", window, slide) if slide else F.window("__ts", window)
    )
    return melted.groupBy(win.alias("window"), F.col("column")).agg(
        F.count(F.lit(1)).alias("n"),
        F.count("value").alias("count"),
        (F.count(F.lit(1)) - F.count("value")).alias("n_missing"),
        F.approx_count_distinct("value").alias("approx_distinct"),
        F.avg("num").alias("mean"),
        F.stddev_samp("num").alias("std"),
        F.min("num").alias("min"),
        F.max("num").alias("max"),
        F.coalesce(
            F.sum(F.when(F.col("num") == 0, 1).otherwise(0)), F.lit(0)
        ).alias("n_zeros"),
    )


def run_stream_to_memory(
    stream_df: DataFrame,
    ts_col: str,
    query_name: str = "stream_profile",
    window: str = "5 minutes",
) -> DataFrame:
    """Drive a streaming profile to completion over the currently-available data
    (test/backfill helper): memory sink + processAllAvailable."""
    agg = profile_stream(stream_df, ts_col, window=window)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return stream_df.sparkSession.table(query_name)
