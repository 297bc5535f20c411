"""Streaming data-quality gate — the stream tier of operators/checks.py.

Completes the validation family's operating-mode matrix (batch suite /
incremental ``checks_of`` / CLI gate / THIS): the scalar constraint family is
natively streaming-expressible — every compliance ratio and metric bound is a
conditional aggregate, so the whole declared suite rides ONE watermarked
windowed aggregation, exactly the batch compilation grouped by event-time
window. Each closed window emits one row per check (append mode), so a
downstream sink can alert the moment a window's completeness drops or a bound
breaks — without ever buffering raw rows.

Honest scope: quantile bounds (TypedImperativeAggregate) and the
uniqueness / FK / FD families (group- or join-visibility over the full
history) are NOT windowed-streaming-expressible; they refuse by name. The
per-micro-batch alternative for those is ``foreachBatch`` + the batch
``check_suite`` (the asof_foreach_batch pattern in temporal_stream.py),
which sees exactly one batch of visibility — a documented, weaker contract.

The same plan runs on a batch frame (minus the watermark clock), which is
how the equivalence test pins stream == batch per window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pandas_profiling_personal_spark.operators.checks import (
    _SCALAR_KINDS,
    Check,
    _scalar_plan,
    _scalar_structs,
)

#: windowed-streaming-expressible kinds: scalar family minus the
#: percentile branch (TypedImperativeAggregate — not supported in a
#: watermarked streaming aggregation)
STREAM_KINDS = _SCALAR_KINDS - {"quantile_between"}


def checks_stream(
    df: DataFrame,
    checks: list[Check],
    ts_col: str,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Windowed check evaluation: one row per (event-time window, check).

    Output columns: ``window_start``, ``window_end`` + the batch suite's
    result schema (check_name/kind/column/metric/value/lower/upper/passed),
    with the batch pass rules and 4-decimal rounding — a window's row is
    directly comparable with ``check_suite`` run on that window's slice.
    """
    if not checks:
        raise ValueError("checks_stream: empty check list")
    names = [c.name for c in checks]
    dupes = {n for n in names if names.count(n) > 1}
    if dupes:
        raise ValueError(f"duplicate check names: {sorted(dupes)}")
    unsupported = [c.name for c in checks if c.kind not in STREAM_KINDS]
    if unsupported:
        raise ValueError(
            "checks_stream: not windowed-streaming-expressible (quantiles "
            "need a TypedImperativeAggregate; uniqueness/FK/FD need full-"
            "history visibility — use foreachBatch + check_suite for "
            f"per-batch gating): {unsupported}"
        )
    decl, pct, rows = _scalar_plan(checks, exact_quantiles=False)
    assert not pct  # quantile_between excluded by STREAM_KINDS
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    agg = df.groupBy(
        F.window(F.col(ts_col), window, slide or window).alias("window")
    ).agg(*decl)
    return agg.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        F.explode(F.array(*_scalar_structs(rows))).alias("r"),
    ).select("window_start", "window_end", "r.*")


def failed_checks_stream(result: DataFrame) -> DataFrame:
    """Alert projection: only the failing rows (the sink most gates want)."""
    return result.filter(~F.col("passed"))


def checks_foreach_batch(
    checks: list[Check],
    out_path: str,
    ref_paths: dict[str, str] | None = None,
):
    """``foreachBatch`` processor: the FULL batch suite per micro-batch.

    The per-batch tier for the kinds the windowed aggregation refuses —
    uniqueness / primary keys / quantiles / foreign keys / functional
    dependencies — with the honest contract stated: each batch is gated in
    ISOLATION (a key that repeats across two micro-batches is unique inside
    each; cross-history dedup is the signature-store operators' job, not a
    per-batch check). Reference frames for foreign keys load fresh from
    ``ref_paths`` (parquet) every batch, so a growing dimension is picked
    up; result rows land in ``out_path/batch=<id>`` with overwrite (a
    retried micro-batch replaces its own output — the asof_foreach_batch
    arrival contract). Wire it up::

        q = (stream.writeStream
             .foreachBatch(checks_foreach_batch(suite, out,
                                                {"customer": cust_path}))
             .option("checkpointLocation", ckpt).start())
    """
    from pandas_profiling_personal_spark.operators.checks import check_suite

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        refs = {
            name: spark.read.parquet(path)
            for name, path in (ref_paths or {}).items()
        }
        (
            check_suite(batch_df, checks, refs=refs)
            .write.mode("overwrite")
            .parquet(f"{out_path}/batch={batch_id}")
        )

    return process
