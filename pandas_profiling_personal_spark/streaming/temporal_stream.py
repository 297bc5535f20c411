"""Streaming temporal alignment: the stream tiers of
``operators/temporal.py`` (as-of join, interval range join).

Two shapes, matching Structured Streaming's capabilities honestly:

* ``range_join_stream`` — STATELESS stream-static equi-join: the static
  window table pre-explodes over buckets (the batch operator's own
  geometry), each streaming point joins on its single bucket key with the
  exact bound predicate as the join residual. Append-mode, zero state,
  works with plain watermarks; exactly the batch pair semantics because
  a (point, interval) pair can only meet in the point's own bucket.

* ``asof_foreach_batch`` — the as-of join needs a per-key ORDER over the
  union of events and snapshots, which no built-in watermarked stateful
  operator expresses (same analysis as within-stream near-dup,
  ``dedup_stream.py``). The honest tier is foreachBatch: every
  micro-batch runs the BATCH ``asof_join`` against the snapshot store
  read fresh per batch (a growing store is picked up), writing matched
  rows to ``batch=<id>`` subdirectories with overwrite — a retried
  micro-batch replaces its own output (exactly-once under foreachBatch's
  at-least-once contract, the ``minhash_dedup_foreach_batch`` pattern).
  Cross-EVENT ordering never matters to as-of (each event row matches
  independently against history), so micro-batch boundaries cannot
  change results as long as the store only carries snapshots with
  ``ts <= watermark`` of the events processed — the caller owns that
  contract and it is documented here: a snapshot arriving AFTER an event
  batch was processed will not retroactively re-match those events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pandas_profiling_personal_spark.operators.temporal import (
    _as_num,
    _is_ts,
    asof_join,
)


def range_join_stream(
    stream: DataFrame,
    windows: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    by: list[str] | None = None,
    bucket_width: float | None = None,
    closed: str = "[)",
) -> DataFrame:
    """Land streaming points inside STATIC intervals — append-mode,
    stateless. Same bucketization as the batch ``range_join`` (the static
    side explodes once per bucket it covers; the stream side derives its
    single bucket key per row), so the pair set equals the batch operator
    on the same rows (pytest-gated)."""
    if not stream.isStreaming:
        raise ValueError(
            "range_join_stream: left side must be a streaming DataFrame "
            "— use operators.temporal.range_join for batch frames"
        )
    if windows.isStreaming:
        raise ValueError(
            "range_join_stream: the interval side must be STATIC "
            "(stream-stream interval joins need event-time range "
            "conditions on both sides — express those directly with "
            "Spark's stream-stream join + watermarks)"
        )
    if closed not in ("[)", "[]", "()", "(]"):
        raise ValueError("closed must be one of [) [] () (]")
    by = list(by or [])
    if "__bucket" in stream.columns or "__bucket" in windows.columns:
        raise ValueError("the column name __bucket is reserved")

    lo = _as_num(windows, lo_col)
    hi = _as_num(windows, hi_col)
    if bucket_width is None:
        row = windows.agg(
            F.max(hi - lo).alias("w"), F.count(F.lit(1)).alias("n")
        ).collect()[0]
        bucket_width = (
            int(row["w"]) if row["n"] and row["w"] and row["w"] > 0 else 1
        )
    width = F.lit(bucket_width)
    rexp = windows.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(lo / width).cast("long"),
                F.floor(hi / width).cast("long"),
            )
        ),
    )
    p = _as_num(stream, point_col)
    lpt = stream.withColumn("__bucket", F.floor(p / width).cast("long"))

    def _num(dfref, base_df, col):
        c = dfref[col]
        if _is_ts(base_df, col):
            return F.unix_micros(c.cast("timestamp"))
        return c

    pj = _num(lpt, stream, point_col)
    loj = _num(rexp, windows, lo_col)
    hij = _num(rexp, windows, hi_col)
    lo_ok = pj >= loj if closed[0] == "[" else pj > loj
    hi_ok = pj <= hij if closed[1] == "]" else pj < hij
    cond = [lpt["__bucket"] == rexp["__bucket"]] + [
        lpt[c] == rexp[c] for c in by
    ]
    joined = lpt.join(rexp, cond, "inner").where(lo_ok & hi_ok)
    rpairs = [
        (c, c + "_right" if c in stream.columns else c)
        for c in windows.columns
        if c not in by
    ]
    return joined.select(
        *[lpt[c] for c in stream.columns],
        *[rexp[c].alias(name) for c, name in rpairs],
    )


def asof_foreach_batch(
    store_path: str,
    out_path: str,
    on: str,
    by: list[str] | str,
    value_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance_s: float | None = None,
    store_schema: str | None = None,
):
    """``foreachBatch`` processor: per micro-batch, the BATCH
    :func:`asof_join` against the snapshot store at ``store_path``
    (parquet, read fresh each batch so a growing store is picked up);
    matched rows land in ``out_path/batch=<id>`` with overwrite (retried
    micro-batches replace their output). A missing store — first batch,
    nothing persisted yet — runs the SAME join against an empty frame
    built from ``store_schema`` (a DDL string), so the output schema is
    stable from batch zero; missing store with no schema fails loudly
    naming the fix rather than guessing column types. Wire it up::

        q = (events.writeStream
             .foreachBatch(asof_foreach_batch(
                 store, out, "ts", ["user_id"],
                 store_schema="user_id bigint, ts timestamp, state double"))
             .option("checkpointLocation", ckpt).start())
    """

    def process(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.errors import AnalysisException

        spark = batch_df.sparkSession
        try:
            store = spark.read.parquet(store_path)
        except AnalysisException as exc:
            if "PATH_NOT_FOUND" not in str(exc):
                raise
            if store_schema is None:
                raise ValueError(
                    f"asof_foreach_batch: snapshot store {store_path} does "
                    "not exist yet and no store_schema was given — pass "
                    "store_schema='<DDL>' so the first micro-batch can "
                    "emit the correct (all-null-match) output schema"
                ) from exc
            store = spark.createDataFrame([], store_schema)
        out = asof_join(
            batch_df,
            store,
            on=on,
            by=by,
            value_cols=value_cols,
            direction=direction,
            tolerance_s=tolerance_s,
        )
        out.write.mode("overwrite").parquet(f"{out_path}/batch={batch_id}")

    return process
