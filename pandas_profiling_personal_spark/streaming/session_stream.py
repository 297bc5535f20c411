"""Streaming sessionization — a CUSTOM stateful operator via
``applyInPandasWithState`` (the one capability Structured Streaming's
built-in operators don't cover: gap-based sessions need per-key state that
closes on the NEXT event or on watermark timeout, not a fixed window).

Batch twin: ``operators.sessions.sessionize`` (lag + cumulative sum over a
per-user window). Same session rule — a session extends while the gap to
the previous event is ≤ ``gap_minutes``, otherwise it closes and a new one
starts — so a batch backfill and the stream agree on every CLOSED session
(equivalence-tested).

Shape at scale: state is ONE (session_start, last_ts, n_events) triple per
ACTIVE user — not per event — and event-time timeout reaps users whose
sessions have expired past the watermark, so the state store is bounded by
concurrent active users regardless of stream volume. The grouping shuffles
once on the user key, exactly like the batch window's partitionBy.

Semantics notes (documented, not hidden):
* events are processed in event-time order WITHIN each micro-batch (the
  kernel sorts its input); an event that arrives in a LATER micro-batch
  than a successor event of the same user can split a session that a batch
  run would merge — the standard streaming sessionization caveat, bounded
  by the watermark horizon.
* closed sessions emit append-mode rows ``(user_key, session_start,
  session_end, n_events)``; an open session emits when the watermark
  passes ``last_ts + gap`` (event-time timeout) — flushing is eventual,
  correctness of the rows is immediate.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_key", T.StringType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_start", T.LongType()),  # epoch micros
        T.StructField("last_ts", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def _fold_sessions(
    ts_us: list[int],
    state: tuple[int, int, int] | None,
    gap_us: int,
) -> tuple[list[tuple[int, int, int]], tuple[int, int, int] | None]:
    """Fold event-time-sorted timestamps through (start, last, n) state.
    Returns (closed sessions, open state) — the ONE session rule both the
    batch and streaming tiers share."""
    closed: list[tuple[int, int, int]] = []
    start_us, last_us, n = state if state is not None else (None, None, 0)
    for t in ts_us:
        if last_us is not None and t - last_us <= gap_us:
            last_us, n = t, n + 1
        else:
            if last_us is not None:
                closed.append((start_us, last_us, n))
            start_us, last_us, n = t, t, 1
    return closed, ((start_us, last_us, n) if last_us is not None else None)


def _sessions_frame(user: str, sessions: list[tuple[int, int, int]]):
    return pd.DataFrame(
        {
            "user_key": [user] * len(sessions),
            "session_start": [
                pd.Timestamp(s, unit="us") for s, _, _ in sessions
            ],
            "session_end": [
                pd.Timestamp(e, unit="us") for _, e, _ in sessions
            ],
            "n_events": [n for _, _, n in sessions],
        }
    )


def _ts_micros(pdf: pd.DataFrame) -> list[int]:
    # drop NaT: a null timestamp would otherwise convert to int64-min (a
    # year-1677 garbage session) — null-ts events carry no session signal
    col = pd.to_datetime(pdf["__ts"]).dropna()
    return [int(x) // 1000 for x in col.astype("int64")]


def _utc_timeout_ms(last_us: int, tz: str, gap_ms: int) -> int:
    """Event-time timeout for an open session, in UTC epoch ms.

    Arrow hands the kernel timestamps as NAIVE values localized to the
    Spark session timezone, while ``setTimeoutTimestamp`` compares against
    the UTC-epoch watermark — feeding session-local micros in directly
    shifts the timeout by the UTC offset (west-of-UTC zones produce
    timeouts already below the watermark, which Spark rejects, killing the
    query). DST edges resolve deterministically (ambiguous → first
    occurrence, nonexistent → shifted forward)."""
    ts = pd.Timestamp(last_us, unit="us").tz_localize(
        tz, ambiguous=True, nonexistent="shift_forward"
    )
    return ts.value // 1_000_000 + gap_ms


def sessionize_stream(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_minutes: int = 30,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Closed sessions per user from an unbounded event stream:
    ``(user_key, session_start, session_end, n_events)`` in append mode.

    On a BATCH DataFrame the same session fold runs through a stateless
    ``applyInPandas`` per user (Spark rejects ``applyInPandasWithState``
    outside streaming) — closed sessions match the streaming tier and
    ``operators.sessions.sessionize`` exactly; each user's final session is
    open-by-definition (no watermark clock) and is not emitted, same as
    the stream before its timeout fires.
    """
    gap_us = int(gap_minutes) * 60 * 1_000_000
    # captured at plan build for the UTC timeout conversion (the kernel
    # has no session handle)
    session_tz = df.sparkSession.conf.get(
        "spark.sql.session.timeZone", "UTC"
    )

    src = df.select(
        df[user_col].cast("string").alias("__user"),
        df[ts_col].cast("timestamp").alias("__ts"),
    ).where(F.col("__ts").isNotNull())

    if not df.isStreaming:

        def batch_fn(pdf: pd.DataFrame) -> pd.DataFrame:
            closed, _open = _fold_sessions(
                sorted(_ts_micros(pdf)), None, gap_us
            )
            return _sessions_frame(str(pdf["__user"].iloc[0]), closed)

        return src.groupBy("__user").applyInPandas(
            batch_fn, SESSION_SCHEMA
        )

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user = str(key[0])
        if state.hasTimedOut:
            # watermark passed last_ts + gap: the open session is closed
            start_us, last_us, n = state.get
            state.remove()
            yield _sessions_frame(user, [(start_us, last_us, n)])
            return

        # fold this micro-batch's events (event-time order) through state
        ts_us: list[int] = []
        for pdf in pdfs:
            ts_us.extend(_ts_micros(pdf))
        closed, open_state = _fold_sessions(
            sorted(ts_us), state.get if state.exists else None, gap_us
        )
        if open_state is not None:
            state.update(open_state)
            # event-time timeout: fire when the watermark passes the gap
            # horizon of the open session (UTC ms — see _utc_timeout_ms)
            state.setTimeoutTimestamp(
                _utc_timeout_ms(open_state[1], session_tz, gap_us // 1000)
            )
        if closed:
            yield _sessions_frame(user, closed)

    return (
        src.withWatermark("__ts", watermark)
        .groupBy("__user")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
