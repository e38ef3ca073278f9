"""Custom stateful streaming operators via applyInPandasWithState.

The reference's trigger worker keeps per-subscription offset/retry
state; beyond that surface, a training-data ingest stream wants
per-KEY evolving state (running per-user counters, session windows,
rate trackers). Structured Streaming's arbitrary-state API is the
Spark-native mechanism: state lives in the checkpointed state store
(RocksDB/HDFS-backed at scale, partitioned by key — no driver
involvement), and the operator is an Arrow-batched pandas function.

``running_user_stats`` is the canonical shape: cumulative (count,
sum) per user across micro-batches, emitting the updated totals for
every user seen in the batch. Restart-safe: state restores from the
checkpoint exactly like the committed offsets.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = "user_id long, n_events long, total_value double"
_STATE_SCHEMA = "n long, total double"


def _update_user_stats(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        [{"user_id": key[0], "n_events": n, "total_value": total}]
    )


def running_user_stats(events_stream: DataFrame) -> DataFrame:
    """Per-user cumulative (event count, value sum) over a STREAMING
    events DataFrame — one row per (user, micro-batch that touched
    the user), totals monotone across batches. State is per-key in
    the checkpointed store; parallelism is #users, shuffled once on
    the grouping key per micro-batch."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update_user_stats,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# session windows with event-time timeout
# ---------------------------------------------------------------------------

_SESSION_OUT = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, closed_by string"
)
_SESSION_STATE = "start_us long, last_us long, n long"

_US = 1_000_000


def _make_session_fn(gap_s: int):
    gap_us = gap_s * _US

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        def row(start_us: int, last_us: int, n: int, why: str) -> dict:
            return {
                "user_id": key[0],
                "session_start": pd.Timestamp(start_us, unit="us"),
                "session_end": pd.Timestamp(last_us, unit="us"),
                "n_events": n,
                "closed_by": why,
            }

        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield pd.DataFrame([row(start_us, last_us, n, "timeout")])
            return

        ts = sorted(
            int(t.value // 1000)  # pandas ns -> us
            for pdf in pdfs
            for t in pd.to_datetime(pdf["ts"])
            if pd.notna(t)  # a null ts must not poison the session
        )
        if not ts and not state.exists:
            return
        # gap-split the batch's sorted events into segments, then
        # merge the STORED open session in by interval distance — so
        # an out-of-order straggler more than a gap BEFORE the stored
        # session start forms its own (already-over) session instead
        # of being absorbed into a window that by gap semantics must
        # be two sessions
        segments: list[list[int]] = []  # [start, last, n]
        for t in ts:
            if segments and t - segments[-1][1] <= gap_us:
                segments[-1][1] = t
                segments[-1][2] += 1
            else:
                segments.append([t, t, 1])
        if state.exists:
            segments.append(list(state.get))
            segments.sort(key=lambda s: s[0])
            remerged, acc = [], None
            for seg in segments:
                if acc is not None and seg[0] - acc[1] <= gap_us:
                    acc[1] = max(acc[1], seg[1])
                    acc[2] += seg[2]
                else:
                    if acc is not None:
                        remerged.append(acc)
                    acc = list(seg)
            remerged.append(acc)
            segments = remerged
        closed = [
            row(s, l, n, "gap") for s, l, n in segments[:-1]
        ]  # every non-final segment is over (a later event > gap away)
        start_us, last_us, n = segments[-1]
        wm_us = state.getCurrentWatermarkMs() * 1000
        if wm_us > last_us + gap_us:
            # the final session is ALREADY expired (straggler whose
            # natural timeout is below the watermark): close it now —
            # deferring to the next watermark advance would leave it
            # open forever on a quiet stream
            closed.append(row(start_us, last_us, n, "timeout"))
            state.remove()
        else:
            state.update((start_us, last_us, n))
            # close the open session when the WATERMARK passes
            # last + gap (event-time timeout: deterministic under
            # replay, no wall clock). Clamp ABOVE the current
            # watermark — ms truncation could otherwise set a
            # below-watermark timeout, which Spark rejects and the
            # error would kill the whole query (again on restart,
            # since the checkpoint replays the same batch).
            state.setTimeoutTimestamp(
                max((last_us + gap_us) // 1000, wm_us // 1000 + 1)
            )
        if closed:
            yield pd.DataFrame(closed)

    return update


def session_windows(
    events_stream: DataFrame,
    gap_s: int = 1800,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Per-user SESSION windows over a streaming events DataFrame —
    the custom sessionizer the built-in tumbling/sliding windows
    can't express (reference has no counterpart; this is the
    Spark-native §2.10 'arbitrary per-key state' surface with
    EVENT-TIME timeouts).

    A session closes when (a) a later event of the same user arrives
    more than ``gap_s`` after it (emitted immediately, closed_by =
    'gap'), or (b) the watermark passes session_end + gap (emitted by
    the state timeout, closed_by = 'timeout') — so idle users' state
    is reclaimed deterministically, never by wall clock. State is one
    (start, last, n) triple per user in the checkpointed store;
    parallelism is #users, one key shuffle per micro-batch."""
    return (
        events_stream.withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_session_fn(gap_s),
            outputStructType=_SESSION_OUT,
            stateStructType=_SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
