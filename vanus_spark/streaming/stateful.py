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
# ALL of a user's not-yet-final sessions, parallel arrays ordered by
# start: a gap-split segment stays revisable (an in-watermark
# out-of-order event in a later batch may bridge two of them) until
# the watermark passes its end + gap — the same emission rule as the
# built-in session_window aggregation.
_SESSION_STATE = "starts array<long>, lasts array<long>, ns array<long>"

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

        segments: list[list[int]] = []  # [start, last, n], by start
        if state.exists:
            starts, lasts, ns = state.get
            segments = [[s, l, n] for s, l, n in zip(starts, lasts, ns)]

        if not state.hasTimedOut:
            ts = sorted(
                int(t.value // 1000)  # pandas ns -> us
                for pdf in pdfs
                for t in pd.to_datetime(pdf["ts"])
                if pd.notna(t)  # a null ts must not poison the session
            )
            if not ts and not segments:
                return
            # fold the batch's events in as unit segments, then merge
            # by interval distance — events within a gap of a RETAINED
            # segment (even one split off in an earlier batch) extend
            # or bridge it, which is what gap semantics demand of
            # out-of-order arrivals inside the watermark delay
            segments.extend([t, t, 1] for t in ts)
            segments.sort(key=lambda s: s[0])
            merged: list[list[int]] = []
            for seg in segments:
                if merged and seg[0] - merged[-1][1] <= gap_us:
                    merged[-1][1] = max(merged[-1][1], seg[1])
                    merged[-1][2] += seg[2]
                else:
                    merged.append(list(seg))
            segments = merged

        # emit every segment the watermark has passed (end + gap <
        # watermark ⇒ no in-watermark event can extend it any more):
        # 'gap' when a later segment of the same user proves it over,
        # 'timeout' when only the watermark does (the user's final
        # segment — including a straggler already below the watermark
        # on arrival, which closes immediately rather than idling)
        wm_us = state.getCurrentWatermarkMs() * 1000
        ready = [s for s in segments if wm_us > s[1] + gap_us]
        still_open = [s for s in segments if not (wm_us > s[1] + gap_us)]
        closed = [
            row(
                s,
                l,
                n,
                "gap" if (i < len(ready) - 1 or still_open) else "timeout",
            )
            for i, (s, l, n) in enumerate(ready)
        ]
        if still_open:
            state.update(
                (
                    [s[0] for s in still_open],
                    [s[1] for s in still_open],
                    [s[2] for s in still_open],
                )
            )
            # wake when the WATERMARK passes the earliest open
            # segment's end + gap (event-time timeout: deterministic
            # under replay, no wall clock). Clamp ABOVE the current
            # watermark — ms truncation could otherwise set a
            # below-watermark timeout, which Spark rejects and the
            # error would kill the whole query (again on restart,
            # since the checkpoint replays the same batch).
            state.setTimeoutTimestamp(
                max(
                    min(s[1] + gap_us for s in still_open) // 1000,
                    wm_us // 1000 + 1,
                )
            )
        elif state.exists:
            state.remove()
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

    A session EMITS only once the watermark passes its end + gap (the
    built-in session_window emission rule): until then a gap-split
    segment stays revisable in state, so an in-watermark out-of-order
    event arriving in a later batch can still bridge two segments into
    the single session gap semantics demand. ``closed_by`` records the
    closing evidence: 'gap' when a later session of the same user
    exists (an event > gap after it proved it over), 'timeout' when
    only the watermark closed it (the user's final session) — so idle
    users' state is reclaimed deterministically, never by wall clock.
    State is the user's open (start, last, n) segments in the
    checkpointed store; parallelism is #users, one key shuffle per
    micro-batch."""
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
