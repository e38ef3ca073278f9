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
