"""Eventbus addressing: (eventlog, offset), time->offset lookup,
event fetch, event-ID addressing.

Reference model: an eventbus has N append-only eventlogs; an event's
global address is (eventlog_id u64, offset u64); the store supports
EarliestOffset / LatestOffset / QueryOffsetByTime via the per-entry
stime index (reference: client/pkg/api/client.go:58-66,
server/store/vsb/block_seek.go:34-117,
server/gateway/proxy/proxy.go:710-800,860-900).

Spark mapping: Parquet replaces VSB; ``eventlog`` is a hash partition
of the bus, ``offset`` is the per-log row_number ordered by (ts,
event_id). At 100 TB the bus would be written partitioned BY eventlog
with offsets assigned at ingest (monotonic per partition, e.g. Kafka
offsets) — the window here exists only to reconstruct addressing for
the unpartitioned test fixture. Time->offset lookup is a partial agg
(min) per partition — one narrow shuffle of (log, offset) pairs, and
Parquet min/max stats on ``ts`` prune the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from vanus_spark.model import decode_event_id, encode_event_id  # noqa: F401 (re-export)


def assign_addresses(events: DataFrame, n_logs: int = 4) -> DataFrame:
    """Attach (eventlog, offset) columns to the raw events table.

    Fixture convention (FIXTURES.md §1): eventlog = user_id % n_logs,
    offset = row_number over (eventlog) ordered by (ts, event_id) - 1.
    """
    w = Window.partitionBy("eventlog").orderBy("ts", "event_id")
    return events.withColumn(
        "eventlog", (F.col("user_id") % n_logs).cast("long")
    ).withColumn("offset", (F.row_number().over(w) - 1).cast("long"))


def publish_round_robin(events: DataFrame, n_logs: int = 4, order_col: str = "event_id") -> DataFrame:
    """Publish-path write policy: round-robin eventlog assignment
    (reference: client/pkg/policy/policy.go:25-57 — a per-writer
    monotonic counter mod #logs; deterministically reproduced here as
    arrival order mod #logs).

    NOTE the global row_number exists only to make the tiny test
    fixture deterministic; at scale the writer assigns log ids at
    ingest (per-task counters), which needs no global ordering."""
    w = Window.orderBy(order_col)
    return events.withColumn(
        "eventlog", ((F.row_number().over(w) - 1) % n_logs).cast("long")
    )


def route_delayed_publish(envelope: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Publish gateway split: events carrying xvanusdeliverytime are
    rerouted to the timer bus instead of their target bus
    (reference: server/gateway/proxy/proxy.go:207-231)."""
    delay = F.col("attributes").getItem("xvanusdeliverytime")
    return envelope.where(delay.isNull()), envelope.where(delay.isNotNull())


def get_event(bus: DataFrame, eventlog: int, offset: int, number: int = 1) -> DataFrame:
    """GetEvent(eventbus, eventlog, offset, n)
    (reference: proxy.go:750-800; n capped server-side)."""
    return (
        bus.where((F.col("eventlog") == eventlog) & (F.col("offset") >= offset))
        .orderBy("offset")
        .limit(number)
    )


def get_event_by_id(bus: DataFrame, event_id: str) -> DataFrame:
    """Fetch by the 16-byte global event ID
    (reference: proxy.go:860-900 decodeEventID)."""
    log_id, offset = decode_event_id(event_id)
    return bus.where((F.col("eventlog") == log_id) & (F.col("offset") == offset))


def lookup_offset_by_time(bus: DataFrame, ts) -> DataFrame:
    """LookupOffset(timestamp): per eventlog, the first offset with
    ts >= T; T beyond the latest event => latest offset + 1
    (reference: proxy.go:710-744, block_seek.go:34-117,
    vsctl event.go:436-441).

    One partial-aggregated groupBy — map-side combine makes this a
    tiny shuffle regardless of bus size, and the ts predicate prunes
    row groups via Parquet stats.
    """
    per_log = bus.groupBy("eventlog").agg(
        F.min(F.when(F.col("ts") >= ts, F.col("offset"))).alias("first_at_or_after"),
        (F.max("offset") + 1).alias("next_offset"),
    )
    return per_log.select(
        "eventlog",
        F.coalesce("first_at_or_after", "next_offset").alias("offset"),
    )


def earliest_latest_offsets(bus: DataFrame) -> DataFrame:
    """Eventlog Earliest/Latest/Length surface
    (reference: client/pkg/api/client.go:58-66)."""
    return bus.groupBy("eventlog").agg(
        F.min("offset").alias("earliest"),
        F.max("offset").alias("latest"),
        F.count("*").alias("length"),
    )
