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
offsets) — address reconstruction here uses a two-phase distributed
rank (range partition -> local window -> broadcast prefix-count join)
so NO stage ever funnels through one task, whatever the bus size.
Time->offset lookup is a partial agg (min) per partition — one narrow
shuffle of (log, offset) pairs, and Parquet min/max stats on ``ts``
prune the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from vanus_spark.model import decode_event_id, encode_event_id  # noqa: F401 (re-export)


def distributed_row_number(
    df: DataFrame,
    part_cols: list[str],
    order_cols: list[str],
    out_col: str,
    keep_slice: bool = False,
) -> DataFrame:
    """``row_number() OVER (PARTITION BY part_cols ORDER BY order_cols)
    - 1`` computed WITHOUT a per-key (or, for empty part_cols, global)
    single-reducer window — the two-phase rank that survives 100 TB:

    1. range-partition on (part_cols + order_cols): partitions are
       disjoint, ordered slices with ~equal rows (sampled boundaries);
    2. local row_number per (part_cols, slice) — parallelism is
       #slices × #keys, never 1;
    3. global rank = local rank + prefix count of earlier slices of
       the same key — a #slices-row aggregate, broadcast-joined.

    Ordering keys must be unique per key-group (callers tie-break with
    event_id), which makes the result reproducible run-to-run.

    ``keep_slice=True`` retains the internal ``_slice`` column. Its
    contract (per key-group): ranks within a slice are CONTIGUOUS and
    slices ordered by slice id have strictly increasing rank ranges —
    both by construction, since the prefix sums counts over
    ``_e_slice < _slice``. Downstream prefix-sum consumers (e.g. the
    SFT packer) must group on THIS column, never on
    ``spark_partition_id()`` re-derived after the exchange: hash
    collisions / AQE coalescing put non-adjacent rank ranges into one
    physical partition.
    """
    keys = [*part_cols, *order_cols]
    ranged = df.repartitionByRange(*keys).withColumn(
        "_slice", F.spark_partition_id()
    )
    # _slice comes from a nondeterministically-SAMPLED range exchange, and
    # both the local ranks and the prefix counts below must observe the SAME
    # slice assignment.  Relying on Catalyst ReuseExchange to canonicalize
    # the two subtrees equal is fragile (disabled reuse or a future edit
    # that un-equalizes them would silently corrupt offsets), so pin the
    # assignment by materializing the ranged data once: a lazy local
    # checkpoint computes the partitions on first use and every branch
    # reads the stored blocks.
    ranged = ranged.localCheckpoint(eager=False)
    local_w = Window.partitionBy(*part_cols, "_slice").orderBy(*order_cols)
    local = ranged.withColumn("_lrn", F.row_number().over(local_w))
    counts = local.groupBy(*part_cols, "_slice").agg(F.count("*").alias("_n"))
    # Prefix count of earlier slices per key-group, via a triangular
    # self-join on the #slices-row aggregate.  A window over an empty
    # PARTITION BY would compute the same thing but emits WindowExec's
    # single-partition warning and funnels through one task; the join is
    # O(#slices^2) TUPLES on a frame of #partitions rows — trivially
    # broadcastable at any bus size.
    earlier = counts.select(
        *[F.col(c).alias(f"_e_{c}") for c in part_cols],
        F.col("_slice").alias("_e_slice"),
        F.col("_n").alias("_e_n"),
    )
    cond = F.col("_e_slice") < F.col("_slice")
    for c in part_cols:
        cond = cond & (F.col(f"_e_{c}") == F.col(c))
    prefix = (
        counts.join(F.broadcast(earlier), cond, "left")
        .groupBy(*part_cols, "_slice")
        .agg(F.coalesce(F.sum("_e_n"), F.lit(0)).alias("_base"))
    )
    out = (
        local.join(F.broadcast(prefix), [*part_cols, "_slice"])
        .withColumn(out_col, (F.col("_base") + F.col("_lrn") - 1).cast("long"))
        .drop("_lrn", "_base")
    )
    return out if keep_slice else out.drop("_slice")


def assign_addresses(events: DataFrame, n_logs: int = 4) -> DataFrame:
    """Attach (eventlog, offset) columns to the raw events table.

    Fixture convention (FIXTURES.md §1): eventlog = user_id % n_logs,
    offset = rank within eventlog ordered by (ts, event_id). The rank
    is the two-phase distributed form — parallelism does not collapse
    to n_logs tasks."""
    with_log = events.withColumn(
        "eventlog", (F.col("user_id") % n_logs).cast("long")
    )
    return distributed_row_number(
        with_log, ["eventlog"], ["ts", "event_id"], "offset"
    )


def publish_round_robin(events: DataFrame, n_logs: int = 4, order_col: str = "event_id") -> DataFrame:
    """Publish-path write policy: round-robin eventlog assignment
    (reference: client/pkg/policy/policy.go:25-57 — a per-writer
    monotonic counter mod #logs; deterministically reproduced here as
    arrival order mod #logs).

    The arrival rank is the two-phase distributed row_number — at
    ingest the writer's per-task counter needs no ordering at all;
    this reconstruction keeps the fixture deterministic without ever
    funneling the bus through a single task."""
    ranked = distributed_row_number(events, [], [order_col], "_arrival")
    return ranked.withColumn(
        "eventlog", (F.col("_arrival") % n_logs).cast("long")
    ).drop("_arrival")


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
