"""Streaming delivery loop: the Spark-native replacement for the
reference's trigger worker + timing wheel + retry/DLQ buses.

Reference dataflow (server/trigger/trigger/trigger.go:594-643): reader
-> filter+transform -> batcher -> sender -> ack/offset-commit, with
failed events written to retry (timer) buses and a DLQ bus, and
delayed events parked in the timing wheel.

Spark design (SURVEY §7.4): ONE pending-events table replaces the 130
timer eventbuses; each micro-batch:

  1. due = pending WHERE due_ts <= batch_time; carry the rest
  2. fresh = filter(transform(batch)); transform errors -> DLQ route
  3. deliver (due ∪ fresh) executor-side (mapInPandas over the sink
     callable — no driver round-trip, partition-parallel)
  4. failures -> route_failed_events -> retry rows re-enter pending
     with the backoff schedule; dead rows append to the DLQ table
  5. committed offset advances by the min-unacked rule

The loop is a pure function of (batch, pending, batch_time), so tests
replay deterministic batches with logical timestamps (no wall clock),
exactly like the reference's own unit strategy for the wheel.

At scale: pending is small relative to throughput (only failures and
delays), so the union is cheap; delivery parallelism = input
partitions; the only shuffle is the offset aggregation (tiny,
partial-agg). For exactly-once bookkeeping the delivered/dead tables
would be Delta/Iceberg appends keyed by (eventlog, offset) — plain
parquet appends here since those jars aren't in the test image.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from vanus_spark.delivery import route_failed_events, split_due_events
from vanus_spark.model import ATTR_DELIVERY_TIME
from vanus_spark.subscription import Subscription

# sink: rows (list of dict) -> list of int status codes (2xx = success)
SinkFn = Callable[[list[dict[str, Any]]], list[int]]


@dataclass
class SinkResult:
    delivered: DataFrame
    pending: DataFrame
    dead: DataFrame
    # newly-parked retries this tick (None for control-plane-gated
    # ticks) — consumed by run_stream's counter aggregate, mirroring
    # the reference's TriggerRetryEventCounter
    retried: DataFrame | None = None


_STATUS_SCHEMA_SUFFIX = ", status int, error string"


def _deliver_with_sink(df: DataFrame, sink_fn: SinkFn) -> DataFrame:
    """Run the sink executor-side per Arrow batch; returns df + status.

    The sink callable must be picklable (it ships to executors, like
    the reference's sender goroutines ship the HTTP client config).
    """
    out_schema = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
        + _STATUS_SCHEMA_SUFFIX
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = pdf.to_dict("records")
            try:
                statuses = sink_fn(rows)
            except Exception as e:  # noqa: BLE001 — sink blew up: all fail
                statuses = [500] * len(rows)
                pdf = pdf.assign(status=statuses, error=str(e))
                yield pdf
                continue
            pdf = pdf.assign(
                status=statuses,
                error=["" if 200 <= s < 300 else f"status={s}" for s in statuses],
            )
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


class DeliveryLoop:
    """Per-subscription micro-batch delivery with retry/DLQ/delay."""

    def __init__(
        self,
        spark: SparkSession,
        subscription: Subscription,
        sink_fn: SinkFn,
        sub_id: str = "sub-0",
        state_dir: str | None = None,
        catalog=None,
        catalog_sub_id: int | None = None,
    ):
        """``state_dir`` makes pending/dead state durable: the pending
        table snapshots per epoch (alternating dirs, so a crash mid-
        write leaves the previous epoch intact) and the DLQ appends —
        a restarted loop resumes its parked retries/delays. In-memory
        (localCheckpoint) otherwise — fine for tests, not restarts."""
        self.spark = spark
        self.sub = subscription
        self.sink_fn = sink_fn
        self.sub_id = sub_id
        self.state_dir = state_dir
        # Optional control-plane gate: when bound to a Catalog
        # subscription, a disabled phase stops delivery at the top of
        # every tick (the reference's trigger worker is descheduled on
        # DisableSubscription, controller.go:305-336); the batch is NOT
        # consumed, so offsets stand still and a later resume redelivers
        # from where delivery stopped.
        self.catalog = catalog
        self.catalog_sub_id = catalog_sub_id
        self._epoch = 0
        self.empty_envelope = spark.createDataFrame(
            [],
            "id string, source string, specversion string, type string, "
            "time timestamp, datacontenttype string, dataschema string, "
            "subject string, attributes map<string,string>, data string",
        )
        self.pending: DataFrame = self.empty_envelope.withColumn(
            "due_ts", F.lit(None).cast("timestamp")
        ).limit(0)
        self.dead: DataFrame = self.empty_envelope
        self.delivered_count = 0
        self.metrics: list[dict] = []
        # Prometheus-shaped counters (reference pkg/observability/
        # metrics/trigger.go): monotonic totals accumulated per tick by
        # run_stream, exported with the reference's metric names via
        # vanus_spark.observability. Kept separate from self.metrics so
        # the metrics_df schema (a query surface) stays frozen.
        self.prom_counters: dict[str, int] = {
            "pull_event_number": 0,
            "push_event_number": 0,  # result=success pushes
            "retry_event_number": 0,
            "dead_letter_event_number": 0,
        }
        if state_dir:
            self._restore_state()

    # ----- durable state ---------------------------------------------------

    def _pending_dir(self, epoch: int) -> str:
        return f"{self.state_dir}/pending_e{epoch % 2}"

    def _restore_state(self) -> None:
        import os

        marker = f"{self.state_dir}/EPOCH"
        if os.path.exists(marker):
            with open(marker) as f:
                self._epoch = int(f.read().strip())
            self.pending = self.spark.read.parquet(self._pending_dir(self._epoch))
        dead_dir = f"{self.state_dir}/dead"
        if os.path.isdir(dead_dir) and any(
            f.endswith(".parquet") for f in os.listdir(dead_dir)
        ):
            self.dead = self.spark.read.parquet(dead_dir)

    def _persist_state(self, new_dead: DataFrame) -> None:
        self._epoch += 1
        path = self._pending_dir(self._epoch)
        self.pending.write.mode("overwrite").parquet(path)
        self.pending = self.spark.read.parquet(path)
        new_dead.write.mode("append").parquet(f"{self.state_dir}/dead")
        self.dead = self.spark.read.parquet(f"{self.state_dir}/dead")
        with open(f"{self.state_dir}/EPOCH", "w") as f:
            f.write(str(self._epoch))

    def _with_due_ts(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            "due_ts",
            F.to_timestamp(F.col("attributes").getItem(ATTR_DELIVERY_TIME)),
        )

    def process_batch(
        self, batch_df: DataFrame, batch_time, tick_seconds: float = 1.0
    ) -> SinkResult:
        """One micro-batch tick; updates pending/dead state, returns
        what happened (all DataFrames, lazily evaluated).

        Backpressure/rate limiting are ENFORCED here, not passed
        through: ``config.max_uack`` (reference: offset/offset.go:29-63
        maxUACK) and ``config.rate_limit`` × ``tick_seconds``
        (reference: trigger.go:130-132,247) bound how many events reach
        the sender this tick; the excess parks in pending (due
        immediately) and drains FIFO — by (time, id) — on later ticks,
        exactly the bounded-unacked-window behavior of the reference's
        offset tracker."""
        # 0. control-plane gate: a stopped subscription receives nothing
        if self.catalog is not None and self.catalog_sub_id is not None:
            self.catalog.refresh()
            if not self.catalog.subscription_is_active(self.catalog_sub_id):
                return SinkResult(
                    delivered=self.empty_envelope,
                    pending=self.pending,
                    dead=self.empty_envelope,
                )
        # 1. transform: errors route to DLQ with TransformError
        processed = self.sub.apply(batch_df)
        fresh_ok = processed.where(~F.col("transform_error")).drop("transform_error")
        tf_failed = (
            processed.where(F.col("transform_error"))
            .drop("transform_error")
            .withColumn("status", F.lit(1))
            .withColumn("error", F.lit("transform error"))
        )
        _, tf_dead = route_failed_events(
            tf_failed, self.sub_id, batch_time, self.sub.max_retry_attempts
        )

        # 2. delayed events in the fresh batch park in pending
        fresh = self._with_due_ts(fresh_ok)
        delayed = fresh.where(F.col("due_ts") > F.lit(batch_time).cast("timestamp"))
        immediate = fresh.where(
            F.col("due_ts").isNull() | (F.col("due_ts") <= F.lit(batch_time).cast("timestamp"))
        )

        # 3. due pending events rejoin the stream
        due, still_pending = split_due_events(self.pending, batch_time)

        to_send = immediate.unionByName(due).drop("due_ts")

        # 3b. backpressure: cap what reaches the sender; overflow parks
        # (sort+limit is TakeOrdered — memory bounded by the cap, never
        # a full global sort)
        cap = self.sub.batch_cap(tick_seconds)
        throttled = None
        if cap is not None:
            sendable = (
                to_send.orderBy(F.col("time").asc_nulls_last(), "id").limit(cap)
            )
            throttled = to_send.join(
                sendable.select("id"), "id", "left_anti"
            ).withColumn("due_ts", F.lit(batch_time).cast("timestamp"))
            to_send = sendable

        # 4. deliver executor-side, split by status
        sent = _deliver_with_sink(to_send, self.sink_fn).cache()
        ok = sent.where((F.col("status") >= 200) & (F.col("status") < 300)).drop(
            "status", "error"
        )
        failed = sent.where((F.col("status") < 200) | (F.col("status") >= 300))
        if self.sub.ordered:
            # ordered mode: a failed send never retries — straight to
            # DLQ with reason OrderEvent (reference: trigger.go:427-434)
            failed = failed.withColumn("status", F.lit(-1))
        retry, dead = route_failed_events(
            failed, self.sub_id, batch_time, self.sub.max_retry_attempts
        )

        # 5. state: retries re-enter pending with their backoff due_ts
        self.pending = still_pending.unionByName(
            self._with_due_ts(retry)
        ).unionByName(delayed)
        if throttled is not None:
            self.pending = self.pending.unionByName(throttled)
        new_dead = dead.unionByName(tf_dead)
        if self.state_dir:
            self._persist_state(new_dead)
        else:
            self.pending = self.pending.localCheckpoint(eager=True)
            self.dead = self.dead.unionByName(new_dead).localCheckpoint(eager=True)
        return SinkResult(
            delivered=ok, pending=self.pending, dead=new_dead, retried=retry
        )

    # ----- Structured Streaming wiring -------------------------------------

    def metrics_df(self) -> DataFrame:
        """Per-tick delivery metrics as a DataFrame (delivered /
        newly-dead / parked per processed micro-batch — the
        observability surface of the reference's delivery counters)."""
        schema = "epoch long, delivered long, new_dead long, pending long"
        return self.spark.createDataFrame(self.metrics, schema)

    _HEARTBEAT_ID = "__heartbeat__"

    def _heartbeat_stream(self) -> DataFrame:
        """A rate-source stream shaped like the envelope: one marker
        row per second whose only job is to make the trigger fire so
        parked retries/delays drain on a QUIET input stream. Without
        it, a file/kafka source with no new data never invokes
        foreachBatch, and a retry due at T+5s waits for the next
        unrelated event — the reference's loop is clock-driven
        (trigger.go:594-643), so ours must tick on the clock too."""
        rate = self.spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        return rate.select(
            F.lit(self._HEARTBEAT_ID).alias("id"),
            F.lit("/heartbeat").alias("source"),
            F.lit("1.0").alias("specversion"),
            F.lit(self._HEARTBEAT_ID).alias("type"),
            F.col("timestamp").alias("time"),
            F.lit(None).cast("string").alias("datacontenttype"),
            F.lit(None).cast("string").alias("dataschema"),
            F.lit(None).cast("string").alias("subject"),
            F.create_map().cast("map<string,string>").alias("attributes"),
            F.lit(None).cast("string").alias("data"),
        )

    def run_stream(
        self,
        stream_df: DataFrame,
        checkpoint_dir: str,
        tick_seconds: float = 1.0,
        heartbeat: bool = False,
        **trigger_kwargs,
    ):
        """Attach the loop to a streaming DataFrame via foreachBatch.
        Offsets/exactly-once come from the checkpoint (the Spark
        equivalent of the reference's committed-offset store).

        Backpressure / rate limiting are enforced at TWO layers: the
        source's maxOffsetsPerTrigger / maxFilesPerTrigger options
        bound what each micro-batch READS (set them on ``stream_df``'s
        reader), and the subscription's max_uack / rate_limit config
        bounds what each tick SENDS (process_batch parks the excess in
        pending). ``tick_seconds`` should match the trigger interval
        so rate_limit integrates correctly; pass
        ``processingTime='...'`` here to pace the ticks.

        ``heartbeat=True`` unions a 1-row/s rate-source marker stream
        so ticks fire even when the input is quiet — REQUIRED for
        long-lived processingTime streams with retries/delays (a file
        source with no new files never triggers a batch, which would
        strand parked retries until the next unrelated event). Leave
        off for availableNow/replay runs, where a drain loop would
        never terminate."""
        if heartbeat:
            stream_df = stream_df.unionByName(self._heartbeat_stream())

        def on_batch(batch_df: DataFrame, epoch_id: int):
            import datetime as _dt

            if heartbeat:
                batch_df = batch_df.where(F.col("id") != self._HEARTBEAT_ID)
            res = self.process_batch(
                batch_df, _dt.datetime.now(_dt.timezone.utc), tick_seconds
            )
            # force delivery + expose progress in ONE tagged-union job
            # (the reference's TriggerDeliveryEventCounter surface:
            # delivered / newly-dead / parked per tick)
            tag_union = (
                batch_df.select(F.lit("pulled").alias("k"))
                .unionByName(res.delivered.select(F.lit("delivered").alias("k")))
                .unionByName(res.dead.select(F.lit("dead").alias("k")))
                .unionByName(res.pending.select(F.lit("pending").alias("k")))
            )
            if res.retried is not None:
                tag_union = tag_union.unionByName(
                    res.retried.select(F.lit("retry").alias("k"))
                )
            counts = {
                r["k"]: r["n"]
                for r in tag_union.groupBy("k")
                .agg(F.count("*").alias("n"))
                .collect()
            }
            self.delivered_count += counts.get("delivered", 0)
            self.prom_counters["pull_event_number"] += counts.get("pulled", 0)
            self.prom_counters["push_event_number"] += counts.get(
                "delivered", 0
            )
            self.prom_counters["retry_event_number"] += counts.get("retry", 0)
            self.prom_counters["dead_letter_event_number"] += counts.get(
                "dead", 0
            )
            self.metrics.append(
                {
                    "epoch": int(epoch_id),
                    "delivered": counts.get("delivered", 0),
                    "new_dead": counts.get("dead", 0),
                    "pending": counts.get("pending", 0),
                }
            )

        return (
            stream_df.writeStream.foreachBatch(on_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(**(trigger_kwargs or {"availableNow": True}))
            .start()
        )
