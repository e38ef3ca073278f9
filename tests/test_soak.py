"""Wall-clock soak: DeliveryLoop.run_stream under real async timing.

The deterministic batch-replay tests (test_streaming.py) pin the
semantics with logical timestamps; this suite runs the loop as the
reference actually runs (a long-lived processingTime-triggered stream,
trigger.go:594-643) with an injected flaky sink and asserts the
retry/DLQ/offset invariants hold when micro-batch boundaries, backoff
due-times, and sink failures interleave on the real clock:

- no loss: every input event is delivered, dead, or still pending
- no duplicates: delivered ids are unique across the whole run
- transient failures (503 until attempt >= heal) eventually deliver
- permanent failures (404) land in the DLQ exactly once, never retry

The sink is STATELESS across calls (it ships to executors): its
decisions key off the event id and the xvanusretryattempts attribute
the router stamps on each retry, so behavior is reproducible under
any batch interleaving. Delivered ids are recorded by the sink as
files in a spool dir (executors share the local filesystem in
local[*] — the same observation trick the sink tests use).
"""

from __future__ import annotations

import os
import time
import uuid

import pytest

from pyspark.sql import functions as F

from vanus_spark.streaming.runner import DeliveryLoop
from vanus_spark.subscription import Subscription

pytestmark = pytest.mark.slow

N_EVENTS = 200


class SoakSink:
    """id % 13 == 0 -> permanent 404 (DLQ, non-retriable);
    id % 7 == 0 (and not % 13) -> 503 until retry attempt >= 2;
    else 200. Records every 2xx-delivered id into spool_dir."""

    def __init__(self, spool_dir: str):
        self.spool_dir = spool_dir

    def __call__(self, rows):
        statuses = []
        ok_ids = []
        for r in rows:
            i = int(r["id"])
            attempts = int((r["attributes"] or {}).get("xvanusretryattempts", 0))
            if i % 13 == 0:
                statuses.append(404)
            elif i % 7 == 0 and attempts < 2:
                statuses.append(503)
            else:
                statuses.append(200)
                ok_ids.append(r["id"])
        if ok_ids:
            path = os.path.join(self.spool_dir, uuid.uuid4().hex)
            with open(path, "w") as f:
                f.write("\n".join(ok_ids))
        return statuses


def _read_spool(spool_dir: str) -> list[str]:
    out: list[str] = []
    for name in os.listdir(spool_dir):
        with open(os.path.join(spool_dir, name)) as f:
            out.extend(x for x in f.read().splitlines() if x)
    return out


def test_soak_flaky_sink_invariants(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    spool = str(tmp_path / "spool")
    os.makedirs(spool)

    ce = (
        spark.range(N_EVENTS)
        .select(
            F.col("id").cast("string").alias("id"),
            F.lit("/soak").alias("source"),
            F.lit("1.0").alias("specversion"),
            F.lit("purchase").alias("type"),
            F.current_timestamp().alias("time"),
            F.lit("application/json").alias("datacontenttype"),
            F.lit(None).cast("string").alias("dataschema"),
            F.lit(None).cast("string").alias("subject"),
            F.create_map().cast("map<string,string>").alias("attributes"),
            F.lit('{"v":1}').alias("data"),
        )
        .repartition(10)  # ~10 source files, paced 2 per micro-batch
    )
    ce.write.parquet(src)

    expected_dead = {str(i) for i in range(N_EVENTS) if i % 13 == 0}
    expected_ok = {str(i) for i in range(N_EVENTS)} - expected_dead

    loop = DeliveryLoop(spark, Subscription.from_spec({}), SoakSink(spool))
    q = loop.run_stream(
        spark.readStream.schema(ce.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src),
        ckpt,
        tick_seconds=0.5,
        heartbeat=True,  # quiet-input ticks so the retry tail drains
        processingTime="500 milliseconds",
    )

    # run on the wall clock until the retry tail drains (503 events
    # need 2 retries: due +1s then +5s after their failing tick) or a
    # hard deadline passes. The stream keeps ticking on empty input —
    # exactly the long-lived loop shape under test. The deadline needs
    # real headroom over the ~15 s nominal drain: under co-tenant load
    # each tick stretches to seconds, and a deadline expiring mid-tick
    # stops the stream AFTER the sink writes land but BEFORE the
    # driver-side counter update — orphaning the final tick's count
    # (observed: spool complete, pending 0, counter 6 shy at 90 s).
    deadline = time.time() + 300
    try:
        while time.time() < deadline:
            time.sleep(2.0)
            if (
                len(set(_read_spool(spool))) >= len(expected_ok)
                and loop.pending.count() == 0
                # the loop's own counter is updated moments AFTER the
                # tick's sink writes land; stopping in that window
                # would orphan the final tick's count (seen once under
                # heavy co-tenant load: spool complete, counter 6 shy)
                and loop.delivered_count >= len(expected_ok)
            ):
                break
    finally:
        q.stop()

    delivered = _read_spool(spool)

    # no duplicates under any interleaving of retries and fresh batches
    assert len(delivered) == len(set(delivered))
    # transient 503s healed and delivered; nothing lost
    assert set(delivered) == expected_ok
    # permanent 404s: exactly the %13 ids, each dead exactly once
    dead_rows = loop.dead.collect()
    assert {r.id for r in dead_rows} == expected_dead
    assert len(dead_rows) == len(expected_dead)
    assert all(
        r.attributes["xvanusdlreason"] == "Response404" for r in dead_rows
    )
    # retry tail fully drained; the loop's own progress counter agrees
    assert loop.pending.count() == 0
    assert loop.delivered_count == len(expected_ok)
