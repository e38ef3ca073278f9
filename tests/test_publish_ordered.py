"""Publish path, retry re-filter, ordered mode."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from vanus_spark.bus import publish_round_robin, route_delayed_publish
from vanus_spark.delivery import refilter_retry_events
from vanus_spark.filters import compile_filter
from vanus_spark.streaming.runner import DeliveryLoop
from vanus_spark.subscription import Subscription

T0 = dt.datetime(2024, 6, 1, 12, 0, 0)


def test_publish_round_robin_balances(events):
    out = publish_round_robin(events)
    counts = {r.eventlog: r.n for r in out.groupBy("eventlog").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {0, 1, 2, 3}
    assert max(counts.values()) - min(counts.values()) <= 1  # perfectly balanced


def test_route_delayed_publish(cloudevents):
    delayed_attr = F.map_concat(
        "attributes", F.create_map(F.lit("xvanusdeliverytime"), F.lit("2030-01-01T00:00:00Z"))
    )
    mixed = cloudevents.limit(10).withColumn(
        "attributes",
        F.when(F.col("id").cast("long") % 2 == 0, delayed_attr).otherwise(F.col("attributes")),
    )
    direct, timer = route_delayed_publish(mixed)
    assert direct.count() + timer.count() == 10
    assert all(
        r.attributes.get("xvanusdeliverytime") for r in timer.collect()
    )


def test_refilter_retry(cloudevents):
    bus = cloudevents.withColumn(
        "attributes",
        F.map_concat("attributes", F.create_map(F.lit("xvanussubid"), F.lit("sub-x"))),
    )
    pred = compile_filter({"exact": {"type": "error"}})
    match = refilter_retry_events(bus, "sub-x", pred)
    assert match.count() == cloudevents.where(F.col("type") == "error").count()
    assert refilter_retry_events(bus, "other-sub", pred).count() == 0


def _envelope(spark, rows):
    return spark.createDataFrame(
        rows,
        "id string, source string, specversion string, type string, "
        "time timestamp, datacontenttype string, dataschema string, "
        "subject string, attributes map<string,string>, data string",
    )


def test_ordered_mode_failure_goes_to_dlq(spark):
    sub = Subscription.from_spec({"config": {"ordered_event": True}})
    loop = DeliveryLoop(spark, sub, lambda rows: [503] * len(rows))
    loop.process_batch(
        _envelope(spark, [("1", "/s", "1.0", "t", T0, None, None, None, {}, "{}")]), T0
    )
    assert loop.pending.count() == 0  # NO retry in ordered mode
    d = loop.dead.collect()
    assert len(d) == 1 and d[0].attributes["xvanusdlreason"] == "OrderEvent"
