"""Bus addressing + delivery semantics (FIXTURES.md streaming cases)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from vanus_spark.bus import (
    assign_addresses,
    earliest_latest_offsets,
    get_event,
    get_event_by_id,
    lookup_offset_by_time,
)
from vanus_spark.delivery import (
    backoff_seconds,
    committed_offset,
    committed_offsets_df,
    resend_dead_letter,
    route_failed_events,
    split_due_events,
)
from vanus_spark.model import encode_event_id


@pytest.fixture(scope="module")
def bus(events):
    return assign_addresses(events).cache()


def test_addresses_dense_per_log(bus):
    stats = earliest_latest_offsets(bus).collect()
    assert len(stats) == 4
    for r in stats:
        assert r.earliest == 0
        assert r.latest == r.length - 1  # dense offsets


def test_get_event(bus):
    rows = get_event(bus, 1, 5, number=3).collect()
    assert [r.offset for r in rows] == [5, 6, 7]
    assert all(r.eventlog == 1 for r in rows)


def test_get_event_by_id(bus):
    rows = get_event_by_id(bus, encode_event_id(2, 7)).collect()
    assert len(rows) == 1 and rows[0].offset == 7 and rows[0].eventlog == 2


def test_lookup_offset_by_time(bus):
    t = dt.datetime(2024, 1, 15)
    res = {r.eventlog: r.offset for r in lookup_offset_by_time(bus, t).collect()}
    # oracle: per log, min offset with ts >= t
    expected = {
        r.eventlog: r.o
        for r in bus.where(F.col("ts") >= t)
        .groupBy("eventlog")
        .agg(F.min("offset").alias("o"))
        .collect()
    }
    assert res == expected


def test_lookup_offset_beyond_latest(bus):
    t = dt.datetime(2030, 1, 1)
    res = {r.eventlog: r.offset for r in lookup_offset_by_time(bus, t).collect()}
    latest = {
        r.eventlog: r.latest + 1 for r in earliest_latest_offsets(bus).collect()
    }
    assert res == latest


def test_backoff_schedule():
    # FIXTURES: attempts 1..11 -> [1,5,10,30,60,120,240,480,960,3600,3600]
    assert [backoff_seconds(n) for n in range(1, 12)] == [
        1, 5, 10, 30, 60, 120, 240, 480, 960, 3600, 3600,
    ]


def test_committed_offset_min_unacked():
    # acks {1,2,4} of received {1..5} => committed 3
    assert committed_offset([1, 2, 3, 4, 5], {1, 2, 4}) == 3
    assert committed_offset([1, 2, 3], {1, 2, 3}) == 4
    assert committed_offset([], set()) == 0


def test_committed_offsets_df(spark):
    rows = [(0, o, o in (1, 2, 4)) for o in range(1, 6)] + [(1, o, True) for o in range(3)]
    df = spark.createDataFrame(rows, "eventlog long, offset long, acked boolean")
    res = {r.eventlog: r.committed_offset for r in committed_offsets_df(df).collect()}
    assert res == {0: 3, 1: 3}


def _mk_failed(spark, status, attempts=None, error="boom"):
    attrs = {"partitionkey": "1"}
    if attempts is not None:
        attrs["xvanusretryattempts"] = str(attempts)
    return spark.createDataFrame(
        [("1", "/s", "1.0", "t", attrs, "{}", status, error)],
        "id string, source string, specversion string, type string, "
        "attributes map<string,string>, data string, status int, error string",
    )


BATCH_T = dt.datetime(2024, 6, 1, 12, 0, 0)


def test_route_5xx_to_retry(spark):
    retry, dead = route_failed_events(_mk_failed(spark, 503), "sub-1", BATCH_T)
    r = retry.collect()
    assert len(r) == 1 and dead.count() == 0
    attrs = r[0].attributes
    assert attrs["xvanusretryattempts"] == "1"
    assert attrs["xvanussubid"] == "sub-1"
    # attempt 1 -> +1s
    assert attrs["xvanusdeliverytime"] == "2024-06-01T12:00:01Z"


def test_route_404_to_dlq(spark):
    retry, dead = route_failed_events(_mk_failed(spark, 404), "sub-1", BATCH_T)
    assert retry.count() == 0
    d = dead.collect()[0].attributes
    assert d["xvanusdlreason"] == "Response404"
    assert d["xvanuslastdlerror"] == "boom"
    assert d["xvanussubid"] == "sub-1"
    assert d["xvanuslastdltime"] == "2024-06-01T12:00:00Z"


def test_route_429_retries(spark):
    retry, dead = route_failed_events(_mk_failed(spark, 429), "sub-1", BATCH_T)
    assert retry.count() == 1 and dead.count() == 0


def test_transform_error_to_dlq(spark):
    retry, dead = route_failed_events(_mk_failed(spark, 1), "sub-1", BATCH_T)
    assert retry.count() == 0
    assert dead.collect()[0].attributes["xvanusdlreason"] == "TransformError"


def test_max_attempts_to_dlq(spark):
    retry, dead = route_failed_events(
        _mk_failed(spark, 503, attempts=32), "sub-1", BATCH_T
    )
    assert retry.count() == 0
    assert dead.collect()[0].attributes["xvanusdlreason"] == "MaxDeliveryAttemptExceeded"


def test_backoff_attempt_rollover(spark):
    # attempts=3 -> next=4 -> 30s delay
    retry, _ = route_failed_events(_mk_failed(spark, 500, attempts=3), "s", BATCH_T)
    assert retry.collect()[0].attributes["xvanusdeliverytime"] == "2024-06-01T12:00:30Z"


def test_resend_dead_letter_strips_attrs(spark):
    _, dead = route_failed_events(_mk_failed(spark, 404), "sub-1", BATCH_T)
    out = resend_dead_letter(dead).collect()[0].attributes
    assert "xvanusdlreason" not in out and "xvanuslastdltime" not in out
    assert out["xvanussubid"] == "sub-1"  # kept (reference keeps sub id)


def test_split_due_events(spark):
    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 6, 1, 11, 59)), (2, dt.datetime(2024, 6, 1, 12, 1))],
        "id long, due_ts timestamp",
    )
    due, rest = split_due_events(df, BATCH_T)
    assert [r.id for r in due.collect()] == [1]
    assert [r.id for r in rest.collect()] == [2]
