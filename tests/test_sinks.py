"""FaaS/gRPC sink adapters: CE JSON marshalling, the interface.go
error model (600/601), and full retry/DLQ routing through DeliveryLoop
with mocked transports."""

from __future__ import annotations

import datetime as dt
import json

import pytest

from vanus_spark.sinks import (
    ERR_DELIVERY_TIMEOUT,
    ERR_UNKNOWN,
    aws_lambda_sink,
    event_row_to_cloudevent_json,
    gcloud_functions_sink,
    grpc_batched_sink,
)
from vanus_spark.streaming.runner import DeliveryLoop
from vanus_spark.subscription import Subscription

T0 = dt.datetime(2024, 6, 1, 12, 0, 0)


def _row(i, typ="purchase", data='{"v":1}', attrs=None):
    return {
        "id": str(i), "source": "/s", "specversion": "1.0", "type": typ,
        "time": T0, "datacontenttype": "application/json",
        "dataschema": None, "subject": None,
        "attributes": attrs or {"partitionkey": "7"}, "data": data,
    }


def test_cloudevent_json_marshal():
    ce = json.loads(event_row_to_cloudevent_json(_row(1)))
    assert ce["specversion"] == "1.0" and ce["id"] == "1"
    assert ce["type"] == "purchase" and ce["source"] == "/s"
    assert ce["data"] == {"v": 1}  # json payload embeds as JSON value
    assert ce["partitionkey"] == "7"  # extension flattens to top level
    assert ce["time"].startswith("2024-06-01T12:00:00")


def test_cloudevent_time_non_utc_offset_is_well_formed_rfc3339():
    """Regression (r4 advisor): a tz-aware timestamp with a non-UTC
    offset must convert to UTC before the fraction + 'Z' are appended
    — never the malformed '...+05:30.000000Z' shape."""
    ist = dt.timezone(dt.timedelta(hours=5, minutes=30))
    r = _row(3)
    r["time"] = dt.datetime(2024, 1, 1, 9, 0, 0, tzinfo=ist)
    ce = json.loads(event_row_to_cloudevent_json(r))
    assert ce["time"] == "2024-01-01T03:30:00.000000Z"  # UTC, one Z
    # whole-second UTC-aware input keeps the uniform 6-digit fraction
    r["time"] = dt.datetime(2024, 1, 1, 9, 0, 0, tzinfo=dt.timezone.utc)
    assert json.loads(event_row_to_cloudevent_json(r))["time"] == (
        "2024-01-01T09:00:00.000000Z"
    )


def test_cloudevent_json_non_json_payload():
    r = _row(2, data="plain text")
    r["datacontenttype"] = "text/plain"
    ce = json.loads(event_row_to_cloudevent_json(r))
    assert ce["data"] == "plain text"


def test_lambda_sink_statuses_and_error_model():
    calls = []

    def transport(arn, payload):
        calls.append((arn, payload))
        ce = json.loads(payload)
        if ce["id"] == "1":
            return 200
        if ce["id"] == "2":
            raise TimeoutError("deadline")
        if ce["id"] == "3":
            raise RuntimeError("socket reset")
        return 429

    sink = aws_lambda_sink("arn:aws:lambda:us-east-1:1:function:f", transport=transport)
    statuses = sink([_row(1), _row(2), _row(3), _row(4)])
    assert statuses == [200, ERR_DELIVERY_TIMEOUT, ERR_UNKNOWN, 429]
    assert all(c[0].startswith("arn:aws:lambda") for c in calls)
    assert len(calls) == 4  # per-event Invoke (lambda.go:61: events[0])


def test_gcloud_sink_posts_per_event():
    seen = []

    def transport(url, payload):
        seen.append(url)
        return 204

    sink = gcloud_functions_sink("https://fn.example/x", transport=transport)
    assert sink([_row(1), _row(2)]) == [204, 204]
    assert seen == ["https://fn.example/x"] * 2


def test_grpc_sink_batches_and_fans_status():
    batches = []

    def transport(target, payloads):
        batches.append(len(payloads))
        return 200 if len(batches) == 1 else 503

    sink = grpc_batched_sink("host:1234", transport=transport, batch_size=3)
    statuses = sink([_row(i) for i in range(7)])
    assert batches == [3, 3, 1]
    assert statuses == [200, 200, 200, 503, 503, 503, 503]


def test_grpc_sink_requires_transport():
    with pytest.raises(NotImplementedError):
        grpc_batched_sink("host:1234")


class _FlakyLambdaTransport:
    """Times out for id 2 until healed; 404 for id 3 — drives the full
    retry + DLQ split through the loop."""

    def __init__(self):
        self.healed = False

    def __call__(self, arn, payload):
        ce = json.loads(payload)
        if ce["id"] == "2" and not self.healed:
            raise TimeoutError()
        if ce["id"] == "3":
            return 404
        return 200


def _envelope(spark, rows):
    return spark.createDataFrame(
        [
            (r["id"], r["source"], r["specversion"], r["type"], r["time"],
             r["datacontenttype"], r["dataschema"], r["subject"],
             r["attributes"], r["data"])
            for r in rows
        ],
        "id string, source string, specversion string, type string, "
        "time timestamp, datacontenttype string, dataschema string, "
        "subject string, attributes map<string,string>, data string",
    )


def test_lambda_sink_retry_and_dlq_through_loop(spark):
    transport = _FlakyLambdaTransport()
    sink = aws_lambda_sink("arn:aws:lambda:eu-west-1:1:function:g", transport=transport)
    loop = DeliveryLoop(spark, Subscription.from_spec({}), sink)

    res1 = loop.process_batch(_envelope(spark, [_row(1), _row(2), _row(3)]), T0)
    assert [r.id for r in res1.delivered.collect()] == ["1"]
    # timeout (601) -> retriable, parked with backoff
    pend = loop.pending.collect()
    assert len(pend) == 1 and pend[0].id == "2"
    assert pend[0].attributes["xvanusretryattempts"] == "1"
    # 404 -> dead with Response404
    d = loop.dead.collect()
    assert len(d) == 1 and d[0].id == "3"
    assert d[0].attributes["xvanusdlreason"] == "Response404"

    transport.healed = True
    res2 = loop.process_batch(_envelope(spark, []), T0 + dt.timedelta(seconds=2))
    assert [r.id for r in res2.delivered.collect()] == ["2"]
    assert loop.pending.count() == 0
