"""Live HTTP CloudEvents ingest shim (reference:
server/gateway/proxy/proxy.go:166-231 Publish, 526-543 checkExtension).

Covers both HTTP binding content modes, the gateway's validation
rules, delayed-event reroute to the timer bus, ingest-time
addressing, and the spool -> Structured Streaming hand-off.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from vanus_spark.model import ATTR_DELIVERY_TIME, ATTR_EVENTBUS, decode_event_id
from vanus_spark.sources.http_ingest import (
    CloudEventsReceiver,
    InvalidEvent,
    TIMER_BUS,
    parse_cloudevent,
)


def _post(url: str, body: bytes, headers: dict[str, str]):
    req = urllib.request.Request(url, data=body, headers=headers, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=5) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


BINARY_HEADERS = {
    "ce-id": "e1",
    "ce-source": "/unit",
    "ce-specversion": "1.0",
    "ce-type": "test.created",
    "ce-subject": "s1",
    "ce-priority": "7",
    "Content-Type": "application/json",
}


class TestParse:
    def test_binary_mode(self):
        row = parse_cloudevent(BINARY_HEADERS, b'{"k":1}')
        assert row["id"] == "e1" and row["type"] == "test.created"
        assert row["subject"] == "s1"
        assert row["attributes"] == {"priority": "7"}
        assert row["data"] == '{"k":1}'
        assert row["datacontenttype"] == "application/json"

    def test_structured_mode(self):
        body = json.dumps(
            {
                "id": "e2",
                "source": "/unit",
                "specversion": "1.0",
                "type": "test.created",
                "time": "2024-01-02T03:04:05Z",
                "priority": 9,
                "data": {"k": [1, 2]},
            }
        ).encode()
        row = parse_cloudevent(
            {"Content-Type": "application/cloudevents+json"}, body
        )
        assert row["attributes"] == {"priority": "9"}
        assert row["data"] == '{"k":[1,2]}'
        assert row["time"].startswith("2024-01-02T03:04:05")

    def test_missing_required(self):
        h = dict(BINARY_HEADERS)
        del h["ce-source"]
        with pytest.raises(InvalidEvent, match="source"):
            parse_cloudevent(h, b"{}")

    def test_reserved_prefix_rejected(self):
        # proxy.go:526-543 — clients may not set xvanus* attrs...
        h = {**BINARY_HEADERS, "ce-xvanuseventbus": "spoof"}
        with pytest.raises(InvalidEvent, match="xvanus"):
            parse_cloudevent(h, b"")

    def test_delivery_time_allowed_but_validated(self):
        # ...except the delivery-time attr, which must parse RFC3339
        # (proxy.go:202-220, pkg/time.go:35).
        h = {**BINARY_HEADERS, "ce-" + ATTR_DELIVERY_TIME: "2030-01-01T00:00:00Z"}
        row = parse_cloudevent(h, b"")
        assert row["attributes"][ATTR_DELIVERY_TIME] == "2030-01-01T00:00:00Z"
        h[f"ce-{ATTR_DELIVERY_TIME}"] = "tomorrow-ish"
        with pytest.raises(InvalidEvent, match="RFC3339"):
            parse_cloudevent(h, b"")

    def test_bad_extension_name(self):
        h = {**BINARY_HEADERS, "ce-Not_Valid!": "x"}
        with pytest.raises(InvalidEvent, match="attribute name"):
            parse_cloudevent(h, b"")


class TestReceiverEndToEnd:
    def test_publish_accept_reject_and_spool(self, tmp_path, spark):
        from vanus_spark.sources.streams import read_envelope_stream

        with CloudEventsReceiver(str(tmp_path), n_logs=2) as r:
            url = f"{r.url}/gateway/v1/eventbus/unitbus/events"
            # 5 good binary-mode events round-robin over 2 logs
            for i in range(5):
                h = {**BINARY_HEADERS, "ce-id": f"e{i}"}
                code, resp = _post(url, json.dumps({"n": i}).encode(), h)
                assert code == 200
                log, off = decode_event_id(resp["event_id"])
                assert (log, off) == (resp["eventlog"], resp["offset"])
            # one structured-mode event
            body = json.dumps(
                {"id": "s1", "source": "/u", "specversion": "1.0",
                 "type": "t", "data": {"x": 1}}
            ).encode()
            code, _ = _post(url, body, {"Content-Type": "application/cloudevents+json"})
            assert code == 200
            # rejected: spoofed system attr, missing required, bad route
            code, resp = _post(url, b"", {**BINARY_HEADERS, "ce-xvanusspoof": "1"})
            assert code == 400 and "xvanus" in resp["error"]
            code, _ = _post(url, b"", {"ce-id": "x", "Content-Type": "text/plain"})
            assert code == 400
            code, _ = _post(f"{r.url}/other", b"", BINARY_HEADERS)
            assert code == 404
            # delayed event -> timer bus, origin stamped
            h = {**BINARY_HEADERS, "ce-id": "d1",
                 "ce-" + ATTR_DELIVERY_TIME: "2030-01-01T00:00:00Z"}
            code, resp = _post(url, b"{}", h)
            assert code == 200 and resp["eventbus"] == TIMER_BUS
            r.flush()

            # spool -> Spark: batch read of the landing dir
            main = spark.read.schema(
                "id STRING, source STRING, specversion STRING, type STRING, "
                "time TIMESTAMP, datacontenttype STRING, dataschema STRING, "
                "subject STRING, attributes MAP<STRING,STRING>, data STRING, "
                "eventlog LONG, offset LONG"
            ).json(str(tmp_path / "unitbus"))
            rows = {x["id"]: x for x in main.collect()}
            assert set(rows) == {"e0", "e1", "e2", "e3", "e4", "s1"}
            assert rows["e0"]["attributes"][ATTR_EVENTBUS] == "unitbus"
            # ingest-assigned addresses: round-robin logs, dense offsets
            assert sorted(x["eventlog"] for x in rows.values()) == [0, 0, 0, 1, 1, 1]
            timer = spark.read.json(str(tmp_path / TIMER_BUS))
            t = timer.collect()
            assert [x["id"] for x in t] == ["d1"]

            # spool -> Structured Streaming with the stock reader
            stream = read_envelope_stream(spark, str(tmp_path / "unitbus"), "json")
            assert stream.isStreaming
            q = (
                stream.writeStream.format("memory")
                .queryName("http_ingest_t")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(60)
            got = spark.sql("select count(*) c from http_ingest_t").collect()[0]["c"]
            assert got == 6

    def test_concurrent_offsets_dense(self, tmp_path):
        """Offsets stay dense per (bus, log) under concurrent POSTs."""
        import concurrent.futures

        with CloudEventsReceiver(str(tmp_path), n_logs=4) as r:
            url = f"{r.url}/gateway/v1/eventbus/c/events"

            def send(i):
                return _post(url, b"{}", {**BINARY_HEADERS, "ce-id": f"e{i}"})

            with concurrent.futures.ThreadPoolExecutor(8) as ex:
                out = list(ex.map(send, range(40)))
            assert all(code == 200 for code, _ in out)
            by_log: dict[int, list[int]] = {}
            for _, resp in out:
                by_log.setdefault(resp["eventlog"], []).append(resp["offset"])
            assert len(by_log) == 4
            for offs in by_log.values():
                assert sorted(offs) == list(range(10))
