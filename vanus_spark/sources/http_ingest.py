"""Live HTTP CloudEvents ingest shim — the reference's front door.

The reference gateway accepts CloudEvents over HTTP (binary and
structured content modes), validates them, stamps the target eventbus,
reroutes delayed events to the timer eventbus, and appends to the bus
(reference: server/gateway/proxy/proxy.go:166-231 ``Publish``,
proxy.go:526-543 ``checkExtension``, pkg/time.go:22-37 RFC3339
delivery-time parsing, proxy.go:640-690 ``receive``).

Spark-first shape: an HTTP receiver cannot live *inside* a Spark job —
Structured Streaming pulls from replayable sources. So the shim is the
standard landing-zone pattern:

    HTTP POST -> validate -> spool (atomic JSON-lines files, one dir
    per eventbus) -> ``spark.readStream.schema(...).json(spool)``

At 100 TB the receiver is a stateless fleet writing to Kafka (the
``read_kafka_stream`` reader in streams.py is the drop-in); the spool
dir is the jar-free stand-in with identical semantics: offsets are
assigned at ingest (per-log monotonic counters — exactly the
reference's per-writer round-robin policy,
client/pkg/policy/policy.go:25-57), so downstream NEVER re-sorts the
bus to reconstruct addresses. Files are written tmp-then-rename so the
streaming file source never observes a partial file.

Wire formats (CloudEvents HTTP protocol binding):
- binary mode: attributes in ``ce-*`` headers, payload is the body;
- structured mode: ``Content-Type: application/cloudevents+json``,
  body is the event JSON (``data`` or base64 ``data_base64``).
"""

from __future__ import annotations

import json
import os
import re
import threading
import uuid
from datetime import datetime, timezone
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any

from vanus_spark.model import (
    ATTR_DELIVERY_TIME,
    ATTR_EVENTBUS,
    SPEC_ATTRIBUTES,
    encode_event_id,
    validate_extension_attr_name,
)

TIMER_BUS = "__Timer_RS"  # reference: primitive.TimerEventbusName

_RFC3339_RE = re.compile(
    r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(\.\d+)?(Z|[+-]\d{2}:\d{2})$"
)


class InvalidEvent(ValueError):
    """400-level rejection (reference: ErrInvalidArgument)."""


def _parse_rfc3339(s: str) -> datetime:
    """RFC3339 only — the reference's single accepted layout
    (pkg/time.go:22-37); anything else is a 400."""
    if not _RFC3339_RE.match(s):
        raise InvalidEvent(f"invalid RFC3339 time: {s!r}")
    return datetime.fromisoformat(s.replace("Z", "+00:00"))


def check_extensions(attrs: dict[str, Any]) -> None:
    """reference: proxy.go:526-543 checkExtension + pkg/event.go:17-32
    name rule — ``xvanus*`` names are reserved for the system (only
    the delivery-time attr may be supplied by clients)."""
    for name in attrs:
        if name == ATTR_DELIVERY_TIME:
            continue
        if name.startswith("xvanus"):
            raise InvalidEvent(f"invalid ce attribute [{name}] prefix xvanus")
        if not validate_extension_attr_name(name):
            raise InvalidEvent(f"invalid ce attribute name [{name}]")


def parse_cloudevent(headers: dict[str, str], body: bytes) -> dict[str, Any]:
    """Parse one HTTP request into an envelope row (model.py
    ENVELOPE_SCHEMA shape, ``time`` as RFC3339 string).

    Dispatches on content mode per the CloudEvents HTTP binding; the
    reference gets this from the CE SDK's protocol layer, so behavior
    (not code) is mirrored here.
    """
    hdrs = {k.lower(): v for k, v in headers.items()}
    ctype = hdrs.get("content-type", "")
    if ctype.split(";")[0].strip() == "application/cloudevents+json":
        try:
            obj = json.loads(body.decode("utf-8"))
        except (UnicodeDecodeError, json.JSONDecodeError) as e:
            raise InvalidEvent(f"bad structured event: {e}") from e
        if not isinstance(obj, dict):
            raise InvalidEvent("structured event must be a JSON object")
        attrs = {k: v for k, v in obj.items() if k not in ("data", "data_base64")}
        if "data_base64" in obj:
            import base64

            data = base64.b64decode(obj["data_base64"]).decode("utf-8", "replace")
        else:
            d = obj.get("data")
            data = d if isinstance(d, str) else (
                None if d is None else json.dumps(d, separators=(",", ":"))
            )
    else:
        attrs = {
            k[3:]: v for k, v in hdrs.items() if k.startswith("ce-")
        }
        data = body.decode("utf-8", "replace") if body else None
        if ctype and "datacontenttype" not in attrs:
            attrs["datacontenttype"] = ctype

    for req in ("id", "source", "specversion", "type"):
        v = attrs.get(req)
        if not v or not isinstance(v, str):
            raise InvalidEvent(f"missing required attribute {req}")

    spec = {k: attrs.pop(k) for k in list(attrs) if k in SPEC_ATTRIBUTES}
    ext = {k: str(v) for k, v in attrs.items()}
    check_extensions(ext)
    if "time" in spec:
        spec["time"] = _parse_rfc3339(str(spec["time"])).astimezone(
            timezone.utc
        ).isoformat()
    if ATTR_DELIVERY_TIME in ext:
        _parse_rfc3339(ext[ATTR_DELIVERY_TIME])  # validate, keep as string

    return {
        "id": spec["id"],
        "source": spec["source"],
        "specversion": spec["specversion"],
        "type": spec["type"],
        "time": spec.get("time"),
        "datacontenttype": spec.get("datacontenttype"),
        "dataschema": spec.get("dataschema"),
        "subject": spec.get("subject"),
        "attributes": ext,
        "data": data,
    }


class SpoolWriter:
    """Per-eventbus append spool with ingest-time addressing.

    Each accepted event gets ``eventlog`` from a per-writer round-robin
    counter (policy.go:25-57) and ``offset`` from a per-log monotonic
    counter — the ingest-assigned offsets that make downstream
    address reconstruction a no-op at any scale. One JSON-lines file
    per flush, written tmp-then-rename (atomic for the file source).
    """

    def __init__(self, root: str, n_logs: int = 4):
        self.root = root
        self.n_logs = n_logs
        self._lock = threading.Lock()
        self._rr = 0
        self._offsets: dict[tuple[str, int], int] = {}
        self._buffers: dict[str, list[str]] = {}

    def append(self, bus: str, row: dict[str, Any]) -> tuple[int, int]:
        with self._lock:
            log = self._rr % self.n_logs
            self._rr += 1
            off = self._offsets.get((bus, log), 0)
            self._offsets[(bus, log)] = off + 1
            row = {**row, "eventlog": log, "offset": off}
            self._buffers.setdefault(bus, []).append(
                json.dumps(row, ensure_ascii=False, separators=(",", ":"))
            )
            return log, off

    def flush(self) -> list[str]:
        """Write buffered events, one file per bus; returns paths."""
        with self._lock:
            buffers, self._buffers = self._buffers, {}
        paths = []
        for bus, lines in buffers.items():
            d = os.path.join(self.root, bus)
            os.makedirs(d, exist_ok=True)
            name = f"batch-{uuid.uuid4().hex}.json"
            tmp = os.path.join(d, "." + name + ".tmp")
            final = os.path.join(d, name)
            with open(tmp, "w", encoding="utf-8") as f:
                f.write("\n".join(lines) + "\n")
            os.replace(tmp, final)
            paths.append(final)
        return paths


class _Handler(BaseHTTPRequestHandler):
    server: "CloudEventsReceiver"

    def log_message(self, *a):  # noqa: D102 — quiet
        pass

    def do_POST(self):  # noqa: N802 — http.server API
        m = re.match(r"^/gateway/v1/eventbus/([^/]+)/events/?$", self.path)
        if not m:
            self._reply(404, {"error": f"no such route {self.path}"})
            return
        bus = m.group(1)
        # gateway auth (reference: the gateway authenticates the Bearer
        # token and authorizes eventbus:write before accepting a
        # publish; pkg/interceptor wires this in front of Publish)
        if self.server.guard is not None:
            auth = self.headers.get("Authorization") or ""
            if not auth.startswith("Bearer "):
                self._reply(401, {"error": "missing bearer token"})
                return
            try:
                self.server.guard(auth[len("Bearer ") :], bus)
            except PermissionError as e:
                self._reply(403, {"error": str(e)})
                return
            except Exception as e:
                self._reply(401, {"error": str(e)})
                return
        length = int(self.headers.get("Content-Length") or 0)
        body = self.rfile.read(length) if length else b""
        try:
            row = parse_cloudevent(dict(self.headers.items()), body)
        except InvalidEvent as e:
            self._reply(400, {"error": str(e)})
            return
        # Stamp the origin bus; delayed events reroute to the timer
        # bus carrying it (proxy.go:199-231).
        row["attributes"] = {**row["attributes"], ATTR_EVENTBUS: bus}
        target = TIMER_BUS if ATTR_DELIVERY_TIME in row["attributes"] else bus
        log, off = self.server.spool.append(target, row)
        self._reply(
            200,
            {"eventbus": target, "event_id": encode_event_id(log, off),
             "eventlog": log, "offset": off},
        )

    def _reply(self, code: int, obj: dict) -> None:
        payload = json.dumps(obj).encode("utf-8")
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)


class CloudEventsReceiver(ThreadingHTTPServer):
    """Embeddable ingest endpoint: ``with CloudEventsReceiver(dir) as
    r: POST to r.url`` then read the spool with
    ``read_envelope_stream(spark, f"{dir}/{bus}", "json")``.

    Daemon-threaded; ``flush()`` makes buffered events visible to the
    file source. In production this process is N stateless replicas
    behind a load balancer writing to Kafka — nothing here holds state
    beyond per-writer counters, the same statelessness the reference's
    gateway has (its offsets come from the store append, ours from the
    ingest counter)."""

    daemon_threads = True

    def __init__(
        self,
        spool_dir: str,
        n_logs: int = 4,
        host: str = "127.0.0.1",
        port: int = 0,
        guard=None,
    ):
        self.spool = SpoolWriter(spool_dir, n_logs)
        # guard(token, bus_name) -> None; PermissionError => 403, any
        # other exception => 401 (invalid/revoked token). None = open
        # gateway (the default for tests and trusted-network spools).
        self.guard = guard
        super().__init__((host, port), _Handler)
        self._thread: threading.Thread | None = None

    @property
    def url(self) -> str:
        return f"http://{self.server_address[0]}:{self.server_address[1]}"

    def start(self) -> "CloudEventsReceiver":
        self._thread = threading.Thread(target=self.serve_forever, daemon=True)
        self._thread.start()
        return self

    def flush(self) -> list[str]:
        return self.spool.flush()

    def stop(self) -> None:
        self.shutdown()
        if self._thread:
            self._thread.join(timeout=5)
        self.server_close()
        self.spool.flush()

    def __enter__(self) -> "CloudEventsReceiver":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()
