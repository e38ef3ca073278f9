"""Streaming sources/sinks for the eventbus.

The reference ingests CloudEvents over HTTP/gRPC and delivers to
HTTP/gRPC/FaaS sinks. In Spark terms the ingest side is any
``readStream`` source producing the envelope schema; delivery is the
DeliveryLoop's pluggable sink. This module provides:

- envelope readers for parquet/JSON-lines directories (the file-bus —
  what the test image supports),
- a Kafka reader (gated: the connector jar isn't in this image),
- sink factories: an HTTP webhook sink (gated on ``requests``) and a
  collecting sink for tests.

At scale the bus IS Kafka (or a cloud log service): `(topic-partition,
offset)` maps 1:1 to the reference's `(eventlog, offset)`, and
Structured Streaming's checkpointing replaces its committed-offset
store.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from vanus_spark.model import ENVELOPE_SCHEMA


def read_envelope_stream(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """File-bus reader: a directory of parquet/JSON-lines envelope
    rows as a streaming DataFrame."""
    reader = spark.readStream.schema(ENVELOPE_SCHEMA)
    if fmt == "parquet":
        return reader.parquet(path)
    if fmt == "json":
        return reader.json(path)
    raise ValueError(f"unsupported stream format {fmt}")


def read_kafka_stream(
    spark: SparkSession, bootstrap: str, topic: str, starting_offsets: str = "latest"
) -> DataFrame:
    """Kafka bus reader: value is the JSON-serialized envelope.
    Requires the spark-sql-kafka connector jar (not in this image)."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    parsed = raw.select(
        F.from_json(F.col("value").cast("string"), ENVELOPE_SCHEMA).alias("e"),
        F.col("partition").cast("long").alias("eventlog"),
        F.col("offset").alias("offset"),
    )
    return parsed.select("e.*", "eventlog", "offset")


def http_webhook_sink(url: str, timeout_s: float = 5.0) -> Callable[[list[dict[str, Any]]], list[int]]:
    """POST each event to a webhook (reference: server/trigger/client/
    http.go). Returns per-event HTTP status codes, which feed the
    retry/DLQ router. Gated on ``requests`` being importable."""
    try:
        import requests  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "http sink needs the 'requests' package (not in this image); "
            "use a custom sink_fn"
        ) from e

    def sink(rows: list[dict[str, Any]]) -> list[int]:
        import requests

        out = []
        for r in rows:
            try:
                resp = requests.post(
                    url,
                    data=r.get("data") or "",
                    headers={
                        "Content-Type": r.get("datacontenttype") or "application/json",
                        "ce-id": str(r.get("id")),
                        "ce-source": str(r.get("source")),
                        "ce-type": str(r.get("type")),
                        "ce-specversion": str(r.get("specversion")),
                    },
                    timeout=timeout_s,
                )
                out.append(resp.status_code)
            except Exception:  # noqa: BLE001 — network error == retriable 5xx
                out.append(503)
        return out

    return sink


class CollectingSink:
    """Test double: records delivered payloads (executor-side lists
    won't aggregate across processes — use only with local[1] tests
    or for per-batch assertions via the returned statuses)."""

    def __init__(self, status: int = 200):
        self.status = status

    def __call__(self, rows: list[dict[str, Any]]) -> list[int]:
        return [self.status] * len(rows)
