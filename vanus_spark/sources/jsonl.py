"""JSONL document corpus I/O — the interchange format training-data
pipelines actually exchange (one JSON object per line, gz-shardable).

Readers keep Spark-native behavior where it matters at scale:

- an EXPLICIT schema (never inference — schema inference reads the
  whole input once before the real scan),
- PERMISSIVE mode with a corrupt-record sidecar, so one malformed
  line quarantines instead of failing a 100 TB job; ``bad`` rows
  carry the raw line for a DLQ-style reprocess,
- compression is transparent (.gz/.zst per Spark's codecs), and the
  reader parallelizes per file — shard the corpus, get parallelism.

Writers emit one JSON object per line via the native json writer
(whole-stage codegen'd StructsToJson, no Python in the path).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

DOCUMENT_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)
_CORRUPT = "_corrupt_record"


@dataclass
class JsonlRead:
    docs: DataFrame
    bad: DataFrame


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    schema: str = DOCUMENT_SCHEMA,
) -> JsonlRead:
    """Read a JSONL document corpus. Returns (docs, bad): well-formed
    rows with the declared schema, and quarantined raw lines for
    malformed input."""
    # Spark forbids queries that prune down to ONLY the corrupt-record
    # column of a raw JSON scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN); the
    # documented remedy is materializing the parsed frame. cache() here
    # is per-ingest-shard state; at 100 TB the split is written in the
    # same pass (both branches from one staged scan), never re-parsed.
    raw = spark.read.schema(schema + f", {_CORRUPT} string").json(path).cache()
    docs = raw.where(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    bad = raw.where(F.col(_CORRUPT).isNotNull()).select(
        F.col(_CORRUPT).alias("raw_line")
    )
    return JsonlRead(docs=docs, bad=bad)


def write_documents_jsonl(
    docs: DataFrame, path: str, mode: str = "overwrite", compression: str | None = None
) -> None:
    """One JSON object per line, one shard per partition (repartition
    upstream to control shard count/size)."""
    w = docs.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)
