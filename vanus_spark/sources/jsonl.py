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
    cache: bool = False,
) -> JsonlRead:
    """Read a JSONL document corpus. Returns (docs, bad): well-formed
    rows with the declared schema, and quarantined raw lines for
    malformed input.

    The scan is a TEXT read + ``from_json``: same Jackson parse cost
    as the native json source, but free of the raw-JSON-scan
    corrupt-column restriction (QUERY_ONLY_CORRUPT_RECORD_COLUMN), so
    neither branch forces materialization and the quarantined line is
    the literal input line. ``cache=True`` optionally pins the parsed
    frame so consuming BOTH branches parses each line once — callers
    own the unpersist (``r.docs.unpersist()`` releases it; the
    branches share the plan). The default does NOT cache: pinning a
    corpus-sized parse for the whole session is wrong at scale, and
    consuming a single branch costs one parse pass either way.
    """
    raw = spark.read.text(path).where(F.trim("value") != "")
    parsed = raw.select(
        "value",
        F.from_json(
            F.col("value"),
            schema + f", {_CORRUPT} string",
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT},
        ).alias("j"),
    )
    if cache:
        parsed = parsed.cache()
    docs = parsed.where(F.col(f"j.{_CORRUPT}").isNull()).select("j.*").drop(_CORRUPT)
    bad = parsed.where(F.col(f"j.{_CORRUPT}").isNotNull()).select(
        F.col("value").alias("raw_line")
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
