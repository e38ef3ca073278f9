"""Physical table layout helpers: the storage half of the 100 TB
design.

The operator modules keep repeating two promises — "at scale the bus
is WRITTEN partitioned by eventlog" and "the signature/corpus tables
are stored bucketed by their join key". These helpers make those
layouts real and verifiable:

- ``write_bus_partitioned`` / ``read_bus``: hive-partitioned parquet
  by ``eventlog``; any eventlog-addressed read (get_event, offset
  lookups) prunes partitions at the FILE level — the plan's
  PartitionFilters line, not a post-scan filter.
- ``write_bucketed`` / ``bucketed_table``: catalog tables bucketed +
  sort-ordered by the join key. Two tables bucketed the same way
  co-locate their keys, so equi-joins and groupBys on that key run
  WITHOUT a shuffle exchange — the plan drops the Exchange nodes
  entirely. This is the stored form of the dedup signature /
  embedding tables (join key: doc_id / vec_id / band_key).

Bucketing requires the session catalog (saveAsTable) — plain
``.parquet()`` files carry no bucket metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bus_partitioned(bus: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Persist the addressed bus hive-partitioned by eventlog."""
    bus.write.mode(mode).partitionBy("eventlog").parquet(path)


def read_bus(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned bus; eventlog predicates become partition
    pruning (verify with .explain: PartitionFilters non-empty)."""
    return spark.read.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    mode: str = "overwrite",
) -> None:
    """Persist as a catalog table bucketed AND sorted by the join key
    (sorting makes the per-bucket merge join cheapest)."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
