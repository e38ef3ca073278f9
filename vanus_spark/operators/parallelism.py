"""Adaptive source-parallelism guard.

A heavy per-row chain (shingling, hashing, regex scoring) is bounded
by the SCAN's partition count, not the cluster's: a small fixture —
or any single-file table — arrives as one partition and serializes
the whole map phase into one task. On a real 100 TB table the scan
already carries thousands of splits, so widening is a no-op there;
the guard only pays a (cheap, row-preserving) round-robin exchange
when the source is narrower than the cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def repartition_for_compute(df: DataFrame, *cols: str) -> DataFrame:
    """Widen ``df`` to the session's default parallelism iff its
    current partitioning is materially narrower (< half). With
    ``cols``, hash-partition on those columns so a later join/groupBy
    on the same keys reuses the exchange; otherwise round-robin.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= max(1, target // 2):
        return df
    return df.repartition(target, *cols) if cols else df.repartition(target)
