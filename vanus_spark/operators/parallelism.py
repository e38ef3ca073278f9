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

    Width is estimated WITHOUT touching ``df.rdd`` (which forces a
    plan-to-RDD physical translation per call): a frame whose
    analyzed logical plan already contains a shuffle-inducing node
    (join / aggregate / repartition / window / sort) runs at the
    session's shuffle width — leave it alone; otherwise the frame is
    a narrow chain over its scan, and its width is the scan's file
    count (``inputFiles()``, a driver-side file-index lookup). One
    file can carry several splits, so this under-counts wide
    single-file scans; that only risks one cheap row-preserving
    exchange, never lost parallelism. In-memory fixtures
    (createDataFrame, no files, no shuffle) are narrow — widen them.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    try:
        plan = df._jdf.queryExecution().analyzed().toString()
    except Exception:  # pragma: no cover — connect-only sessions
        plan = ""
    if any(
        node in plan
        for node in ("Join", "Aggregate", "Repartition", "Window", "Sort", "Deduplicate")
    ):
        return df
    try:
        width = len(df.inputFiles())
    except Exception:
        width = 0
    if width >= max(1, target // 2):
        return df
    return df.repartition(target, *cols) if cols else df.repartition(target)
