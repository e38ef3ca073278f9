"""SparkSession factory with scale-oriented defaults.

Local testing runs on local[N]; the same config block is what we'd
ship to a 1000-executor cluster (AQE, skew-join handling, Arrow for
the pandas paths, UTC session timezone for oracle comparability).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "vanus_spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # ~1 shuffle partition per core locally; on a real cluster this
        # would be cores*2-3 or left to AQE coalescing.
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _quiet_bounded_window_warning(spark)
    return spark


def _quiet_bounded_window_warning(spark: SparkSession) -> None:
    """Silence WindowExec's "No Partition Defined" warning.

    Every no-partition window in this repo runs over an audited
    BOUNDED frame (top-k survivors after TakeOrderedAndProject,
    sketch candidate sets capped at capacity*partitions, #slices-row
    prefix aggregates, TPC-H top-k over small aggregates — round-6
    verdict audit), so the per-query warning is pure noise that
    floods the bench stderr tail the driver captures. Corpus-sized
    global windows stay forbidden by design (the two-phase
    distributed rank in bus.py is the scale path); the plan-audit
    tests, not this log line, are the guard. Catalyst constant-folds
    a literal partition key away, so partitionBy(lit(0)) cannot
    suppress it — the logger level is the only lever."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.sql.execution.window.WindowExec",
            jvm.org.apache.logging.log4j.Level.ERROR,
        )
    except Exception:
        pass  # non-log4j2 deployments keep the warning; cosmetic only
