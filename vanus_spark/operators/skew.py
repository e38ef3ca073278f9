"""Skew mitigation helpers.

AQE's skew-join handling (on in our session defaults) covers join
skew at runtime; these helpers cover the aggregation/window cases AQE
doesn't: a hot group key (e.g. one boilerplate LSH bucket holding 1%
of a 100 TB corpus) serializing into one task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted(df: DataFrame, key_cols: list[str], buckets: int = 16) -> DataFrame:
    """Append a deterministic salt in [0, buckets) derived from the
    row content — two-phase aggregations then group by
    (key..., _salt) first, merge partials second."""
    salt = F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(buckets))
    return df.withColumn("_salt", salt)


def two_phase_count(df: DataFrame, key_cols: list[str], buckets: int = 16) -> DataFrame:
    """Skew-proof count per key: pre-aggregate per (key, salt), then
    merge. The first shuffle spreads a hot key over ``buckets`` tasks;
    the second handles at most ``buckets`` rows per key."""
    partial = (
        salted(df, key_cols, buckets)
        .groupBy(*key_cols, "_salt")
        .agg(F.count("*").alias("_c"))
    )
    return partial.groupBy(*key_cols).agg(F.sum("_c").alias("count"))


def explode_hot_keys(
    df: DataFrame, key_col: str, hot_keys: list, replicas: int = 8
) -> tuple[DataFrame, Column]:
    """Join-side salting: replicate build-side rows of known-hot keys
    ``replicas`` times with a replica id, and return the probe-side
    salt expression to join against. Classic hot-key join salting for
    when AQE can't help (e.g. broadcast threshold exceeded)."""
    replica_ids = F.when(
        F.col(key_col).isin(*hot_keys),
        F.sequence(F.lit(0), F.lit(replicas - 1)),
    ).otherwise(F.array(F.lit(0)))
    replicated = df.withColumn("_replica", F.explode(replica_ids))
    probe_salt = F.when(
        F.col(key_col).isin(*hot_keys),
        F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(replicas)),
    ).otherwise(F.lit(0))
    return replicated, probe_salt


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    key_col: str,
    hot_keys: list,
    replicas: int = 8,
    how: str = "inner",
) -> DataFrame:
    """End-to-end hot-key salted equi-join: the build side's hot-key
    rows are replicated ``replicas`` times, the probe side picks a
    replica pseudo-randomly, and the join runs on (key, replica) — a
    hot key's probe rows spread over ``replicas`` tasks instead of
    serializing into one. The RESULT is identical to
    ``probe.join(build, key_col, how)`` (each probe row matches
    exactly the replica it picked), so correctness is salt-invariant
    even though the replica assignment itself is not deterministic.

    For when AQE's skew-join split can't help: a hot PARTITION it can
    re-split, but a single hot KEY inside one task it cannot. Use with
    a build side too large to broadcast; otherwise just broadcast."""
    replicated, probe_salt = explode_hot_keys(build, key_col, hot_keys, replicas)
    return (
        probe.withColumn("_replica", probe_salt)
        .join(replicated, [key_col, "_replica"], how)
        .drop("_replica")
    )
