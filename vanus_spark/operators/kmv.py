"""KMV (k-minimum-values) distinct sketch with set-operation support.

HLL (hll.py) answers per-group cardinality but cannot estimate
INTERSECTIONS well; the KMV sketch — the k smallest hash values of a
set — supports union natively (k smallest of the concatenation) and
from there Jaccard / intersection estimates: with K the k smallest of
A ∪ B, J_est = |K ∩ A ∩ B| / |K| (Beyer et al., "On synopses for
distinct-value estimation under multiset operations"). The distinct
estimate is (k-1) * H / h_k for hash range H.

Build shape (the Misra-Gries two-phase pattern, sketch_topk.py):

1. per-partition k-smallest via a bounded heap in Arrow-batched
   ``mapInPandas`` — O(k) state per (group, partition), one pass;
2. exact global k-smallest over the candidates only (window over
   <= k * num_partitions rows, never the distinct-value set).

The two-phase selection is EXACT (the k smallest of a union of
per-partition k-smallest supersets the global k smallest), so a SQL
oracle can restate the sketch as a plain row_number over distinct
hashes — every value in the result is engine-portable integer logic
until the single final division.
"""

from __future__ import annotations

import heapq
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from vanus_spark.llm.dedup import md5_long

#: md5_long yields 60-bit hashes: the estimator's hash-range constant.
KMV_RANGE = float(2**60)


def _kmv_partition(
    batches: Iterator[pd.DataFrame], k: int
) -> Iterator[pd.DataFrame]:
    # per-group max-heap (negated) of the k smallest distinct hashes
    heaps: dict[str, list[int]] = {}
    seen: dict[str, set[int]] = {}
    for pdf in batches:
        for g, h in zip(pdf["g"], pdf["h"]):
            s = seen.setdefault(g, set())
            if h in s:
                continue
            hp = heaps.setdefault(g, [])
            if len(hp) < k:
                heapq.heappush(hp, -h)
                s.add(h)
            elif h < -hp[0]:
                s.discard(-heapq.heappushpop(hp, -h))
                s.add(h)
    yield pd.DataFrame(
        {
            "g": [g for g, hp in heaps.items() for _ in hp],
            "h": [-x for hp in heaps.values() for x in hp],
        }
    )


def kmv_sketch(
    df: DataFrame, value_col: str, group_col: str, k: int = 64
) -> DataFrame:
    """(g, h): the k smallest distinct 60-bit hashes per group —
    <= k rows per group, mergeable by union + re-selection."""
    hashed = df.select(
        F.col(group_col).cast("string").alias("g"),
        md5_long(F.col(value_col)).alias("h"),
    )
    cand = hashed.mapInPandas(
        lambda it: _kmv_partition(it, k), schema="g string, h long"
    ).distinct()
    w = Window.partitionBy("g").orderBy("h")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


def kmv_distinct_estimate(sketch: DataFrame, k: int = 64) -> DataFrame:
    """(g, n_sketch, distinct_est): (k-1) * H / h_k when the sketch is
    full; an under-full sketch saw every distinct value, so the count
    is exact."""
    agg = sketch.groupBy("g").agg(
        F.count("*").alias("n_sketch"), F.max("h").alias("h_k")
    )
    est = F.when(
        F.col("n_sketch") < k, F.col("n_sketch").cast("double")
    ).otherwise(
        F.lit(float(k - 1) * KMV_RANGE) / F.col("h_k").cast("double")
    )
    return agg.select("g", "n_sketch", est.alias("distinct_est"))


def kmv_jaccard_pairs(sketch: DataFrame, k: int = 64) -> DataFrame:
    """(g_a, g_b, kk, inter, j_est) for every unordered group pair:
    the union's k smallest hashes (kk = their count, < k when the pair
    is small), how many of them belong to BOTH sketches, and the
    Jaccard estimate inter / kk. All joins run on the bounded sketch
    table."""
    groups = sketch.select("g").distinct()
    pairs = (
        groups.select(F.col("g").alias("g_a"))
        .join(groups.select(F.col("g").alias("g_b")))
        .where(F.col("g_a") < F.col("g_b"))
    )
    side = sketch.select("g", "h")
    memb = (
        pairs.join(side, pairs.g_a == side.g)
        .select("g_a", "g_b", "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
        .unionByName(
            pairs.join(side, pairs.g_b == side.g).select(
                "g_a", "g_b", "h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b")
            )
        )
        .groupBy("g_a", "g_b", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    w = Window.partitionBy("g_a", "g_b").orderBy("h")
    topk = memb.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)
    return topk.groupBy("g_a", "g_b").agg(
        F.count("*").alias("kk"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("inter"),
    ).select(
        "g_a",
        "g_b",
        "kk",
        "inter",
        (F.col("inter").cast("double") / F.col("kk")).alias("j_est"),
    )
