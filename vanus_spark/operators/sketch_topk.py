"""Approximate heavy hitters: Misra-Gries candidates + exact recount.

The exact top-k-frequent-items query shuffles EVERY distinct value —
at 100 TB of tokens that is the corpus vocabulary, and the shuffle is
the bottleneck. The sketch shape used here is the scale-correct
two-phase pattern:

1. per-partition Misra-Gries summaries (capacity ``m``, O(m) memory,
   one pass, Arrow-batched ``mapInPandas``) produce a CANDIDATE set;
   the standard guarantee is that any item with global frequency
   > n/m survives in at least one partition's summary, so for a
   sufficiently separated distribution the true top-k is contained in
   the candidates (tests assert the margin on the fixture);
2. the exact counts of ONLY the candidates are computed with one
   broadcast semi-join + partial aggregate — the shuffle carries at
   most ``m * num_partitions`` distinct keys instead of the vocabulary.

The emitted counts are EXACT (the second pass), so the result is
oracle-comparable against plain SQL top-k; the sketch controls cost,
not correctness, provided the candidate set covers the true top-k.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def _misra_gries_partition(
    batches: Iterator[pd.DataFrame], capacity: int
) -> Iterator[pd.DataFrame]:
    counters: dict[str, int] = {}
    for pdf in batches:
        for v in pdf["value"]:
            if v in counters:
                counters[v] += 1
            elif len(counters) < capacity:
                counters[v] = 1
            else:
                # decrement-all step; drop zeros
                dead = []
                for key in counters:
                    counters[key] -= 1
                    if counters[key] == 0:
                        dead.append(key)
                for key in dead:
                    del counters[key]
    yield pd.DataFrame({"value": list(counters.keys())})


def heavy_hitters(
    df: DataFrame, col: str, k: int = 20, capacity: int = 2048
) -> DataFrame:
    """Top-``k`` most frequent values of ``col`` with EXACT counts:
    (value, cnt, rank). ``capacity`` is the per-partition Misra-Gries
    size; items with global frequency > n/capacity are guaranteed
    candidates."""
    values = df.select(F.col(col).cast("string").alias("value"))
    candidates = (
        values.mapInPandas(
            lambda it: _misra_gries_partition(it, capacity),
            schema="value string",
        )
        .distinct()
    )
    exact = (
        values.join(F.broadcast(candidates), "value", "left_semi")
        .groupBy("value")
        .agg(F.count("*").alias("cnt"))
    )
    # global window over the CANDIDATE set only — bounded by
    # capacity * num_partitions rows, never the vocabulary
    w = Window.orderBy(F.col("cnt").desc(), F.col("value"))
    return (
        exact.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
    )
