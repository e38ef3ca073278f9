"""Distributed 2-D skyline (Pareto-dominance filter).

The skyline keeps every point no other point dominates (>= in both
dimensions, > in at least one) — "best spend AND best activity"
multi-objective reporting. The naive form is a quadratic NOT-EXISTS
self-join; the sorted form is a single global sort. Neither survives
100 TB, so this is the classic two-phase distributed skyline:

1. **Local prune**: points are hash-bucketed and each bucket drops its
   locally-dominated points with one windowed running-max pass — a
   point dominated inside any subset is dominated globally, so pruning
   is sound and runs fully parallel, one shuffle on the bucket key.
2. **Global pass**: the survivors (per-bucket skylines — typically a
   vanishing fraction of the input) take the same running-max pass in
   one partition. The single-task sort now touches only candidate
   points, the same bounded-final-stage argument as every top-k in
   this repo.

The windowed pass: after deduplicating (v1, v2) and sorting
(v1 DESC, v2 DESC), every earlier row has v1' > v1, or v1' = v1 with
v2' > v2; either way it dominates the current row iff its v2' >= v2.
So a row survives iff max(v2) over the preceding rows < v2 — one
running max, no self-join. Integer/exact inputs make the whole
operator engine-portable for a SQL oracle (which can state the
independent NOT-EXISTS form).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def _prune(df: DataFrame, v1: str, v2: str, part_cols: list[str]) -> DataFrame:
    w = Window.partitionBy(*part_cols).orderBy(
        F.col(v1).desc(), F.col(v2).desc()
    ).rowsBetween(Window.unboundedPreceding, -1)
    return (
        df.withColumn("_pmax", F.max(v2).over(w))
        .where(F.col("_pmax").isNull() | (F.col("_pmax") < F.col(v2)))
        .drop("_pmax")
    )


def skyline_2d(
    df: DataFrame, v1: str, v2: str, buckets: int = 32
) -> DataFrame:
    """Rows of ``df`` (one representative per distinct (v1, v2) point
    is NOT taken — all rows carrying a skyline point survive) that no
    other row dominates on (v1, v2), maximizing both."""
    pts = df.select(v1, v2).distinct()
    local = _prune(
        pts.withColumn(
            "_b", F.abs(F.hash(F.col(v1), F.col(v2))) % buckets
        ),
        v1,
        v2,
        ["_b"],
    ).drop("_b")
    sky = _prune(local, v1, v2, [])
    return df.join(sky, [v1, v2])
