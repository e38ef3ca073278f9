"""Range (interval) join: pair rows whose numeric/time values fall
within a distance of each other, without the O(n·m) blow-up.

Naive ``a JOIN b ON abs(a.v - b.v) <= w`` forces a broadcast
nested-loop or cartesian plan. The bucketized form joins on
``floor(v / w)`` equality against each of the 3 adjacent buckets, then
re-applies the exact predicate — candidates are only same-or-adjacent
bucket pairs, so the join is an equi-join (shuffle-hash / sort-merge,
AQE-skew-safe) and the per-row candidate set is bounded by bucket
occupancy rather than table size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def range_join_buckets(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    right_val: str,
    width: float,
) -> DataFrame:
    """All (left, right) pairs with |left_val - right_val| <= width.
    Output: left columns + right columns (right's prefixed ``r_``)."""
    lb = left.withColumn("_bucket", F.floor(F.col(left_val) / F.lit(width)))
    rb = right.select(
        *[F.col(c).alias(f"r_{c}") for c in right.columns],
        F.explode(
            F.array(
                F.floor(F.col(right_val) / F.lit(width)) - 1,
                F.floor(F.col(right_val) / F.lit(width)),
                F.floor(F.col(right_val) / F.lit(width)) + 1,
            )
        ).alias("_bucket"),
    )
    joined = lb.join(rb, "_bucket").where(
        F.abs(F.col(left_val) - F.col(f"r_{right_val}")) <= width
    )
    return joined.drop("_bucket")
