"""Pre-join cardinality estimation from per-side key histograms.

The planning question at 100 TB is "how big is this join's OUTPUT and
which keys dominate it?" — answered here WITHOUT running the join:
build a (key, count) histogram per side (one partial-agg groupBy each,
output ~#distinct keys, orders of magnitude smaller than the fact
tables), then join the two histograms (tiny) and fold. ``est_rows``
(the histogram inner product sum cnt_l*cnt_r) is EXACT for an inner
equi-join; ``est_independent`` is the classic textbook estimate
|L|*|R|/max(d_L, d_R) a Selinger-style planner would use with only
distinct counts — reporting both side by side shows how much the key
correlation moves the answer. ``top_key_rows`` is the single hottest
key's output contribution: the number AQE skew-join or salting
decisions key off.

Complements operators/skew.py's per-table skew report: this is the
PER-JOIN view (the product of the two degree distributions), which is
what actually sizes shuffle partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def join_size_estimate(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    join_name: str,
) -> DataFrame:
    """One summary row for the inner equi-join left.left_on = right.right_on.

    Columns: join_name, n_left, n_right, d_left, d_right (row/distinct
    counts per side), est_rows (exact inner-join output size from the
    histogram inner product), est_independent (distinct-count-only
    planner estimate), top_key (hottest key, ties to the largest key),
    top_key_rows (its output contribution).
    """
    hl = left.groupBy(F.col(left_on).cast("string").alias("k")).agg(
        F.count("*").alias("cl")
    )
    hr = right.groupBy(F.col(right_on).cast("string").alias("k")).agg(
        F.count("*").alias("cr")
    )
    totals_l = hl.agg(
        F.sum("cl").alias("n_left"), F.count("*").alias("d_left")
    )
    totals_r = hr.agg(
        F.sum("cr").alias("n_right"), F.count("*").alias("d_right")
    )
    prod = hl.join(hr, "k").select(
        "k", (F.col("cl") * F.col("cr")).alias("out_rows")
    )
    inner = prod.agg(
        F.coalesce(F.sum("out_rows"), F.lit(0)).alias("est_rows"),
        F.max(F.struct("out_rows", "k")).alias("_top"),
    )
    return (
        inner.crossJoin(F.broadcast(totals_l))
        .crossJoin(F.broadcast(totals_r))
        .select(
            F.lit(join_name).alias("join_name"),
            "n_left",
            "n_right",
            "d_left",
            "d_right",
            "est_rows",
            # the cross product is assembled in decimal so the
            # intermediate never overflows long at real row counts;
            # the final estimate is cast back for the report
            F.floor(
                F.col("n_left").cast("decimal(38,0)")
                * F.col("n_right").cast("decimal(38,0)")
                / F.greatest("d_left", "d_right").cast("decimal(38,0)")
            )
            .cast("long")
            .alias("est_independent"),
            F.col("_top.k").alias("top_key"),
            F.col("_top.out_rows").alias("top_key_rows"),
        )
    )


def equi_depth_histogram(
    df: DataFrame,
    val_col: str,
    tiebreak_col: str,
    n_buckets: int = 16,
) -> DataFrame:
    """Exact equi-depth histogram — the per-column statistic a
    cost-based planner keeps next to ndv/min/max (selectivity of a
    range predicate = covered bucket fraction): rows are globally
    ranked by (value, tiebreak) and cut into ``n_buckets`` equal-count
    buckets; each bucket reports its bounds, row count, and distinct
    values.

    Scale shape: the global rank is bus.distributed_row_number's
    two-phase form (range partition -> local rank -> prefix-count
    broadcast), NEVER a single-task window, so the histogram build is
    shuffle-bounded by the range exchange — the same discipline as the
    bus offset assignment. The bucket cut floor(rank * n / total) is
    exact integer arithmetic, so the result is deterministic and
    SQL-restatable (row_number twin).
    """
    from vanus_spark.bus import distributed_row_number

    ranked = distributed_row_number(
        df.select(val_col, tiebreak_col), [], [val_col, tiebreak_col], "_rk"
    )
    total = ranked.agg(F.count("*").alias("_n"))
    # exact INTEGER floor division — a double floor(a/b) can misplace a
    # boundary row when a/b rounds up to the next integer
    bucket = F.expr(f"(_rk * {int(n_buckets)}L) div _n").cast("long")
    return (
        ranked.join(F.broadcast(total))
        .withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.min(val_col).alias("lo"),
            F.max(val_col).alias("hi"),
            F.count("*").alias("n_rows"),
            F.countDistinct(val_col).alias("n_distinct"),
        )
    )
