"""Nonparametric rank tests.

Mann-Whitney U (Wilcoxon rank-sum) — the distribution-free two-sample
test run when an A/B metric is heavy-tailed enough that Welch's t
(operator: the q_events_ab_test readout) is driven by outliers.

Reference parity: the reference event engine has no statistics surface
(SURVEY §2.6-2.8 absences); this extends the A/B-stats family the
Spark port adds.

Scale shape: global average ranks come from the two-phase distributed
rank (bus.distributed_row_number: range exchange -> local rank ->
broadcast prefix) — never a single-task global window — followed by
one groupBy(value) tie collapse and a 1-row final fold. Two shuffles
total, both map-side combined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def mann_whitney_u(
    samples: DataFrame,
    value_col: str,
    group_col: str,
    id_col: str,
) -> DataFrame:
    """One-row (n_a, n_b, u_a, z, rank_biserial) Mann-Whitney U test.

    ``group_col`` must be 0/1 (group A = 0). Ties get average ranks
    (the tie group's mean rank times its per-group counts IS the rank
    sum — no per-row correction pass); the z statistic uses the
    standard tie-corrected variance
    sigma^2 = (n_a*n_b/12) * ((N+1) - sum(t^3-t)/(N(N-1))).
    ``id_col`` breaks rank ties deterministically (required by
    distributed_row_number; the average-rank collapse makes the
    tiebreak order irrelevant to the result).

    The cubic tie term stays in exact long arithmetic — exact up to
    tie groups of ~2M rows (2M^3 < 2^63), far beyond any real metric
    lattice bucket; past that, pre-bucket the metric.
    """
    from vanus_spark.bus import distributed_row_number

    ranked = distributed_row_number(samples, [], [value_col, id_col], "_rk")
    grp = ranked.groupBy(value_col).agg(
        F.avg(F.col("_rk") + 1).alias("arank"),
        F.count("*").alias("t"),
        F.sum(F.when(F.col(group_col) == 0, 1).otherwise(0)).alias("cnt_a"),
    )
    one = grp.agg(
        F.sum(F.col("arank") * F.col("cnt_a")).alias("r_a"),
        F.sum("cnt_a").alias("n_a"),
        F.sum(F.col("t") - F.col("cnt_a")).alias("n_b"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias("ties"),
        F.sum("t").alias("n"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    nn = F.col("n").cast("double")
    u_a = F.col("r_a") - na * (na + 1) / 2
    mu = na * nb / 2
    sig2 = (na * nb / 12) * (
        (nn + 1) - F.col("ties").cast("double") / (nn * (nn - 1))
    )
    # degenerate samples (everything tied) have zero variance: z is
    # undefined -> NULL, not an ANSI divide-by-zero
    z = F.when(sig2 > 0, (u_a - mu) / F.sqrt(sig2))
    return one.select(
        "n_a",
        "n_b",
        F.round(u_a, 1).alias("u_a"),
        F.round(z, 6).alias("z"),
        F.round(F.lit(1.0) - 2 * u_a / (na * nb), 6).alias("rank_biserial"),
    )


def runs_test(
    samples: DataFrame,
    value_col: str,
    key_col: str,
    order_cols: list[str],
) -> DataFrame:
    """Wald-Wolfowitz runs test per key: is the above/below-median
    sign sequence of the key's ordered values random, or does it
    trend/cluster? Values equal to the key's own exact median drop
    (the standard convention); the tie-free normal approximation
    z = (R - mu)/sigma with mu = 2*n1*n2/n + 1 and
    sigma^2 = 2*n1*n2*(2*n1*n2 - n) / (n^2 (n-1)).

    Scale shape: one per-key median aggregate, one per-key ordered
    lag window, one per-key rollup — everything key-partitioned,
    nothing global. Returns (key, n1, n2, runs, z)."""
    from pyspark.sql import Window

    med = samples.groupBy(key_col).agg(F.median(value_col).alias("_med"))
    signed = (
        samples.join(med, key_col)
        .where(F.col(value_col) != F.col("_med"))
        .select(
            key_col,
            *order_cols,
            (F.col(value_col) > F.col("_med")).cast("int").alias("_sgn"),
        )
    )
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    runs = signed.withColumn(
        "_new",
        F.coalesce(
            (F.col("_sgn") != F.lag("_sgn").over(w)).cast("int"), F.lit(1)
        ),
    )
    per_key = runs.groupBy(key_col).agg(
        F.sum("_sgn").alias("n1"),
        F.sum(F.lit(1) - F.col("_sgn")).alias("n2"),
        F.sum("_new").alias("runs"),
    )
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    nn = n1 + n2
    mu = 2 * n1 * n2 / nn + 1
    sig2 = (2 * n1 * n2 * (2 * n1 * n2 - nn)) / (nn * nn * (nn - 1))
    # n1 = n2 = 1 (or single-sign keys) has zero variance: z NULL
    z = F.when(sig2 > 0, (F.col("runs") - mu) / F.sqrt(sig2))
    return per_key.select(
        key_col, "n1", "n2", "runs", F.round(z, 6).alias("z")
    )
