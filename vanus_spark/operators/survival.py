"""Kaplan-Meier survival estimation.

The standard right-censored time-to-event estimator (Kaplan & Meier
1958) — churn/retention analysis runs it over "days until a user's
last event", with still-active users entering as censored
observations: S(t) = prod_{t_i <= t} (1 - d_i / n_i), d_i = events at
t_i, n_i = subjects still at risk entering t_i.

Reference parity note: no survival surface exists in the reference
event engine (SURVEY §2.6-2.8 absences); this is part of the
analytics family the Spark port adds over the events table.

Scale shape: one groupBy over (group, duration) collapses the subject
table to the risk table (map-side combined — the shuffle is bounded by
#groups x #distinct durations, not #subjects), then the cumulative
product runs as a window over that SMALL risk table per group. The
product is computed as exp(sum(ln(factor))) — a fixed formula both
IEEE engines evaluate identically to within an ulp (round(6) at the
emit) — with an explicit zero flag once the at-risk set empties, so
ln(0) never evaluates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def kaplan_meier(
    subjects: DataFrame,
    duration_col: str = "duration",
    event_col: str = "event",
    group_col: str = "segment",
) -> DataFrame:
    """(group, t, n_at_risk, n_events, n_censored, survival).

    ``subjects``: one row per subject with an integer duration and an
    ``event`` flag (1 = event observed at t, 0 = censored at t).
    Output has one row per (group, distinct duration), survival
    evaluated AT t (events at t included, the standard convention).
    """
    risk = subjects.groupBy(group_col, duration_col).agg(
        F.sum(F.col(event_col).cast("long")).alias("n_events"),
        F.sum((F.lit(1) - F.col(event_col)).cast("long")).alias("n_censored"),
    )
    w_tot = Window.partitionBy(group_col)
    w_ord = Window.partitionBy(group_col).orderBy(duration_col)
    w_prev = w_ord.rowsBetween(Window.unboundedPreceding, -1)
    total = F.sum(F.col("n_events") + F.col("n_censored")).over(w_tot)
    left_before = F.coalesce(
        F.sum(F.col("n_events") + F.col("n_censored")).over(w_prev), F.lit(0)
    )
    staged = risk.withColumn("n_at_risk", total - left_before)
    factor = (
        F.lit(1.0)
        - F.col("n_events").cast("double") / F.col("n_at_risk").cast("double")
    )
    # once any factor hits 0 the curve is 0 from there on; flagging it
    # keeps ln() off the zero (engines disagree on ln(0))
    dead = F.max((F.col("n_events") == F.col("n_at_risk")).cast("int")).over(
        w_ord.rowsBetween(Window.unboundedPreceding, 0)
    )
    log_sum = F.sum(
        F.when(factor > 0, F.log(factor)).otherwise(F.lit(0.0))
    ).over(w_ord.rowsBetween(Window.unboundedPreceding, 0))
    survival = F.when(dead == 1, F.lit(0.0)).otherwise(F.exp(log_sum))
    return staged.select(
        group_col,
        F.col(duration_col).alias("t"),
        "n_at_risk",
        "n_events",
        "n_censored",
        F.round(survival, 6).alias("survival"),
    )


def logrank_test(
    subjects: DataFrame,
    duration_col: str = "duration",
    event_col: str = "event",
    group_col: str = "grp",
) -> DataFrame:
    """Two-group log-rank test — the significance readout on top of
    the Kaplan-Meier curves ("do the two churn curves differ, or is
    the gap noise?"): at every event time t, group 1's observed
    events d1 vs its hypergeometric expectation d * n1/n, with
    variance d * (n1/n)(1 - n1/n)(n - d)/(n - 1); the chi-square is
    (sum(d1 - E))^2 / sum(V). ``group_col`` must be 0/1.

    Scale shape mirrors ``kaplan_meier``: ONE groupBy collapses the
    subject table to per-duration leave/event counts (map-side
    combined, bounded by the duration lattice, not #subjects); the
    at-risk prefix windows and the final fold run over that risk
    table only. The windows are deliberately un-partitioned — the
    frame is the distinct-duration axis, bounded by time resolution
    (the same boundedness argument as the KM risk table).
    """
    one = F.lit(1).cast("long")
    ev = F.col(event_col).cast("long")
    is1 = (F.col(group_col) == 1).cast("long")
    risk = subjects.groupBy(duration_col).agg(
        F.sum(ev * is1).alias("_d1"),
        F.sum(ev * (one - is1)).alias("_d0"),
        F.sum(is1).alias("_l1"),
        F.sum(one - is1).alias("_l0"),
    )
    w_tot = Window.partitionBy()
    w_prev = (
        Window.orderBy(duration_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tot1 = F.sum("_l1").over(w_tot)
    tot0 = F.sum("_l0").over(w_tot)
    n1 = tot1 - F.coalesce(F.sum("_l1").over(w_prev), F.lit(0))
    n0 = tot0 - F.coalesce(F.sum("_l0").over(w_prev), F.lit(0))
    staged = risk.select(
        F.col(duration_col),
        "_d1",
        (F.col("_d1") + F.col("_d0")).alias("_d"),
        n1.alias("_n1"),
        (n1 + n0).alias("_n"),
        tot1.alias("n_b"),
        tot0.alias("n_a"),
    ).where(F.col("_d") > 0)
    r1 = F.col("_n1").cast("double") / F.col("_n")
    e1 = F.col("_d").cast("double") * F.col("_n1") / F.col("_n")
    v = F.when(
        F.col("_n") > 1,
        F.col("_d").cast("double")
        * r1
        * (1 - r1)
        * (F.col("_n") - F.col("_d"))
        / (F.col("_n") - 1),
    ).otherwise(0.0)
    agg = staged.groupBy("n_a", "n_b").agg(
        F.sum("_d1").alias("o_b"),
        F.sum(e1).alias("_e"),
        F.sum(v).alias("_v"),
    )
    diff = F.col("o_b").cast("double") - F.col("_e")
    z = F.when(F.col("_v") > 0, diff / F.sqrt("_v"))
    return agg.select(
        "n_a",
        "n_b",
        "o_b",
        F.round("_e", 6).alias("e_b"),
        F.round(F.when(F.col("_v") > 0, diff * diff / F.col("_v")), 6).alias(
            "logrank_chi2"
        ),
        F.round(z, 6).alias("z"),
    )


def nelson_aalen(
    subjects: DataFrame,
    duration_col: str = "duration",
    event_col: str = "event",
    group_col: str = "segment",
) -> DataFrame:
    """Nelson-Aalen cumulative-hazard estimator per group:
    H(t) = sum_{t_i <= t} d_i / n_i with the standard variance
    sum d_i / n_i^2 — the hazard-scale companion to ``kaplan_meier``
    (K-M answers "what fraction survives", N-A answers "how much
    hazard has accumulated", the quantity additive-risk models and
    hazard-ratio eyeballing need).

    Same scale shape as kaplan_meier: the subject table collapses to
    the (group, duration) risk table before any window runs; the
    running sums accumulate in duration order over risk-table rows
    only, so both engines walk identical IEEE sequences."""
    risk = subjects.groupBy(group_col, duration_col).agg(
        F.sum(F.col(event_col).cast("long")).alias("n_events"),
        F.sum((F.lit(1) - F.col(event_col)).cast("long")).alias("n_censored"),
    )
    w_tot = Window.partitionBy(group_col)
    w_ord = Window.partitionBy(group_col).orderBy(duration_col)
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    w_prev = w_ord.rowsBetween(Window.unboundedPreceding, -1)
    total = F.sum(F.col("n_events") + F.col("n_censored")).over(w_tot)
    left_before = F.coalesce(
        F.sum(F.col("n_events") + F.col("n_censored")).over(w_prev), F.lit(0)
    )
    staged = risk.withColumn("n_at_risk", total - left_before)
    d = F.col("n_events").cast("double")
    n = F.col("n_at_risk").cast("double")
    return staged.select(
        group_col,
        F.col(duration_col).alias("t"),
        "n_at_risk",
        "n_events",
        F.round(F.sum(d / n).over(w_run), 6).alias("cum_hazard"),
        F.round(F.sum(d / (n * n)).over(w_run), 6).alias("var_hazard"),
    )
