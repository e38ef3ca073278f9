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
