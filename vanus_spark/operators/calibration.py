"""Isotonic (PAV) probability calibration on a bounded bin table.

Reference parity: the reference event engine has no model-evaluation
surface (SURVEY §2.6-2.8 absences); this extends the classifier-QA
family the Spark port adds next to ``q_quality_auc`` /
``q_quality_calibration`` — the reliability table says WHETHER the
probabilities are biased, the isotonic fit is the standard
non-parametric way to REPAIR them (Zadrozny & Elkan 2002).

Scale shape: pool-adjacent-violators is inherently sequential, so it
runs on the BINNED reliability table (<= ``n_bins`` rows), never the
observations — the one scoring pass over the data is the caller's
binning aggregate. On <= B bins the fit uses the exact minimax closed
form  fit[i] = max_{j<=i} min_{k>=i} mean(y[j..k])  (Robertson,
Wright & Dykstra 1988, Thm 1.4.4): an O(B^3)-pair computation that is
a few thousand rows at B=20 and stays a broadcastable dim at any data
scale, because B never grows with the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def isotonic_binned(
    bins: DataFrame,
    bucket_col: str = "bucket",
    weight_col: str = "w",
    sum_col: str = "s",
) -> DataFrame:
    """Weighted non-decreasing isotonic fit over a bin table.

    ``bins``: one row per bucket with an integer weight (count) and an
    integer value sum; the fitted rate for bucket i is the minimax
    interval mean above. Returns (bucket, iso_rate) with iso_rate
    non-decreasing in bucket. All interval means divide exact BIGINT
    sums, so both engines derive identical doubles.
    """
    w_cum = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, 0)
    pre = bins.select(
        F.col(bucket_col).alias("_b"),
        F.col(weight_col).alias("_w"),
        F.col(sum_col).alias("_s"),
    ).select(
        "_b",
        "_w",
        "_s",
        F.sum("_w").over(w_cum).alias("_pw"),
        F.sum("_s").over(w_cum).alias("_ps"),
    )
    a, k = pre.alias("a"), pre.alias("k")
    intervals = a.join(k, F.col("a._b") <= F.col("k._b")).select(
        F.col("a._b").alias("_j"),
        F.col("k._b").alias("_k"),
        (
            (F.col("k._ps") - (F.col("a._ps") - F.col("a._s"))).cast(
                "double"
            )
            / (F.col("k._pw") - (F.col("a._pw") - F.col("a._w")))
        ).alias("_ia"),
    )
    anchors = bins.select(F.col(bucket_col).alias("_i"))
    mins = (
        anchors.join(
            intervals,
            (F.col("_j") <= F.col("_i")) & (F.col("_k") >= F.col("_i")),
        )
        .groupBy("_i", "_j")
        .agg(F.min("_ia").alias("_mina"))
    )
    return mins.groupBy("_i").agg(F.max("_mina").alias("_iso")).select(
        F.col("_i").alias(bucket_col), F.col("_iso").alias("iso_rate")
    )
