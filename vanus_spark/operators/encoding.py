"""Categorical feature-encoding operators for ML pipelines.

``target_encode_loo`` — leave-one-out target encoding with additive
(prior) smoothing, the standard high-cardinality categorical encoder
that avoids self-leakage: each row's own label is subtracted from its
group sum before the mean is formed.

``woe_iv`` — weight-of-evidence per category plus the information
value, credit-scoring's canonical predictive-power screen for a
categorical feature against a binary outcome.

Both run as ONE partial-aggregate shuffle over the raw table plus a
broadcast-sized category dim joined back — the 100 TB shape for any
per-category statistic (the dim is #categories rows; the fact table is
scanned once per encoder). All counts stay exact BIGINTs; the encoded
values are single fixed IEEE expressions an independent SQL engine
reproduces bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def target_encode_loo(
    df: DataFrame,
    cat_col: str,
    label_col: str,
    keep_cols: list[str],
    prior_weight: float = 10.0,
    out_col: str = "enc",
) -> DataFrame:
    """Leave-one-out target encoding of ``cat_col`` against the
    integer 0/1 ``label_col``:

        enc_i = (sum_g - y_i + a * global_mean) / (n_g - 1 + a)

    with a = ``prior_weight``. The global mean regularizes rare
    categories toward the prior; subtracting the row's own label kills
    the self-leakage that makes naive target encoding overfit.

    Plan: per-category (n, sum) aggregate (map-side combined), global
    totals from the category dim (never a second fact scan), both
    broadcast back onto the fact table — one shuffle total."""
    g = df.groupBy(cat_col).agg(
        F.count("*").alias("_n"), F.sum(label_col).alias("_s")
    )
    tot = g.agg(
        F.sum("_n").alias("_tn"), F.sum("_s").alias("_ts")
    )
    j = df.join(F.broadcast(g), cat_col).crossJoin(F.broadcast(tot))
    gm = F.col("_ts").cast("double") / F.col("_tn").cast("double")
    enc = (
        (F.col("_s") - F.col(label_col)).cast("double")
        + F.lit(prior_weight) * gm
    ) / ((F.col("_n") - 1).cast("double") + F.lit(prior_weight))
    return j.select(*keep_cols, cat_col, label_col, enc.alias(out_col))


def woe_iv(
    df: DataFrame,
    cat_col: str,
    label_col: str,
    smoothing: float = 0.5,
) -> DataFrame:
    """Weight of evidence per category of ``cat_col`` against binary
    ``label_col`` (1 = good), with Laplace ``smoothing`` added to both
    event counts so empty cells stay finite:

        woe_c = ln(((good_c + s)/G) / ((bad_c + s)/B))
        iv    = sum_c ((good_c + s)/G - (bad_c + s)/B) * woe_c

    Returns one row per category (n, good, bad, woe, iv_term) plus the
    total IV repeated on every row (the PSI-report convention, so the
    table is self-contained). One map-side combined aggregate to the
    #categories dim; everything after runs on that dim."""
    g = df.groupBy(cat_col).agg(
        F.count("*").alias("n"),
        F.sum(label_col).alias("good"),
        F.sum(1 - F.col(label_col)).alias("bad"),
    )
    tot = g.agg(F.sum("good").alias("_tg"), F.sum("bad").alias("_tb"))
    j = g.crossJoin(F.broadcast(tot))
    s = F.lit(smoothing)
    pg = (F.col("good") + s) / F.col("_tg").cast("double")
    pb = (F.col("bad") + s) / F.col("_tb").cast("double")
    woe = F.log(pg / pb)
    scored = j.select(
        cat_col,
        "n",
        "good",
        "bad",
        woe.alias("_woe"),
        ((pg - pb) * woe).alias("_ivt"),
    )
    iv = scored.agg(F.sum("_ivt").alias("_iv"))
    return scored.crossJoin(F.broadcast(iv)).select(
        cat_col,
        "n",
        "good",
        "bad",
        F.round("_woe", 6).alias("woe"),
        F.round("_ivt", 6).alias("iv_term"),
        F.round("_iv", 6).alias("iv_total"),
    )


def pr_auc(
    scored: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Average precision (step-interpolated PR-AUC) plus the best F1
    over all thresholds, from a (score, label) table whose scores sit
    on a finite rounded lattice (the caller guarantees both engines
    form identical tie groups):

        AP = sum_k (R_k - R_{k-1}) * P_k

    walking distinct scores in DESCENDING order (each tie group enters
    en bloc — the sklearn convention). Plan: one cell aggregate per
    distinct score, one ordered window over the #cells dim, one final
    fold — the raw table is touched exactly once."""
    from pyspark.sql import Window

    cells = scored.groupBy(score_col).agg(
        F.count("*").alias("_m"), F.sum(label_col).alias("_tp")
    )
    w = (
        Window.partitionBy(F.lit(1))
        .orderBy(F.col(score_col).desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = cells.agg(
        F.sum("_m").alias("_n"), F.sum("_tp").alias("_p")
    )
    cum = cells.select(
        score_col,
        F.sum("_m").over(w).alias("_cm"),
        F.sum("_tp").over(w).alias("_ctp"),
    ).crossJoin(F.broadcast(tot))
    prec = F.col("_ctp").cast("double") / F.col("_cm").cast("double")
    # a label column with zero positives makes recall undefined — NULL
    # explicitly (both engines) rather than a silent NaN cascade
    rec = F.when(
        F.col("_p") > 0,
        F.col("_ctp").cast("double") / F.col("_p").cast("double"),
    )
    wlag = Window.partitionBy(F.lit(1)).orderBy(F.col(score_col).desc())
    prev_rec = F.coalesce(F.lag(rec).over(wlag), F.lit(0.0))
    stepped = cum.select(
        ((rec - prev_rec) * prec).alias("_ap_term"),
        F.when(
            prec + rec > 0, 2.0 * prec * rec / (prec + rec)
        ).otherwise(0.0).alias("_f1"),
        F.col("_n"),
        F.col("_p"),
    )
    return stepped.groupBy("_n", "_p").agg(
        F.round(F.sum("_ap_term"), 6).alias("average_precision"),
        F.round(F.max("_f1"), 6).alias("best_f1"),
    ).select(
        F.col("_n").alias("n"),
        F.col("_p").alias("n_pos"),
        "average_precision",
        "best_f1",
    )
