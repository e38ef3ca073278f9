"""Blocked fuzzy matching (edit distance) — record-linkage primitive.

The naive fuzzy join is an all-pairs ``levenshtein`` — O(n^2) rows and
unshippable at scale. This implements FastSS-style *deletion
neighborhood* blocking for radius 1: every string generates itself plus
each single-character-deletion variant as blocking keys; two strings
within edit distance <= 1 are GUARANTEED to share at least one key
(substitution: delete the differing position from both; insert/delete:
the shorter string IS a variant of the longer). Candidates sharing a
key are then verified with the exact ``levenshtein`` — so blocking
affects cost only, never the result set.

Scale design (100 TB): keys per string = len+1 (bounded for name/ID-like
columns); the join shuffles on the variant key, and bucket sizes are
bounded by how many strings collapse onto one deletion — ``bucket_cap``
guards degenerate keys (same pattern as the LSH band join's cap) by
dropping keys whose candidate list exceeds the cap, which is an explicit
recall trade documented to the caller, never an OOM.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def deletion_variants(c: Column) -> Column:
    """Distinct array: the string itself + every single-char deletion."""
    variants = F.transform(
        F.sequence(F.lit(1), F.length(c)),
        lambda i: F.concat(
            F.substr(c, F.lit(1), i - F.lit(1)), F.substr(c, i + F.lit(1), F.length(c))
        ),
    )
    return F.array_distinct(F.concat(F.array(c), variants))


def fuzzy_self_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_dist: int = 1,
    bucket_cap: int = 10_000,
) -> DataFrame:
    """All pairs (id_l < id_r) within edit distance ``max_dist`` (0 or 1).

    Returns (id_l, id_r, dist). Exact for max_dist <= 1 as long as no
    blocking key exceeds ``bucket_cap`` members; larger radii should
    run this repeatedly on cluster representatives (the same
    composition the LSH near-dup family uses).
    """
    if max_dist not in (0, 1):
        raise ValueError(
            "deletion-neighborhood blocking is exact only for max_dist in {0, 1}; "
            f"got {max_dist}"
        )
    key_src = (
        F.array(F.col(text_col))
        if max_dist == 0
        else deletion_variants(F.col(text_col))
    )
    keyed = df.select(
        F.col(id_col).alias("_id"),
        F.col(text_col).alias("_txt"),
        F.explode(key_src).alias("_k"),
    )
    if bucket_cap is not None:
        hot = (
            keyed.groupBy("_k")
            .agg(F.count("*").alias("_n"))
            .where(F.col("_n") > bucket_cap)
            .select("_k")
        )
        keyed = keyed.join(F.broadcast(hot), "_k", "left_anti")
    a = keyed.select(
        F.col("_k"), F.col("_id").alias("id_l"), F.col("_txt").alias("txt_l")
    )
    b = keyed.select(
        F.col("_k"), F.col("_id").alias("id_r"), F.col("_txt").alias("txt_r")
    )
    cand = (
        a.join(b, "_k")
        .where(F.col("id_l") < F.col("id_r"))
        .select("id_l", "id_r", "txt_l", "txt_r")
        .distinct()  # pairs can share several variant keys
    )
    return (
        cand.withColumn("dist", F.levenshtein("txt_l", "txt_r").cast("int"))
        .where(F.col("dist") <= max_dist)
        .select("id_l", "id_r", "dist")
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    max_dist: int = 1,
    bucket_cap: int = 10_000,
) -> DataFrame:
    """Two-table fuzzy equi-join on edit distance <= ``max_dist`` (0/1):
    returns left.* plus right.* for every matching pair, via the same
    deletion-neighborhood blocking + exact verify."""
    if max_dist not in (0, 1):
        raise ValueError("max_dist must be 0 or 1 for exact blocking")

    def explode_keys(df: DataFrame, col: str, side: str) -> DataFrame:
        src = (
            F.array(F.col(col)) if max_dist == 0 else deletion_variants(F.col(col))
        )
        return df.withColumn(f"_k_{side}", F.explode(src))

    lk = explode_keys(left, left_on, "l")
    rk = explode_keys(right, right_on, "r")
    joined = (
        lk.join(rk, lk[f"_k_l"] == rk[f"_k_r"])
        .drop("_k_l", "_k_r")
        .distinct()
    )
    return joined.where(F.levenshtein(F.col(left_on), F.col(right_on)) <= max_dist)
