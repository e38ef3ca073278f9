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

from typing import Iterator, Tuple  # noqa: F401 — pandas_udf type hints resolve module-globally

import pandas as pd  # noqa: F401 — pandas_udf type hints resolve module-globally
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


# --- Jaro-Winkler linkage -------------------------------------------------


def _jaro_winkler_py(s1: str, s2: str, p: float = 0.1, boost_above: float = 0.7) -> float:
    """Reference Jaro-Winkler (prefix scale 0.1, boost only when the
    Jaro score exceeds 0.7 — the standard parameters), computed over
    the **UTF-8 bytes** of the inputs: that is the operator contract
    (it matches DuckDB's jaro_winkler_similarity and therefore the
    oracle), and tests/test_session8_ops.py asserts BIT-EXACT double
    parity against DuckDB on both ASCII and non-ASCII pairs. On pure
    ASCII bytes == codepoints; on multi-byte text the byte view scores
    differ from a codepoint implementation by design (e.g. 'café' vs
    'cafe' compares the two bytes of 'é' individually).

    Both-empty is scored 0.0 (the engine convention), so callers must
    treat empty strings as non-matchable rather than identical."""
    if not s1 or not s2:
        return 0.0
    if s1 == s2:
        return 1.0
    s1 = s1.encode("utf-8")
    s2 = s2.encode("utf-8")
    l1, l2 = len(s1), len(s2)
    window = max(l1, l2) // 2 - 1
    hit1 = [False] * l1
    hit2 = [False] * l2
    m = 0
    for i, ch in enumerate(s1):
        lo = i - window if i > window else 0
        hi = i + window + 1
        if hi > l2:
            hi = l2
        for j in range(lo, hi):
            if not hit2[j] and s2[j] == ch:
                hit1[i] = hit2[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if hit1[i]:
            while not hit2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    jaro = (m / l1 + m / l2 + (m - t) / m) / 3.0
    if jaro > boost_above:
        prefix = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a != b:
                break
            prefix += 1
        jaro = jaro + prefix * p * (1.0 - jaro)
    return jaro


def jaro_winkler_udf():
    """Arrow-batched (string, string) -> double Jaro-Winkler column.

    The kernel is embedded DuckDB's ``jaro_winkler_similarity``
    (bit-exact with ``_jaro_winkler_py`` — the same parity
    tests/test_session8_ops.py asserts — and with the oracle, which
    IS DuckDB; both operate over UTF-8 **bytes**, the documented
    operator contract): each Arrow batch is handed to one vectorized
    native scan instead of a per-pair Python loop (guide §4.2;
    measured ~30x on 200k pairs). Iterator form so the connection is
    built once per task, not per batch (§4.5); single-threaded so the
    replacement scan streams the batch in row order. NULLs propagate
    as NULL (explicit first CASE arm); otherwise the empty-string
    convention (both-empty or one-empty scores 0.0, never a match)
    applies.

    duckdb is probed here, on the driver at construction time, so a
    cluster missing the dependency fails fast with a clear error
    rather than at first task execution.
    """
    try:
        import duckdb  # noqa: F401 — driver-side fail-fast probe
    except ImportError as e:  # pragma: no cover - env-dependent
        raise ImportError(
            "jaro_winkler_udf requires the 'duckdb' package on the "
            "driver AND every executor (it is the vectorized JW "
            "kernel); install duckdb>=0.9"
        ) from e

    @F.pandas_udf("double")
    def jw(it: Iterator[Tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
        import duckdb

        con = duckdb.connect()
        con.execute("SET threads=1")
        for a, b in it:
            batch = pd.DataFrame({"a": a, "b": b})  # noqa: F841 — duckdb replacement scan
            yield con.execute(
                "SELECT CASE WHEN a IS NULL OR b IS NULL THEN NULL "
                "WHEN a = '' OR b = '' THEN 0.0 "
                "ELSE jaro_winkler_similarity(a, b) END AS v FROM batch"
            ).df()["v"]

    return jw


def jw_best_match(
    master: DataFrame,
    dirty: DataFrame,
    master_id: str,
    master_text: str,
    dirty_id: str,
    dirty_text: str,
    block_key,
    threshold: float = 0.8,
) -> DataFrame:
    """Record linkage: for every dirty row, the best-scoring master row
    among candidates that share ``block_key`` (a Column function
    applied to the text on BOTH sides), kept only at score >=
    ``threshold``.

    Scale shape: the blocked equi-join shuffles on the block key —
    candidates per dirty row are bounded by block selectivity, never
    O(|master|); scoring is one Arrow-batched pass over candidate
    pairs; argmax is a bounded per-dirty-id window. Empty texts never
    match (engine convention scores them 0.0).

    Determinism: ties on the raw double score break to the smallest
    master id, and the emitted score is rounded AFTER ranking.
    """
    from pyspark.sql import Window

    jw = jaro_winkler_udf()
    m = master.select(
        F.col(master_id).alias("_mid"),
        F.col(master_text).alias("_mtxt"),
        block_key(F.col(master_text)).alias("_blk"),
    ).where(F.length("_mtxt") > 0)
    d = dirty.select(
        F.col(dirty_id).alias("_did"),
        F.col(dirty_text).alias("_dtxt"),
        block_key(F.col(dirty_text)).alias("_blk"),
    ).where(F.length("_dtxt") > 0)
    # the blocked join broadcasts the (small) master side, so the
    # probe side keeps ITS partitioning — a narrow single-file dirty
    # scan would run the whole Arrow-batched JW scoring pass in one
    # task (measured: task time ~= wall at sf0.1). Widen it first;
    # no-op when the dirty side is already wide.
    from vanus_spark.operators.parallelism import repartition_for_compute

    d = repartition_for_compute(d)
    scored = (
        d.join(m, "_blk")
        .select("_did", "_mid", "_dtxt", "_mtxt", jw("_dtxt", "_mtxt").alias("_s"))
        .where(F.col("_s") >= threshold)
    )
    w = Window.partitionBy("_did").orderBy(F.desc("_s"), F.asc("_mid"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            F.col("_did").alias("dirty_id"),
            F.col("_mid").alias("matched_id"),
            F.round("_s", 6).alias("score"),
        )
    )
