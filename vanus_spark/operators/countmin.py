"""Count-Min sketch over a token column.

A depth x width counter matrix: cell (j, h_j(t)) accumulates every
occurrence of token t; the point estimate min_j M[j][h_j(t)] can only
OVERcount (hash collisions add, never subtract), with error <= 2N/width
at probability 1 - 2^-depth. Complements the Misra-Gries heavy-hitters
operator (sketch_topk.py): Misra-Gries answers "which tokens are
frequent", Count-Min answers "how frequent is THIS token" for tokens
chosen after the scan.

100 TB design: the BUILD is one partial-aggregated groupBy over
(depth, cell) — at most depth*width output rows regardless of corpus
size, so the shuffle is bounded by the sketch, never the vocabulary
(the win over exact counting when the vocabulary itself is shuffle-
hostile). Counts are linear, so per-shard partial sketches merge by
elementwise addition — the sketch of a union is the sum of sketches.
Estimation broadcasts the (bounded) query set's cells against the
sketch table.

Hashes are the universal-hash family shared with MinHash
(llm/dedup.py: md5-derived base, then (a*base + b) % p), chosen
because both engines compute them verbatim — the DuckDB oracle
re-derives the ENTIRE sketch in SQL and must land on identical cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from vanus_spark.llm.dedup import MINHASH_P, md5_long, minhash_coeffs


def _cells(token_col: str, depth: int, width: int):
    """array of the token's cell index per depth row; the md5 base is
    computed once into a column before this array references it."""
    coeffs = minhash_coeffs(depth)
    return F.array(
        *[
            ((F.lit(a) * F.col("_cm_base") + F.lit(b)) % MINHASH_P) % width
            for (a, b) in coeffs
        ]
    )


def _with_base(df: DataFrame, token_col: str) -> DataFrame:
    return df.withColumn(
        "_cm_base",
        md5_long(F.concat(F.lit("0|"), F.col(token_col))) % MINHASH_P,
    )


def cm_sketch(
    tokens: DataFrame, token_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """(d, cell, cnt): the sketch as a narrow long table of at most
    depth*width rows. One wide scan, one bounded-output aggregate."""
    return (
        _with_base(tokens, token_col)
        .select(F.posexplode(_cells(token_col, depth, width)).alias("d", "cell"))
        .groupBy("d", "cell")
        .agg(F.count("*").alias("cnt"))
    )


def cm_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    token_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point estimates for a bounded query-token set: min over the
    depth cells each query token hashes into. The query side is tiny —
    broadcast it so the sketch (itself bounded) never shuffles."""
    q = (
        _with_base(queries.select(token_col).distinct(), token_col)
        .select(
            token_col,
            F.posexplode(_cells(token_col, depth, width)).alias("d", "cell"),
        )
    )
    return (
        sketch.join(F.broadcast(q), ["d", "cell"])
        .groupBy(token_col)
        .agg(F.min("cnt").alias("cm_est"))
    )
