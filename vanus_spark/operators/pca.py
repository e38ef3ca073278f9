"""Distributed PCA top component via EXACT-INTEGER power iteration.

Embedding-curation pipelines want the dominant variance direction of a
huge embedding table (drift monitoring, whitening, anisotropy checks —
"all-but-the-top" style postprocessing). The classic obstacle to gating
such an operator cross-engine is float summation order: a Gram matrix
accumulated over millions of rows differs in the last ulp between any
two engines, and power iteration amplifies nothing but still lands on
un-hashable trailing digits.

This module sidesteps float drift entirely:

1. vectors are quantized to small integers ONCE (the only float op is
   a single well-separated round);
2. the Gram matrix G = Q^T Q is computed in exact int64 — per-partition
   numpy partial Grams via ``mapInPandas`` (d^2 rows cross the shuffle
   per PARTITION, never per input row), summed with one tiny aggregate;
3. power iteration runs on the d^2-row Gram table in decimal(38,0) —
   every matvec is an exact integer join+sum, so independent engines
   (DuckDB does it in HUGEINT/int128) agree bit for bit;
4. only the FINAL normalization divides two exactly-agreed integers as
   doubles — one correctly-rounded IEEE op per dimension.

Iteration depth is bounded by the 38-digit capacity: with |q| <= ~1e2
entries and d = 64, four iterations peak around 1e27 — far inside both
decimal(38,0) and int128. Convergence is the fixture's job (plant or
verify a separated spectrum); the ALGEBRA is exact at any depth.

At 100 TB: stage 2 is the only corpus-scale pass — one mapInPandas
over the vectors plus a d^2-key aggregate (map-side combined); the
iteration loop touches only the d^2 Gram table (d = 64..4096 -> at
most ~16M tiny rows), broadcast-joined against the d-row vector.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F


def gram_matrix_exact(
    qvecs: DataFrame, vec_col: str = "qvec", dim: int = 64
) -> DataFrame:
    """(i, j, g): exact int64 Gram matrix of the integer vectors in
    ``vec_col`` (array<long>, all length ``dim``).

    Per-partition numpy partial Grams (V^T V in int64) -> one
    groupBy(i, j) sum. Entries must satisfy
    rows_per_partition * max(q)^2 < 2^63 (trivially true for
    quantized embeddings)."""
    schema = "i int, j int, g long"

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        acc = np.zeros((dim, dim), dtype="int64")
        seen = False
        for b in batches:
            if len(b) == 0:
                continue
            V = np.stack(b[vec_col].to_numpy()).astype("int64")
            acc += V.T @ V
            seen = True
        if not seen:
            return
        ii, jj = np.meshgrid(
            np.arange(dim, dtype="int32"),
            np.arange(dim, dtype="int32"),
            indexing="ij",
        )
        yield pd.DataFrame(
            {"i": ii.ravel(), "j": jj.ravel(), "g": acc.ravel()}
        )

    return (
        qvecs.select(vec_col)
        .mapInPandas(part, schema)
        .groupBy("i", "j")
        .agg(F.sum("g").alias("g"))
    )


def gram_matrix_join(
    q_long: DataFrame,
    id_col: str = "vec_id",
    dim_col: str = "d",
    val_col: str = "q",
) -> DataFrame:
    """Reference implementation: the same Gram matrix as a plain
    self-join on the vector id over long-form (id, d, q) rows —
    d^2 intermediate rows PER VECTOR, so only for tests/small data.
    ``gram_matrix_exact`` must equal this exactly (integer algebra)."""
    a = q_long.select(
        F.col(id_col).alias("_id"),
        F.col(dim_col).alias("i"),
        F.col(val_col).alias("qa"),
    )
    b = q_long.select(
        F.col(id_col).alias("_id"),
        F.col(dim_col).alias("j"),
        F.col(val_col).alias("qb"),
    )
    return (
        a.join(b, "_id")
        .groupBy("i", "j")
        .agg(F.sum(F.col("qa") * F.col("qb")).alias("g"))
    )


def power_iteration_exact(
    spark: SparkSession, gram: DataFrame, dim: int, iters: int = 4
) -> DataFrame:
    """(dim, component): ``iters`` exact decimal(38,0) power-iteration
    steps from the all-ones vector, normalized at the END by the max
    absolute entry (a single double division per dimension — the only
    float op, performed on integers both engines agree on exactly).

    Capacity: peak magnitude grows by a factor <= dim * max|G| per
    step; callers must keep iters inside 38 digits (4 steps for
    quantized 64-dim embeddings peaks ~1e27)."""
    g = gram.select(
        "i", "j", F.col("g").cast("decimal(38,0)").alias("g")
    ).localCheckpoint(eager=True)
    v = spark.range(dim).select(
        F.col("id").cast("int").alias("j"),
        F.lit(1).cast("decimal(38,0)").alias("v"),
    )
    for _ in range(iters):
        v = (
            g.join(F.broadcast(v), "j")
            .groupBy("i")
            .agg(F.sum(F.col("g") * F.col("v")).alias("v"))
            .select(F.col("i").alias("j"), "v")
        )
    mx = v.agg(F.max(F.abs(F.col("v"))).alias("mx"))
    return v.crossJoin(F.broadcast(mx)).select(
        F.col("j").alias("dim"),
        (F.col("v").cast("double") / F.col("mx").cast("double")).alias(
            "component"
        ),
    )
