"""Bloom-filter join pruning (semi-join reduction).

For a fact⋈dim join where the dim side is too large to broadcast
whole but its KEY SET summarizes into a few-KB bit array, pre-filter
the fact side with a Bloom filter of the dim keys BEFORE the fact
rows reach the join's shuffle. At 100 TB this is the difference
between shuffling every fact row and shuffling only the ~matching
ones — the same trick Spark's own runtime row-level filtering
(`spark.sql.optimizer.runtime.bloomFilter.enabled`) applies, exposed
here as an explicit operator with a tunable bit budget.

Design notes (scale-first):

- The bitmap is built fully DISTRIBUTED: positions explode → per-word
  `bit_or` partial aggregation (map-side combine absorbs the fan-in)
  → ONE dense `array<long>` row. No driver collect at any size.
- The one-row bitmap is broadcast as DATA via a BroadcastNestedLoop
  join, not embedded as a plan literal — a 2k-element literal array
  would bloat the expression tree and codegen for every hash probe.
- Double hashing (Kirsch–Mitzenmacher): pos_i = h1 + i·h2 (mod m)
  gives k independent-enough probes from two xxhash64 calls.
- No false negatives by construction, so the exact join afterwards
  removes the false positives; the result is bit-for-bit the plain
  join (the oracle for `bloom_semi_join` is exactly that).
- The dim side is scanned twice (bloom build + join), but the build
  scan prunes to the key column only — at parquet that is a few
  percent of the table's bytes.

The reference has no batch join engine (vanus is an event pipeline);
this operator belongs to the LLM-pipeline scale toolkit alongside
salting (`operators/skew.py`) and the LSH band joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# fixed seeds so bitmap build and probe agree across DataFrames
_SEED1 = 0x9E3779B9
_SEED2 = 0x85EBCA6B


def _positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """k Bloom positions for ``key`` via double hashing
    (Kirsch–Mitzenmacher). Both hashes are reduced mod m BEFORE the
    probe arithmetic: ANSI mode raises on long overflow, so the
    classic wrapping h1 + i*h2 is not available; with p1, p2 < m and
    i < k the sum stays far inside long range. p2 is forced into
    [1, m-1] so the probes never collapse onto p1."""
    m = F.lit(num_bits).cast("long")
    p1 = F.pmod(F.xxhash64(key, F.lit(_SEED1)), m)
    p2 = F.pmod(F.xxhash64(key, F.lit(_SEED2)), m - F.lit(1).cast("long")) + F.lit(1)
    return [F.pmod(p1 + F.lit(i) * p2, m) for i in range(num_hashes)]


def bloom_bitmap(
    dim: DataFrame,
    key: str | Column,
    num_bits: int = 1 << 17,
    num_hashes: int = 3,
) -> DataFrame:
    """ONE-row DataFrame ``(words: array<long>)`` of length
    num_bits/64 — the Bloom bitmap of ``dim[key]``. Fully
    distributed: explode positions, per-word ``bit_or`` (partial agg
    combines map-side), then a single dense-array fold; words with no
    bits set fill as 0 via ``try_element_at`` on the sparse map."""
    if num_bits % 64:
        raise ValueError("num_bits must be a multiple of 64")
    key_c = F.col(key) if isinstance(key, str) else key
    pos = F.explode(
        F.array(*_positions(key_c, num_bits, num_hashes))
    ).alias("pos")
    sparse = (
        dim.select(pos)
        .select(
            F.shiftright("pos", 6).alias("w"),
            # variable shift amounts must go through SQL — the PySpark
            # shiftleft() wrapper only takes a literal bit count
            F.expr("shiftleft(1L, CAST(pos & 63 AS INT))").alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("bits"))
    )
    n_words = num_bits // 64
    folded = sparse.groupBy().agg(
        F.map_from_entries(F.collect_list(F.struct("w", "bits"))).alias("m")
    )
    return folded.select(
        F.transform(
            F.sequence(F.lit(0).cast("long"), F.lit(n_words - 1).cast("long")),
            lambda i: F.coalesce(F.try_element_at("m", i), F.lit(0).cast("long")),
        ).alias("words")
    )


def _probed(
    df: DataFrame, key: str, num_bits: int, num_hashes: int
) -> tuple[DataFrame, Column, list[str]]:
    """``df`` (carrying a ``words`` bitmap column) extended with probe
    position temp columns, plus the might-contain predicate (every
    probe bit set) and the temp column names to drop afterwards.
    Variable-amount shifts are SQL-only, so probe positions land in
    temp columns referenced by one F.expr predicate."""
    tmp = [f"_bp{i}" for i in range(num_hashes)]
    probed = df
    for name, p in zip(tmp, _positions(F.col(key), num_bits, num_hashes)):
        probed = probed.withColumn(name, p)
    pred = " AND ".join(
        f"(shiftright(element_at(words, CAST(shiftright({c}, 6) AS INT) + 1),"
        f" CAST({c} & 63 AS INT)) & 1) = 1"
        for c in tmp
    )
    return probed, F.expr(pred), tmp


def _probe_filter(df: DataFrame, key: str, num_bits: int, num_hashes: int) -> DataFrame:
    """Rows whose ``key`` MIGHT be in the Bloom filter."""
    probed, pred, tmp = _probed(df, key, num_bits, num_hashes)
    return probed.where(pred).drop(*tmp)


def bloom_prune_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    num_bits: int = 1 << 17,
    num_hashes: int = 3,
    how: str = "inner",
) -> DataFrame:
    """``fact ⋈ dim`` with the fact side Bloom-pruned before its
    shuffle. Result is EXACTLY the plain join (false positives are
    eliminated by the join; Bloom filters have no false negatives).

    ``how`` must not be fact-preserving (left/full would need the
    pruned-out rows back); inner/right/semi are the useful shapes.
    """
    if how in ("left", "left_outer", "full", "full_outer", "outer", "left_anti"):
        raise ValueError(f"bloom pruning would drop fact rows needed by how={how!r}")
    bm = F.broadcast(bloom_bitmap(dim, dim_key, num_bits, num_hashes))
    pruned = _probe_filter(fact.crossJoin(bm), fact_key, num_bits, num_hashes).drop(
        "words"
    )
    if how in ("semi", "left_semi", "leftsemi"):
        return pruned.join(dim, pruned[fact_key] == dim[dim_key], "left_semi")
    return pruned.join(dim, pruned[fact_key] == dim[dim_key], how)


def bloom_anti_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    num_bits: int = 1 << 17,
    num_hashes: int = 3,
) -> DataFrame:
    """``left ▷ right`` (anti join) with a Bloom split: a bloom MISS
    proves the key is absent from ``right`` (no false negatives), so
    miss rows bypass the join entirely; only hit rows (true matches +
    false positives) run the exact anti join, and the union of the
    miss rows with the anti-join survivors is EXACTLY the plain anti
    join. This is the incremental-dedup ingest shape — "which of
    these N new rows are NOT in the huge seen-set?" — where most rows
    are genuinely new: the shuffle shrinks to the ~hit fraction.

    ``left`` is scanned twice (once per side of the split); both scans
    prune to the needed columns and neither shuffles, which at scale
    is far cheaper than shuffling every left row into the anti join.
    """
    bm = F.broadcast(bloom_bitmap(right, right_key, num_bits, num_hashes))
    probed, pred, tmp = _probed(left.crossJoin(bm), left_key, num_bits, num_hashes)
    miss = probed.where(~pred).drop("words", *tmp)
    hit = probed.where(pred).drop("words", *tmp)
    survivors = hit.join(
        right, hit[left_key] == right[right_key], "left_anti"
    )
    return miss.unionByName(survivors)
