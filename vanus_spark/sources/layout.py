"""Physical table layout helpers: the storage half of the 100 TB
design.

The operator modules keep repeating two promises — "at scale the bus
is WRITTEN partitioned by eventlog" and "the signature/corpus tables
are stored bucketed by their join key". These helpers make those
layouts real and verifiable:

- ``write_bus_partitioned`` / ``read_bus``: hive-partitioned parquet
  by ``eventlog``; any eventlog-addressed read (get_event, offset
  lookups) prunes partitions at the FILE level — the plan's
  PartitionFilters line, not a post-scan filter.
- ``write_bucketed`` / ``bucketed_table``: catalog tables bucketed +
  sort-ordered by the join key. Two tables bucketed the same way
  co-locate their keys, so equi-joins and groupBys on that key run
  WITHOUT a shuffle exchange — the plan drops the Exchange nodes
  entirely. This is the stored form of the dedup signature /
  embedding tables (join key: doc_id / vec_id / band_key).

Bucketing requires the session catalog (saveAsTable) — plain
``.parquet()`` files carry no bucket metadata.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F


def write_bus_partitioned(bus: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Persist the addressed bus hive-partitioned by eventlog."""
    bus.write.mode(mode).partitionBy("eventlog").parquet(path)


def read_bus(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned bus; eventlog predicates become partition
    pruning (verify with .explain: PartitionFilters non-empty)."""
    return spark.read.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    mode: str = "overwrite",
) -> None:
    """Persist as a catalog table bucketed AND sorted by the join key
    (sorting makes the per-bucket merge join cheapest)."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


# ---------------------------------------------------------------------------
# table statistics + Z-order clustering
# ---------------------------------------------------------------------------

def table_stats(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """ANALYZE-style per-column statistics: (column, n_rows, n_nulls,
    n_distinct, min_str, max_str) — the stats a cost-based planner
    (or a human sizing a join) reads before picking broadcast vs
    shuffle. One aggregate per column batched into a single pass
    (grouping-free agg with conditional counts), so the table scans
    ONCE regardless of column count. min/max surface as strings so
    one schema covers every column type."""
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__ndv"),
            F.min(F.col(c).cast("string")).alias(f"{c}__min"),
            F.max(F.col(c).cast("string")).alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__rows").alias("n_rows"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__ndv").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_str"),
                F.col(f"{c}__max").alias("max_str"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(rows).alias("s")).select("s.*")


def zorder_key(cols: list[Column], bits: int = 8) -> Column:
    """Interleaved-bit Z-order key over per-column RANK buckets.

    Callers first bucket each dimension into [0, 2^bits) (e.g. via
    ntile or a rank window — buckets, not raw values, so skewed
    dimensions still interleave evenly), then this folds the bucket
    ids into one long by bit interleaving: sorting by the key stores
    rows so that range predicates on ANY of the dimensions touch few
    contiguous row ranges — the standard multi-dimensional clustering
    for 100 TB scans (Delta OPTIMIZE ZORDER shape). Pure integer
    Columns, zero shuffle beyond the caller's final sort."""
    n = len(cols)
    if bits * n > 63:
        raise ValueError(
            f"zorder_key needs bits*dims <= 63 (got {bits}*{n}): JVM "
            "shiftleft wraps shift distances mod 64, which would "
            "silently corrupt the interleaving"
        )
    key = F.lit(0).cast("long")
    for b in range(bits - 1, -1, -1):  # msb first
        for i, c in enumerate(cols):
            bit = F.shiftrightunsigned(c.cast("long"), b) % 2
            pos = b * n + (n - 1 - i)
            key = key + F.shiftleft(bit, pos)
    return key


def zorder_table(
    df: DataFrame,
    dims: list[str],
    bits: int = 8,
    exact: bool = False,
) -> DataFrame:
    """df + (dimension bucket columns, zkey): each dim is ranked into
    2^bits quantile buckets, then the interleaved zkey is appended.
    Writers sort by zkey (repartitionByRange + sortWithinPartitions)
    so min/max file stats prune on every dimension.

    The DEFAULT (exact=False) is the 100 TB path: approximate quantile
    BOUNDARIES (one approxQuantile sketch pass, driver-side list of
    2^bits-1 cut points) and a zero-shuffle bucket lookup per row — no
    global sort anywhere before the writer's range partitioning.
    exact=True buckets by a percent_rank window per dim — exact and
    oracle-mirrorable, but each window is a SINGLE-TASK global sort:
    opt into it only for fixtures/small tables (the same safe-by-
    default principle as dedup's bucket_cap)."""
    out = df
    n_buckets = (1 << bits) - 1
    all_bnds: dict[str, list[float]] = {}
    if not exact:
        qs = [i / (1 << bits) for i in range(1, 1 << bits)]
        # ONE sketch pass computes every dimension's boundaries
        all_bnds = dict(zip(dims, df.approxQuantile(dims, qs, 0.001)))
    for d in dims:
        if exact:
            w = Window.orderBy(F.col(d))
            bucket = F.least(
                F.floor(F.percent_rank().over(w) * (1 << bits)).cast("long"),
                F.lit(n_buckets).cast("long"),
            )
        else:
            bucket = F.size(
                F.filter(
                    F.lit([float(b) for b in all_bnds[d]]),
                    lambda x: F.col(d).cast("double") > x,
                )
            ).cast("long")
        out = out.withColumn(f"_zb_{d}", bucket)
    return out.withColumn(
        "zkey", zorder_key([F.col(f"_zb_{d}") for d in dims], bits)
    )


def hilbert_key(x: Column, y: Column, bits: int = 8) -> Column:
    """2-D Hilbert-curve index over bucket ids in [0, 2^bits) — the
    locality-better sibling of ``zorder_key`` (Hilbert has no Z-shaped
    seams, so range predicates on either dimension touch strictly
    fewer contiguous runs; it is what Delta/Iceberg OPTIMIZE use when
    asked for hilbert clustering).

    The standard xy2d walk (s = 2^(bits-1) .. 1: quadrant digit
    d += s*s*((3*rx) xor ry), then the conditional flip+swap rotation)
    is UNROLLED at plan-build time into one integer Column expression
    — the per-iteration x/y rebinding duplicates subtrees, but the
    blowup is bounded (~2.4x per level, a few thousand int ops per
    row at bits=8): pure whole-stage-codegen arithmetic, zero
    shuffle, zero UDF. The oracle restates the same unrolled levels
    as chained CTEs."""
    if bits < 1 or 2 * bits > 62:
        raise ValueError("hilbert_key needs 1 <= bits <= 31")
    xs = x.cast("long")
    ys = y.cast("long")
    d: Column = F.lit(0).cast("long")
    for level in range(bits - 1, -1, -1):
        s = 1 << level
        rx = F.when((xs.bitwiseAND(F.lit(s))) > 0, F.lit(1)).otherwise(F.lit(0))
        ry = F.when((ys.bitwiseAND(F.lit(s))) > 0, F.lit(1)).otherwise(F.lit(0))
        d = d + F.lit(s * s).cast("long") * (
            (F.lit(3) * rx).bitwiseXOR(ry)
        ).cast("long")
        # rotate the quadrant: if ry == 0, optionally flip, then swap
        nx = (
            F.when(ry == 0, F.when(rx == 1, F.lit(s - 1) - ys).otherwise(ys))
            .otherwise(xs)
        )
        ny = (
            F.when(ry == 0, F.when(rx == 1, F.lit(s - 1) - xs).otherwise(xs))
            .otherwise(ys)
        )
        xs, ys = nx, ny
    return d
