"""HyperLogLog distinct-count sketch as a mergeable aggregate.

Spark's ``approx_count_distinct`` answers one-shot cardinality but its
HLL++ state is opaque — you cannot persist per-shard sketches and merge
them later (the "daily uniques -> monthly uniques without re-scanning"
workflow the reference's metrics store supports via its aggregated
counters, /root/reference/pkg/observability/metrics/metrics.go). This
module keeps the register table EXPLICIT: a (group, reg, max_rho) long
table of at most m rows per group that merges across shards/days by
``groupBy(reg).agg(max(rho))`` — union-then-max, the HLL merge law.

100 TB design: the build is one partial-aggregated groupBy whose output
is bounded by m * |groups| regardless of input size (like the Count-Min
build, countmin.py); no vocabulary-sized shuffle ever happens. The
estimator runs on the bounded register table.

Engine portability (the property the DuckDB oracle needs): the hash is
the shared md5 base (llm/dedup.md5_long); the geometric statistic is
1 + count-trailing-zeros of the suffix bits — computed as
``log2(v & -v)``, exact in IEEE doubles because ``v & -v`` is a power
of two (leading-zero counting would need a bit-length primitive the
two engines don't share). The harmonic sum accumulates as an EXACT
integer scaled by 2^RHO_MAX (each term 2^-rho becomes the integer
2^(RHO_MAX-rho)), so summation order cannot perturb it; the single
final int->double conversion and division are IEEE-determined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from vanus_spark.llm.dedup import md5_long

#: registers per sketch (2^REG_BITS); alpha_m is the published bias
#: constant for m >= 128 (0.7213 / (1 + 1.079/m)) — computed ONCE
#: driver-side so both engines fold the identical double literal.
REG_BITS = 8
HLL_M = 1 << REG_BITS
HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)
#: suffix bits available after the REG_BITS register-index bits of the
#: 60-bit md5 hash; rho for an all-zero suffix is RHO_MAX + 1.
RHO_MAX = 60 - REG_BITS
#: the harmonic sum scales by 2^HLL_SCALE so even the rho = RHO_MAX + 1
#: edge term stays an exact integer (2^0); max sum 256 * 2^53 < 2^63.
HLL_SCALE = RHO_MAX + 1


def hll_registers(
    df: DataFrame, value_col: str, group_cols: list[str]
) -> DataFrame:
    """(group..., reg, rho): the sketch as a long table, <= HLL_M rows
    per group. Mergeable: union register tables from any number of
    shards and re-run this same max-aggregate."""
    hv = md5_long(F.col(value_col))
    suffix = F.shiftright(hv, REG_BITS)
    rho = F.when(suffix == 0, F.lit(RHO_MAX + 1)).otherwise(
        F.lit(1)
        + F.log2((suffix.bitwiseAND(-suffix)).cast("double")).cast("long")
    )
    return (
        df.select(*group_cols, (hv % HLL_M).alias("reg"), rho.alias("_rho"))
        .groupBy(*group_cols, "reg")
        .agg(F.max("_rho").alias("rho"))
    )


def hll_estimate(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """(group..., hll_est): the HLL estimator over a register table.

    Absent registers contribute 2^0 = 1 to the harmonic sum; in the
    scaled-integer form that is 2^HLL_SCALE per absent register. The
    small-range linear-counting branch (E <= 2.5m and empty registers
    present) uses m*ln(m/V) exactly as published."""
    scaled = F.expr(f"shiftleft(cast(1 as bigint), {HLL_SCALE} - rho)")
    agg = registers.groupBy(*group_cols).agg(
        F.count("*").alias("n_regs"),
        F.sum(scaled).alias("s_present"),
    )
    s_total = (
        F.col("s_present")
        + (F.lit(HLL_M) - F.col("n_regs")) * F.lit(2**HLL_SCALE)
    ).cast("double")
    raw = (
        F.lit(HLL_ALPHA * HLL_M * HLL_M * float(2**HLL_SCALE)) / s_total
    )
    zeros = F.lit(HLL_M) - F.col("n_regs")
    est = F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (zeros > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zeros.cast("double")),
    ).otherwise(raw)
    return agg.select(*group_cols, "n_regs", est.alias("hll_est"))
