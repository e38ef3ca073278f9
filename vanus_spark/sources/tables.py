"""Parquet table loaders for the test corpus.

The ``events`` table is written with nanosecond timestamps, which the
Spark 4 Parquet reader rejects unless
``spark.sql.legacy.parquet.nanosAsLong`` is set; we read the nanos as
long and truncate to microseconds (the same truncation DuckDB applies
when casting TIMESTAMP_NS to its native microsecond timestamp), so
Spark-vs-DuckDB oracle comparisons line up exactly.

At 100 TB these readers stay scan-friendly: plain ``spark.read
.parquet`` keeps predicate pushdown / column pruning; the ts
conversion is a cheap projected expression, not a UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _normalize_ntz(df: DataFrame) -> DataFrame:
    """Cast TIMESTAMP_NTZ columns to TIMESTAMP (LTZ).

    Parquet written with isAdjustedToUTC=false infers as NTZ under
    Spark 4; NTZ is rejected by watermarks/windowed streaming and
    diverges from DuckDB's naive-timestamp canon only in type, not
    value (session tz is pinned UTC, so the wall-clock is preserved).
    """
    ntz = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    if ntz:
        df = df.withColumns({c: F.col(c).cast("timestamp") for c in ntz})
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # The caller's session may not be ours (the driver supplies its own):
    # pin UTC so date_format/date_trunc agree with DuckDB's naive
    # timestamps regardless of host timezone.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.floor(F.col("ts") / F.lit(1000)).cast("long"))
            )
        return _normalize_ntz(df)
    return _normalize_ntz(spark.read.parquet(f"{sf_dir}/{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
