"""Scale probe for the sixth-session operators: HLL registers,
histogram quantile sketch, two-phase skyline, grid-blocked geo radius
join. Replicates the sf0.1 events/customer tables R times with
offset keys (so distinct users / points / customers grow with R) and
times each operator per multiple.

Measurement protocol: noop WRITE (never count() — Catalyst prunes
aggregate columns under count and skews the timing), one op at a time,
results as JSON lines for SCALING.md.

Usage: python tools/probe_session6.py [R ...]   (default 1 10 50)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("PYTHONPATH", "/root/repo")

from pyspark.sql import DataFrame, functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicate(df: DataFrame, r: int, id_cols: list[str]) -> DataFrame:
    if r == 1:
        return df
    reps = F.explode(F.sequence(F.lit(0), F.lit(r - 1))).alias("rep")
    out = df.select("*", reps)
    for c in id_cols:
        out = out.withColumn(c, F.col(c) + F.col("rep") * 10_000_000)
    return out.drop("rep")


def _noop(df: DataFrame) -> float:
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def main() -> None:
    from vanus_spark import get_spark
    from vanus_spark.llm.dedup import md5_long
    from vanus_spark.operators.geo import radius_join
    from vanus_spark.operators.hll import hll_estimate, hll_registers
    from vanus_spark.operators.qsketch import histogram_sketch, sketch_quantiles
    from vanus_spark.operators.skyline import skyline_2d
    from vanus_spark.sources import load_table

    multiples = [int(x) for x in sys.argv[1:]] or [1, 10, 50]
    spark = get_spark("probe_session6", int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    ev0 = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    cust0 = load_table(spark, SF_DIR, "customer").select("c_custkey")
    supp = load_table(spark, SF_DIR, "supplier").select("s_suppkey")

    def coord(col, seed, span, offset):
        return (md5_long(col, seed) % span).cast("double") / 1000000.0 - offset

    results = []
    for r in multiples:
        ev = replicate(ev0, r, ["event_id", "user_id"]).localCheckpoint(
            eager=True
        )
        cust = replicate(cust0, r, ["c_custkey"]).localCheckpoint(eager=True)
        ops = {
            "hll_build": lambda: hll_estimate(
                hll_registers(ev, "user_id", ["event_type"]), ["event_type"]
            ),
            "qsketch_build": lambda: sketch_quantiles(
                spark,
                histogram_sketch(ev, "value", ["event_type"], 0.0, 512.0, 256),
                ["event_type"],
                [0.5, 0.9, 0.99],
                0.0,
                512.0,
                256,
            ),
            "skyline_users": lambda: skyline_2d(
                ev.groupBy("user_id").agg(
                    F.count("*").alias("n_events"),
                    F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                        "total_cents"
                    ),
                ),
                "n_events",
                "total_cents",
            ),
            "geo_radius": lambda: radius_join(
                cust.select(
                    "c_custkey",
                    coord(F.col("c_custkey"), 1, 120000000, 60.0).alias("lat"),
                    coord(F.col("c_custkey"), 2, 360000000, 180.0).alias("lon"),
                ),
                supp.select(
                    "s_suppkey",
                    coord(F.col("s_suppkey"), 3, 120000000, 60.0).alias("lat2"),
                    coord(F.col("s_suppkey"), 4, 360000000, 180.0).alias(
                        "lon2"
                    ),
                ),
                250.0,
                ("lat", "lon"),
                ("lat2", "lon2"),
            ).select("c_custkey", "s_suppkey", "dist_km"),
        }
        for name, build in ops.items():
            spark.catalog.clearCache()
            secs = _noop(build())
            row = {"op": name, "r": r, "sec": round(secs, 2)}
            results.append(row)
            print(json.dumps(row), flush=True)
        ev.unpersist()
        cust.unpersist()

    by_op: dict[str, dict[int, float]] = {}
    for row in results:
        by_op.setdefault(row["op"], {})[row["r"]] = row["sec"]
    print("\nop                base_r  growth (sec per multiple)")
    for op, d in by_op.items():
        base_r = min(d)
        desc = "  ".join(f"{r}x:{d[r]:.2f}s" for r in sorted(d))
        print(f"{op:18s} {base_r:5d}  {desc}")


if __name__ == "__main__":
    main()
