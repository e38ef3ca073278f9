"""Physical layout: partition pruning and shuffle-free bucketed joins
verified against the actual physical plans."""

from __future__ import annotations

from pyspark.sql import functions as F

from vanus_spark.bus import assign_addresses, get_event
from vanus_spark.sources.layout import (
    bucketed_table,
    read_bus,
    write_bucketed,
    write_bus_partitioned,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_partitioned_bus_prunes(spark, events, tmp_path):
    bus = assign_addresses(events.limit(2000))
    path = str(tmp_path / "bus")
    write_bus_partitioned(bus, path)
    stored = read_bus(spark, path)
    one_log = get_event(stored, eventlog=2, offset=10, number=5)
    plan = _plan(one_log)
    # the eventlog predicate reaches the scan as a PARTITION filter
    assert "PartitionFilters: [" in plan
    assert "eventlog" in plan.split("PartitionFilters")[1][:120]
    assert one_log.count() == 5
    # and rows outside the partition never load
    assert stored.where("eventlog = 2").count() == bus.where("eventlog = 2").count()


def test_bucketed_join_has_no_shuffle(spark, events, tmp_path):
    # warehouse dir is a static conf; tables land in the default
    # spark-warehouse and are dropped (managed => files deleted) below
    left = events.where("event_id < 3000").select("event_id", "user_id", "value")
    right = events.where("event_id < 3000").select("event_id", "event_type")
    n = left.count()
    write_bucketed(left, "t_left_bkt", "event_id", n_buckets=4)
    write_bucketed(right, "t_right_bkt", "event_id", n_buckets=4)
    a = bucketed_table(spark, "t_left_bkt")
    b = bucketed_table(spark, "t_right_bkt")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = a.join(b, "event_id")
        plan = _plan(joined)
        # same bucketing on the join key -> no Exchange anywhere
        assert "Exchange" not in plan
        assert joined.count() == n
        # groupBy on the bucket key is also exchange-free
        agg_plan = _plan(a.groupBy("event_id").agg(F.sum("value")))
        assert "Exchange" not in agg_plan
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS t_left_bkt")
        spark.sql("DROP TABLE IF EXISTS t_right_bkt")


def test_table_stats_single_pass(spark):
    from vanus_spark.sources.layout import table_stats

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (4, "b")], "id long, tag string"
    )
    got = {r.column: r for r in table_stats(df).collect()}
    assert got["id"].n_rows == 4 and got["id"].n_nulls == 0
    assert got["id"].n_distinct == 4
    assert (got["id"].min_str, got["id"].max_str) == ("1", "4")
    assert got["tag"].n_nulls == 1 and got["tag"].n_distinct == 2
    # ONE scan: a single aggregate node feeds every column's stats
    plan = table_stats(df)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LogicalRDD") == 1


def test_zorder_key_interleaves_and_localizes(spark):
    from vanus_spark.sources.layout import zorder_key, zorder_table
    from pyspark.sql import functions as F

    # hand-check the interleave: x=0b10, y=0b01, bits=2
    # positions: x bit b -> 2b+1, y bit b -> 2b
    df = spark.createDataFrame([(2, 1)], "x long, y long")
    [r] = df.select(
        zorder_key([F.col("x"), F.col("y")], bits=2).alias("z")
    ).collect()
    assert r.z == (1 << 3) | (1 << 0)  # x msb at pos 3, y lsb at pos 0
    # clustering property: sorting by zkey keeps both dims locally
    # bounded — the max bucket spread within any 16-row zkey run is
    # far below the global spread
    n = 256
    data = spark.createDataFrame(
        [(i, (i * 37) % n, (i * 101) % n) for i in range(n)],
        "doc_id long, a long, b long",
    )
    out = zorder_table(data, ["a", "b"], bits=4).orderBy("zkey").collect()
    runs = [out[i : i + 16] for i in range(0, n, 16)]
    for run in runs:
        assert max(r._zb_a for r in run) - min(r._zb_a for r in run) <= 8
        assert max(r._zb_b for r in run) - min(r._zb_b for r in run) <= 8


def test_zorder_default_path_has_no_global_window(spark):
    """The DEFAULT zorder_table path must be the sketch one: no
    Window (single-task global sort) anywhere in the physical plan —
    safe-by-default, same principle as dedup's bucket_cap."""
    from vanus_spark.sources.layout import zorder_table

    data = spark.createDataFrame(
        [(i, float(i % 50), i % 7) for i in range(500)],
        "doc_id long, a double, b long",
    )
    out = zorder_table(data, ["a", "b"], bits=3)  # defaults only
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan  # the scale path has no global sort
    rows = out.collect()
    assert all(0 <= r.zkey < 64 for r in rows)
    # the opt-in exact path exists and uses the rank window
    exact_plan = (
        zorder_table(data, ["a", "b"], bits=3, exact=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" in exact_plan


def test_hilbert_key_is_bijective_and_unit_step(spark):
    """hilbert_key on the full 64x64 grid (bits=6): a bijection onto
    [0, 4096) whose consecutive indices are manhattan-adjacent cells —
    the two defining properties of the curve (zorder fails the second;
    that's exactly the locality win)."""
    import pyspark.sql.functions as F

    from vanus_spark.sources.layout import hilbert_key

    grid = (
        spark.range(64 * 64)
        .select(
            (F.col("id") % 64).alias("x"),
            (F.col("id") / 64).cast("long").alias("y"),
        )
    )
    rows = (
        grid.select("x", "y", hilbert_key(F.col("x"), F.col("y"), bits=6).alias("d"))
        .orderBy("d")
        .collect()
    )
    ds = [r["d"] for r in rows]
    assert ds == list(range(4096))  # bijective onto the full range
    for a, b in zip(rows, rows[1:]):
        assert abs(a["x"] - b["x"]) + abs(a["y"] - b["y"]) == 1  # unit steps


def test_hilbert_chunked_dfa_matches_python_walk(spark):
    """bits > 8 routes through the 4-state chunked DFA (one hex-table
    lookup per 8-bit chunk). Cross-check bits=13 (odd leading chunk)
    and bits=16 (two full chunks) against the plain-python xy2d walk
    — bits=16 was unreachable under the round-6 unrolled expression
    (Catalyst tree grew ~2.4x per level)."""
    import random

    import pyspark.sql.functions as F

    from vanus_spark.sources.layout import _hilbert_d_int, hilbert_key

    rng = random.Random(42)
    for bits in (13, 16):
        pts = [
            (rng.randrange(1 << bits), rng.randrange(1 << bits))
            for _ in range(300)
        ]
        df = spark.createDataFrame(pts, "x long, y long")
        rows = df.select(
            "x", "y", hilbert_key(F.col("x"), F.col("y"), bits=bits).alias("d")
        ).collect()
        for r in rows:
            assert r["d"] == _hilbert_d_int(r["x"], r["y"], bits)


def test_hilbert_plan_is_compile_bounded(spark):
    """The defining fix: plan BUILD + analysis must be O(1) in bits.
    Building and analyzing the bits=16 projection (1.3 MB hex-literal
    lookups, a few dozen nodes) must complete in seconds — the
    round-6 expression could not analyze bits=16 at all."""
    import time

    import pyspark.sql.functions as F

    from vanus_spark.sources.layout import hilbert_key

    df = spark.range(10).select(
        (F.col("id") * 37 % 65536).alias("x"),
        (F.col("id") * 101 % 65536).alias("y"),
    )
    t0 = time.time()
    out = df.select(hilbert_key(F.col("x"), F.col("y"), bits=16).alias("d"))
    out.schema  # forces analysis
    assert time.time() - t0 < 30


def _scan_output_rows(df) -> int:
    """numOutputRows of the parquet scan AFTER an action — with
    filterPushdown, the vectorized reader emits only rows from row
    groups whose min/max stats survive the predicate, so this metric
    IS the row-group-pruning measurement."""
    df.collect()
    leaves = df._jdf.queryExecution().executedPlan().collectLeaves()
    for i in range(leaves.length()):
        node = leaves.apply(i)
        if "Scan" in node.nodeName():
            return node.metrics().apply("numOutputRows").value()
    raise AssertionError("no scan node found")


def test_zorder_sorted_layout_prunes_row_groups(spark):
    """The layout module's stated purpose, machine-checked (round-7
    verdict #4): writing zkey-sorted parquet makes a 2-D range
    predicate skip row groups via min/max stats — the scan emits a
    small fraction of the table — while the same predicate on a
    randomly-laid-out copy reads every row group. Mirrors the
    reference's stime-seek file-stat capability
    (/root/reference/server/store/vsb/block_seek.go:34-117)."""
    import tempfile

    import pyspark.sql.functions as F

    from vanus_spark.sources.layout import zorder_table

    n = 100_000
    base = spark.range(n).select(
        F.col("id").alias("rid"),
        ((F.hash(F.col("id").cast("string")) % 256 + 256) % 256 * 1.0).alias("x"),
        ((F.hash((F.col("id") + 7).cast("string")) % 256 + 256) % 256 * 1.0).alias("y"),
    )
    zt = zorder_table(base, ["x", "y"], bits=4)
    pred = (
        (F.col("x") >= 10.0) & (F.col("x") < 26.0)
        & (F.col("y") >= 200.0) & (F.col("y") < 216.0)
    )

    sorted_path = tempfile.mkdtemp(prefix="zt_sorted_") + "/t.parquet"
    (
        zt.repartitionByRange(8, "zkey")
        .sortWithinPartitions("zkey")
        .write.option("parquet.block.size", 65536)
        .parquet(sorted_path)
    )
    random_path = tempfile.mkdtemp(prefix="zt_random_") + "/t.parquet"
    zt.repartition(8).write.option("parquet.block.size", 65536).parquet(random_path)

    scanned_sorted = _scan_output_rows(spark.read.parquet(sorted_path).where(pred))
    scanned_random = _scan_output_rows(spark.read.parquet(random_path).where(pred))
    assert scanned_random == n  # random layout: every row group survives
    assert scanned_sorted < n // 10  # clustered layout: >90% skipped
    # both layouts agree on the answer, of course
    a = spark.read.parquet(sorted_path).where(pred).count()
    b = spark.read.parquet(random_path).where(pred).count()
    assert a == b


def test_hilbert_sorted_layout_prunes_row_groups(spark):
    """Same gate for the hilbert key: sorting by hilbert_key over the
    bucketed dims must let a 2-D range predicate skip most row
    groups."""
    import tempfile

    import pyspark.sql.functions as F

    from vanus_spark.sources.layout import hilbert_key

    n = 100_000
    base = spark.range(n).select(
        F.col("id").alias("rid"),
        (((F.hash(F.col("id").cast("string")) % 256 + 256) % 256)).alias("bx"),
        (((F.hash((F.col("id") + 7).cast("string")) % 256 + 256) % 256)).alias("by"),
    )
    ht = base.withColumn("hk", hilbert_key(F.col("bx"), F.col("by"), bits=8))
    path = tempfile.mkdtemp(prefix="ht_sorted_") + "/t.parquet"
    (
        ht.repartitionByRange(8, "hk")
        .sortWithinPartitions("hk")
        .write.option("parquet.block.size", 65536)
        .parquet(path)
    )
    pred = (
        (F.col("bx") >= 16) & (F.col("bx") < 32)
        & (F.col("by") >= 192) & (F.col("by") < 208)
    )
    scanned = _scan_output_rows(spark.read.parquet(path).where(pred))
    assert scanned < n // 10
