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
