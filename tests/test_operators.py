"""as-of join and range join operators."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from vanus_spark.operators import asof_join, range_join_buckets


def ts(h):
    return dt.datetime(2024, 1, 1, h)


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame(
        [("A", ts(1), 10.0), ("A", ts(3), 11.0), ("B", ts(2), 20.0)],
        "sym string, qts timestamp, price double",
    )


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [("A", ts(0), 5), ("A", ts(2), 7), ("A", ts(3), 9), ("B", ts(5), 11)],
        "sym string, tts timestamp, qty int",
    )


def test_asof_backward(spark, trades, quotes):
    out = asof_join(trades, quotes, "sym", "tts", "qts", ["price"])
    got = {(r.sym, r.tts.hour): r.asof_price for r in out.collect()}
    assert got == {
        ("A", 0): None,   # no quote yet
        ("A", 2): 10.0,   # quote@1
        ("A", 3): 11.0,   # quote@3 ties -> visible
        ("B", 5): 20.0,
    }


def test_asof_strict_excludes_ties(spark, trades, quotes):
    out = asof_join(trades, quotes, "sym", "tts", "qts", ["price"], strict=True)
    got = {(r.sym, r.tts.hour): r.asof_price for r in out.collect()}
    assert got[("A", 3)] == 10.0  # quote@3 NOT visible under strict


def test_asof_forward(spark, trades, quotes):
    out = asof_join(
        trades, quotes, "sym", "tts", "qts", ["price"], direction="forward"
    )
    got = {(r.sym, r.tts.hour): r.asof_price for r in out.collect()}
    assert got == {
        ("A", 0): 10.0,  # next quote@1
        ("A", 2): 11.0,  # next quote@3
        ("A", 3): 11.0,  # quote@3 ties -> visible
        ("B", 5): None,  # no later quote
    }


def test_asof_forward_strict_excludes_ties(spark, trades, quotes):
    out = asof_join(
        trades, quotes, "sym", "tts", "qts", ["price"],
        direction="forward", strict=True,
    )
    got = {(r.sym, r.tts.hour): r.asof_price for r in out.collect()}
    assert got[("A", 3)] is None  # quote@3 NOT visible under strict


def test_asof_nearest_picks_smaller_gap_backward_on_tie(spark, quotes):
    t = spark.createDataFrame(
        [
            ("A", ts(2), 1),  # gap 1h back (q@1) vs 1h fwd (q@3): tie -> back
            ("A", ts(0), 2),  # only forward exists
            ("A", ts(9), 3),  # only backward exists
            ("B", ts(1), 4),  # forward q@2 nearer than nothing-backward
        ],
        "sym string, tts timestamp, qty int",
    )
    out = asof_join(
        t, quotes, "sym", "tts", "qts", ["price"], direction="nearest"
    )
    got = {r.qty: r.asof_price for r in out.collect()}
    assert got == {1: 10.0, 2: 10.0, 3: 11.0, 4: 20.0}


def test_asof_matches_pandas_merge_asof(spark, events):
    """Property check vs pandas.merge_asof on real data: for each
    purchase event, the latest prior signup of the same user."""
    import pandas as pd

    purchases = events.where("event_type = 'purchase'").select("user_id", "ts", "event_id")
    signups = events.where("event_type = 'signup'").select(
        "user_id", F.col("ts").alias("sts"), F.col("event_id").alias("signup_id")
    )
    out = asof_join(purchases, signups, "user_id", "ts", "sts", ["signup_id"])
    got = {r.event_id: r.asof_signup_id for r in out.collect()}

    pp = purchases.orderBy("ts").toPandas()
    sp = signups.orderBy("sts").toPandas()
    merged = pd.merge_asof(
        pp, sp.rename(columns={"sts": "ts"}), on="ts", by="user_id"
    )
    expected = {
        int(r.event_id): (None if pd.isna(r.signup_id) else int(r.signup_id))
        for r in merged.itertuples()
    }
    assert got == expected


def test_range_join(spark):
    left = spark.createDataFrame([(1, 10.0), (2, 55.0)], "lid long, v double")
    right = spark.createDataFrame(
        [(100, 12.0), (101, 19.0), (102, 54.0), (103, 70.0)], "rid long, v double"
    )
    out = range_join_buckets(left, right, "v", "v", 5.0)
    pairs = {(r.lid, r.r_rid) for r in out.collect()}
    assert pairs == {(1, 100), (2, 102)}


def test_range_join_matches_cartesian(spark, events):
    a = events.limit(120).select(F.col("event_id").alias("aid"), F.col("value").alias("av"))
    b = events.limit(120).select(F.col("event_id").alias("bid"), F.col("value").alias("bv"))
    fast = {
        (r.aid, r.r_bid)
        for r in range_join_buckets(a, b, "av", "bv", 1.5).collect()
    }
    slow = {
        (r.aid, r.bid)
        for r in a.crossJoin(b).where(F.abs(F.col("av") - F.col("bv")) <= 1.5).collect()
    }
    assert fast == slow


def test_two_phase_count_matches_plain(spark, events):
    from vanus_spark.operators.skew import two_phase_count

    fast = {r.event_type: r["count"] for r in two_phase_count(events, ["event_type"]).collect()}
    plain = {r.event_type: r.n for r in events.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    assert fast == plain


def test_salted_join_matches_plain_join(spark, events):
    from pyspark.sql import functions as F

    from vanus_spark.operators.skew import salted_join

    ev = events.select(
        "event_id",
        "value",
        F.when(F.col("event_type") == "view", F.lit(0))
        .otherwise(F.col("user_id"))
        .cast("long")
        .alias("k"),
    )
    dim = ev.select("k").distinct().select(
        "k", F.pmod(F.col("k"), F.lit(5)).alias("segment")
    )
    plain = sorted(
        (r.event_id, r.segment)
        for r in ev.join(dim, "k").select("event_id", "segment").collect()
    )
    salted = sorted(
        (r.event_id, r.segment)
        for r in salted_join(ev, dim, "k", hot_keys=[0], replicas=8)
        .select("event_id", "segment")
        .collect()
    )
    assert salted == plain


def test_salted_join_left_keeps_unmatched(spark):
    from vanus_spark.operators.skew import salted_join

    probe = spark.createDataFrame(
        [(0, "a"), (0, "b"), (1, "c"), (9, "d")], "k long, tag string"
    )
    build = spark.createDataFrame([(0, "hot"), (1, "cold")], "k long, lab string")
    out = salted_join(probe, build, "k", hot_keys=[0], replicas=4, how="left")
    got = {(r.k, r.tag): r.lab for r in out.collect()}
    assert got == {(0, "a"): "hot", (0, "b"): "hot", (1, "c"): "cold", (9, "d"): None}
