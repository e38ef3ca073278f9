"""Bloom-filter join pruning (operators/bloom.py): exactness vs the
plain join, false-positive tolerance at tiny bit budgets, prefilter
placement below the join exchange, and the guard against
fact-preserving join types."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vanus_spark.operators.bloom import (
    _probe_filter,
    bloom_bitmap,
    bloom_prune_join,
)


def _tables(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    od = spark.read.parquet(f"{sf_dir}/orders.parquet").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return li, od


def _agg(df):
    return (
        df.groupBy("l_returnflag")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_extendedprice"), 2).alias("s"))
        .orderBy("l_returnflag")
        .collect()
    )


def test_result_equals_plain_join(spark, sf_dir):
    li, od = _tables(spark, sf_dir)
    pruned = bloom_prune_join(li, od, "l_orderkey", "o_orderkey", num_bits=1 << 14)
    plain = li.join(od, li.l_orderkey == od.o_orderkey)
    assert _agg(pruned) == _agg(plain)


def test_tiny_bitmap_keeps_exactness(spark, sf_dir):
    """At 128 bits the prefilter passes nearly everything (dense
    bitmap, many false positives) — the exact join must still produce
    the plain-join result, and the prefilter must never drop a true
    match (no false negatives)."""
    li, od = _tables(spark, sf_dir)
    pruned = bloom_prune_join(li, od, "l_orderkey", "o_orderkey", num_bits=128)
    plain = li.join(od, li.l_orderkey == od.o_orderkey)
    assert _agg(pruned) == _agg(plain)
    pre = _probe_filter(
        li.crossJoin(F.broadcast(bloom_bitmap(od, "o_orderkey", 128))),
        "l_orderkey",
        128,
        3,
    )
    assert pre.count() >= plain.count()


def test_prefilter_selectivity(spark, sf_dir):
    """At a healthy bit budget the prefilter passes ~only the true
    matches: on the urgent-orders fixture that's a >3x fact-row
    reduction BEFORE the join shuffle."""
    li, od = _tables(spark, sf_dir)
    nb = 1 << 14
    pre = _probe_filter(
        li.crossJoin(F.broadcast(bloom_bitmap(od, "o_orderkey", nb))),
        "l_orderkey",
        nb,
        3,
    )
    true_matches = li.join(od, li.l_orderkey == od.o_orderkey).count()
    kept = pre.count()
    assert true_matches <= kept < li.count() / 3


def test_bitmap_is_dense_array(spark, sf_dir):
    _, od = _tables(spark, sf_dir)
    row = bloom_bitmap(od, "o_orderkey", 1 << 14).collect()
    assert len(row) == 1
    words = row[0]["words"]
    assert len(words) == (1 << 14) // 64
    density = sum(bin(w & (2**64 - 1)).count("1") for w in words) / (1 << 14)
    assert 0 < density < 0.5, f"density {density} out of the useful range"


def test_prune_happens_below_the_join_exchange(spark, sf_dir):
    """With broadcast disabled the final join is a shuffle join; the
    Bloom probe filter (element_at over the bitmap words) must sit
    BELOW the fact side's Exchange — i.e. rows are dropped before they
    are shuffled. Plans print top-down, so the first Exchange string
    index precedes the probe filter's."""
    li, od = _tables(spark, sf_dir)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = bloom_prune_join(li, od, "l_orderkey", "o_orderkey", num_bits=1 << 14)
        out.write.format("noop").mode("overwrite").save()
        plan = out._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
    assert "element_at(words" in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan)
    first_exchange = plan.index("Exchange")
    probe = plan.index("element_at(words")
    assert first_exchange < probe, "probe filter ended up above the join exchange"


def test_fact_preserving_joins_rejected(spark, sf_dir):
    li, od = _tables(spark, sf_dir)
    with pytest.raises(ValueError, match="bloom pruning"):
        bloom_prune_join(li, od, "l_orderkey", "o_orderkey", how="left")


def test_semi_join_shape(spark, sf_dir):
    li, od = _tables(spark, sf_dir)
    semi = bloom_prune_join(li, od, "l_orderkey", "o_orderkey", how="left_semi")
    plain_semi = li.join(od, li.l_orderkey == od.o_orderkey, "left_semi")
    assert semi.count() == plain_semi.count()
    assert semi.columns == li.columns


# ---------------------------------------------------------------------------
# bloom anti join (the incremental-dedup split)
# ---------------------------------------------------------------------------

def test_anti_join_equals_plain_anti(spark, sf_dir):
    from vanus_spark.operators.bloom import bloom_anti_join

    li, od = _tables(spark, sf_dir)
    got = bloom_anti_join(li, od, "l_orderkey", "o_orderkey", num_bits=1 << 14)
    plain = li.join(od, li.l_orderkey == od.o_orderkey, "left_anti")
    assert got.count() == plain.count()
    assert sorted(got.columns) == sorted(li.columns)
    a = {tuple(r) for r in got.select("l_orderkey", "l_linenumber").collect()}
    b = {tuple(r) for r in plain.select("l_orderkey", "l_linenumber").collect()}
    assert a == b


def test_anti_join_exact_even_with_dense_bitmap(spark, sf_dir):
    """At 128 bits nearly every row bloom-hits (false positives), so
    nearly everything routes through the exact anti join — the result
    must still be the plain anti join."""
    from vanus_spark.operators.bloom import bloom_anti_join

    li, od = _tables(spark, sf_dir)
    got = bloom_anti_join(li, od, "l_orderkey", "o_orderkey", num_bits=128)
    plain = li.join(od, li.l_orderkey == od.o_orderkey, "left_anti")
    assert got.count() == plain.count()


def test_anti_join_miss_path_carries_most_rows(spark, sf_dir):
    """With a healthy bit budget, the definite-miss fraction (rows
    bypassing the join) should be ~the true new fraction — that's the
    whole scale argument."""
    from vanus_spark.operators.bloom import (
        _probed,
        bloom_bitmap,
    )

    li, od = _tables(spark, sf_dir)
    bm = F.broadcast(bloom_bitmap(od, "o_orderkey", 1 << 14))
    probed, pred, tmp = _probed(li.crossJoin(bm), "l_orderkey", 1 << 14, 3)
    n_miss = probed.where(~pred).count()
    true_new = li.join(od, li.l_orderkey == od.o_orderkey, "left_anti").count()
    assert n_miss <= true_new  # misses are provably new
    assert n_miss >= true_new * 0.95  # and nearly all new rows miss
