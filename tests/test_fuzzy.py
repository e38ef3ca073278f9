"""Blocked fuzzy matching (vanus_spark/operators/fuzzy.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_fuzzy_self_pairs_hand_cases(spark):
    from vanus_spark.operators.fuzzy import fuzzy_self_pairs

    df = spark.createDataFrame(
        [
            (1, "cat"),
            (2, "cot"),   # substitution -> dist 1
            (3, "cats"),  # insertion -> dist 1
            (4, "dog"),   # unrelated
            (5, "cat"),   # exact dup -> dist 0
            (6, "tac"),   # shares deletion variants but dist 2 -> verified out
        ],
        "id long, name string",
    )
    out = {
        (r.id_l, r.id_r): r.dist
        for r in fuzzy_self_pairs(df, "name", "id", max_dist=1).collect()
    }
    assert out == {
        (1, 2): 1,
        (1, 3): 1,
        (1, 5): 0,
        (2, 5): 1,
        (3, 5): 1,
    }


def test_fuzzy_self_pairs_matches_brute_force(spark, sf_dir):
    from vanus_spark.operators.fuzzy import fuzzy_self_pairs

    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    blocked = set(
        (r.id_l, r.id_r)
        for r in fuzzy_self_pairs(sup, "s_name", "s_suppkey").collect()
    )
    a, b = sup.alias("a"), sup.alias("b")
    brute = set(
        (r.id_l, r.id_r)
        for r in a.join(b, F.col("a.s_suppkey") < F.col("b.s_suppkey"))
        .where(F.levenshtein(F.col("a.s_name"), F.col("b.s_name")) <= 1)
        .select(
            F.col("a.s_suppkey").alias("id_l"), F.col("b.s_suppkey").alias("id_r")
        )
        .collect()
    )
    assert blocked == brute and len(brute) > 0


def test_fuzzy_join_two_tables(spark):
    from vanus_spark.operators.fuzzy import fuzzy_join

    left = spark.createDataFrame([("alpha",), ("beta",)], "lname string")
    right = spark.createDataFrame([("alpho",), ("betas",), ("gamma",)], "rname string")
    rows = fuzzy_join(left, right, "lname", "rname").collect()
    assert {(r.lname, r.rname) for r in rows} == {
        ("alpha", "alpho"),
        ("beta", "betas"),
    }


def test_fuzzy_rejects_wide_radius(spark):
    from vanus_spark.operators.fuzzy import fuzzy_self_pairs

    df = spark.createDataFrame([(1, "x")], "id long, name string")
    with pytest.raises(ValueError):
        fuzzy_self_pairs(df, "name", "id", max_dist=3)
