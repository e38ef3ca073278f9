"""Count-Min sketch (operators/countmin.py), SCD2 builder
(operators/scd.py), and directed containment (llm/dedup.py)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_cm_never_undercounts_and_is_bounded(spark):
    from vanus_spark.operators.countmin import cm_estimate, cm_sketch

    toks = spark.createDataFrame(
        [(w,) for w in "a b c a b a d e f g h a b c".split()], "term string"
    )
    sk = cm_sketch(toks, "term", depth=3, width=8)
    assert sk.count() <= 3 * 8
    exact = toks.groupBy("term").agg(F.count("*").alias("exact_cnt"))
    est = cm_estimate(sk, exact.select("term"), "term", depth=3, width=8)
    rows = {r.term: (r.exact_cnt, r.cm_est) for r in exact.join(est, "term").collect()}
    assert len(rows) == 8
    for term, (ex, cm) in rows.items():
        assert cm >= ex, term


def test_cm_sketches_merge_by_addition(spark):
    """Linearity: sketch(A ∪ B) == elementwise sketch(A) + sketch(B)."""
    from vanus_spark.operators.countmin import cm_sketch

    a = spark.createDataFrame([(w,) for w in "x y z x".split()], "term string")
    b = spark.createDataFrame([(w,) for w in "y z q".split()], "term string")
    merged = (
        cm_sketch(a, "term", 2, 16)
        .unionByName(cm_sketch(b, "term", 2, 16))
        .groupBy("d", "cell")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = cm_sketch(a.unionByName(b), "term", 2, 16)
    lhs = {(r.d, r.cell): r.cnt for r in merged.collect()}
    rhs = {(r.d, r.cell): r.cnt for r in whole.collect()}
    assert lhs == rhs


def test_scd2_runs_and_intervals(spark):
    from vanus_spark.operators.scd import scd2_build

    rows = [
        (1, 1, "gold"),
        (1, 2, "gold"),
        (1, 3, "silver"),
        (1, 5, "gold"),
        (2, 4, "bronze"),
    ]
    df = spark.createDataFrame(rows, "k long, t long, attr string")
    out = sorted(
        (r.k, r.attr, r.valid_from, r.valid_to, r.is_current)
        for r in scd2_build(df, "k", "attr", ["t"]).collect()
    )
    assert out == [
        (1, "gold", 1, 3, False),
        (1, "gold", 5, None, True),
        (1, "silver", 3, 5, False),
        (2, "bronze", 4, None, True),
    ]


def test_containment_catches_quote_inclusion_jaccard_misses(spark):
    from vanus_spark.llm.dedup import containment_pairs, ngram_jaccard_pairs

    short = "alpha beta gamma delta epsilon"
    long = short + " " + " ".join(f"w{i} x{i} y{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, short), (2, long)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    c = containment_pairs(docs, pairs).collect()[0]
    j = ngram_jaccard_pairs(docs, pairs).collect()[0]
    assert c.containment_a > 0.99  # the short doc is fully contained
    assert c.containment_b < 0.1
    assert j.jaccard < 0.1  # jaccard alone would never flag this pair
