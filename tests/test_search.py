"""BM25 lexical retrieval (vanus_spark/llm/search.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_exact_small_corpus(spark):
    """Hand-computed BM25 on a 3-doc corpus matches to 1e-9."""
    from vanus_spark.llm.search import bm25_search

    docs = _docs(
        spark,
        [
            (1, "cat sat on the mat"),
            (2, "dog sat on the log"),
            (3, "cat cat cat everywhere"),
        ],
    )
    qs = spark.createDataFrame([(100, "cat sat")], "query_id long, query_text string")
    out = {
        (r.doc_id): (r.rank, r.score)
        for r in bm25_search(docs, qs, k=10).collect()
    }

    # hand derivation: N=3, dl = [5,5,4], avgdl = 14/3
    def idf(df):
        return math.log(1 + (3 - df + 0.5) / (df + 0.5))

    def tfn(tf, dl):
        return tf * (1.2 + 1.0) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / (14 / 3)))

    exp1 = idf(2) * tfn(1, 5) + idf(2) * tfn(1, 5)  # doc1: cat + sat
    exp2 = idf(2) * tfn(1, 5)  # doc2: sat only
    exp3 = idf(2) * tfn(3, 4)  # doc3: cat x3
    for did, exp in [(1, exp1), (2, exp2), (3, exp3)]:
        assert abs(out[did][1] - round(exp, 6)) < 1e-9, (did, out[did], exp)
    # doc1 matches both terms -> rank 1
    assert out[1][0] == 1


def test_bm25_rank_contract(spark, sf_dir):
    """Ranks are 1..n contiguous per query, scores non-increasing and
    positive, and top-k is respected."""
    from vanus_spark.llm.dedup import normalize_text
    from vanus_spark.llm.search import bm25_search

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    qs = docs.where(F.col("doc_id").isin(3, 17)).select(
        F.col("doc_id").alias("query_id"),
        F.array_join(
            F.slice(F.split(normalize_text(F.col("text")), " "), 1, 4), " "
        ).alias("query_text"),
    )
    rows = bm25_search(docs, qs, k=10).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        scores = [r.score for r in rs]
        assert scores == sorted(scores, reverse=True)
        assert len(rs) <= 10 and all(s > 0 for s in scores), qid


def test_bm25_empty_query_yields_no_rows(spark):
    from vanus_spark.llm.search import bm25_search

    docs = _docs(spark, [(1, "a b c")])
    qs = spark.createDataFrame([(9, "   ")], "query_id long, query_text string")
    assert bm25_search(docs, qs).count() == 0


def test_bm25_plan_shape(spark, sf_dir):
    """Pin the scale-shape: query/df/stats sides broadcast, no
    cartesian product, no sort-merge join anywhere in the plan."""
    from pyspark.sql import functions as F

    from vanus_spark.llm.dedup import normalize_text
    from vanus_spark.llm.search import bm25_search

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    qs = docs.where(F.col("doc_id") < 2).select(
        F.col("doc_id").alias("query_id"),
        F.substring(normalize_text(F.col("text")), 1, 20).alias("query_text"),
    )
    plan = (
        bm25_search(docs, qs)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_heavy_hitters_plan_shape(spark, sf_dir):
    """The exact recount must be a broadcast left-semi against the
    candidate set — never a shuffle of the vocabulary."""
    from vanus_spark.llm.search import tokens_df
    from vanus_spark.operators.sketch_topk import heavy_hitters

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        heavy_hitters(tokens_df(docs), "term", k=5, capacity=256)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftSemi" in plan and "Broadcast" in plan
    assert "CartesianProduct" not in plan


def test_tfidf_keywords_hand_computed(spark):
    import math

    from vanus_spark.llm.search import tfidf_keywords

    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry durian"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r.doc_id, r.term): (r.rank, r.score)
        for r in tfidf_keywords(docs, k=2).collect()
    }

    def score(tf, dl, df, n=3.0):
        return round(tf / dl * (math.log((1 + n) / (1 + df)) + 1), 6)

    # doc 1: apple tf=2 df=1, banana tf=1 df=2
    assert out[(1, "apple")] == (1, score(2, 3, 1))
    assert out[(1, "banana")] == (2, score(1, 3, 2))
    # doc 3: cherry tf=3 df=2 ranks above the rarer durian tf=1 df=1
    assert out[(3, "cherry")][0] == 1
    assert out[(3, "durian")][0] == 2
    # k=2 cap holds
    assert all(rank <= 2 for rank, _ in out.values())


def test_ranking_eval_golden(spark):
    """ranking_eval: hand-computed NDCG/MRR/recall on a tiny judged set."""
    import math

    from vanus_spark.llm.search import ranking_eval

    ranked = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3), (2, 20, 1), (2, 21, 2)],
        "query_id long, doc_id long, rank int",
    )
    truth = spark.createDataFrame(
        [(1, 11, 3), (1, 99, 1), (2, 20, 2)],
        "query_id long, doc_id long, grade int",
    )
    out = {r["query_id"]: r.asDict() for r in ranking_eval(ranked, truth, k=3).collect()}
    # q1: dcg = (2^3-1)/log2(3) at rank 2; idcg = 7/log2(2) + 1/log2(3)
    dcg = 7.0 / math.log2(3.0)
    idcg = 7.0 / 1.0 + 1.0 / math.log2(3.0)
    assert out[1]["ndcg_3"] == round(dcg / idcg, 6)
    assert out[1]["mrr"] == 0.5
    assert out[1]["recall_3"] == 0.5
    assert out[2]["ndcg_3"] == 1.0 and out[2]["mrr"] == 1.0
    assert out[2]["recall_3"] == 1.0 and out[2]["n_relevant"] == 1


def test_ranking_eval_keeps_unjudged_queries(spark):
    """Regression (round-7 advice): a query present in `ranked` with
    zero judged-relevant docs must still appear — ndcg NULL (no ideal
    ranking exists), mrr 0.0, recall 0.0, n_relevant 0 — instead of
    being dropped by an inner join against the truth aggregates."""
    from vanus_spark.llm.search import ranking_eval

    ranked = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (3, 30, 1), (3, 31, 2)],
        "query_id long, doc_id long, rank int",
    )
    truth = spark.createDataFrame(
        [(1, 10, 2)], "query_id long, doc_id long, grade int"
    )
    out = {r["query_id"]: r.asDict() for r in ranking_eval(ranked, truth, k=3).collect()}
    assert set(out) == {1, 3}
    assert out[3]["ndcg_3"] is None
    assert out[3]["mrr"] == 0.0
    assert out[3]["recall_3"] == 0.0
    assert out[3]["n_relevant"] == 0
    assert out[1]["ndcg_3"] == 1.0 and out[1]["n_relevant"] == 1
