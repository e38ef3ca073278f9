"""Lexical retrieval: BM25 full-text search over a document corpus.

The reference has no search engine; this belongs to the LLM-data-
pipeline layer (SURVEY north star): lexical top-k retrieval is the
workhorse for decontamination lookups ("is this eval question in the
corpus?"), dedup triage, and eval-set mining at corpus scale.

Scale design (100 TB):
- the inverted index is ONE ``explode`` + ONE ``groupBy(doc, term)``
  shuffle over the corpus; document length and per-term document
  frequency are partial aggregates over the same exploded frame
  (map-side combine does most of the work);
- corpus stats (N, avgdl) are a one-row aggregate, joined back as a
  broadcast — never a driver-side collect in the plan;
- the query side is tiny by construction and broadcast to the postings
  (partitioned by term), so candidate generation is a broadcast hash
  join + a (query, doc) partial aggregate. No cross join anywhere;
  top-k per query is a bounded per-query window over the candidate
  rows, not a global sort.

Scoring is Lucene-flavoured BM25:
    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
    tfn(t, d)   = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))
    score(q, d) = sum over DISTINCT query terms of idf * tfn
(query-side term frequency is deliberately not weighted; queries are
short probes here and the oracle mirrors the same convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from vanus_spark.llm.dedup import normalize_text


def tokens_df(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per (doc, token occurrence), whitespace tokens of the
    normalized (lowercase, collapsed-whitespace) text."""
    return (
        docs.select(
            F.col(id_col),
            F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("term"),
        )
        .where(F.col("term") != "")
    )


def bm25_index(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Build the inverted index. Returns ``(postings, term_df, stats)``:

    - postings: (id_col, term, tf, dl) — term frequency + doc length
    - term_df:  (term, dfreq) — document frequency per term
    - stats:    one row (n_docs, avgdl)

    The postings/doclen/df trio shares one tokenized frame; Catalyst
    reuses the scan, and each aggregate is a partial (map-side) combine
    before its single shuffle.
    """
    tk = tokens_df(docs, text_col, id_col)
    tf = tk.groupBy(id_col, "term").agg(F.count("*").cast("double").alias("tf"))
    # dl and term_df both derive from the tf AGGREGATE (not from tk):
    # all three consumers then share one tokenize+partial-aggregate
    # chain via ReusedExchange instead of re-tokenizing the corpus.
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    postings = tf.join(dl, id_col)
    term_df = tf.groupBy("term").agg(F.count("*").cast("double").alias("dfreq"))
    stats = dl.agg(
        F.count("*").cast("double").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    return postings, term_df, stats


def bm25_search(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
) -> DataFrame:
    """Top-k BM25 hits per query: (query_id, doc_id, rank, score).

    Ranking is deterministic: order by round(score, 9) DESC then doc id
    (ulp-level float divergence across engines cannot reorder, and
    exact-duplicate documents tie-break stably).
    """
    postings, term_df, stats = bm25_index(docs, text_col, id_col)
    q_terms = queries.select(
        F.col(query_id_col),
        F.explode(
            F.array_distinct(F.split(normalize_text(F.col(query_text_col)), " "))
        ).alias("term"),
    ).where(F.col("term") != "")

    from pyspark.sql.window import Window

    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("dfreq") + F.lit(0.5)) / (F.col("dfreq") + F.lit(0.5))
    )
    tfn = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    # restrict the vocab-sized term_df to the query vocabulary BEFORE
    # broadcasting — the full term_df is corpus-vocabulary-sized and must
    # never ship to every executor; filtered, it is bounded by the number
    # of distinct query terms.
    q_term_df = term_df.join(
        F.broadcast(q_terms.select("term").distinct()), "term"
    )
    cand = (
        postings.join(F.broadcast(q_terms), "term")
        .join(F.broadcast(q_term_df), "term")
        .join(F.broadcast(stats))
        .groupBy(query_id_col, id_col)
        .agg(F.sum(idf * tfn).alias("score"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.round("score", 9).desc(), F.col(id_col)
    )
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "rank", F.round("score", 6).alias("score"))
    )


def tfidf_keywords(
    docs: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k characteristic terms per document by smoothed TF-IDF:
    (id_col, term, rank, score) with

        score(t, d) = tf(t,d)/dl(d) * (ln((1 + N) / (1 + df(t))) + 1)

    (the sklearn ``smooth_idf`` convention — never divides by zero and
    keeps corpus-universal terms at idf 1 instead of 0, so they still
    rank below rare terms but are not erased).

    Scale design: reuses the bm25_index chain — ONE tokenize +
    partial-aggregate pass feeds tf/dl/df via ReusedExchange; the
    vocabulary-sized term_df joins the postings ON TERM as a key join
    (a 100 TB vocabulary must never broadcast); the corpus-stats row
    broadcasts; top-k is a bounded per-document window, not a global
    sort. Ranking is deterministic: round(score, 9) DESC then term
    (ulp-level float divergence across engines cannot reorder)."""
    from pyspark.sql.window import Window

    postings, term_df, stats = bm25_index(docs, text_col, id_col)
    score = (F.col("tf") / F.col("dl")) * (
        F.log((F.lit(1.0) + F.col("n_docs")) / (F.lit(1.0) + F.col("dfreq")))
        + F.lit(1.0)
    )
    w = Window.partitionBy(id_col).orderBy(
        F.round("score", 9).desc(), F.col("term")
    )
    return (
        postings.join(term_df, "term")
        .join(F.broadcast(stats))
        .withColumn("score", score)
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select(id_col, "term", "rank", F.round("score", 6).alias("score"))
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 10,
    c: int = 60,
    query_col: str = "query_id",
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal-rank fusion of N retrieval rankings (hybrid search:
    BM25 lexical + embedding ANN is the canonical pair). Each input is
    (query_col, id_col, rank); a document absent from a list simply
    contributes nothing (the standard RRF convention).

    score(d) = sum over lists of 1 / (c + rank_list(d))

    Shuffle shape: the inputs are already per-query top-k tables
    (bounded: #queries x k rows each), so the union + groupBy + window
    all run on candidate-sized data — fusion never touches the corpus.
    Determinism: contributions are exact reciprocals summed over at
    most N terms; ranking orders by round(rrf, 12) DESC then id, so
    single-list ties at equal rank break stably."""
    contrib = None
    for r in rankings:
        part = r.select(
            query_col,
            id_col,
            (
                F.lit(1.0) / (F.lit(float(c)) + F.col("rank").cast("double"))
            ).alias("contrib"),
        )
        contrib = part if contrib is None else contrib.unionByName(part)
    fused = contrib.groupBy(query_col, id_col).agg(
        F.sum("contrib").alias("rrf"), F.count("*").alias("n_lists")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy(query_col).orderBy(
        F.round("rrf", 12).desc(), F.col(id_col)
    )
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select(
            query_col, id_col, "rank", F.round("rrf", 9).alias("rrf"), "n_lists"
        )
    )


def ranking_eval(
    ranked: DataFrame,
    truth: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Offline ranking-quality metrics — the eval loop every retrieval
    stack (BM25, hybrid, ANN) runs against a judged set: per query,
    NDCG@k (graded, 2^g-1 gains, log2(rank+1) discounts), MRR (first
    relevant hit), and recall@k.

    ``ranked``: (query_id, doc_id, rank) with rank starting at 1;
    ``truth``: (query_id, doc_id, grade) with grade >= 1 for every
    judged-relevant doc (absent pair = irrelevant).

    Shape: one broadcast-friendly left join of the top-k lists against
    the truth table, a per-query partial aggregate, and a bounded
    per-query window on the truth side for IDCG — no shuffle larger
    than the judged set. The metric sums are <= k doubles each, so a
    round(6) absorbs cross-engine fold-order drift (the BM25/idf
    precedent).

    Reference parity: no retrieval surface exists in the reference
    event engine; this is part of the LLM-pipeline eval family the
    Spark port adds (decontamination / eval-mining quality control).
    """
    from pyspark.sql import Window

    r = ranked.where(F.col("rank") <= k)
    j = r.join(truth, ["query_id", "doc_id"], "left").withColumn(
        "g", F.coalesce("grade", F.lit(0)).cast("double")
    )
    gain = (F.pow(F.lit(2.0), F.col("g")) - F.lit(1.0)) / F.log2(
        F.col("rank") + F.lit(1.0)
    )
    got = j.groupBy("query_id").agg(
        F.sum(gain).alias("dcg"),
        F.min(F.when(F.col("g") >= 1, F.col("rank"))).alias("first_rel"),
        F.count(F.when(F.col("g") >= 1, F.lit(1))).alias("n_rel_retrieved"),
    )
    # ideal DCG: the truth set's top-k grades in (grade desc, doc_id)
    # order — doc_id tiebreak makes the window deterministic
    iw = Window.partitionBy("query_id").orderBy(
        F.desc("grade"), F.asc("doc_id")
    )
    ideal = (
        truth.withColumn("irank", F.row_number().over(iw))
        .where(F.col("irank") <= k)
        .groupBy("query_id")
        .agg(
            F.sum(
                (F.pow(F.lit(2.0), F.col("grade").cast("double")) - F.lit(1.0))
                / F.log2(F.col("irank") + F.lit(1.0))
            ).alias("idcg")
        )
    )
    n_rel = truth.groupBy("query_id").agg(F.count("*").alias("n_relevant"))
    # LEFT joins from the retrieved side: a query with no judged-
    # relevant docs still gets a row (ndcg NULL — undefined without an
    # ideal ranking; mrr/recall 0.0; n_relevant 0) instead of being
    # silently dropped from the eval.
    return (
        got.join(ideal, "query_id", "left")
        .join(n_rel, "query_id", "left")
        .select(
            "query_id",
            F.round(F.col("dcg") / F.col("idcg"), 6).alias(f"ndcg_{k}"),
            F.round(
                F.coalesce(F.lit(1.0) / F.col("first_rel"), F.lit(0.0)), 6
            ).alias("mrr"),
            F.round(
                F.coalesce(
                    F.col("n_rel_retrieved") / F.col("n_relevant").cast("double"),
                    F.lit(0.0),
                ),
                6,
            ).alias(f"recall_{k}"),
            F.coalesce("n_relevant", F.lit(0)).alias("n_relevant"),
        )
    )
