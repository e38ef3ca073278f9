"""All-pairs document similarity: TF-IDF cosine via an inverted-index
join (the AllPairs / prefix-filtering family of set-similarity joins).

MinHash-LSH (llm/dedup.py) answers "which pairs are probably similar"
probabilistically; this operator computes the EXACT sparse-vector
cosine for every pair that shares at least one indexed term — the
workhorse for dedup triage, plagiarism detection, and citation-graph
construction where the score itself matters, not just the bucket.

Scale design (100 TB):
- the index is ONE tokenize + ONE (doc, term) aggregate — the same
  chain BM25 shares (llm/search.py), map-side combined;
- candidate generation self-joins the postings list on ``term``: the
  per-term fan-out is df(t)^2, so ubiquitous terms (stop words) would
  quadratically dominate. ``max_df_ratio`` drops terms whose document
  frequency exceeds the cap BEFORE the join — the classic df-pruning
  of AllPairs (Bayardo et al., WWW'07), and the same safety valve as
  ``bucket_cap`` in the LSH band join. Dropped terms only ever LOWER
  a cosine, so the pruned score is the defined semantics and the
  oracle applies the identical cap;
- pair scores are one partial-aggregated sum per (doc_l, doc_r) —
  no driver-side collect anywhere, and the threshold filter runs
  inside the aggregate's HAVING so sub-threshold pairs never leave
  the shuffle.

Reference: the vanus reference has no similarity join; this extends
the LLM-data-pipeline layer (SURVEY north star) alongside
llm/dedup.py's MinHash/SimHash family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from vanus_spark.llm.search import tokens_df


def tfidf_unit_vectors(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df_ratio: float = 0.5,
) -> DataFrame:
    """(id_col, term, w): L2-normalized TF-IDF weights per document.

    idf = ln(n_docs / df); terms with df > max_df_ratio * n_docs are
    dropped before weighting (df-pruning, see module doc). The norm is
    computed over the KEPT terms, so every surviving vector is exactly
    unit length and pair dots are true cosines of the pruned vectors.
    """
    tk = tokens_df(docs, text_col, id_col)
    tf = tk.groupBy(id_col, "term").agg(F.count("*").cast("double").alias("tf"))
    df = tf.groupBy("term").agg(F.count("*").cast("double").alias("dfreq"))
    n_docs = docs.select(F.count("*").cast("double").alias("n_docs"))
    kept = (
        df.crossJoin(F.broadcast(n_docs))
        .where(F.col("dfreq") <= F.lit(max_df_ratio) * F.col("n_docs"))
        .select("term", (F.log(F.col("n_docs") / F.col("dfreq"))).alias("idf"))
    )
    w = tf.join(kept, "term").select(
        id_col, "term", (F.col("tf") * F.col("idf")).alias("w")
    )
    norm = w.groupBy(id_col).agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    return w.join(norm, id_col).select(
        id_col, "term", (F.col("w") / F.col("nrm")).alias("w")
    )


def tfidf_cosine_pairs(
    docs: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df_ratio: float = 0.5,
) -> DataFrame:
    """(id_l, id_r, cosine) for every ordered pair (id_l < id_r)
    sharing >= 1 kept term with cosine >= threshold.

    The cosine is exact for the df-pruned vectors: candidate pairs
    come from the inverted-index self-join on ``term`` and the score
    is sum(w_l * w_r) over shared terms of two unit vectors.
    """
    unit = tfidf_unit_vectors(docs, text_col, id_col, max_df_ratio)
    left = unit.select(
        F.col(id_col).alias("id_l"), "term", F.col("w").alias("w_l")
    )
    right = unit.select(
        F.col(id_col).alias("id_r"), "term", F.col("w").alias("w_r")
    )
    return (
        left.join(right, "term")
        .where(F.col("id_l") < F.col("id_r"))
        .groupBy("id_l", "id_r")
        .agg(F.sum(F.col("w_l") * F.col("w_r")).alias("cosine"))
        .where(F.col("cosine") >= F.lit(threshold))
    )


def jaccard_prefix_join(
    docs: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """(id_a, id_b, jaccard): every pair with EXACT word-n-gram-shingle
    Jaccard >= threshold — the lossless counterpart of the MinHash-LSH
    pipeline (which is probabilistic: dedup_lsh_recall measures 0.96).

    PPJoin-style prefix filtering (Xiao et al., WWW'08): order every
    document's shingles by a single GLOBAL rarity rank (document
    frequency asc, shingle asc — deterministic), index only each set's
    first m - ceil(t*m) + 1 shingles, and candidate-join on that
    prefix. The pigeonhole lemma guarantees any pair with J >= t
    shares a prefix token under a common order, so the join is
    LOSSLESS while pruning the quadratic inverted-index fan-out (rare
    tokens lead the order, so prefix postings lists are the short
    ones). Exact Jaccard verification reuses
    ``dedup.ngram_jaccard_pairs`` — the explode only ever touches
    candidates.

    At 100 TB: one shingle pass + one df aggregate + a per-doc sort of
    its own (bounded) shingle array; the candidate join shuffles only
    prefix-token postings. The oracle is the quadratic exact-Jaccard
    restatement, proving losslessness on the fixture.
    """
    from vanus_spark.llm.dedup import ngram_jaccard_pairs, shingles_df

    sh = shingles_df(docs, text_col, id_col, n).localCheckpoint(eager=True)
    long = sh.select(id_col, F.explode("sh").alias("shingle"))
    df = long.groupBy("shingle").agg(F.count("*").alias("dfreq"))
    ranked = long.join(df, "shingle").select(
        id_col, "shingle", F.struct("dfreq", "shingle").alias("_ord")
    )
    w = Window.partitionBy(id_col).orderBy("_ord")
    sized = long.groupBy(id_col).agg(F.count("*").alias("m"))
    prefix = (
        ranked.withColumn("rnk", F.row_number().over(w))
        .join(sized, id_col)
        .where(
            F.col("rnk")
            <= F.col("m") - F.ceil(F.lit(threshold) * F.col("m")) + 1
        )
        .select(id_col, "shingle")
    )
    cand = (
        prefix.select(F.col(id_col).alias("id_a"), "shingle")
        .join(
            prefix.select(F.col(id_col).alias("id_b"), "shingle"), "shingle"
        )
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return ngram_jaccard_pairs(
        docs, cand, text_col, id_col, n, shingle_df=sh
    ).where(F.col("jaccard") >= F.lit(threshold))
