"""End-to-end corpus cleaning: the composition a 100 TB training-data
pipeline actually runs.

    raw documents
      -> exact dedup           (content-hash groupBy)
      -> near-dup removal      (MinHash LSH -> Jaccard >= t, greedy
                                keep-lowest-id per pair)
      -> quality filter        (composite score >= threshold)
      -> language filter       (marker-based lang id)
      -> profile               (token counts etc. for training stats)

Every stage is a DataFrame transform; the whole pipeline is ONE lazy
plan, so Catalyst fuses the scans and the only shuffles are the two
dedup aggregations and the LSH bucket join. The greedy near-dup rule
(drop the higher id of every surviving pair) is the standard scalable
approximation of connected-component clustering — one anti-join
instead of an iterative algorithm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from vanus_spark.llm.dedup import exact_dedup_rows, near_dup_pairs, shingles_df
from vanus_spark.llm.textstats import lang_id_df, quality_score, text_profile


def corpus_clean(
    docs: DataFrame,
    jaccard_threshold: float = 0.8,
    quality_threshold: float = 0.5,
    languages: tuple[str, ...] = ("en",),
    id_col: str = "doc_id",
    text_col: str = "text",
    persist_signatures: bool = True,
) -> DataFrame:
    """Returns the cleaned corpus (surviving rows of ``docs``).

    The shingle set is computed ONCE and persisted
    (MEMORY_AND_DISK), then reused by the MinHash signature chain and
    the Jaccard verification — hash the corpus once, join candidates
    against the stored table. At 100 TB the persist becomes a written
    ``(doc_id, sh)`` / ``(doc_id, sig)`` table bucketed by band key;
    the plan shape is identical."""
    survivors = exact_dedup_rows(docs, text_col, id_col)
    sh = shingles_df(survivors, text_col, id_col)
    if persist_signatures:
        sh = sh.persist(StorageLevel.MEMORY_AND_DISK)
    dup_pairs = near_dup_pairs(
        survivors,
        threshold=jaccard_threshold,
        text_col=text_col,
        id_col=id_col,
        shingle_df=sh,
    )
    drop_ids = dup_pairs.select(F.col("id_b").alias(id_col)).distinct()
    survivors = survivors.join(drop_ids, id_col, "left_anti")
    survivors = survivors.where(
        F.round(quality_score(F.col(text_col)), 6) >= quality_threshold
    )
    langs = lang_id_df(survivors, text_col, id_col)
    survivors = survivors.join(
        langs.where(F.col("lang_pred").isin(*languages)).select(id_col), id_col, "left_semi"
    )
    return survivors


def corpus_clean_report(docs: DataFrame, **kwargs) -> DataFrame:
    """Cleaned corpus + per-document profile (the training-stats row)."""
    cleaned = corpus_clean(docs, **kwargs)
    return text_profile(cleaned)
