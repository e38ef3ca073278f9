"""Scale probe for the seventh-session operators: all-pairs TF-IDF
cosine, exact Jaccard prefix join, k-core peeling, exact-integer PCA,
greedy max-coverage, item-item co-occurrence.

Two corpus-growth modes, because similarity joins have two distinct
scale regimes:
- UNIQUE mode suffixes every token with the replica index — replicas
  share no terms, so candidate generation cannot couple them and the
  honest expectation is ~linear growth;
- DUP mode rotates word order only (bag-of-words identical) — every
  replica of a doc is a true near-duplicate, so the OUTPUT pair count
  itself grows ~R^2/2 per base doc and the measured superlinearity is
  genuine duplicate-pair volume, not join waste (the same accounting
  the round-4 near-dup probe established).

Protocol: noop WRITE, one op at a time, JSON lines for SCALING.md.
Usage: python tools/probe_session7.py [R ...]   (default 1 5 10)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("PYTHONPATH", "/root/repo")

from pyspark.sql import DataFrame, functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicate_rotate(docs: DataFrame, r: int) -> DataFrame:
    """R copies, replica k rotates the word order by k (same bag)."""
    if r == 1:
        return docs
    reps = F.explode(F.sequence(F.lit(0), F.lit(r - 1))).alias("rep")
    out = docs.select("doc_id", "text", reps)
    words = F.split("text", " ")
    k = F.col("rep") % F.greatest(F.size(words), F.lit(1))
    rotated = F.concat_ws(
        " ",
        F.flatten(
            F.array(
                F.slice(words, k + 1, F.size(words)),
                F.slice(words, F.lit(1), k),
            )
        ),
    )
    return out.select(
        (F.col("doc_id") * r + F.col("rep")).alias("doc_id"),
        rotated.alias("text"),
    )


def replicate_unique(docs: DataFrame, r: int) -> DataFrame:
    """R copies, replica k suffixes EVERY word with _k — disjoint
    vocabularies, so similarity joins cannot couple replicas."""
    if r == 1:
        return docs
    reps = F.explode(F.sequence(F.lit(0), F.lit(r - 1))).alias("rep")
    out = docs.select("doc_id", "text", reps)
    suff = F.concat(F.lit("_"), F.col("rep").cast("string"))
    words = F.transform(F.split("text", " "), lambda w: F.concat(w, suff))
    return out.select(
        (F.col("doc_id") * r + F.col("rep")).alias("doc_id"),
        F.concat_ws(" ", words).alias("text"),
    )


def _noop(df: DataFrame) -> tuple[float, int]:
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    dt = time.monotonic() - t0
    return dt


def main() -> None:
    from vanus_spark import get_spark
    from vanus_spark.llm.allpairs import (
        jaccard_prefix_join,
        tfidf_cosine_pairs,
    )
    from vanus_spark.llm.dedup import shingles_df
    from vanus_spark.llm.graphs import kcore
    from vanus_spark.llm.selection import greedy_max_coverage
    from vanus_spark.operators.pca import (
        gram_matrix_exact,
        power_iteration_exact,
    )
    from vanus_spark.sources import load_table

    multiples = [int(a) for a in sys.argv[1:]] or [1, 5, 10]
    spark = get_spark(
        "probe_session7", int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    )
    docs0 = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    emb0 = load_table(spark, SF_DIR, "embeddings")
    li0 = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_partkey"
    )

    def emit(op, r, rows, sec, out):
        print(
            json.dumps(
                {"op": op, "multiple": r, "rows": rows, "sec": round(sec, 2), "out": out}
            ),
            flush=True,
        )

    for r in multiples:
        uniq = replicate_unique(docs0, r).localCheckpoint(eager=True)
        dup = replicate_rotate(docs0, r).localCheckpoint(eager=True)
        n = uniq.count()

        for mode, d in (("unique", uniq), ("dup", dup)):
            t0 = time.monotonic()
            pairs = tfidf_cosine_pairs(d, threshold=0.6)
            cnt = pairs.count()
            emit(f"tfidf_cosine[{mode}]", r, n, time.monotonic() - t0, cnt)

            t0 = time.monotonic()
            jp = jaccard_prefix_join(d, threshold=0.5)
            cnt = jp.count()
            emit(f"jaccard_prefix[{mode}]", r, n, time.monotonic() - t0, cnt)

        # k-core on a hash-random graph over the replicated doc ids
        t0 = time.monotonic()
        ids = uniq.select("doc_id")
        h = lambda j: F.conv(  # noqa: E731
            F.substring(
                F.md5(F.concat_ws(":", F.col("doc_id").cast("string"), F.lit(j))),
                1, 8,
            ), 16, 10,
        ).cast("long")
        edges = (
            ids.select(
                "doc_id",
                F.explode(F.sequence(F.lit(0), (F.lit(1) + h("99") % 7).cast("int"))).alias("j"),
            )
            .select(
                F.col("doc_id").alias("src"),
                (h(F.col("j")) % (500 * r)).alias("dst"),
            )
            .where(F.col("src") != F.col("dst"))
            .distinct()
        )
        core = kcore(edges, k=5, max_rounds=30)
        cnt = core.count()
        emit("kcore[k=5]", r, n, time.monotonic() - t0, cnt)

        # exact-integer PCA: gram + 4 iterations over replicated vectors
        embr = emb0
        if r > 1:
            reps = F.explode(F.sequence(F.lit(0), F.lit(r - 1))).alias("rep")
            embr = emb0.select("vec_id", "embedding", reps).select(
                (F.col("vec_id") * r + F.col("rep")).alias("vec_id"),
                "embedding",
            )
        embr = embr.localCheckpoint(eager=True)
        t0 = time.monotonic()
        qv = embr.select(
            F.transform(
                "embedding",
                lambda x, i: F.round(x.cast("double") * 100).cast("long")
                + ((F.col("vec_id") % 7) - 3) * 8 * ((i % 5) - 2),
            ).alias("qvec")
        )
        comp = power_iteration_exact(
            spark, gram_matrix_exact(qv, dim=64), dim=64, iters=4
        )
        cnt = comp.count()
        emit("pca_power", r, embr.count(), time.monotonic() - t0, cnt)

        # greedy max-coverage, k=5 (unique corpus: coverage grows)
        t0 = time.monotonic()
        ds = shingles_df(uniq).select(
            "doc_id", F.explode("sh").alias("shingle")
        )
        picks = greedy_max_coverage(ds, k=5)
        emit("greedy_k5", r, n, time.monotonic() - t0, len(picks))

        # item-item co-occurrence on replicated orders
        lir = li0
        if r > 1:
            reps = F.explode(F.sequence(F.lit(0), F.lit(r - 1))).alias("rep")
            lir = li0.select("l_orderkey", "l_partkey", reps).select(
                (F.col("l_orderkey") * r + F.col("rep")).alias("l_orderkey"),
                "l_partkey",
            )
        lir = lir.distinct().localCheckpoint(eager=True)
        t0 = time.monotonic()
        a = lir.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("pa"))
        b = lir.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("pb"))
        cooc = (
            a.join(b, "o")
            .where(F.col("pa") < F.col("pb"))
            .groupBy("pa", "pb")
            .agg(F.count("*").alias("cooc"))
            .where(F.col("cooc") >= 2)
        )
        cnt = cooc.count()
        emit("item_cooc", r, lir.count(), time.monotonic() - t0, cnt)

        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
