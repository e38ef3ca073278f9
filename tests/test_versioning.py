"""Corpus versioning operators: snapshot diff, deterministic shuffle,
NB classifier, and the exact-digest ingest tier with windowed metrics."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# corpus_diff
# ---------------------------------------------------------------------------

def test_corpus_diff_statuses(spark):
    from vanus_spark.llm.versioning import corpus_diff, diff_summary

    old = _docs(
        spark,
        [(1, "alpha"), (2, "bravo"), (3, "charlie"), (4, "delta")],
    )
    new = _docs(
        spark,
        [(1, "alpha"), (2, "bravo EDITED"), (5, "echo")],
    )
    got = {r.doc_id: r.status for r in corpus_diff(old, new).collect()}
    assert got == {
        1: "unchanged",
        2: "changed",
        3: "removed",
        4: "removed",
        5: "added",
    }
    summary = {r.status: r.n_docs for r in diff_summary(corpus_diff(old, new)).collect()}
    assert summary == {"unchanged": 1, "changed": 1, "removed": 2, "added": 1}


def test_corpus_diff_is_content_not_byte_diff(spark):
    from vanus_spark.llm.versioning import corpus_diff

    old = _docs(spark, [(1, "Hello   World")])
    new = _docs(spark, [(1, "hello world")])
    [r] = corpus_diff(old, new).collect()
    assert r.status == "unchanged"  # normalization collapses the edit


# ---------------------------------------------------------------------------
# deterministic_shuffle
# ---------------------------------------------------------------------------

def test_shuffle_reproducible_and_sharded(spark):
    from vanus_spark.llm.versioning import deterministic_shuffle

    docs = _docs(spark, [(i, f"doc {i}") for i in range(200)])
    a = deterministic_shuffle(docs, n_shards=4, seed=1).collect()
    b = deterministic_shuffle(docs, n_shards=4, seed=1).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # same seed -> same order
    assert {r.shard for r in a} <= set(range(4))
    # per-shard positions are contiguous 1..n
    by_shard: dict[int, list[int]] = {}
    for r in a:
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # a different seed gives a different permutation
    c = deterministic_shuffle(docs, n_shards=4, seed=2).collect()
    order_a = [r.doc_id for r in sorted(a, key=lambda r: (r.shard, r.pos))]
    order_c = [r.doc_id for r in sorted(c, key=lambda r: (r.shard, r.pos))]
    assert order_a != order_c


# ---------------------------------------------------------------------------
# Naive-Bayes classifier
# ---------------------------------------------------------------------------

def test_nb_classifier_separates_vocabularies(spark):
    from vanus_spark.llm.qualityrules import nb_score, nb_train

    labeled = spark.createDataFrame(
        [
            (1, 1, "good clean prose text here"),
            (2, 1, "clean prose with good words"),
            (3, 0, "spam junk click buy now"),
            (4, 0, "junk spam buy click offer"),
        ],
        "doc_id long, label int, text string",
    )
    word_df, stats_df = nb_train(labeled)
    score_docs = spark.createDataFrame(
        [(10, "clean good prose"), (11, "spam click buy")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in nb_score(score_docs, word_df, stats_df).collect()}
    assert got[10].pred and got[10].score > 0
    assert not got[11].pred and got[11].score < 0
    assert got[10].n_tokens == 3


def test_nb_oov_scores_by_prior_and_class_mass(spark):
    from vanus_spark.llm.qualityrules import nb_score, nb_train

    labeled = spark.createDataFrame(
        [(1, 1, "a b"), (2, 0, "c d"), (3, 0, "e f")],
        "doc_id long, label int, text string",
    )
    word_df, stats_df = nb_train(labeled)
    unseen = spark.createDataFrame([(9, "zz yy")], "doc_id long, text string")
    [r] = nb_score(unseen, word_df, stats_df).collect()
    # all-OOV: score = ln(1/2) + 2 * (ln(4+6) - ln(2+6))
    import math

    expected = math.log(1 / 2) + 2 * (math.log(10) - math.log(8))
    assert abs(r.score - round(expected, 6)) < 1e-9


# ---------------------------------------------------------------------------
# exact-digest ingest tier + windowed metrics
# ---------------------------------------------------------------------------

def test_exact_ingest_tier_and_windowed_metrics(spark):
    from vanus_spark.streaming.dedup_ingest import DedupIngestLoop, windowed_metrics

    loop = DedupIngestLoop(spark, lsh=False)
    b0 = _docs(spark, [(1, "one"), (2, "two"), (3, "one")])  # 3 dups 1 within
    b1 = _docs(spark, [(4, "two"), (5, "three")])  # 4 dups vs stored state
    b2 = _docs(spark, [(6, "three"), (7, "four")])
    b3 = _docs(spark, [(8, "four"), (9, "five"), (10, "five")])
    for b in (b0, b1, b2, b3):
        loop.process_batch(b)
    accepted = {r.doc_id for r in loop.corpus.collect()}
    assert accepted == {1, 2, 5, 7, 9}
    m = {r.batch: r for r in loop.metrics_df().collect()}
    assert (m[0].n_in, m[0].accepted) == (3, 2)
    assert (m[1].n_in, m[1].accepted) == (2, 1)
    assert (m[3].n_in, m[3].accepted) == (3, 1)
    w = {r.win: r for r in windowed_metrics(loop.metrics_df(), every=2).collect()}
    assert (w[0].n_in, w[0].accepted, w[0].rejected) == (5, 3, 2)
    assert (w[1].n_in, w[1].accepted) == (5, 2)
    assert abs(w[0].acceptance_rate - 0.6) < 1e-9


def test_metrics_stream_live_table(spark, tmp_path):
    """run_stream with metrics_dir feeds a real readStream +
    windowed_metrics aggregation (the live corpus-growth table)."""
    from vanus_spark.streaming.dedup_ingest import (
        DedupIngestLoop,
        metrics_stream,
        windowed_metrics,
    )

    src = str(tmp_path / "src")
    _docs(
        spark, [(1, "one"), (2, "two"), (3, "one"), (4, "three")]
    ).repartition(1).write.parquet(src)
    loop = DedupIngestLoop(spark, lsh=False)
    stream = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    q = loop.run_stream(
        stream,
        checkpoint_dir=str(tmp_path / "ck"),
        output_dir=str(tmp_path / "out"),
        metrics_dir=str(tmp_path / "metrics"),
        availableNow=True,
    )
    q.awaitTermination(120)
    live = metrics_stream(spark, str(tmp_path / "metrics"))
    agg_q = (
        windowed_metrics(live, every=10)
        .writeStream.format("memory")
        .queryName("live_metrics")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    agg_q.awaitTermination(120)
    rows = spark.sql("select * from live_metrics").collect()
    assert len(rows) == 1
    assert rows[0].n_in == 4 and rows[0].accepted == 3


# ---------------------------------------------------------------------------
# hash_split
# ---------------------------------------------------------------------------

def test_hash_split_deterministic_and_weighted(spark):
    from vanus_spark.llm.versioning import hash_split

    docs = _docs(spark, [(i, f"doc {i}") for i in range(2000)])
    a = hash_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1}, seed=3)
    b = hash_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1}, seed=3)
    ra = {r.doc_id: r.split for r in a.collect()}
    rb = {r.doc_id: r.split for r in b.collect()}
    assert ra == rb  # pure function of (seed, id)
    from collections import Counter

    counts = Counter(ra.values())
    assert set(counts) == {"train", "val", "test"}
    assert 0.75 < counts["train"] / 2000 < 0.85
    # membership stable under appends: the original docs keep their
    # split when more rows arrive
    more = _docs(spark, [(i, f"doc {i}") for i in range(3000)])
    rc = {r.doc_id: r.split
          for r in hash_split(more, {"train": 0.8, "val": 0.1, "test": 0.1}, seed=3).collect()}
    assert all(rc[i] == ra[i] for i in range(2000))


def test_intra_doc_line_dedup_keeps_first_occurrence(spark):
    from vanus_spark.llm.qualityrules import intra_doc_line_dedup

    docs = spark.createDataFrame(
        [
            (1, "alpha\nbeta\nalpha\ngamma\nBETA"),
            (2, "one\ntwo"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in intra_doc_line_dedup(docs).collect()}
    # 'alpha' repeat dropped; 'BETA' normalizes to 'beta' -> dropped
    assert got[1].clean_text == "alpha\nbeta\ngamma"
    assert (got[1].n_lines, got[1].n_repeated_lines) == (5, 2)
    assert got[2].clean_text == "one\ntwo"
    assert got[2].n_repeated_lines == 0


def test_corpus_diff_self_is_all_unchanged(spark):
    from vanus_spark.llm.versioning import corpus_diff

    docs = _docs(spark, [(i, f"text {i}") for i in range(50)])
    statuses = {r.status for r in corpus_diff(docs, docs).collect()}
    assert statuses == {"unchanged"}


def test_intra_doc_dedup_idempotent(spark):
    from vanus_spark.llm.qualityrules import intra_doc_line_dedup

    docs = spark.createDataFrame(
        [(1, "a\nb\na\nc\nb"), (2, "x\nx\nx")], "doc_id long, text string"
    )
    once = intra_doc_line_dedup(docs).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    twice = intra_doc_line_dedup(once)
    for r in twice.collect():
        assert r.n_repeated_lines == 0
        assert r.clean_text == {1: "a\nb\nc", 2: "x"}[r.doc_id]
