"""Streaming dedup-on-ingest: within-batch + cross-batch rules,
durable state resume, and a real two-micro-batch file stream."""

from __future__ import annotations

from pyspark.sql import functions as F

from vanus_spark.streaming.dedup_ingest import DedupIngestLoop

BASE = (
    "the quick brown fox jumps over the lazy dog and then runs far "
    "away into the deep green forest to hide from every hunter"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_within_and_cross_batch_rules(spark):
    loop = DedupIngestLoop(spark, threshold=0.8)
    b1 = _docs(
        spark,
        [
            (1, BASE),
            (2, BASE),  # exact dup of 1 (within batch)
            (3, BASE + " extra"),  # near dup of 1 (within batch)
            (4, "completely different text about spark query planning engines"),
        ],
    )
    s1 = {r.doc_id for r in loop.process_batch(b1).collect()}
    assert s1 == {1, 4}
    b2 = _docs(
        spark,
        [
            (10, BASE),  # exact dup of stored 1
            (11, BASE + " tiny"),  # near dup of stored 1
            (12, "fresh unrelated content mentioning adaptive execution runtime"),
            (13, "fresh unrelated content mentioning adaptive execution runtime x"),
            # 13 is a near dup of 12 WITHIN this batch
        ],
    )
    s2 = {r.doc_id for r in loop.process_batch(b2).collect()}
    assert s2 == {12}
    assert {r.doc_id for r in loop.corpus.collect()} == {1, 4, 12}
    assert loop.accepted_count == 3


def test_state_dir_resume(spark, tmp_path):
    state = str(tmp_path / "state")
    loop = DedupIngestLoop(spark, state_dir=state)
    loop.process_batch(_docs(spark, [(1, BASE)]))
    # a FRESH loop restored from disk still rejects dups of batch 1
    loop2 = DedupIngestLoop(spark, state_dir=state)
    out = loop2.process_batch(_docs(spark, [(2, BASE), (3, "novel words entirely")]))
    assert {r.doc_id for r in out.collect()} == {3}
    assert {r.doc_id for r in loop2.corpus.collect()} == {1, 3}


def test_run_stream_two_file_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    _docs(spark, [(1, BASE), (2, "alpha beta gamma delta epsilon zeta")]).coalesce(
        1
    ).write.parquet(src)
    _docs(spark, [(3, BASE), (4, "unrelated novel content here")]).coalesce(
        1
    ).write.mode("append").parquet(src)
    loop = DedupIngestLoop(spark)
    schema = "doc_id long, text string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = loop.run_stream(stream, str(tmp_path / "ckpt"), str(tmp_path / "out"))
    q.processAllAvailable()
    q.stop()
    accepted = {r.doc_id for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    # 3 is an exact dup of 1 -> rejected whichever batch order ran
    assert accepted == {1, 2, 4}


def test_ingest_metrics(spark):
    loop = DedupIngestLoop(spark)
    loop.process_batch(
        _docs(spark, [(1, BASE), (2, BASE), (3, BASE + " extra"), (4, "novel words")])
    )
    loop.process_batch(_docs(spark, [(10, BASE), (11, "more novel words")]))
    m = {r.batch: r for r in loop.metrics_df().collect()}
    assert m[0].n_in == 4 and m[0].rejected_exact_within == 1
    assert m[0].rejected_near_within == 1 and m[0].accepted == 2
    assert m[1].rejected_vs_corpus == 1 and m[1].accepted == 1


def test_state_commit_is_atomic(spark, tmp_path):
    """A crash between the corpus write and the sig write (or before
    the manifest rename) must be invisible: restore reads only
    manifest-committed batch dirs, so orphan directories from a torn
    append never surface."""
    state = str(tmp_path / "state")
    loop = DedupIngestLoop(spark, state_dir=state)
    loop.process_batch(_docs(spark, [(1, BASE)]))

    # simulate a torn append: batch dir written, manifest NEVER renamed
    _docs(spark, [(99, "orphan uncommitted words")]).write.parquet(
        f"{state}/corpus/b1"
    )
    # (sig/b1 missing entirely — the crash happened between the writes)

    loop2 = DedupIngestLoop(spark, state_dir=state)
    assert {r.doc_id for r in loop2.corpus.collect()} == {1}
    out = loop2.process_batch(_docs(spark, [(2, BASE), (3, "fresh novel text")]))
    assert {r.doc_id for r in out.collect()} == {3}
    # the next committed append claims the b1 slot, overwriting the orphan
    assert {r.doc_id for r in loop2.corpus.collect()} == {1, 3}


def test_compact_state_preserves_corpus_and_survives_restart(spark, tmp_path):
    from vanus_spark.streaming.dedup_ingest import DedupIngestLoop

    state = str(tmp_path / "state")
    loop = DedupIngestLoop(spark, lsh=False, state_dir=state)
    for k, rows in enumerate(
        [
            [(1, "one"), (2, "two")],
            [(3, "one"), (4, "three")],   # 3 dups vs stored state
            [(5, "four"), (6, "three")],  # 6 dups vs stored state
        ]
    ):
        loop.process_batch(
            spark.createDataFrame(rows, "doc_id long, text string")
        )
    before = {r.doc_id for r in loop.corpus.collect()}
    assert before == {1, 2, 4, 5}
    folded = loop.compact_state()
    assert folded == 3
    assert {r.doc_id for r in loop.corpus.collect()} == before
    # a FRESH loop restores the compacted state and keeps deduping
    loop2 = DedupIngestLoop(spark, lsh=False, state_dir=state)
    assert {r.doc_id for r in loop2.corpus.collect()} == before
    out = loop2.process_batch(
        spark.createDataFrame([(7, "four"), (8, "five")], "doc_id long, text string")
    )
    assert {r.doc_id for r in out.collect()} == {8}
    # one directory per state table after compaction + the new append
    import os

    assert len(os.listdir(os.path.join(state, "corpus"))) == 2
    # compacting a single-batch state is a no-op
    assert loop2.compact_state() == 2  # folds (c3, b1) -> 1
    assert loop2.compact_state() == 0
