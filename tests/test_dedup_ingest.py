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
    # the orphan's generation is consumed, never its contents: the next
    # append picks a strictly higher generation and the orphan stays
    # unreferenced forever (doc 99 must not surface)
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
    # compaction no longer deletes (older epochs still reference the
    # folded dirs — time travel); vacuum is the retention GC: after it,
    # one compacted dir + the new append remain per state table
    import os

    assert loop2.vacuum(retain_epochs=1) > 0
    assert len(os.listdir(os.path.join(state, "corpus"))) == 2
    # compacting a single-batch state is a no-op
    assert loop2.compact_state() == 2  # folds (compacted dir, new append) -> 1
    assert loop2.compact_state() == 0


def test_time_travel_reads_every_epoch_and_vacuum_fences(spark, tmp_path):
    """corpus_at_epoch(E) returns the corpus EXACTLY as of manifest
    epoch E — across appends AND compaction (which must not destroy
    older epochs' readability until vacuum reclaims them); after
    vacuum, pruned epochs fail loudly instead of returning garbage."""
    import pytest

    state = str(tmp_path / "state")
    loop = DedupIngestLoop(spark, lsh=False, state_dir=state)
    loop.process_batch(_docs(spark, [(1, "one"), (2, "two")]))      # epoch 1
    loop.process_batch(_docs(spark, [(3, "one"), (4, "three")]))    # epoch 2
    loop.compact_state()                                            # epoch 3
    loop.process_batch(_docs(spark, [(5, "three"), (6, "four")]))   # epoch 4
    assert loop.epochs() == [1, 2, 3, 4]
    at = lambda e: {r.doc_id for r in loop.corpus_at_epoch(e).collect()}
    assert at(1) == {1, 2}
    assert at(2) == {1, 2, 4}  # 3 was a cross-batch dup of 1
    assert at(3) == {1, 2, 4}  # compaction preserves content
    assert at(4) == {1, 2, 4, 6}
    # retention: keep the last 2 epochs, reclaim the rest
    assert loop.vacuum(retain_epochs=2) > 0
    assert at(4) == {1, 2, 4, 6}
    assert at(3) == {1, 2, 4}  # retained
    with pytest.raises(ValueError):
        loop.corpus_at_epoch(1)  # pruned epoch fails loudly
    # a fresh loop restores the live state unaffected
    loop2 = DedupIngestLoop(spark, lsh=False, state_dir=state)
    assert {r.doc_id for r in loop2.corpus.collect()} == {1, 2, 4, 6}


def test_compact_under_steady_cadence_never_destroys_state(spark, tmp_path):
    """Regression (r4 advisor, HIGH): the fold target was named
    c{len(batches)}, which could equal a LIVE committed directory
    (manifest [c2, b1] folded to target c2), so the overwrite deleted
    source files mid-read — the third compaction under an
    append/compact cadence failed and left COMMITTED pointing at a
    destroyed directory. The monotonic generation makes every fold
    target fresh; this replays the exact cadence that reproduced it."""
    state = str(tmp_path / "state")
    loop = DedupIngestLoop(spark, lsh=False, state_dir=state)
    expected: set[int] = set()
    for i in range(4):  # append, compact, append, compact, ...
        loop.process_batch(
            spark.createDataFrame(
                [(10 * i + 1, f"text {i} a"), (10 * i + 2, f"text {i} b")],
                "doc_id long, text string",
            )
        )
        expected |= {10 * i + 1, 10 * i + 2}
        loop.compact_state()
        assert {r.doc_id for r in loop.corpus.collect()} == expected
    # restore from the final manifest sees the same corpus
    loop2 = DedupIngestLoop(spark, lsh=False, state_dir=state)
    assert {r.doc_id for r in loop2.corpus.collect()} == expected


def test_concurrent_writer_is_fenced(spark, tmp_path):
    """Two loops over one state_dir: the writer that committed since
    the other's last manifest read is rejected at ITS commit point
    (epoch mismatch) — stale dedup state can never silently commit,
    and the loser's directories stay unreferenced orphans."""
    import pytest

    from vanus_spark.streaming.dedup_ingest import ConcurrentWriterError

    state = str(tmp_path / "state")
    a = DedupIngestLoop(spark, lsh=False, state_dir=state)
    a.process_batch(_docs(spark, [(1, "alpha")]))
    b = DedupIngestLoop(spark, lsh=False, state_dir=state)  # observes epoch 1
    a.process_batch(_docs(spark, [(2, "beta")]))  # a commits epoch 2
    with pytest.raises(ConcurrentWriterError):
        b.process_batch(_docs(spark, [(3, "gamma")]))
    # the committed state reflects only a's commits; b's orphans unread
    fresh = DedupIngestLoop(spark, lsh=False, state_dir=state)
    assert {r.doc_id for r in fresh.corpus.collect()} == {1, 2}
    # a re-instantiated b (re-reading the manifest) proceeds normally
    b2 = DedupIngestLoop(spark, lsh=False, state_dir=state)
    out = b2.process_batch(_docs(spark, [(3, "gamma"), (4, "alpha")]))
    assert {r.doc_id for r in out.collect()} == {3}


def test_metrics_epoch_replay_is_idempotent_for_live_reader(spark, tmp_path):
    """A crash-replay of the same foreachBatch epoch must atomically
    REPLACE the epoch's metrics file under the identical filename —
    a live file-source reader (which tracks seen filenames) then
    never double-counts the epoch and never sees a vanished file."""
    import os

    src = str(tmp_path / "src")
    _docs(spark, [(1, "one"), (2, "two")]).repartition(1).write.parquet(src)
    mdir = str(tmp_path / "metrics")
    loop = DedupIngestLoop(spark, lsh=False)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = loop.run_stream(
        stream,
        checkpoint_dir=str(tmp_path / "ck"),
        output_dir=str(tmp_path / "out"),
        metrics_dir=mdir,
        availableNow=True,
    )
    q.awaitTermination(120)
    files1 = sorted(os.listdir(mdir))
    assert files1 == ["epoch-0.parquet"]
    # simulate the crash-replay of epoch 0: a fresh loop + fresh
    # checkpoint re-processes the same file as the same epoch id
    loop2 = DedupIngestLoop(spark, lsh=False)
    q2 = loop2.run_stream(
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src),
        checkpoint_dir=str(tmp_path / "ck2"),
        output_dir=str(tmp_path / "out2"),
        metrics_dir=mdir,
        availableNow=True,
    )
    q2.awaitTermination(120)
    assert sorted(os.listdir(mdir)) == files1  # same filename, replaced
    m = spark.read.parquet(mdir).collect()
    assert len(m) == 1 and m[0].n_in == 2  # exactly one row for the epoch
