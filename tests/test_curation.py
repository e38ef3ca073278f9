"""Corpus-curation operators: PII redaction, contamination detection,
stratified sampling, sequence packing, incremental dedup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vanus_spark.llm import curation, dedup
from vanus_spark.sources import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").cache()


def _one(spark, text):
    return spark.createDataFrame([(1, text)], "doc_id long, text string")


def test_redact_pii_all_kinds(spark):
    df = _one(
        spark,
        "mail bob.smith+x@corp.example.co from 192.168.0.1 "
        "ssn 123-45-6789 phone 555 123 4567 end",
    )
    row = df.select(curation.redact_pii(F.col("text")).alias("r")).first()
    assert row.r == "mail <EMAIL> from <IP> ssn <SSN> phone <PHONE> end"


def test_redact_pii_leaves_clean_text(spark):
    txt = "no pii here, just words and 42 numbers"
    row = _one(spark, txt).select(curation.redact_pii(F.col("text")).alias("r")).first()
    assert row.r == txt


def test_pii_report_counts(spark):
    df = _one(spark, "a@b.co and c@d.org at 10.0.0.1; ssn 000-11-2222")
    row = curation.pii_report(df).first()
    assert (row.n_email, row.n_ipv4, row.n_ssn, row.n_phone) == (2, 1, 1, 0)


def test_contamination_flags_verbatim_overlap(spark):
    bench = _one(spark, "the quick brown fox jumps over the lazy dog")
    docs = spark.createDataFrame(
        [
            (10, "intro text then the quick brown fox jumps over the lazy dog"),
            (11, "completely unrelated words about spark execution plans"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in curation.contamination_report(docs, bench).collect()}
    assert out[10].contaminated and out[10].n_overlap > 0
    assert not out[11].contaminated and out[11].n_overlap == 0
    assert out[11].contamination == 0.0  # null-safe left-join miss


def test_stratified_sample_rates_and_determinism(docs):
    rates = {"en": 0.8, "fr": 0.5, "es": 0.25, "de": 0.1}
    kept = curation.stratified_sample(docs, "lang", rates, "doc_id", 0.05)
    a = sorted(r.doc_id for r in kept.select("doc_id").collect())
    b = sorted(r.doc_id for r in kept.select("doc_id").collect())
    assert a == b  # hash gate => same draw every run
    n = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    k = {r.lang: r.n for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # loose binomial sanity at tiny SF: kept fraction within ±0.35 of rate
    for lang, rate in rates.items():
        if n.get(lang, 0) >= 20:
            assert abs(k.get(lang, 0) / n[lang] - rate) < 0.35


def test_pack_sequences_layout(spark):
    # tokens: 100, 100, 100 -> cum 100, 200, 300 with capacity 128
    rows = [(i, "g", " ".join(["w"] * 100)) for i in (1, 2, 3)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {r.doc_id: r for r in curation.pack_sequences(df, 128, "lang").collect()}
    assert (out[1].pack_id, out[1].pack_offset, out[1].n_packs_spanned) == (0, 0, 1)
    assert (out[2].pack_id, out[2].pack_offset, out[2].n_packs_spanned) == (0, 100, 2)
    assert (out[3].pack_id, out[3].pack_offset, out[3].n_packs_spanned) == (1, 72, 2)


def test_pack_sequences_groups_independent(spark):
    rows = [(1, "a", "x y z"), (2, "b", "x y z")]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {r.doc_id: r for r in curation.pack_sequences(df, 4, "lang").collect()}
    # each group starts its own pack 0
    assert out[1].pack_id == 0 and out[2].pack_id == 0


def test_incremental_dedup_drops_exact_and_near(spark, docs):
    corpus = docs.where(F.col("doc_id") < 400)
    base = corpus.limit(2).collect()
    exact_copy = (base[0].doc_id + 10_000, base[0].text, "en", "s", 1)
    near_copy = (base[1].doc_id + 20_000, base[1].text + " extra", "en", "s", 1)
    novel = (30_000, "a genuinely novel document about catalyst optimizer rules", "en", "s", 1)
    new = spark.createDataFrame(
        [exact_copy, near_copy, novel],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = dedup.incremental_dedup(new, corpus, threshold=0.8, num_hashes=16, bands=8)
    kept = {r.doc_id for r in out.select("doc_id").collect()}
    assert kept == {30_000}


def test_incremental_dedup_accepts_stored_signatures(spark, docs):
    corpus = docs.where(F.col("doc_id") < 100)
    new = docs.where((F.col("doc_id") >= 100) & (F.col("doc_id") < 120))
    sh = dedup.shingles_df(corpus).cache()
    sig = dedup.minhash_signatures_from_shingles(sh)
    via_stored = dedup.incremental_dedup(
        new, corpus, corpus_sh_df=sh, corpus_sig_df=sig, num_hashes=16, bands=8
    )
    recomputed = dedup.incremental_dedup(new, corpus, num_hashes=16, bands=8)
    assert {r.doc_id for r in via_stored.collect()} == {
        r.doc_id for r in recomputed.collect()
    }


def test_chunk_documents_windows(spark):
    from vanus_spark.llm.curation import chunk_documents

    text = " ".join(f"w{i}" for i in range(100))
    docs = spark.createDataFrame([(1, text), (2, "short doc"), (3, "")],
                                 ["doc_id", "text"])
    out = chunk_documents(docs, chunk_tokens=32, overlap_tokens=8)
    rows = sorted(out.collect(), key=lambda r: (r.doc_id, r.chunk_index))
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: 100 tokens, stride 24 -> ceil(92/24) = 4 chunks
    c1 = by_doc[1]
    assert [r.chunk_index for r in c1] == [0, 1, 2, 3]
    assert c1[0].chunk_text.startswith("w0 w1") and c1[0].n_chunk_tokens == 32
    assert c1[1].chunk_text.startswith("w24 ")  # stride 24
    assert c1[3].n_chunk_tokens == 100 - 3 * 24  # truncated tail, no pad
    # consecutive chunks overlap by exactly 8 tokens
    assert c1[0].chunk_text.split()[-8:] == c1[1].chunk_text.split()[:8]
    # every token appears in some chunk
    seen = set()
    for r in c1:
        seen.update(r.chunk_text.split())
    assert len(seen) == 100
    # short + empty docs -> exactly one chunk each
    assert len(by_doc[2]) == 1 and by_doc[2][0].n_chunk_tokens == 2
    assert len(by_doc[3]) == 1
    # uids unique and stable
    assert len({r.chunk_uid for r in rows}) == len(rows)


def test_chunk_documents_rejects_bad_overlap(spark):
    import pytest as _pytest
    from vanus_spark.llm.curation import chunk_documents

    docs = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with _pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=8, overlap_tokens=8)


def test_exact_stratified_sample(spark):
    from vanus_spark.llm.curation import exact_stratified_sample

    rows = [(i, "en" if i % 3 else "fr") for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    out = exact_stratified_sample(df, "lang", 10, "doc_id")
    by_lang = {
        r.lang: r.n for r in out.groupBy("lang").count().withColumnRenamed("count", "n").collect()
    }
    assert by_lang == {"en": 10, "fr": 10}
    # deterministic: same draw every run
    again = exact_stratified_sample(df, "lang", 10, "doc_id")
    assert {r.doc_id for r in out.collect()} == {r.doc_id for r in again.collect()}
    # small stratum: returns all of it
    tiny = exact_stratified_sample(df.where("doc_id < 4"), "lang", 10, "doc_id")
    assert tiny.count() == 4


def test_resample_mixture_exact_shares(spark):
    """The materialized mixture honors the weights exactly (floor
    rounding), capped by the stratum that runs out first, and is
    deterministic in hash order."""
    from vanus_spark.llm.curation import resample_mixture

    rows = [(i, "en" if i < 60 else ("de" if i < 80 else "fr")) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = resample_mixture(df, "lang", {"en": 0.5, "de": 0.25, "fr": 0.25}, "doc_id")
    got = out.groupBy("lang").count().collect()
    by = {r.lang: r["count"] for r in got}
    # T = min(60/.5, 20/.25, 20/.25) = 80 -> en 40, de 20, fr 20
    assert by == {"en": 40, "de": 20, "fr": 20}
    # deterministic: same call, same rows
    again = resample_mixture(df, "lang", {"en": 0.5, "de": 0.25, "fr": 0.25}, "doc_id")
    assert {r.doc_id for r in out.collect()} == {r.doc_id for r in again.collect()}
    # unknown strata are dropped; weights renormalize
    out2 = resample_mixture(df, "lang", {"en": 1.0}, "doc_id")
    assert out2.count() == 60 and {r.lang for r in out2.collect()} == {"en"}


def test_shard_assignment_balanced(spark):
    from vanus_spark.llm.curation import shard_assignment

    rows = [(i, "en", " ".join(["w"] * 10)) for i in range(10)]  # 10 tokens each
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = shard_assignment(df, target_tokens=25, group_col="lang").collect()
    by = {r.doc_id: r for r in out}
    # cum_before: 0,10,20,...,90 -> shard = floor(/25): 0,0,0,1,1,2,2,2,3,3
    assert [by[i].shard for i in range(10)] == [0, 0, 0, 1, 1, 2, 2, 2, 3, 3]
    assert by[3].shard_tokens_before == 30 % 25
    # doc never splits: every doc appears exactly once
    assert len(out) == 10


def test_conversation_stats_flags_malformed_transcripts(spark):
    """conversation_stats: a double-assistant turn breaks
    alternation_ok; assistant-first shows in first_role; bad JSON
    yields zero turns (from_json -> NULL -> no rows)."""
    from vanus_spark.llm.curation import (
        conversation_stats,
        flatten_conversations,
    )

    convs = spark.createDataFrame(
        [
            (1, '[{"role":"user","content":"a"},{"role":"assistant","content":"b"}]'),
            (2, '[{"role":"user","content":"a"},{"role":"user","content":"b"},'
                '{"role":"assistant","content":"c"}]'),
            (3, '[{"role":"assistant","content":"x"}]'),
            (4, "not json at all"),
        ],
        "conv_id long, conversation string",
    )
    turns = flatten_conversations(convs)
    stats = {r["conv_id"]: r.asDict() for r in conversation_stats(turns).collect()}
    assert stats[1]["alternation_ok"] and stats[1]["first_role"] == "user"
    assert not stats[2]["alternation_ok"]
    assert stats[2]["n_user"] == 2 and stats[2]["n_assistant"] == 1
    assert stats[3]["first_role"] == "assistant" and stats[3]["n_turns"] == 1
    assert 4 not in stats  # unparseable JSON produces no turn rows
    assert stats[1]["content_chars"] == 2 and stats[1]["last_role"] == "assistant"


def test_pack_turns_with_masks_spans_and_masks(spark):
    """pack_turns_with_masks: global end-to-end layout in (conv, turn)
    order, correct pack boundaries at capacity, loss_mask only on
    assistant turns, zero-token turns take no space."""
    from vanus_spark.llm.curation import pack_turns_with_masks

    rows = [
        (1, 0, "user", "a b c"),          # 3 tokens -> pack 0, off 0
        (1, 1, "assistant", "d e f g"),   # 4 tokens -> pack 0, off 3
        (2, 0, "user", "h i j"),          # 3 tokens -> pack 0, off 7
        (2, 1, "assistant", ""),          # 0 tokens -> off 10, no space
        (3, 0, "user", "k l m n o p"),    # 6 tokens -> spans into pack 1
    ]
    turns = spark.createDataFrame(
        rows, "conv_id long, turn_idx long, role string, content string"
    )
    out = {
        (r["conv_id"], r["turn_idx"]): r.asDict()
        for r in pack_turns_with_masks(turns, capacity=10).collect()
    }
    assert out[(1, 0)]["pack_id"] == 0 and out[(1, 0)]["pack_offset"] == 0
    assert out[(1, 1)]["pack_offset"] == 3 and out[(1, 1)]["loss_mask"] == 1
    assert out[(2, 0)]["pack_offset"] == 7 and out[(2, 0)]["loss_mask"] == 0
    assert out[(2, 1)]["n_tokens"] == 0
    assert out[(3, 0)]["pack_id"] == 1 and out[(3, 0)]["pack_offset"] == 0


def test_pack_turns_prefix_survives_hash_collisions(spark):
    """Regression (round-7 advice, high): the packer's prefix sum must
    group on distributed_row_number's pinned rank-contiguous _slice,
    not on spark_partition_id() re-derived after the hash exchange —
    with 7 shuffle partitions and AQE coalescing off, slices hash-
    collide into shared physical partitions and the old derivation
    corrupted 429/600 pack ids. Checks every row against the
    driver-computed ground-truth packing."""
    from pyspark.sql import functions as F

    from vanus_spark.llm.curation import pack_turns_with_masks

    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    old_coal = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        rows = [
            (cid, t, "user" if t % 2 == 0 else "assistant",
             " ".join(["w"] * ((cid * 7 + t * 3) % 9 + 1)))
            for cid in range(100)
            for t in range(6)
        ]
        turns = spark.createDataFrame(
            rows, "conv_id long, turn_idx long, role string, content string"
        ).repartition(11)
        cap = 64
        got = {
            (r["conv_id"], r["turn_idx"]): (r["pack_id"], r["pack_offset"])
            for r in pack_turns_with_masks(turns, capacity=cap).collect()
        }
        cum = 0
        bad = 0
        for cid, t, _role, text in sorted(rows):
            n = len(text.split())
            want = (cum // cap, cum % cap)
            if got[(cid, t)] != want:
                bad += 1
            cum += n
        assert bad == 0, f"{bad}/{len(rows)} rows mis-packed"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", old_coal)
