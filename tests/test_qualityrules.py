"""Repetition/structure quality rules (Gopher/MassiveText, C4-style)
on crafted documents exercising every flag branch."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def crafted(spark):
    long_ok = "word " * 60  # 60 words, clean
    rows = [
        (1, long_ok.strip()),
        (2, "too short"),
        (3, ("spam ham " * 30 + "# " * 20).strip()),  # symbol soup
        (4, "- one\n- two\n- three"),  # all bullet lines
        (5, "keep this\nto be continued...\nand more...\nend"),  # ellipses
        (6, "same line\nsame line\nsame line\nunique line"),  # dup lines
        (7, ("lorem ipsum " * 40).strip()),  # heavy 2-gram repetition
        (8, "1 2 3 4 5 6 7 8 9 10"),  # no alpha words
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_gopher_flags(spark, crafted):
    from vanus_spark.llm.qualityrules import gopher_flags

    out = {r.doc_id: r for r in gopher_flags(crafted).collect()}
    assert out[1].keep
    assert not out[2].keep and out[2].n_words == 2  # below min_words
    assert out[3].symbol_word_ratio > 0.1 and not out[3].keep
    assert out[4].bullet_line_fraction == 1.0 and not out[4].keep
    assert out[5].ellipsis_line_fraction == 0.5 and not out[5].keep
    assert out[6].dup_line_fraction == 0.5 and not out[6].keep
    assert out[8].alpha_word_fraction == 0.0 and not out[8].keep


def test_top_ngram_stats(spark, crafted):
    from vanus_spark.llm.qualityrules import top_ngram_stats

    out = {r.doc_id: r for r in top_ngram_stats(crafted, n=2).collect()}
    # doc 7: "lorem ipsum" x40 -> grams lorem-ipsum x40, ipsum-lorem x39
    assert out[7].n_grams == 79
    assert out[7].top_gram_count == 40
    assert abs(out[7].top_gram_fraction - 40 / 79) < 1e-6
    # doc 1: "word word" everywhere -> one gram dominates completely
    assert out[1].top_gram_fraction == 1.0


def test_line_dedup_corpus_level(spark, crafted):
    from vanus_spark.llm.qualityrules import line_dedup

    # "same line" repeats WITHIN doc 6; add a second doc sharing a line
    # ACROSS docs to prove corpus-level counting.
    extra = spark.createDataFrame(
        [(9, "unique line\nsolo content here")], ["doc_id", "text"]
    )
    out = {
        r.doc_id: r
        for r in line_dedup(crafted.unionByName(extra), min_count=2).collect()
    }
    assert out[6].n_lines == 4 and out[6].n_boilerplate_lines == 4
    # doc 6's "unique line" became boilerplate via doc 9's copy
    assert out[6].clean_text == ""
    assert out[9].n_boilerplate_lines == 1
    assert out[9].clean_text == "solo content here"
    # untouched doc keeps its text verbatim
    assert out[5].clean_text == crafted.where("doc_id = 5").collect()[0].text


def test_word_ngrams_single_word(spark):
    from vanus_spark.llm.qualityrules import word_ngrams

    row = (
        spark.createDataFrame([("solo",)], ["text"])
        .select(word_ngrams(F.col("text"), 2).alias("g"))
        .collect()[0]
    )
    assert row.g == ["solo"]


def test_unigram_score_self_trained(spark):
    import math

    from vanus_spark.llm.qualityrules import unigram_score

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a b"), (3, "c")], ["doc_id", "text"]
    )
    # corpus counts: a=3, b=2, c=1, total=6
    out = {r.doc_id: r for r in unigram_score(docs).collect()}
    assert out[1].n_tokens == 3 and out[1].oov_count == 0
    assert abs(out[1].avg_tok_prob - (3 + 3 + 2) / (3 * 6)) < 1e-12
    expected_lp = (2 * math.log(3 / 6) + math.log(2 / 6)) / 3
    assert abs(out[1].avg_logprob - expected_lp) < 1e-12
    assert abs(out[3].avg_tok_prob - 1 / 6) < 1e-12


def test_unigram_score_stored_model_oov(spark):
    from vanus_spark.llm.qualityrules import unigram_model, unigram_score

    train = spark.createDataFrame([(1, "a a b")], ["doc_id", "text"])
    model = unigram_model(train)
    new = spark.createDataFrame([(9, "a z z")], ["doc_id", "text"])
    row = unigram_score(new, model_df=model).collect()[0]
    # z is OOV: counted, probability contributes 0, logprob floors at 1
    assert row.oov_count == 2
    assert abs(row.avg_tok_prob - 2 / (3 * 3)) < 1e-12


def test_bigram_score_golden(spark):
    """Hand-computed backoff-bigram values on a tiny corpus: model
    trained on doc 1 only, scored over both docs so the backoff
    branch is exercised."""
    import math

    from vanus_spark.llm.qualityrules import (
        bigram_model,
        bigram_score,
        unigram_model,
    )

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], "doc_id long, text string"
    )
    train = docs.where("doc_id = 1")
    out = {
        r.doc_id: r
        for r in bigram_score(
            docs, uni_df=unigram_model(train), big_df=bigram_model(train)
        ).collect()
    }
    # train bigrams: (a,b)x2, (b,a)x1; unigrams: a:2, b:2, T=4
    r1 = out[1]
    assert r1.n_bigrams == 3 and r1.backoff_count == 0
    # p(a->b)=2/2=1 twice, p(b->a)=1/2
    assert r1.avg_logprob2 == pytest.approx(
        (math.log(1.0) * 2 + math.log(0.5)) / 3
    )
    r2 = out[2]
    assert r2.n_bigrams == 2 and r2.backoff_count == 1
    # p(a->b)=1; (b,c) unseen -> 0.4 * max(c_c,1)/T = 0.4 * 1/4
    assert r2.avg_logprob2 == pytest.approx(
        (math.log(1.0) + math.log(0.4 * 1 / 4)) / 2
    )


def test_c4_line_filter_rules(spark):
    from vanus_spark.llm.qualityrules import c4_line_filter

    docs = spark.createDataFrame(
        [
            (1, 'a good sentence here.\nno\nAnother proper one!\nends without punct'),
            (2, 'contains lorem ipsum text.\nthis uses javascript sadly.\nbrace { line here.'),
            (3, 'only short\nno'),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in c4_line_filter(docs).collect()}
    assert out[1].text == "a good sentence here.\nAnother proper one!"
    assert out[1].n_lines_in == 4 and out[1].n_lines_kept == 2
    assert 2 not in out  # every line hits a drop marker
    assert 3 not in out  # every line too short / unpunctuated
    # relaxed mode keeps unpunctuated lines
    relaxed = {
        r.doc_id: r
        for r in c4_line_filter(docs, require_terminal_punct=False).collect()
    }
    assert relaxed[1].n_lines_kept == 3


def test_compression_signal_same_build_golden(spark):
    """compression_signal vs zlib golden computed with the SAME
    interpreter's zlib (DEFLATE output is deterministic only per zlib
    build, so no cross-engine oracle — ADVICE r5)."""
    import zlib

    from vanus_spark.llm.qualityrules import compression_signal

    texts = [
        "natural prose varies its words enough to resist deflate a bit",
        "spam spam spam spam spam spam spam spam spam spam spam spam",
        "x",
        "",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r.asDict() for r in compression_signal(docs).collect()}
    for i, t in enumerate(texts):
        raw = t.encode("utf-8")
        exp_c = len(zlib.compress(raw, 6))
        assert out[i]["orig_bytes"] == len(raw)
        assert out[i]["compressed_bytes"] == exp_c
        exp_ratio = round(exp_c / max(len(raw), 1), 6)
        assert abs(out[i]["compression_ratio"] - exp_ratio) < 1e-9
    # the repetitive doc flags as repetitive, the prose doc does not
    assert out[1]["repetitive"] and not out[0]["repetitive"]
