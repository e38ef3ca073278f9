"""BPE tokenizer: golden merges on a tiny corpus, encode semantics,
distributed encode consistency."""

from __future__ import annotations

from vanus_spark.llm.bpe import (
    EOW,
    bpe_encode,
    bpe_train,
    bpe_train_from_corpus,
    encode_word,
)


def test_bpe_train_golden():
    # the classic Sennrich toy corpus
    freqs = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = bpe_train(freqs, 4)
    # most frequent pair: (e,s) count 9 -> es; then (es,t) 9 -> est;
    # then (est,</w>) 9; then (l,o) 7
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", EOW)
    assert merges[3] == ("l", "o")


def test_encode_word_uses_rank_order():
    freqs = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = bpe_train(freqs, 10)
    ranks = {p: i for i, p in enumerate(merges)}
    assert "".join(encode_word("newest", ranks)) == "newest" + EOW
    assert encode_word("lowest", ranks)[-1] == "est" + EOW
    # unseen word falls back to characters + learned prefixes
    out = encode_word("zzz", ranks)
    assert "".join(out) == "zzz" + EOW


def test_bpe_encode_distributed_matches_local(spark):
    docs = spark.createDataFrame(
        [(1, "low lower newest"), (2, "widest low low"), (3, "")],
        ["doc_id", "text"],
    )
    merges = bpe_train_from_corpus(docs, n_merges=8)
    out = {r.doc_id: r for r in bpe_encode(docs, merges).collect()}
    ranks = {p: i for i, p in enumerate(merges)}
    expect_1 = [
        t for w in ["low", "lower", "newest"] for t in encode_word(w, ranks)
    ]
    assert out[1].tokens == expect_1
    assert out[1].n_words == 3 and out[1].n_tokens == len(expect_1)
    assert out[3].n_words == 0 and out[3].tokens == []
    # merges compress: fewer tokens than characters
    assert out[2].n_tokens < len("widest low low".replace(" ", "")) + 3


def test_bpe_roundtrip_reconstruction(spark, sf_dir):
    from vanus_spark.sources import load_table
    from vanus_spark.llm.dedup import normalize_text
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").limit(50)
    merges = bpe_train_from_corpus(docs, n_merges=60)
    enc = bpe_encode(docs, merges)
    # concatenating tokens and stripping </w> reproduces the
    # normalized text exactly — tokenization is lossless
    rebuilt = enc.select(
        "doc_id",
        F.replace(
            F.array_join("tokens", ""), F.lit(EOW), F.lit(" ")
        ).alias("round"),
    )
    orig = docs.select(
        "doc_id", F.concat(normalize_text(F.col("text")), F.lit(" ")).alias("norm")
    )
    bad = (
        rebuilt.join(orig, "doc_id")
        .where(F.col("round") != F.col("norm"))
        .count()
    )
    assert bad == 0
