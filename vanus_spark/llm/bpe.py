"""Byte-pair-encoding tokenizer: trainable merges + distributed
encode — the real form of the "token counting" surface (the BPE-ish
regex proxy in textstats stays as the cheap pure-Column path).

Training is the classic Sennrich procedure over a WORD-FREQUENCY
table: Spark aggregates (word, count) — the only corpus-sized pass —
and the merge loop runs driver-side over that bounded table (distinct
words, not corpus size; at 100 TB you train on a sampled/truncated
vocabulary, exactly how production tokenizers are fit). Encoding is
Arrow-batched mapInPandas with the merge ranks broadcast: per-word
LRU caching makes it ~one merge walk per DISTINCT word per batch.

End-of-word is modeled with the </w> sentinel so "low" and "lower"
share prefix pairs but not the terminal token, matching the original
BPE formulation.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

EOW = "</w>"


def word_frequencies(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, freq) over whitespace-split normalized text — the one
    corpus-sized aggregation (partial-combined; shuffle ~#distinct)."""
    from vanus_spark.llm.dedup import normalize_text

    toks = F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("word")
    return (
        docs.select(toks)
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def bpe_train(
    word_freqs: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` merges from (word, freq) pairs. Ties break
    lexicographically so training is deterministic. Pure Python over
    the bounded vocabulary table."""
    vocab: dict[tuple[str, ...], int] = {
        (*word, EOW): freq for word, freq in word_freqs if word
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for symbols, freq in vocab.items():
            for a, b in zip(symbols, symbols[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + freq
        if not pairs:
            break
        # highest frequency; ties -> lexicographically smallest pair
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break  # nothing repeats: further merges are noise
        pair = best[0]
        merges.append(pair)
        merged = pair[0] + pair[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for symbols, freq in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(symbols):
                if (
                    i + 1 < len(symbols)
                    and symbols[i] == pair[0]
                    and symbols[i + 1] == pair[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(symbols[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + freq
        vocab = new_vocab
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word, always collapsing the LOWEST-rank
    eligible pair first (the canonical BPE encode order)."""
    symbols: list[str] = [*word, EOW]
    while len(symbols) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(symbols, symbols[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        symbols[best_i : best_i + 2] = [symbols[best_i] + symbols[best_i + 1]]
    return symbols


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_tokens, n_words, tokens array<string>): the document
    tokenized with the trained merges. mapInPandas with a per-batch
    word cache — each DISTINCT word per batch walks the merges once."""
    from vanus_spark.llm.dedup import normalize_text

    ranks = {pair: i for i, pair in enumerate(merges)}
    out_schema = f"{id_col} long, n_words long, n_tokens long, tokens array<string>"
    staged = docs.select(F.col(id_col), normalize_text(F.col(text_col)).alias("_nt"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            rows = []
            for did, nt in zip(pdf[id_col], pdf["_nt"]):
                toks: list[str] = []
                words = [w for w in (nt or "").split(" ") if w]
                for w in words:
                    enc = cache.get(w)
                    if enc is None:
                        enc = encode_word(w, ranks)
                        cache[w] = enc
                    toks.extend(enc)
                rows.append(
                    {
                        id_col: did,
                        "n_words": len(words),
                        "n_tokens": len(toks),
                        "tokens": toks,
                    }
                )
            yield pd.DataFrame(rows)

    return staged.mapInPandas(run, schema=out_schema)


def bpe_train_from_corpus(
    docs: DataFrame,
    n_merges: int = 100,
    text_col: str = "text",
    max_vocab: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Train on the corpus's aggregated word-frequency table (ONE
    Spark aggregation).

    The driver-side collect is hard-capped at ``max_vocab`` rows: the
    cap is pushed into the plan as a frequency-ordered limit (Catalyst
    compiles orderBy+limit to TakeOrderedAndProject — a distributed
    top-k, each task keeps only its local top ``max_vocab``), so at
    100 TB the collect is bounded no matter how many distinct words
    the corpus holds. Trade-off: words outside the top ``max_vocab``
    by frequency contribute nothing to pair statistics — the standard
    production-tokenizer truncation (rare words barely move merge
    ranks anyway). Ties at the frequency boundary break by word so
    the trained merges stay deterministic. ``max_vocab=None``
    explicitly opts out (test-scale corpora only)."""
    wf = word_frequencies(docs, text_col)
    if max_vocab is not None:
        wf = wf.orderBy(F.desc("freq"), F.asc("word")).limit(max_vocab)
    rows = wf.collect()
    return bpe_train([(r.word, r.freq) for r in rows], n_merges)
