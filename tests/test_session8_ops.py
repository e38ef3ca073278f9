"""Eighth-session operators: unicode canonicalization, Jaro-Winkler
linkage, chi-square feature selection, join-size estimation, linear
attribution, standalone k-means."""

from __future__ import annotations

import random
import struct

import duckdb
import pytest
from pyspark.sql import Row, functions as F


# --- normalize -------------------------------------------------------------


def test_accent_table_matches_icu_unaccent():
    """Every (src, dst) pair in the fold table must agree with the
    engine's ICU-style strip_accents — this is the contract that lets
    the text_canonicalize oracle use strip_accents as the twin."""
    from vanus_spark.llm.normalize import ACCENT_DST, ACCENT_SRC

    con = duckdb.connect()
    for s, d in zip(ACCENT_SRC, ACCENT_DST):
        got = con.sql("select strip_accents(?)", params=[s]).fetchone()[0]
        assert got == d, f"{s!r}: strip_accents -> {got!r}, table says {d!r}"


def test_canonicalize_text(spark):
    from vanus_spark.llm.normalize import canonicalize_text

    df = spark.createDataFrame(
        [
            ("Crème  BRÛLÉE\tà la\x07 carte ",),
            ("żółć\x01already ascii",),
            ("", ),
        ],
        ["t"],
    )
    got = [r.c for r in df.select(canonicalize_text("t").alias("c")).collect()]
    assert got[0] == "creme brulee a la carte"
    # ż/ó/ć fold; ł does NOT (non-decomposable — ICU keeps it too);
    # the \x01 control char is stripped without inserting a space
    assert got[1] == "zółcalready ascii".replace("ó", "o")
    assert got[2] == ""


# --- jaro-winkler ----------------------------------------------------------


def test_jw_bit_exact_vs_duckdb():
    """Raw-double parity with the engine implementation on random and
    name-shaped strings, including the below-boost-threshold branch —
    this is what allows the linkage query to rank on raw doubles."""
    from vanus_spark.operators.fuzzy import _jaro_winkler_py

    con = duckdb.connect()
    rng = random.Random(42)
    alpha = "abcdef #0123"
    cases = []
    for _ in range(400):
        a = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 14)))
        b = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 14)))
        cases.append((a, b))
    cases += [
        ("Customer#000000123", "Customer#00000123"),
        ("Customer#000000123", "Customer#000000123"),
        ("martha", "marhta"),
        ("a", "b"),
    ]
    below = 0
    for a, b in cases:
        mine = _jaro_winkler_py(a, b)
        duck = con.sql(
            "select jaro_winkler_similarity(?, ?)", params=[a, b]
        ).fetchone()[0]
        if mine <= 0.7:
            below += 1
        assert struct.pack("d", mine) == struct.pack("d", duck), (a, b, mine, duck)
    assert below > 50  # the no-boost branch is genuinely exercised


def test_jw_empty_convention():
    from vanus_spark.operators.fuzzy import _jaro_winkler_py

    assert _jaro_winkler_py("", "") == 0.0
    assert _jaro_winkler_py("a", "") == 0.0


def test_jw_non_ascii_byte_contract():
    """The operator contract is Jaro-Winkler over UTF-8 BYTES (DuckDB's
    semantics, hence the oracle's): the reference kernel must agree
    with DuckDB on multi-byte text too, and the divergence from a
    codepoint-level implementation is asserted deliberately (r10
    advice) rather than left as a silent scoring change."""
    from vanus_spark.operators.fuzzy import _jaro_winkler_py

    con = duckdb.connect()
    cases = [
        ("café", "cafe"),
        ("żółw", "zolw"),
        ("über", "uber"),
        ("naïve", "naive"),
        ("日本語", "日本言"),
        ("żółw", "żółw"),
        ("Müller GmbH", "Mueller GmbH"),
    ]
    for a, b in cases:
        mine = _jaro_winkler_py(a, b)
        duck = con.sql(
            "select jaro_winkler_similarity(?, ?)", params=[a, b]
        ).fetchone()[0]
        assert struct.pack("d", mine) == struct.pack("d", duck), (a, b, mine, duck)
    # the byte view is a real divergence from codepoint JW: 'żółw' vs
    # 'zolw' shares no BYTES in the match window, so it scores 0.0
    # (a codepoint kernel would score 0.5) — pinned so a future kernel
    # swap cannot silently flip the contract back
    assert _jaro_winkler_py("żółw", "zolw") == 0.0


def test_jw_best_match(spark):
    from vanus_spark.operators.fuzzy import jw_best_match

    master = spark.createDataFrame(
        [Row(id=1, t="jonathan-77"), Row(id=2, t="jonatan-77"), Row(id=3, t="zzzz-99")]
    )
    dirty = spark.createDataFrame([Row(id=10, t="jonathen-77"), Row(id=11, t="qq-00")])
    got = {
        r.dirty_id: (r.matched_id, r.score)
        for r in jw_best_match(
            master, dirty, "id", "t", "id", "t",
            block_key=lambda c: F.substring(c, -2, 2), threshold=0.8,
        ).collect()
    }
    assert got[10][0] == 1  # closer than 'jonatan', ties impossible here
    assert 11 not in got  # different block, nothing to score against


# --- chi2 ------------------------------------------------------------------


def test_chi2_tokens(spark):
    from vanus_spark.llm.qualityrules import chi2_tokens

    df = spark.createDataFrame(
        [
            Row(doc_id=1, label=1, text="spark spark good"),
            Row(doc_id=2, label=1, text="spark fine"),
            Row(doc_id=3, label=0, text="duck bad"),
            Row(doc_id=4, label=0, text="duck duck bad"),
        ]
    )
    rows = {r.tok: r for r in chi2_tokens(df, k=10).collect()}
    # 'spark' and 'duck' perfectly separate the classes: chi2 = N = 4
    assert rows["spark"].chi2 == 4.0 and rows["duck"].chi2 == 4.0
    assert rows["spark"].df_pos == 2 and rows["spark"].df_neg == 0
    # presence, not frequency: doc 1's double 'spark' counts once
    assert rows["duck"].df_neg == 2


# --- join size estimate ----------------------------------------------------


def test_join_size_estimate(spark):
    from vanus_spark.operators.joinstats import join_size_estimate

    left = spark.createDataFrame([Row(k=1), Row(k=1), Row(k=1), Row(k=2)])
    right = spark.createDataFrame([Row(k=1), Row(k=1), Row(k=3)])
    r = join_size_estimate(left, right, "k", "k", "t").collect()[0]
    assert r.est_rows == 6  # 3*2 on key 1; keys 2/3 don't intersect
    assert r.est_rows == left.join(right, "k").count()
    assert (r.n_left, r.n_right, r.d_left, r.d_right) == (4, 3, 2, 2)
    assert r.top_key == "1" and r.top_key_rows == 6
    assert r.est_independent == 4 * 3 // 2


# --- registry smoke at sf0.001 --------------------------------------------


@pytest.mark.parametrize(
    "name",
    [
        "text_canonicalize",
        "er_jw_match",
        "embedding_kmeans",
        "join_size_estimate",
        "attribution_linear",
        "quality_chi2",
    ],
)
def test_new_queries_run(entry_mod, spark, sf_dir, name):
    df = entry_mod.queries()[name](spark, sf_dir)
    assert df.count() >= 0
