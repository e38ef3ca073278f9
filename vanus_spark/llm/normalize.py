"""Unicode text canonicalization — the normalization pass that runs
BEFORE hashing/dedup/tokenization in a multilingual corpus pipeline.

Scope (deliberate): accent folding covers the NFD-decomposable Latin
repertoire (Latin-1 Supplement + the common Latin Extended-A letters)
via ONE explicit 1:1 ``translate`` table. ``translate`` is a plain JVM
string op inside whole-stage codegen — zero shuffle, no UDF, the shape
that runs at 100 TB as a pure map over the scan. Non-decomposable
letters (ł, đ, ø, æ, œ, ß) are intentionally NOT folded: ICU-style
unaccent (Unicode NFD + strip combining marks) leaves them alone too,
so the fold agrees with ``strip_accents`` engines char-for-char on the
covered set (parity is unit-tested against DuckDB in
tests/test_session8_ops.py).

Reference parity: the reference's transformer normalizes payload text
only via lower/upper actions (/root/reference/internal/primitive/
transform/action/strings); corpus-grade canonicalization is part of
the LLM-pipeline surface this repo adds on top.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# 1:1 accent-fold table. Every (src, dst) pair is verified against
# ICU unaccent semantics (DuckDB strip_accents) in the unit test —
# keep the two strings index-aligned.
ACCENT_SRC = (
    "àáâãäåèéêëìíîïòóôõöùúûüýÿñç"
    "ÀÁÂÃÄÅÈÉÊËÌÍÎÏÒÓÔÕÖÙÚÛÜÝÑÇ"
    "āăąēĕėęěīĭįōŏőūŭůűųćčśšźżžńňřťďğşțţ"
)
ACCENT_DST = (
    "aaaaaaeeeeiiiiooooouuuuyync"
    "AAAAAAEEEEIIIIOOOOOUUUUYNC"
    "aaaeeeeeiiiooouuuuuccsszzznnrtdgstt"
)
assert len(ACCENT_SRC) == len(ACCENT_DST)


def fold_accents(c: Column) -> Column:
    """Map each covered accented letter to its base letter (1:1)."""
    return F.translate(c, ACCENT_SRC, ACCENT_DST)


def canonicalize_text(c: Column) -> Column:
    """Corpus-canonical form: fold accents, lowercase, strip ASCII
    control characters, collapse whitespace runs, trim.

    Order matters and is part of the contract: folding happens before
    ``lower`` so the uppercase half of the table participates; the
    control-strip runs before whitespace collapse so a stray ``\\x0b``
    between words still yields a single space.
    """
    folded = F.lower(fold_accents(c))
    no_ctl = F.regexp_replace(folded, "[\\x00-\\x08\\x0e-\\x1f\\x7f]", "")
    return F.trim(F.regexp_replace(no_ctl, "\\s+", " "))
