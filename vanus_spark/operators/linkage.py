"""Fellegi-Sunter probabilistic record linkage scoring.

The classical decision model (Fellegi & Sunter 1969) behind most
production record-linkage stacks (Splink, Dedupe, the Census Bureau
matchers): each candidate pair gets, per compared field, a
log-likelihood weight log2(m/u) when the field AGREES and
log2((1-m)/(1-u)) when it disagrees — m = P(agree | match),
u = P(agree | non-match) — and the pair's total score classifies it
against an upper (match) and lower (possible) threshold.

Reference parity note: the reference event engine has no linkage
surface (SURVEY §2.6-2.8 absences); this belongs to the LLM/curation
operator family the Spark port adds (entity resolution for
training-data registries), alongside operators/fuzzy.py's
deletion-neighborhood blocking and JW best-match.

Scale shape: the operator consumes an ALREADY-BLOCKED candidate-pair
frame (blocking bounds the quadratic; see fuzzy.py) and adds only
pure-Column arithmetic — zero shuffle, fully pushdown-transparent.
The log2 weights are computed driver-side in Python (exact double
literals embedded in the plan), so the per-row score is a fixed-order
sum of double constants selected by booleans: bit-identical on any
IEEE-754 engine, which is what lets the registry gate hash raw scores
against DuckDB.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F


def fs_weights(fields: dict[str, tuple[float, float]]) -> dict[str, tuple[float, float]]:
    """(agree_weight, disagree_weight) per field from (m, u) priors."""
    out = {}
    for name, (m, u) in fields.items():
        if not (0.0 < u < m < 1.0):
            raise ValueError(f"need 0 < u < m < 1 for field {name!r}: m={m}, u={u}")
        out[name] = (math.log2(m / u), math.log2((1.0 - m) / (1.0 - u)))
    return out


def fellegi_sunter(
    pairs: DataFrame,
    fields: dict[str, tuple[float, float]],
    match_threshold: float,
    possible_threshold: float,
    agree_prefix: str = "agree_",
) -> DataFrame:
    """Score blocked candidate pairs.

    ``pairs`` must carry one boolean column ``{agree_prefix}{field}``
    per entry in ``fields`` (the comparison vector — equality,
    edit-distance bands, whatever the caller's comparators produce;
    NULL counts as disagreement, the standard convention). Appends:

    - ``fs_score``  — sum of per-field log2 weights (raw double);
    - ``fs_decision`` — 'match' (score >= match_threshold),
      'possible' (>= possible_threshold), else 'non_match'.
    """
    if possible_threshold > match_threshold:
        raise ValueError("possible_threshold must be <= match_threshold")
    weights = fs_weights(fields)
    score: Column = F.lit(0.0)
    # fixed field order = fixed summation order: the score is one
    # chained double expression, not an aggregation
    for name in fields:
        wa, wd = weights[name]
        agree = F.coalesce(F.col(agree_prefix + name), F.lit(False))
        score = score + F.when(agree, F.lit(wa)).otherwise(F.lit(wd))
    decision = (
        F.when(score >= F.lit(float(match_threshold)), F.lit("match"))
        .when(score >= F.lit(float(possible_threshold)), F.lit("possible"))
        .otherwise(F.lit("non_match"))
    )
    return pairs.withColumn("fs_score", score).withColumn("fs_decision", decision)
