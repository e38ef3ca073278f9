"""Data-quality expectations: declarative table validation rules.

The data-contract counterpart of ``versioning.schema_drift`` (shape
drift) — this validates CONTENT against declared expectations, the
dbt-tests/Great-Expectations pattern a production ingest pipeline runs
before promoting a snapshot:

    rules = [
        {"rule": "not_null", "column": "user_id"},
        {"rule": "in_range", "column": "value", "lo": 0, "hi": 500},
        {"rule": "matches", "column": "event_type", "pattern": "^[a-z_]+$"},
        {"rule": "accepted_values", "column": "event_type",
         "values": ["view", "click"]},
        {"rule": "unique", "column": "event_id"},
    ]
    report = expectations_report(df, rules)

Returns one row per rule: (rule_id, rule, col_name, n_rows, n_violations,
violation_frac, passed).

Scale design: every non-uniqueness rule is a conditional-sum column in
ONE aggregate over ONE scan (map-side partial combine, no per-rule
passes); uniqueness rules aggregate separately (mixing count_distinct
with other aggregates makes Catalyst Expand every row — the
events_sketch_stats lesson) and join back on the single-row boundary.
The per-rule rows come from one ``stack`` over the 1-row aggregate —
never a driver-side loop over collected results.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _violation_expr(rule: dict) -> Column:
    c = F.col(rule["column"])
    kind = rule["rule"]
    if kind == "not_null":
        return c.isNull()
    if kind == "in_range":
        lo, hi = rule["lo"], rule["hi"]
        return c.isNull() | (c < F.lit(lo)) | (c > F.lit(hi))
    if kind == "matches":
        return c.isNull() | ~c.rlike(rule["pattern"])
    if kind == "accepted_values":
        return c.isNull() | ~c.isin(*rule["values"])
    raise ValueError(f"unknown rule type: {kind}")


def expectations_report(df: DataFrame, rules: list[dict]) -> DataFrame:
    scalar_rules = [
        (i, r) for i, r in enumerate(rules) if r["rule"] != "unique"
    ]
    unique_rules = [(i, r) for i, r in enumerate(rules) if r["rule"] == "unique"]

    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for i, r in scalar_rules:
        aggs.append(
            F.sum(_violation_expr(r).cast("long")).alias(f"v{i}")
        )
    base = df.agg(*aggs)
    for i, r in unique_rules:
        u = df.agg(
            (
                F.count(r["column"]) - F.count_distinct(F.col(r["column"]))
            ).alias(f"v{i}")
        )
        base = base.join(u)  # 1-row x 1-row

    stacked = ", ".join(
        f"{i}L, '{r['rule']}', '{r['column']}', v{i}"
        for i, r in sorted(
            scalar_rules + unique_rules, key=lambda t: t[0]
        )
    )
    n = len(rules)
    return base.select(
        F.expr(
            f"stack({n}, {stacked}) AS (rule_id, rule, col_name, n_violations)"
        ),
        "n_rows",
    ).select(
        "rule_id",
        "rule",
        "col_name",
        "n_rows",
        "n_violations",
        F.round(
            F.col("n_violations") / F.greatest(F.col("n_rows"), F.lit(1)), 9
        ).alias("violation_frac"),
        (F.col("n_violations") == 0).alias("passed"),
    )
