"""Slowly-changing-dimension (type 2) builder: turn a keyed change
history into validity intervals.

Given one row per observation (key, order columns, tracked attribute),
emit one row per CHANGE with [valid_from, valid_to) bounds and an
is_current flag — the dimension-table shape every warehouse join uses
for "what was this attribute AT the fact's time" (the batch counterpart
of a CDC-fed dimension).

100 TB design: everything is per-key window functions — one shuffle on
the key, no global sort, no iteration. Run-length compression (drop
rows equal to their predecessor) happens BEFORE the interval close, so
the second window pass sees only change rows, not the raw history.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def scd2_build(
    df: DataFrame,
    key_col: str,
    attr_col: str,
    order_cols: list[str],
) -> DataFrame:
    """(key, attr, valid_from, valid_to, is_current) — valid_from is
    the first order-column value of each run of equal ``attr_col``,
    valid_to the next run's start (null = open / current). Ties in
    ``order_cols`` must be broken by the caller (pass enough columns
    to make the per-key order total, or the run compression is
    nondeterministic)."""
    w = Window.partitionBy(key_col).orderBy(*[F.col(c) for c in order_cols])
    changed: Column = (
        F.lag(attr_col).over(w).isNull()
        | (F.col(attr_col) != F.lag(attr_col).over(w))
    )
    runs = df.select(
        key_col, attr_col, *order_cols, changed.alias("_chg")
    ).where(F.col("_chg"))
    w2 = Window.partitionBy(key_col).orderBy(*[F.col(c) for c in order_cols])
    valid_from = F.col(order_cols[0])
    return runs.select(
        F.col(key_col),
        F.col(attr_col),
        valid_from.alias("valid_from"),
        F.lead(valid_from).over(w2).alias("valid_to"),
        F.lead(valid_from).over(w2).isNull().alias("is_current"),
    )
