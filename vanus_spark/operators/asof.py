"""As-of join: for each left row, the most recent right row with
right_ts <= left_ts (per key).

Spark has no native ASOF JOIN (DuckDB/Pandas do). The naive
formulation — inequality join + per-left-row max — is O(n·m) per key.
This implementation is the union-window composition:

  1. union left and right rows tagged by side, keyed (key, ts)
  2. one window per key ordered by (ts, side) carries the last seen
     right payload forward (last(..., ignoreNulls=True))
  3. keep left rows; the carried value IS the as-of match

Cost: ONE shuffle on the key (the window's partitioning), linear scan
within partitions — the same profile as a sort-merge join, which is
what survives 100 TB. Skewed keys behave like any window (salt or
split if one key dominates).

For per-group in-memory sizes where pandas is acceptable,
``pd.merge_asof`` inside ``applyInPandas`` is the alternative; the
union-window form is preferred because it never materializes a group
in Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    strict: bool = False,
) -> DataFrame:
    """Returns ``left`` plus, for each value column ``v`` of ``right``,
    a column ``asof_<v>`` holding the value from the most recent right
    row with ``right_ts <= left_ts`` (or ``<`` when strict).

    Ties (equal timestamps): the right row at the same instant is
    visible to the left row unless ``strict``.
    """
    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),  # left sorts after right at equal ts
        F.struct(*[F.col(c) for c in left.columns]).alias("_left"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_r_{c}") for c in value_cols],
    )
    r_tagged = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0 if not strict else 2).alias("_side"),
        F.lit(None).cast(
            l_tagged.schema["_left"].dataType.simpleString()
        ).alias("_left"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "_left",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ],
    )
    out = carried.where(F.col("_left").isNotNull())
    return out.select(
        *[F.col(f"_left.{c}").alias(c) for c in left.columns],
        *[F.col(f"asof_{c}") for c in value_cols],
    )
