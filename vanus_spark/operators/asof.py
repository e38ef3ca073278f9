"""As-of join: for each left row, the nearest right row per key —
backward (right_ts <= left_ts, the default), forward
(right_ts >= left_ts), or nearest (smaller absolute gap of the two).

Spark has no native ASOF JOIN (DuckDB/Pandas do). The naive
formulation — inequality join + per-left-row extremum — is O(n·m) per
key. This implementation is the union-window composition:

  1. union left and right rows tagged by side, keyed (key, ts)
  2. one window per key ordered by (ts, side) carries the last seen
     right payload forward (backward: last(..., ignoreNulls) over the
     preceding frame; forward: first(...) over the following frame;
     nearest: both frames over the SAME sort — Catalyst plans the two
     WindowExecs over one shuffle+sort)
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
    direction: str = "backward",
) -> DataFrame:
    """Returns ``left`` plus, for each value column ``v`` of ``right``,
    a column ``asof_<v>`` holding the value from the nearest right row
    in the requested direction (backward: most recent right_ts <=
    left_ts; forward: earliest right_ts >= left_ts; nearest: whichever
    of the two has the smaller absolute gap, backward on ties).

    Ties (equal timestamps): the right row at the same instant is
    visible to the left row unless ``strict``. ``strict`` with
    ``nearest`` excludes the equal-instant row from BOTH directions.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction: {direction}")
    # side ordering encodes tie visibility: the window frame anchored
    # at the left row (side=1) must include the equal-ts right row
    # exactly when the join is inclusive in that direction
    back_side = 2 if strict else 0
    fwd_side = 0 if strict else 2
    need_back = direction in ("backward", "nearest")
    need_fwd = direction in ("forward", "nearest")
    rtypes = dict(right.dtypes)

    def r_cols(side: int, tag: str):
        return [
            F.col(c).alias(f"_{tag}_{c}") for c in value_cols
        ] + [F.col(right_ts).cast("timestamp").alias(f"_{tag}_ts")]

    def r_nulls(tag: str):
        return [
            F.lit(None).cast(rtypes[c]).alias(f"_{tag}_{c}")
            for c in value_cols
        ] + [F.lit(None).cast("timestamp").alias(f"_{tag}_ts")]

    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_left"),
        *(r_nulls("b") if need_back else []),
        *(r_nulls("f") if need_fwd else []),
    )
    # nearest with strict=False: the equal-ts row must be visible to
    # both frames, but one physical row can only sort on one side of
    # the left row — so each right row is emitted once PER NEEDED
    # DIRECTION with that direction's side tag (and null payloads for
    # the other direction, so the other carry ignores it)
    r_parts = []
    if need_back:
        r_parts.append(
            right.select(
                F.col(on).alias("_k"),
                F.col(right_ts).alias("_ts"),
                F.lit(back_side).alias("_side"),
                F.lit(None)
                .cast(l_tagged.schema["_left"].dataType.simpleString())
                .alias("_left"),
                *r_cols(back_side, "b"),
                *(r_nulls("f") if need_fwd else []),
            )
        )
    if need_fwd:
        r_parts.append(
            right.select(
                F.col(on).alias("_k"),
                F.col(right_ts).alias("_ts"),
                F.lit(fwd_side).alias("_side"),
                F.lit(None)
                .cast(l_tagged.schema["_left"].dataType.simpleString())
                .alias("_left"),
                *(r_nulls("b") if need_back else []),
                *r_cols(fwd_side, "f"),
            )
        )
    unioned = l_tagged
    for p in r_parts:
        unioned = unioned.unionByName(p)
    wb = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    carry = ["_left", F.col("_ts").alias("_lts")]
    if need_back:
        carry += [
            F.last(f"_b_{c}", ignorenulls=True).over(wb).alias(f"_cb_{c}")
            for c in value_cols
        ] + [F.last("_b_ts", ignorenulls=True).over(wb).alias("_cb_ts")]
    if need_fwd:
        carry += [
            F.first(f"_f_{c}", ignorenulls=True).over(wf).alias(f"_cf_{c}")
            for c in value_cols
        ] + [F.first("_f_ts", ignorenulls=True).over(wf).alias("_cf_ts")]
    carried = unioned.select(*carry).where(F.col("_left").isNotNull())

    if direction == "backward":
        vals = [F.col(f"_cb_{c}").alias(f"asof_{c}") for c in value_cols]
    elif direction == "forward":
        vals = [F.col(f"_cf_{c}").alias(f"asof_{c}") for c in value_cols]
    else:
        # backward wins ties; a missing side loses automatically
        db = F.col("_lts").cast("double") - F.col("_cb_ts").cast("double")
        df_ = F.col("_cf_ts").cast("double") - F.col("_lts").cast("double")
        use_back = F.col("_cb_ts").isNotNull() & (
            F.col("_cf_ts").isNull() | (db <= df_)
        )
        vals = [
            F.when(use_back, F.col(f"_cb_{c}"))
            .otherwise(F.col(f"_cf_{c}"))
            .alias(f"asof_{c}")
            for c in value_cols
        ]
    return carried.select(
        *[F.col(f"_left.{c}").alias(c) for c in left.columns], *vals
    )
