"""Round-8 goldens: hand-computed fixtures for the new library ops
(drawdown, exact ACF, Ljung-Box, streaks, ...); the registry queries
are gated by the DuckDB oracles (tools/oracle_check.py)."""

from __future__ import annotations

import math

from datetime import date, datetime


def test_max_drawdown_hand_case(spark):
    """Equity walk 10, -4, -8, +5 -> equity 10, 6, -2, 3; peak stays
    10; drawdowns 0, 4, 12, 7 -> max 12; final 3."""
    from vanus_spark.operators.timeseries import max_drawdown

    rows = [
        ("u", datetime(2024, 1, 1, 0, 0, i), i, c)
        for i, c in enumerate([10, -4, -8, 5])
    ]
    df = spark.createDataFrame(
        rows, "k string, ts timestamp, eid long, cents long"
    )
    out = max_drawdown(df, "cents", "ts", "k", "eid").collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_events"] == 4
    assert r["max_drawdown_cents"] == 12
    assert r["peak_cents"] == 10
    assert r["final_cents"] == 3


def test_max_drawdown_monotone_series_is_zero(spark):
    """A strictly rising equity curve never dips below its peak."""
    from vanus_spark.operators.timeseries import max_drawdown

    rows = [
        ("u", datetime(2024, 1, 1, 0, 0, i), i, 5) for i in range(6)
    ]
    df = spark.createDataFrame(
        rows, "k string, ts timestamp, eid long, cents long"
    )
    r = max_drawdown(df, "cents", "ts", "k", "eid").collect()[0]
    assert r["max_drawdown_cents"] == 0
    assert r["final_cents"] == 30 and r["peak_cents"] == 30


def test_acf_exact_alternating_series(spark):
    """y = +1/-1 alternating (as cents 1, -1, ...): mean 0 for even n,
    r_1 = -((n-1)/n), r_2 = +((n-2)/n) (textbook circular-free ACF of
    a period-2 series)."""
    from vanus_spark.operators.timeseries import acf_exact

    n = 10
    rows = [
        ("k", date(2024, 1, 1 + i), 1 if i % 2 == 0 else -1)
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "k string, day date, cents long")
    r = acf_exact(df, "k", "day", "cents", 2).collect()[0]
    assert r["n_days"] == n
    assert abs(r["acf_1"] - (-(n - 1) / n)) < 1e-6
    assert abs(r["acf_2"] - ((n - 2) / n)) < 1e-6


def test_acf_exact_constant_series_is_null(spark):
    """Zero variance -> denominator 0 -> NULL acf, never a div-0."""
    from vanus_spark.operators.timeseries import acf_exact

    rows = [("k", date(2024, 1, 1 + i), 7) for i in range(8)]
    df = spark.createDataFrame(rows, "k string, day date, cents long")
    r = acf_exact(df, "k", "day", "cents", 2).collect()[0]
    assert r["acf_1"] is None and r["acf_2"] is None


def test_ljung_box_matches_manual_fold(spark):
    """Q recomputed in Python from the op's own rounded ACF values;
    p in (0,1) and small for the strongly autocorrelated alternating
    series."""
    from vanus_spark.operators.timeseries import acf_exact, ljung_box

    n = 12
    rows = [
        ("k", date(2024, 1, 1 + i), 1 if i % 2 == 0 else -1)
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "k string, day date, cents long")
    acf = acf_exact(df, "k", "day", "cents", 3).collect()[0]
    got = ljung_box(df, "k", "day", "cents", 3).collect()[0]
    q = 0.0
    for k in (1, 2, 3):
        rk = acf[f"acf_{k}"]
        q += rk * rk / (n - k)
    q *= n * (n + 2)
    assert abs(got["q_stat"] - round(q, 6)) < 1e-6
    assert 0.0 <= got["p_value"] < 0.05


def test_streak_islands_query_shape(spark, tmp_path):
    """Gaps-and-islands on a synthetic user: active days 1,2,3,7,8 ->
    longest 3, islands 2, total 5 (drives the registry query's window
    + double rollup through a real parquet round-trip)."""
    from pyspark.sql import Window, functions as F

    rows = [(1, d) for d in (1, 2, 3, 7, 8)] + [(2, d) for d in (4,)]
    df = spark.createDataFrame(rows, "user_id long, dnum long")
    w = Window.partitionBy("user_id").orderBy("dnum")
    isl = df.select(
        "user_id",
        "dnum",
        (F.col("dnum") - F.row_number().over(w)).alias("island"),
    )
    runs = isl.groupBy("user_id", "island").agg(F.count("*").alias("rl"))
    out = {
        r["user_id"]: r
        for r in runs.groupBy("user_id")
        .agg(
            F.max("rl").alias("longest"),
            F.count("*").alias("n_islands"),
            F.sum("rl").alias("total"),
        )
        .collect()
    }
    assert out[1]["longest"] == 3
    assert out[1]["n_islands"] == 2
    assert out[1]["total"] == 5
    assert out[2]["longest"] == 1 and out[2]["n_islands"] == 1
