"""Round-7 third-session goldens: inverse-normal transform
(RankGauss), isotonic PAV calibration — hand-computed fixtures for the
library ops; the registry queries are gated by the DuckDB oracles
(tools/oracle_check.py)."""

from __future__ import annotations

import math


def test_inv_norm_cdf_matches_known_quantiles(spark):
    """Phi^{-1} at textbook points: 0.5 -> 0, 0.975 -> 1.959964,
    0.025 -> -1.959964 (tail branch), 0.8413447 -> ~1 (central)."""
    from pyspark.sql import functions as F

    from vanus_spark.operators.hyptests import inv_norm_cdf

    df = spark.createDataFrame(
        [(0.5,), (0.975,), (0.025,), (0.8413447460685429,), (1e-6,)],
        "p double",
    )
    got = {
        r["p"]: r["q"]
        for r in df.select(
            "p", inv_norm_cdf(F.col("p")).alias("q")
        ).collect()
    }
    assert abs(got[0.5]) < 1e-12
    assert abs(got[0.975] - 1.959964) < 1e-5
    assert abs(got[0.025] + 1.959964) < 1e-5
    assert abs(got[0.8413447460685429] - 1.0) < 1e-6
    assert abs(got[1e-6] + 4.753424) < 1e-4


def test_rank_gauss_symmetric_and_monotone(spark):
    """Values 1..5 once each in one group: ranks 1..5, Blom p
    symmetric around 0.5 -> gauss antisymmetric; strictly increasing
    in the value."""
    from vanus_spark.operators.hyptests import rank_gauss_by_group

    rows = [("g", v) for v in (1, 2, 3, 4, 5)]
    df = spark.createDataFrame(rows, "grp string, v long")
    out = (
        rank_gauss_by_group(df, "v", "grp")
        .orderBy("v")
        .collect()
    )
    gs = [r["gauss"] for r in out]
    assert gs == sorted(gs)
    assert abs(gs[2]) < 1e-9  # median -> Phi^{-1}(0.5) = 0
    assert abs(gs[0] + gs[4]) < 1e-9 and abs(gs[1] + gs[3]) < 1e-9
    assert [r["avg_rank"] for r in out] == [1.0, 2.0, 3.0, 4.0, 5.0]


def test_rank_gauss_tie_handling(spark):
    """[1, 2, 2, 3]: tied 2s share avg rank 2.5."""
    from vanus_spark.operators.hyptests import rank_gauss_by_group

    df = spark.createDataFrame(
        [("g", 1), ("g", 2), ("g", 2), ("g", 3)], "grp string, v long"
    )
    out = {
        r["v"]: r for r in rank_gauss_by_group(df, "v", "grp").collect()
    }
    assert out[2]["avg_rank"] == 2.5 and out[2]["n_ties"] == 2
    assert abs(out[2]["gauss"]) < 1e-9  # (2.5 - .375)/4.25 = 0.5


def test_isotonic_pav_pools_violators(spark):
    """Unit weights, y = [1, 3, 2, 4]: PAV pools the (3, 2) violation
    into 2.5 -> fit [1, 2.5, 2.5, 4]."""
    from vanus_spark.operators.calibration import isotonic_binned

    bins = spark.createDataFrame(
        [(0, 1, 1), (1, 1, 3), (2, 1, 2), (3, 1, 4)],
        "bucket int, w long, s long",
    )
    got = {
        r["bucket"]: r["iso_rate"]
        for r in isotonic_binned(bins).collect()
    }
    assert got == {0: 1.0, 1: 2.5, 2: 2.5, 3: 4.0}


def test_isotonic_pav_weighted(spark):
    """Weights matter: y-means [2 (w=3), 1 (w=1)] pool to the weighted
    mean 7/4 for both buckets."""
    from vanus_spark.operators.calibration import isotonic_binned

    bins = spark.createDataFrame(
        [(0, 3, 6), (1, 1, 1)], "bucket int, w long, s long"
    )
    got = {
        r["bucket"]: r["iso_rate"]
        for r in isotonic_binned(bins).collect()
    }
    assert got == {0: 1.75, 1: 1.75}


def test_isotonic_already_monotone_is_identity(spark):
    from vanus_spark.operators.calibration import isotonic_binned

    bins = spark.createDataFrame(
        [(0, 2, 0), (1, 2, 1), (2, 2, 3)], "bucket int, w long, s long"
    )
    got = {
        r["bucket"]: r["iso_rate"]
        for r in isotonic_binned(bins).collect()
    }
    assert got == {0: 0.0, 1: 0.5, 2: 1.5}


def test_registry_isotonic_fit_is_monotone(spark, sf_dir):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry_mod", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    rows = m.queries()["quality_isotonic"](spark, sf_dir).collect()
    iso = [r["iso_rate"] for r in rows]
    assert iso == sorted(iso)
    assert all(0.0 <= v <= 1.0 for v in iso)
