"""Post-r10 wave-2 goldens: hand-computed fixtures for Jarque-Bera,
Fleiss' kappa, the g3' functional-dependency audit, and linear CKA;
the registry queries themselves are gated by the DuckDB oracles
(tools/oracle_check.py)."""

from __future__ import annotations

import importlib.util
import math
import os
import tempfile


def _entry():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry_s16__", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def _write_events(spark, rows):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    tmp = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(tmp, "events.parquet"))
    return tmp


def test_jarque_bera_symmetric_fixture(spark):
    """Six symmetric daily totals 1..6 dollars: zero skewness by
    construction; kurtosis/JB/p agree with the population-moment
    formulas computed in plain Python."""
    m = _entry()
    rows = [
        (i, f"2024-01-{i + 1:02d} 10:00:00", 1, "purchase", float(i + 1), "{}")
        for i in range(6)
    ]
    tmp = _write_events(spark, rows)
    r = m.queries()["events_jarque_bera"](spark, tmp).collect()[0]
    cents = [100.0 * (i + 1) for i in range(6)]
    n = len(cents)
    mean = sum(cents) / n
    d = [c - mean for c in cents]
    m2 = sum(v * v for v in d) / n
    m4 = sum(v**4 for v in d) / n
    kurt = m4 / (m2 * m2) - 3.0
    jb = n / 6.0 * (kurt * kurt / 4.0)
    assert r["n_days"] == 6
    assert r["mean_daily"] == 3.5
    assert r["skewness"] == 0.0
    assert abs(r["ex_kurtosis"] - kurt) < 1e-6
    assert abs(r["jb_stat"] - jb) < 1e-6
    assert abs(r["p_value"] - math.exp(-jb / 2.0)) < 1e-6


def test_jarque_bera_bounds_real_fixture(spark):
    """sf0.001: one row per event type, p in [0, 1], JB >= 0."""
    m = _entry()
    out = m.queries()["events_jarque_bera"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(out) == 5
    for r in out:
        assert r["n_days"] >= 3
        assert r["jb_stat"] >= 0.0
        assert 0.0 <= r["p_value"] <= 1.0


def _write_docs(spark, rows):
    df = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    tmp = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
    return tmp


def test_fleiss_kappa_hand_fixture(spark):
    """Same four docs as the Cohen-kappa golden (votes k = 1, 2, 1, 3):
    N=4, K=7, S = 2+2+2+6 = 12, Q = 49 + 25 = 74 ->
    P-bar = 0.5, Pe-bar = 74/144, kappa = (144 - 148)/(288 - 148)."""
    m = _entry()
    a = " ".join(["tok"] * 60)
    b = " ".join(f"word{i}" for i in range(60))
    c = " ".join(["a the"] * 10)
    d = " ".join(f"item{i}" for i in range(47)) + " a a a"
    rows = [
        (0, a, "en", "s", len(a)),
        (1, b, "en", "s", len(b)),
        (2, c, "en", "s", len(c)),
        (3, d, "en", "s", len(d)),
    ]
    tmp = _write_docs(spark, rows)
    r = m.queries()["quality_fleiss_kappa"](spark, tmp).collect()[0]
    assert r["n_docs"] == 4 and r["n_raters"] == 3
    assert r["keep_votes"] == 7
    assert abs(r["p_keep"] - 7.0 / 12.0) < 1e-6
    assert r["p_bar"] == 0.5
    assert abs(r["p_e_bar"] - 74.0 / 144.0) < 1e-6
    assert abs(r["fleiss_kappa"] - (-4.0 / 140.0)) < 1e-6


def test_fleiss_kappa_unanimous_is_one_observed(spark):
    """All raters agree on every doc (k = 0 or 3): P-bar = 1; kappa
    = 1 only if both verdicts occur (here they do)."""
    m = _entry()
    good = " ".join(f"w{i}" for i in range(50)) + " a a the the"
    bad = " ".join(["z"] * 10)
    rows = [
        (0, good, "en", "s", len(good)),
        (1, bad, "en", "s", len(bad)),
    ]
    tmp = _write_docs(spark, rows)
    r = m.queries()["quality_fleiss_kappa"](spark, tmp).collect()[0]
    assert r["p_bar"] == 1.0
    assert r["fleiss_kappa"] == 1.0


def test_fd_violations_hand_fixture(spark):
    """orders: custkey 1 -> {1-P, 1-P, 2-P}, custkey 2 -> {3-P}
    (g3' = 1/4); one shared date with statuses O,O,F,F (g3' = 1/2);
    customer: the key FD holds exactly, nationkey -> segment keeps
    2 of 3."""
    import datetime

    m = _entry()
    dt = datetime.datetime(1995, 3, 1)
    odf = spark.createDataFrame(
        [
            (1, 1, "O", 10.0, dt, "1-P"),
            (2, 1, "O", 10.0, dt, "1-P"),
            (3, 1, "F", 10.0, dt, "2-P"),
            (4, 2, "F", 10.0, dt, "3-P"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    )
    cdf = spark.createDataFrame(
        [
            (1, "c1", 1, 0.0, "AUTO"),
            (2, "c2", 1, 0.0, "AUTO"),
            (3, "c3", 1, 0.0, "BUILDING"),
        ],
        "c_custkey long, c_name string, c_nationkey long,"
        " c_acctbal double, c_mktsegment string",
    )
    tmp = tempfile.mkdtemp()
    odf.write.mode("overwrite").parquet(os.path.join(tmp, "orders.parquet"))
    cdf.write.mode("overwrite").parquet(os.path.join(tmp, "customer.parquet"))
    out = {
        r["fd"]: r
        for r in m.queries()["table_fd_violations"](spark, tmp).collect()
    }
    r1 = out["orders: o_custkey -> o_orderpriority"]
    assert (r1["n_rows"], r1["n_groups"], r1["n_kept"]) == (4, 2, 3)
    assert r1["violation_rate"] == 0.25 and not r1["holds"]
    r2 = out["orders: o_orderdate -> o_orderstatus"]
    assert (r2["n_rows"], r2["n_groups"], r2["n_kept"]) == (4, 1, 2)
    assert r2["violation_rate"] == 0.5 and not r2["holds"]
    r3 = out["customer: c_custkey -> c_mktsegment"]
    assert r3["holds"] and r3["violation_rate"] == 0.0
    assert r3["n_groups"] == 3
    r4 = out["customer: c_nationkey -> c_mktsegment"]
    assert (r4["n_rows"], r4["n_groups"], r4["n_kept"]) == (3, 1, 2)
    assert not r4["holds"]


def test_fd_key_holds_real_fixture(spark):
    """sf0.001: the customer primary key FD must hold exactly; the
    deliberately-violated date -> status FD must not."""
    m = _entry()
    out = {
        r["fd"]: r
        for r in m.queries()["table_fd_violations"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    key = out["customer: c_custkey -> c_mktsegment"]
    assert key["holds"] and key["n_kept"] == key["n_rows"]
    assert not out["orders: o_orderdate -> o_orderstatus"]["holds"]


def _write_embeddings(spark, rows):
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    tmp = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(
        os.path.join(tmp, "embeddings.parquet")
    )
    return tmp


def test_cka_prefix_carries_all_variance(spark):
    """Vectors whose dims 8..63 are identically zero: every centered
    gram entry touching a dim >= 8 vanishes, so each prefix >= 8 sees
    the full geometry and CKA is exactly 1 at every prefix."""
    m = _entry()
    rows = []
    for i in range(4):
        head = [float((i + 1) * (j + 2) % 7) + 0.5 * i for j in range(8)]
        rows.append((i, head + [0.0] * 56, 0))
    tmp = _write_embeddings(spark, rows)
    out = m.queries()["embedding_cka"](spark, tmp).collect()
    assert [r["prefix_dim"] for r in out] == [8, 16, 32, 64]
    for r in out:
        assert r["n_vecs"] == 4
        assert r["cka"] == 1.0, (r["prefix_dim"], r["cka"])


def test_cka_bounds_and_self_check_real_fixture(spark):
    """sf0.001: CKA in (0, 1]; the m=64 row is the exact self-CKA and
    must be 1; truncation to 8 dims must lose at least as much
    geometry as keeping all 64."""
    m = _entry()
    out = {
        r["prefix_dim"]: r["cka"]
        for r in m.queries()["embedding_cka"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert out[64] == 1.0
    for p in (8, 16, 32):
        assert 0.0 < out[p] <= 1.0
    assert out[8] <= out[64]
