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


def test_brown_forsythe_detects_spread_difference(spark):
    """Group a = tight around 100 (+-1), group b = wide (+-50):
    F should be large; identical groups give F ~ 0."""
    from vanus_spark.operators.hyptests import anova_oneway
    from pyspark.sql import functions as F

    tight = [("a", 100 + d) for d in (-1, 0, 1) * 10]
    wide = [("b", 100 + d) for d in (-50, 0, 50) * 10]
    df = spark.createDataFrame(tight + wide, "g string, cents long")
    med = df.groupBy("g").agg(F.expr("percentile(cents, 0.5)").alias("m"))
    dev = df.join(F.broadcast(med), "g").select(
        "g",
        F.abs(F.col("cents") * 2 - (F.col("m") * 2.0).cast("long")).alias(
            "dev2"
        ),
    )
    r = anova_oneway(dev, "dev2", "g").collect()[0]
    assert r["k_groups"] == 2 and r["n"] == 60
    assert r["f_stat"] > 30.0

    same = spark.createDataFrame(
        [("a", v) for v in (90, 100, 110) * 5]
        + [("b", v) for v in (90, 100, 110) * 5],
        "g string, cents long",
    )
    med2 = same.groupBy("g").agg(
        F.expr("percentile(cents, 0.5)").alias("m")
    )
    dev2 = same.join(F.broadcast(med2), "g").select(
        "g",
        F.abs(F.col("cents") * 2 - (F.col("m") * 2.0).cast("long")).alias(
            "dev2"
        ),
    )
    r2 = anova_oneway(dev2, "dev2", "g").collect()[0]
    assert abs(r2["f_stat"]) < 1e-9


def test_wilson_interval_textbook_point(spark):
    """n=10, k=5: Wilson 95% CI ~ (0.2366, 0.7634) (textbook value);
    the interval always stays inside [0, 1] even at k = 0."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(10, 5), (10, 0)], "n long, k long")
    n = F.col("n").cast("double")
    p = F.col("k").cast("double") / n
    z2 = 1.96 * 1.96
    center = (p + z2 / (2.0 * n)) / (1.0 + z2 / n)
    half = (
        1.96
        * F.sqrt(p * (1.0 - p) / n + z2 / (4.0 * n * n))
        / (1.0 + z2 / n)
    )
    rows = df.select(
        "k",
        F.round(center - half, 4).alias("lo"),
        F.round(center + half, 4).alias("hi"),
    ).collect()
    got = {r["k"]: (r["lo"], r["hi"]) for r in rows}
    assert abs(got[5][0] - 0.2366) < 5e-4
    assert abs(got[5][1] - 0.7634) < 5e-4
    assert got[0][0] == 0.0 and 0.0 < got[0][1] < 0.35


def test_poisson_two_sample_z_direction(spark):
    """Variant a has 3x the event rate at equal exposure: z positive
    and large; equal rates give z ~ 0. Conditional-binomial formula
    checked against a hand fold."""
    import math

    c_a, c_b, e_a, e_b = 30, 10, 100, 100
    nn = float(c_a + c_b)
    p0 = e_a / (e_a + e_b)
    z = (c_a - nn * p0) / math.sqrt(nn * p0 * (1 - p0))
    assert z > 3.0
    c_a2 = 10
    nn2 = float(c_a2 + c_b)
    z2 = (c_a2 - nn2 * p0) / math.sqrt(nn2 * p0 * (1 - p0))
    assert abs(z2) < 1e-9


def test_hhi_extremes(spark):
    """One supplier owning everything -> HHI 1; n equal suppliers ->
    HHI 1/n (the two textbook anchors), computed through the same
    decimal-squares expression the registry query uses."""
    from pyspark.sql import functions as F

    rows = [(1, 1, 500)] + [(2, s, 100) for s in range(4)]
    df = spark.createDataFrame(rows, "nat long, sup long, rs long")
    per = df.groupBy("nat").agg(
        F.sum("rs").alias("total"),
        F.sum(
            F.col("rs").cast("decimal(19,0)")
            * F.col("rs").cast("decimal(19,0)")
        ).alias("sumsq"),
    )
    got = {
        r["nat"]: r["hhi"]
        for r in per.select(
            "nat",
            (
                F.col("sumsq").cast("double")
                / (F.col("total").cast("double") * F.col("total").cast("double"))
            ).alias("hhi"),
        ).collect()
    }
    assert abs(got[1] - 1.0) < 1e-12
    assert abs(got[2] - 0.25) < 1e-12


def test_waterfall_identity_holds(spark):
    """charge = gross - discount + tax on the integer lattice for a
    hand row: price 100.00, disc 5%, tax 8%."""
    pc, dp, tp = 10000, 5, 8
    gross = pc * 10000
    disc = pc * dp * 100
    tax = pc * (100 - dp) * tp
    charge = gross - disc + tax
    # 100 * 0.95 * 1.08 = 102.60 exactly
    assert charge / 1_000_000 == 102.6
    assert (gross - disc) / 1_000_000 == 95.0


def test_rolling_share_sums_to_one(spark):
    """Per-day shares across brands must sum to 1 whenever every
    brand's window covers the same days (dense daily panel)."""
    from pyspark.sql import Window, functions as F

    rows = [
        (b, d, (b + 1) * 10 + d) for b in range(3) for d in range(6)
    ]
    daily = spark.createDataFrame(rows, "brand long, dnum long, rev long")
    wb = Window.partitionBy("brand").orderBy("dnum").rangeBetween(-2, 0)
    rolled = daily.select(
        "brand", "dnum", F.sum("rev").over(wb).alias("roll")
    )
    tot = daily.groupBy("dnum").agg(F.sum("rev").alias("trev"))
    wt = Window.partitionBy(F.lit(1)).orderBy("dnum").rangeBetween(-2, 0)
    trolled = tot.select("dnum", F.sum("trev").over(wt).alias("troll"))
    shares = rolled.join(trolled, "dnum").groupBy("dnum").agg(
        F.sum(F.col("roll") / F.col("troll")).alias("s")
    )
    for r in shares.collect():
        assert abs(r["s"] - 1.0) < 1e-12


def test_target_encode_loo_hand_case(spark):
    """Category 'a' = labels [1, 0], prior 10, global mean 0.5:
    row 1's enc = (1 - 1 + 10*0.5)/(2 - 1 + 10) = 5/11; own label
    never contributes to its own encoding."""
    from vanus_spark.operators.encoding import target_encode_loo

    rows = [(1, "a", 1), (2, "a", 0), (3, "b", 1), (4, "b", 0)]
    df = spark.createDataFrame(rows, "rid long, cat string, y long")
    out = {
        r["rid"]: r["enc"]
        for r in target_encode_loo(df, "cat", "y", ["rid"]).collect()
    }
    assert abs(out[1] - 5.0 / 11.0) < 1e-12
    assert abs(out[2] - 6.0 / 11.0) < 1e-12
    # symmetric data -> categories mirror
    assert abs(out[3] - out[1]) < 1e-12


def test_woe_iv_direction_and_smoothing(spark):
    """A category enriched in goods gets positive WoE, the depleted
    one negative; IV total > 0 and identical on every row; smoothing
    keeps a zero-bad cell finite."""
    from vanus_spark.operators.encoding import woe_iv

    rows = (
        [("hi", 1)] * 8 + [("hi", 0)] * 2
        + [("lo", 1)] * 2 + [("lo", 0)] * 8
        + [("pure", 1)] * 3  # zero bads -> needs smoothing
    )
    df = spark.createDataFrame(rows, "cat string, y long")
    out = {r["cat"]: r for r in woe_iv(df, "cat", "y").collect()}
    assert out["hi"]["woe"] > 0 and out["lo"]["woe"] < 0
    assert out["pure"]["woe"] > 0 and math.isfinite(out["pure"]["woe"])
    ivs = {r["iv_total"] for r in out.values()}
    assert len(ivs) == 1 and ivs.pop() > 0.1


def test_pr_auc_perfect_and_random(spark):
    """A perfectly separating score gives AP = 1 and best F1 = 1; a
    constant score gives AP = prevalence."""
    from vanus_spark.operators.encoding import pr_auc

    perfect = [(float(y), y) for y in (1, 1, 1, 0, 0, 0, 0)]
    df = spark.createDataFrame(perfect, "score double, label long")
    r = pr_auc(df, "score", "label").collect()[0]
    assert r["average_precision"] == 1.0 and r["best_f1"] == 1.0

    const = [(0.5, y) for y in (1, 1, 0, 0, 0)]
    df2 = spark.createDataFrame(const, "score double, label long")
    r2 = pr_auc(df2, "score", "label").collect()[0]
    assert abs(r2["average_precision"] - 0.4) < 1e-9


def test_embedding_drift_identical_halves(spark):
    """Two identical halves -> cosine 1, L2 0; orthogonal halves ->
    cosine 0."""
    from pyspark.sql import functions as F

    rows = [
        (0, 0, [1.0, 0.0]),
        (1, 0, [1.0, 0.0]),
        (2, 1, [0.0, 1.0]),
        (3, 1, [1.0, 0.0]),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )
    dims = df.select(
        "label",
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode("embedding").alias("d", "x"),
    )
    cent = dims.groupBy("label", "d").agg(
        F.avg(F.when(F.col("half") == 0, F.col("x"))).alias("ma"),
        F.avg(F.when(F.col("half") == 1, F.col("x"))).alias("mb"),
    )
    agg = cent.groupBy("label").agg(
        F.sum(F.col("ma") * F.col("mb")).alias("dot"),
        F.sum(F.col("ma") * F.col("ma")).alias("qa"),
        F.sum(F.col("mb") * F.col("mb")).alias("qb"),
    )
    got = {
        r["label"]: r["c"]
        for r in agg.select(
            "label",
            (F.col("dot") / (F.sqrt("qa") * F.sqrt("qb"))).alias("c"),
        ).collect()
    }
    assert abs(got[0] - 1.0) < 1e-12  # same vector both halves
    assert abs(got[1] - 0.0) < 1e-12  # orthogonal halves


def test_shapley_two_channel_hand_case(spark):
    """2-channel miniature of the coalition->Shapley algebra the
    registry query uses: v({A})=1, v({B})=0, v({A,B})=1, v({})=0
    -> phi_A = 1, phi_B = 0 (A carries all the credit; B is a dummy
    player)."""
    from pyspark.sql import functions as F

    # coalition table: mask (bit0=A, bit1=B) -> v
    v = spark.createDataFrame(
        [(0, 0.0), (1, 1.0), (2, 0.0), (3, 1.0)], "mask long, v double"
    )
    masks = spark.range(4).select(F.col("id").alias("smask"))
    chans = spark.createDataFrame(
        [("A", 0), ("B", 1)], "channel string, bit int"
    )
    pairs = masks.crossJoin(chans).where(
        F.expr("shiftright(smask, bit) & 1") == 0
    )
    w = F.element_at(
        F.array(F.lit(0.5), F.lit(0.5)),
        F.bit_count(F.col("smask")).cast("int") + 1,
    )
    v_s = v.select(F.col("mask").alias("smask"), F.col("v").alias("v_s"))
    v_si = v.select(F.col("mask").alias("wmask"), F.col("v").alias("v_si"))
    terms = (
        pairs.withColumn(
            "wmask", F.expr("smask + shiftleft(1, bit)").cast("long")
        )
        .join(v_s, "smask", "left")
        .join(v_si, "wmask", "left")
        .select(
            "channel",
            (
                w
                * (
                    F.coalesce("v_si", F.lit(0.0))
                    - F.coalesce("v_s", F.lit(0.0))
                )
            ).alias("term"),
        )
    )
    got = {
        r["channel"]: r["phi"]
        for r in terms.groupBy("channel")
        .agg(F.sum("term").alias("phi"))
        .collect()
    }
    assert abs(got["A"] - 1.0) < 1e-12
    assert abs(got["B"]) < 1e-12
    # efficiency: phi_A + phi_B = v(full) - v(empty)
    assert abs(sum(got.values()) - 1.0) < 1e-12


def test_hits_star_graph(spark):
    """1->0, 2->0, 0->3: after two unnormalized iterations node 0 is
    the top authority (score 4 = h1(1)+h1(2)) and nodes 1, 2 the top
    hubs (score 4 each)."""
    from pyspark.sql import functions as F

    edges = spark.createDataFrame(
        [(1, 0), (2, 0), (0, 3)], "src long, dst long"
    )
    a1 = edges.groupBy("dst").agg(F.count("*").alias("a1"))
    h1 = edges.join(a1, "dst").groupBy("src").agg(F.sum("a1").alias("h1"))
    a2 = edges.join(h1, "src").groupBy("dst").agg(F.sum("h1").alias("a2"))
    h2 = edges.join(a2, "dst").groupBy("src").agg(F.sum("a2").alias("h2"))
    auth = {r["dst"]: r["a2"] for r in a2.collect()}
    hubs = {r["src"]: r["h2"] for r in h2.collect()}
    assert auth == {0: 4, 3: 1}
    assert hubs == {1: 4, 2: 4, 0: 1}


def test_two_hop_reach_chain(spark):
    """Chain 1->2->3->4: reach(1) = {2,3}, reach(2) = {3,4},
    reach(3) = {4}."""
    from pyspark.sql import functions as F

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    two = edges.alias("a").join(
        edges.alias("b"), F.col("a.dst") == F.col("b.src")
    ).select(F.col("a.src").alias("src"), F.col("b.dst").alias("dst"))
    reach = (
        edges.unionByName(two)
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .groupBy("src")
        .agg(F.count("*").alias("r"))
    )
    got = {r["src"]: r["r"] for r in reach.collect()}
    assert got == {1: 2, 2: 2, 3: 1}


def test_k_anonymity_flags_small_groups(spark):
    """A QI group of 3 (k < 5) and a 6-member group with a single
    sensitive value (l = 1) both flag; a diverse 6-member group
    doesn't."""
    from pyspark.sql import functions as F

    rows = (
        [("s1", 1, "mid")] * 3
        + [("s2", 2, "mid")] * 6
        + [("s3", 3, "mid"), ("s3", 3, "high")] * 3
    )
    df = spark.createDataFrame(rows, "seg string, nat long, tier string")
    g = df.groupBy("seg", "nat").agg(
        F.count("*").alias("k"),
        F.count_distinct("tier").alias("l"),
    )
    out = {
        r["seg"]: (r["k"], r["l"], r["k"] < 5 or r["l"] < 2)
        for r in g.collect()
    }
    assert out["s1"] == (3, 1, True)  # too small
    assert out["s2"] == (6, 1, True)  # no diversity
    assert out["s3"] == (6, 2, False)  # fine


def test_croston_constant_demand_reduces_to_ratio(spark):
    """Demand 10 every 2 days: size EWMA -> 10, gap EWMA -> 2,
    croston forecast -> 5 per day (the intermittent-demand identity
    a plain EWMA of the raw series misses)."""
    from pyspark.sql import Window, functions as F

    from vanus_spark.operators.timeseries import ewma

    rows = [(1, 2 * i, 10) for i in range(8)]
    nz = spark.createDataFrame(rows, "user_id long, dnum long, z long")
    w = Window.partitionBy("user_id").orderBy("dnum")
    zs = ewma(nz, "z", "dnum", "user_id", "dnum", alpha=0.5, k=32)
    gaps = nz.select(
        "user_id",
        "dnum",
        (F.col("dnum") - F.lag("dnum").over(w)).alias("gap"),
    ).where(F.col("gap").isNotNull())
    gs = ewma(gaps, "gap", "dnum", "user_id", "dnum", alpha=0.5, k=32)
    ez = zs.orderBy(F.col("dnum").desc()).limit(1).collect()[0]["ewma"]
    eg = gs.orderBy(F.col("dnum").desc()).limit(1).collect()[0]["ewma"]
    assert abs(ez - 10.0) < 1e-12
    assert abs(eg - 2.0) < 1e-12
    assert abs(ez / eg - 5.0) < 1e-12


def test_curation_cube_totals_consistent(spark):
    """The grand-total cube cell equals the sum of the finest cells
    (grouping-set arithmetic sanity on a toy corpus)."""
    from pyspark.sql import functions as F

    rows = [
        ("en", "a", 100),
        ("en", "a", 100),
        ("en", "b", 300),
        ("de", "c", 700),
    ]
    df = spark.createDataFrame(rows, "lang string, text string, n long")
    counts = df.groupBy("text").agg(F.count("*").alias("copies"))
    ann = df.join(counts, "text").select(
        "lang",
        F.when(F.col("copies") > 1, "dup").otherwise("uniq").alias("ds"),
        "n",
    )
    cube = ann.cube("lang", "ds").agg(
        F.count("*").alias("n_docs"),
        F.sum("n").alias("chars"),
        F.grouping_id().alias("gid"),
    )
    rows_out = cube.collect()
    grand = [r for r in rows_out if r["gid"] == 3][0]
    fine = [r for r in rows_out if r["gid"] == 0]
    assert grand["n_docs"] == 4 and grand["chars"] == 1200
    assert sum(r["n_docs"] for r in fine) == 4
    assert sum(r["chars"] for r in fine) == 1200
    dup_cell = [
        r for r in rows_out if r["gid"] == 0 and r["ds"] == "dup"
    ]
    assert sum(r["n_docs"] for r in dup_cell) == 2


def test_fisher_exact_matches_r_values(spark):
    """Textbook tables against R's fisher.test: [[1,9],[11,3]] ->
    p = 0.00275946, [[3,1],[1,3]] -> p = 0.4857143; a balanced table
    gives p = 1."""
    from vanus_spark.operators.hyptests import fisher_exact_2x2

    assert abs(fisher_exact_2x2(1, 9, 11, 3)["p_value"] - 0.002759456) < 1e-8
    assert abs(fisher_exact_2x2(3, 1, 1, 3)["p_value"] - 0.4857142857) < 1e-9
    assert abs(fisher_exact_2x2(5, 5, 5, 5)["p_value"] - 1.0) < 1e-12
    r = fisher_exact_2x2(1, 9, 11, 3)
    assert abs(r["odds_ratio"] - (1 * 3) / (9 * 11)) < 1e-12


def test_fisher_exact_margin_cap_and_null_odds(spark):
    """The documented contract bounds: (a) a walk longer than 1e6
    raises (the O(min-margin) driver loop must not silently hang at
    100 TB counts — the geohash precision-cap pattern); (b) a zero
    off-diagonal returns odds_ratio None, not NaN, so the driver-side
    DataFrame carries SQL NULL matching the oracle's CASE WHEN."""
    import pytest as _pytest

    from vanus_spark.operators.hyptests import fisher_exact_2x2

    with _pytest.raises(ValueError, match="bounded margins"):
        fisher_exact_2x2(2_000_000, 2_000_000, 2_000_000, 2_000_000)
    # degenerate tables: b == 0 and c == 0 each null the odds ratio
    assert fisher_exact_2x2(3, 0, 2, 4)["odds_ratio"] is None
    assert fisher_exact_2x2(3, 2, 0, 4)["odds_ratio"] is None
    # the p-value walk itself still runs on degenerate tables
    assert 0.0 <= fisher_exact_2x2(3, 0, 2, 4)["p_value"] <= 1.0


def test_pacf_ar1_cuts_off_after_lag_one(spark):
    """For an exact AR(1) ACF (r_k = rho^k) the Durbin-Levinson
    unroll gives pacf_2 = pacf_3 = 0 — the textbook cutoff that makes
    PACF the AR-order diagnostic."""
    rho = 0.6
    r1, r2, r3 = rho, rho**2, rho**3
    phi22 = (r2 - r1 * r1) / (1.0 - r1 * r1)
    phi21 = r1 - phi22 * r1
    phi33 = (r3 - phi21 * r2 - phi22 * r1) / (
        1.0 - phi21 * r1 - phi22 * r2
    )
    assert abs(phi22) < 1e-12
    assert abs(phi33) < 1e-12
    # and an MA-ish ACF (r2 below rho^2) gives negative pacf_2
    phi22b = (0.1 - 0.36) / (1.0 - 0.36)
    assert phi22b < 0


def test_code_signal_separates_code_from_prose(spark):
    """A snippet with braces/semicolons + indented lines flags; plain
    prose does not (drives the same HOF + replace-delta expressions as
    the registry query)."""
    from pyspark.sql import functions as F

    code = "int f() {\n    int x = 1;\n    return x;\n}"
    prose = "The quick brown fox jumps over the lazy dog.\nIt was sunny."
    df = spark.createDataFrame(
        [(1, code, len(code)), (2, prose, len(prose))],
        "doc_id long, text string, n_chars long",
    )
    code_lines = F.expr(
        "size(filter(split(text, '\\n'), l ->"
        " right(trim(l), 1) IN (';', '{', '}')"
        " OR left(l, 4) = '    '))"
    )
    n_lines = F.expr("size(split(text, '\\n'))")
    sym = (
        (F.length("text") - F.length(F.replace(F.col("text"), F.lit("{"))))
        + (F.length("text") - F.length(F.replace(F.col("text"), F.lit(";"))))
        + (F.length("text") - F.length(F.replace(F.col("text"), F.lit("="))))
    )
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            n_lines.alias("nl"),
            code_lines.alias("cl"),
            (sym.cast("double") / F.col("n_chars")).alias("dens"),
        ).collect()
    }
    assert out[1]["cl"] == 4 and out[1]["dens"] > 0.02
    assert out[2]["cl"] == 0 and out[2]["dens"] == 0.0


def test_stationary_distribution_textbook_chain(spark):
    """P = [[0.5, 0.5], [0.25, 0.75]] has stationary (1/3, 2/3);
    the distribution sums to 1 and is invariant under one more step."""
    from vanus_spark.operators.markov import stationary_distribution

    out = dict(
        stationary_distribution(
            [("a", "a", 2), ("a", "b", 2), ("b", "a", 1), ("b", "b", 3)],
            ["a", "b"],
        )
    )
    assert abs(out["a"] - 1 / 3) < 1e-12
    assert abs(out["b"] - 2 / 3) < 1e-12
    assert abs(sum(out.values()) - 1.0) < 1e-12
    # invariance: pi P = pi
    pa = out["a"] * 0.5 + out["b"] * 0.25
    assert abs(pa - out["a"]) < 1e-12


def test_stationary_rejects_dead_state(spark):
    import pytest

    from vanus_spark.operators.markov import stationary_distribution

    with pytest.raises(ValueError):
        stationary_distribution([("a", "b", 1)], ["a", "b"])


def test_stationary_residual_flags_periodic_chain(spark):
    """r9-verdict #4: a periodic chain never converges under fixed
    power sweeps — the residual column must FIRE, while an aperiodic
    chain's residual is ~0. (A symmetric 2-cycle won't do: uniform is
    its stationary vector and the uniform START hides the period. The
    a<->b cycle with a one-way feeder c is period-2 from uniform: the
    iterate oscillates (2/3,1/3,0) <-> (1/3,2/3,0), residual 1/3.)"""
    from vanus_spark.operators.markov import stationary_distribution

    _, resid = stationary_distribution(
        [("a", "b", 1), ("b", "a", 1), ("c", "a", 1)],
        ["a", "b", "c"],
        with_residual=True,
    )
    assert abs(resid - 1 / 3) < 1e-12  # oscillating, clearly flagged

    pairs, resid = stationary_distribution(
        [("a", "a", 2), ("a", "b", 2), ("b", "a", 1), ("b", "b", 3)],
        ["a", "b"],
        with_residual=True,
    )
    assert resid < 1e-12  # converged
    assert abs(dict(pairs)["a"] - 1 / 3) < 1e-12


def test_mattr_constant_vs_diverse(spark):
    """All-same tokens -> MATTR = 1/20; all-distinct -> MATTR = 1
    (the two extremes of the 20-token window)."""
    from pyspark.sql import Window, functions as F

    same = [(1, i, "x") for i in range(25)]
    uniq = [(2, i, f"w{i}") for i in range(25)]
    toks = spark.createDataFrame(
        same + uniq, "doc_id long, pos long, tok string"
    )
    w = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(-19, 0)
    win = toks.select("doc_id", F.collect_list("tok").over(w).alias("arr"))
    full = win.where(F.size("arr") == 20).select(
        "doc_id", F.size(F.array_distinct("arr")).alias("k")
    )
    got = {
        r["doc_id"]: r["m"]
        for r in full.groupBy("doc_id")
        .agg((F.sum("k") / (20.0 * F.count("*"))).alias("m"))
        .collect()
    }
    assert abs(got[1] - 1.0 / 20.0) < 1e-12
    assert abs(got[2] - 1.0) < 1e-12


def test_sax_symbols_track_level(spark):
    """A series that steps low -> high maps to 'a...d...' symbols:
    the low plateau z-scores below -0.6745, the high one above."""
    import statistics

    vals = [10.0] * 6 + [20.0] * 6
    mu = statistics.mean(vals)
    sd = statistics.stdev(vals)
    syms = []
    for v in vals:
        z = (v - mu) / sd
        syms.append(
            "a" if z < -0.6745 else
            "b" if z < 0 else
            "c" if z < 0.6745 else "d"
        )
    assert set(syms[:6]) == {"a"} and set(syms[6:]) == {"d"}


def test_adf_random_walk_vs_mean_reverting(spark):
    """A pure random-ish walk (cumulative sum) should NOT reject the
    unit root, while a strongly mean-reverting series should: checked
    through the same closed-form OLS arithmetic the query uses."""

    def df_t(ys):
        pairs = [(ys[i] - ys[i - 1], ys[i - 1]) for i in range(1, len(ys))]
        n = float(len(pairs))
        sx = sum(x for _, x in pairs)
        sd = sum(d for d, _ in pairs)
        sxd = sum(d * x for d, x in pairs)
        sxx = sum(x * x for _, x in pairs)
        sdd = sum(d * d for d, _ in pairs)
        xb, db = sx / n, sd / n
        cxx = sxx - n * xb * xb
        cxd = sxd - n * xb * db
        cdd = sdd - n * db * db
        beta = cxd / cxx
        ssr = cdd - beta * cxd
        return beta / math.sqrt((ssr / (n - 2.0)) / cxx)

    # seeded +-1 random walk -> genuine unit root (a modular
    # arithmetic "walk" is periodic, i.e. secretly stationary)
    import random

    random.seed(0)
    walk = [0]
    for _ in range(200):
        walk.append(walk[-1] + random.choice([-1, 1]))
    # strongly mean-reverting: y alternates around 0 (jittered so the
    # AR fit isn't exact and the residual variance stays positive)
    revert = [
        (100 + (i % 5)) * (1 if i % 2 == 0 else -1) for i in range(60)
    ]
    assert df_t(walk) > -2.89
    assert df_t(revert) < -2.89


def test_mix_decomposition_identity(spark):
    """volume + price effects reconstruct delta revenue exactly:
    (n1-n0)*a0 + n1*(a1-a0) == n1*a1 - n0*a0."""
    n0, c0 = 10, 1000  # avg 100
    n1, c1 = 15, 1800  # avg 120
    a0, a1 = c0 / n0, c1 / n1
    vol = (n1 - n0) * a0
    price = n1 * (a1 - a0)
    assert abs((vol + price) - (c1 - c0)) < 1e-9


def test_pmi_independence_is_zero(spark):
    """Two types present on exactly the same fraction of days,
    co-occurring at the product rate -> PMI 0; perfect co-occurrence
    -> PMI = ln(N / c)."""
    n_days = 100
    ca = cb = 50
    n_both_indep = ca * cb // n_days  # 25
    pmi = math.log(n_both_indep * n_days / (ca * cb))
    assert abs(pmi) < 1e-12
    pmi_perfect = math.log(50 * n_days / (50 * 50))
    assert abs(pmi_perfect - math.log(2.0)) < 1e-12


def test_lorenz_uniform_spend_is_diagonal(spark):
    """Equal spend per user -> each decile holds 10% and the
    cumulative share is the diagonal (the Gini-0 anchor)."""
    from pyspark.sql import Window, functions as F

    from vanus_spark.bus import distributed_row_number

    users = spark.createDataFrame(
        [(i, 100) for i in range(50)], "user_id long, spend long"
    )
    ranked = distributed_row_number(users, [], ["spend", "user_id"], "rk")
    tot = ranked.agg(F.count("*").alias("n"), F.sum("spend").alias("ts"))
    dec = (
        ranked.crossJoin(F.broadcast(tot))
        .select(F.expr("CAST(rk * 10 DIV n AS INT)").alias("d"), "spend", "ts")
        .groupBy("d", "ts")
        .agg(F.sum("spend").alias("sc"))
    )
    w = Window.partitionBy(F.lit(1)).orderBy("d").rowsBetween(
        Window.unboundedPreceding, 0
    )
    rows = dec.select(
        "d",
        (F.sum("sc").over(w) / F.col("ts")).alias("cum"),
    ).collect()
    got = {r["d"]: r["cum"] for r in rows}
    for d in range(10):
        assert abs(got[d] - (d + 1) / 10.0) < 1e-12


def test_ngram_novelty_bounds(spark):
    """A doc duplicated verbatim has novelty 0; a doc with a fully
    unique vocabulary has novelty 1."""
    from pyspark.sql import functions as F

    rows = [
        (1, "alpha beta gamma"),
        (2, "alpha beta gamma"),
        (3, "unique tokens only here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    toks = docs.select("doc_id", F.split("text", " ").alias("toks"))
    bigrams = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "zip_with(slice(toks, 1, size(toks) - 1),"
                " slice(toks, 2, size(toks) - 1),"
                " (a, b) -> concat(a, ' ', b))"
            )
        ).alias("bg"),
    )
    corpus = bigrams.groupBy("bg").agg(F.count("*").alias("cnt"))
    per = (
        bigrams.join(corpus, "bg")
        .groupBy("doc_id")
        .agg(
            (
                F.sum((F.col("cnt") == 1).cast("long"))
                / F.count("*")
            ).alias("nov")
        )
    )
    got = {r["doc_id"]: r["nov"] for r in per.collect()}
    assert got[1] == 0.0 and got[2] == 0.0
    assert got[3] == 1.0


def test_icc_extremes(spark):
    """Identical values within each user but different across users
    -> ICC ~ 1; values identical across everyone -> ICC undefined
    (MSB = MSW = 0) -> guarded NULL in the query's arithmetic (here:
    checked the near-1 case and a shuffled near-0 case)."""
    from pyspark.sql import functions as F

    # 3 users x 4 obs, within-user constant -> ICC = 1
    rows = [(u, u * 100) for u in (1, 2, 3) for _ in range(4)]
    df = spark.createDataFrame(rows, "user_id long, c long")
    g = df.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("ss"),
    )
    gm = g.agg(
        F.sum("n").alias("tn"),
        F.sum("s").alias("ts"),
        F.count("*").alias("k"),
        F.sum(F.col("n") * F.col("n")).alias("snn"),
    )
    j = g.crossJoin(F.broadcast(gm))
    mg = F.col("s").cast("double") / F.col("n")
    gmn = F.col("ts").cast("double") / F.col("tn")
    one = j.groupBy("tn", "k", "snn").agg(
        F.sum(F.col("n") * (mg - gmn) * (mg - gmn)).alias("ssb"),
        F.sum(
            F.col("n")
            * (F.col("ss").cast("double") / F.col("n") - mg * mg)
        ).alias("ssw"),
    )
    r = one.collect()[0]
    tn, k = float(r["tn"]), float(r["k"])
    msb = r["ssb"] / (k - 1)
    msw = r["ssw"] / (tn - k)
    n0 = (tn - r["snn"] / tn) / (k - 1)
    icc = (msb - msw) / (msb + (n0 - 1) * msw)
    assert abs(icc - 1.0) < 1e-12


def test_balanced_sample_equalizes_classes(spark):
    """After the hash-rank cut every class holds exactly the min
    count, and the picked set is deterministic across reruns."""
    from pyspark.sql import Window, functions as F

    rows = [(i, "a") for i in range(10)] + [(100 + i, "b") for i in range(4)]
    ev = spark.createDataFrame(rows, "event_id long, event_type string")
    m = ev.groupBy("event_type").count().agg(F.min("count").alias("m"))
    keyed = ev.withColumn(
        "h", F.md5(F.concat(F.lit("bal7:"), F.col("event_id")))
    )
    w = Window.partitionBy("event_type").orderBy("h", "event_id")
    pick = (
        keyed.select("event_id", "event_type", F.row_number().over(w).alias("r"))
        .crossJoin(F.broadcast(m))
        .where(F.col("r") <= F.col("m"))
    )
    counts = {
        r["event_type"]: r["count"]
        for r in pick.groupBy("event_type").count().collect()
    }
    assert counts == {"a": 4, "b": 4}
    ids1 = sorted(r["event_id"] for r in pick.collect())
    ids2 = sorted(r["event_id"] for r in pick.collect())
    assert ids1 == ids2


def test_repeat_rate_first_order_excluded(spark):
    """A customer's first order never counts as repeat; later orders
    do — strict inequality against the per-customer min date."""
    from datetime import datetime

    from pyspark.sql import Window, functions as F

    rows = [
        (1, datetime(1995, 1, 1)),
        (1, datetime(1995, 5, 1)),
        (2, datetime(1995, 5, 2)),
    ]
    o = spark.createDataFrame(rows, "cust long, d timestamp")
    w = Window.partitionBy("cust")
    s = o.select(
        (F.col("d") > F.min("d").over(w)).cast("long").alias("rep")
    )
    got = [r["rep"] for r in s.collect()]
    assert sorted(got) == [0, 0, 1]


def test_tukey_identical_groups_not_significant(spark):
    """Two identical distributions give q ~ 0; a shifted pair exceeds
    the 3.858 critical value when the shift dwarfs the within-group
    spread (checked via the closed-form arithmetic)."""
    ns = {"a": 30, "b": 30}
    means = {"a": 100.0, "b": 100.0}
    ssw = 2 * 29 * 25.0  # within variance 25 per group
    msw = ssw / (60 - 2)
    se = math.sqrt(msw / 2.0 * (1 / 30 + 1 / 30))
    q0 = abs(means["a"] - means["b"]) / se
    assert q0 < 1e-12
    q1 = abs(100.0 - 120.0) / se
    assert q1 > 3.858


def test_abc_migration_shares_sum_to_one(spark):
    """Per-origin migration shares always sum to 1 over destinations
    (window arithmetic sanity on a toy matrix)."""
    from pyspark.sql import Window, functions as F

    rows = [
        ("A", "A", 8), ("A", "B", 1), ("A", "C", 1),
        ("B", "B", 5), ("B", "C", 5),
        ("C", "C", 10),
    ]
    m = spark.createDataFrame(rows, "f string, t string, n long")
    w = Window.partitionBy("f")
    shares = m.select(
        "f", (F.col("n") / F.sum("n").over(w)).alias("s")
    ).groupBy("f").agg(F.sum("s").alias("tot"))
    for r in shares.collect():
        assert abs(r["tot"] - 1.0) < 1e-12


def test_coverage_curve_monotone(spark):
    """Coverage is nondecreasing in k and bounded by 1 (Zipf toy)."""
    from pyspark.sql import Window, functions as F

    counts = [("the", 50), ("a", 25), ("of", 10), ("x", 5), ("y", 5),
              ("z", 5)]
    c = spark.createDataFrame(counts, "tok string, cnt long")
    w = (
        Window.partitionBy(F.lit(1))
        .orderBy(F.col("cnt").desc(), "tok")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wr = Window.partitionBy(F.lit(1)).orderBy(F.col("cnt").desc(), "tok")
    r = c.select(
        F.row_number().over(wr).alias("rk"),
        F.sum("cnt").over(w).alias("cum"),
    ).collect()
    cums = {x["rk"]: x["cum"] for x in r}
    assert cums[1] == 50 and cums[2] == 75 and cums[6] == 100
    assert all(cums[i] <= cums[i + 1] for i in range(1, 6))


def test_churn_rate_hand_case(spark):
    """Customers: c1 active q0,q1; c2 active q0 only; c3 active q1
    only. Last observed quarter (q1) is censored -> only q0 reports:
    active 2, churned 1 (c2)."""
    from pyspark.sql import Window, functions as F

    rows = [(1, 0), (1, 1), (2, 0), (3, 1)]
    pres = spark.createDataFrame(rows, "cust long, qi long")
    w = Window.partitionBy("cust").orderBy("qi")
    f = pres.select(
        "qi",
        (
            F.coalesce(F.lead("qi").over(w), F.lit(-1)) != F.col("qi") + 1
        ).cast("long").alias("ch"),
    )
    mq = pres.agg(F.max("qi").alias("m"))
    g = (
        f.crossJoin(F.broadcast(mq))
        .where(F.col("qi") < F.col("m"))
        .groupBy("qi")
        .agg(F.count("*").alias("na"), F.sum("ch").alias("nc"))
        .collect()
    )
    assert len(g) == 1
    assert g[0]["na"] == 2 and g[0]["nc"] == 1
