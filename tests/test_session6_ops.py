"""Sixth-session operators: HLL sketch, weighted SSSP, grid-blocked
geo radius join, RRF hybrid fusion."""

from __future__ import annotations

from pyspark.sql import functions as F


# ---------------------------------------------------------------- HLL


def test_hll_merge_law(spark):
    """Sketching two disjoint shards and union+max-merging the register
    tables must equal sketching the whole corpus — the property that
    makes the explicit register table worth keeping over
    approx_count_distinct's opaque state."""
    from vanus_spark.operators.hll import hll_estimate, hll_registers

    df = spark.range(0, 5000).select(
        F.lit("g").alias("g"), (F.col("id") % 1700).alias("v")
    )
    whole = hll_registers(df, "v", ["g"])
    a = hll_registers(df.where(F.col("id") < 2500), "v", ["g"])
    b = hll_registers(df.where(F.col("id") >= 2500), "v", ["g"])
    merged = (
        a.unionByName(b).groupBy("g", "reg").agg(F.max("rho").alias("rho"))
    )
    ew = hll_estimate(whole, ["g"]).collect()[0]
    em = hll_estimate(merged, ["g"]).collect()[0]
    assert ew["hll_est"] == em["hll_est"]
    assert ew["n_regs"] == em["n_regs"]


def test_hll_accuracy_and_bounded_registers(spark):
    """m=256 keeps the standard error small; the register table is
    bounded by m rows per group however large the input."""
    from vanus_spark.operators.hll import HLL_M, hll_estimate, hll_registers

    df = spark.range(0, 20000).select(
        (F.col("id") % 2).cast("string").alias("g"),
        (F.col("id") % 3000).alias("v"),
    )
    regs = hll_registers(df, "v", ["g"])
    assert regs.count() <= 2 * HLL_M
    for row in hll_estimate(regs, ["g"]).collect():
        # both groups see 1500 distinct values
        assert abs(row["hll_est"] - 1500) / 1500 < 0.4


# --------------------------------------------------------------- SSSP


def test_sssp_exact_small_graph(spark):
    """Known 5-node weighted graph: path 0->1->2 (cost 3) beats the
    direct 0->2 edge (cost 10); node 4 is unreachable and absent."""
    from vanus_spark.llm.graphs import sssp

    edges = spark.createDataFrame(
        [(0, 1, 1), (1, 2, 2), (0, 2, 10), (2, 3, 1)],
        "src long, dst long, w long",
    )
    sources = spark.createDataFrame([(0, 0)], "node long, dist long")
    got = {r["node"]: r["dist"] for r in sssp(edges, sources, rounds=4).collect()}
    assert got == {0: 0, 1: 1, 2: 3, 3: 4}


def test_sssp_hop_bound(spark):
    """rounds bounds the explored hop radius: with 1 round the 2-hop
    improvement over the direct edge is not yet visible."""
    from vanus_spark.llm.graphs import sssp

    edges = spark.createDataFrame(
        [(0, 1, 1), (1, 2, 2), (0, 2, 10)], "src long, dst long, w long"
    )
    sources = spark.createDataFrame([(0, 0)], "node long, dist long")
    got = {r["node"]: r["dist"] for r in sssp(edges, sources, rounds=1).collect()}
    assert got == {0: 0, 1: 1, 2: 10}


# ---------------------------------------------------------------- geo


def _coords(spark, sf_dir):
    from vanus_spark.llm.dedup import md5_long
    from vanus_spark.sources.tables import load_table

    def coord(col, seed, span, offset):
        return (md5_long(col, seed) % span).cast("double") / 1000000.0 - offset

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        coord(F.col("c_custkey"), 1, 120000000, 60.0).alias("lat"),
        coord(F.col("c_custkey"), 2, 360000000, 180.0).alias("lon"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        coord(F.col("s_suppkey"), 3, 120000000, 60.0).alias("lat2"),
        coord(F.col("s_suppkey"), 4, 360000000, 180.0).alias("lon2"),
    )
    return cust, supp


def test_geo_blocking_equals_cross_join(spark, sf_dir):
    """The grid-blocked equi-join must find exactly the pairs the
    naive cross join finds — blocking is a pure optimization."""
    from vanus_spark.operators.geo import haversine_km, radius_join

    cust, supp = _coords(spark, sf_dir)
    blocked = {
        (r["c_custkey"], r["s_suppkey"])
        for r in radius_join(
            cust, supp, 250.0, ("lat", "lon"), ("lat2", "lon2")
        ).collect()
    }
    dist = haversine_km(
        F.col("lat"), F.col("lon"), F.col("lat2"), F.col("lon2")
    )
    naive = {
        (r["c_custkey"], r["s_suppkey"])
        for r in cust.crossJoin(supp)
        .where(dist <= 250.0)
        .collect()
    }
    assert blocked == naive and len(naive) > 0


def test_geo_threshold_margin(spark, sf_dir):
    """No cross pair's distance sits near the 250 km threshold (or a
    1e-6 rounding boundary of the reported distance), so cross-libm
    sin/cos ulp drift cannot flip oracle membership — the
    semantic-dedup margin-guard precedent."""
    from vanus_spark.operators.geo import haversine_km

    cust, supp = _coords(spark, sf_dir)
    dist = haversine_km(
        F.col("lat"), F.col("lon"), F.col("lat2"), F.col("lon2")
    )
    margin = (
        cust.crossJoin(supp)
        .select(F.abs(dist - 250.0).alias("m"))
        .agg(F.min("m"))
        .collect()[0][0]
    )
    assert margin > 1e-6


def test_geo_plan_is_equi_join(spark, sf_dir):
    """The radius join must compile to a hash equi-join on the grid
    cells — never a cartesian/broadcast-nested-loop over the inputs."""
    from vanus_spark.operators.geo import radius_join

    cust, supp = _coords(spark, sf_dir)
    plan = (
        radius_join(cust, supp, 250.0, ("lat", "lon"), ("lat2", "lon2"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------- RRF


def test_rrf_fusion_semantics(spark):
    """A doc ranked mid-list by BOTH rankers outranks a doc that tops
    only one list; ties between single-list docs at equal rank break
    by id."""
    from vanus_spark.llm.search import rrf_fuse

    bm = spark.createDataFrame(
        [(1, 10, 1), (1, 20, 2), (1, 30, 3)],
        "query_id long, doc_id long, rank int",
    )
    ann = spark.createDataFrame(
        [(1, 20, 1), (1, 40, 2), (1, 30, 3)],
        "query_id long, doc_id long, rank int",
    )
    rows = rrf_fuse([bm, ann], k=10).orderBy("rank").collect()
    order = [r["doc_id"] for r in rows]
    # doc 20: 1/62 + 1/61 wins over doc 10 (1/61 alone)
    assert order[0] == 20
    # doc 30 appears in both lists at rank 3: 2/63 > 1/61
    assert order[1] == 30
    by_id = {r["doc_id"]: r for r in rows}
    assert by_id[20]["n_lists"] == 2 and by_id[10]["n_lists"] == 1
    # single-list docs at the same rank tie exactly -> id order
    assert order.index(10) < order.index(40) or by_id[10]["rrf"] != by_id[40]["rrf"]


# ------------------------------------------------------------- qsketch


def test_qsketch_merge_law(spark):
    """Summing two shard sketches equals sketching the whole input."""
    from vanus_spark.operators.qsketch import histogram_sketch

    df = spark.range(0, 4000).select(
        F.lit("g").alias("g"), (F.col("id") % 997).cast("double").alias("v")
    )
    whole = histogram_sketch(df, "v", ["g"], 0.0, 1024.0, 128)
    a = histogram_sketch(df.where(F.col("id") < 2000), "v", ["g"], 0.0, 1024.0, 128)
    b = histogram_sketch(df.where(F.col("id") >= 2000), "v", ["g"], 0.0, 1024.0, 128)
    merged = a.unionByName(b).groupBy("g", "bin").agg(F.sum("cnt").alias("cnt"))
    w = {(r["bin"]): r["cnt"] for r in whole.collect()}
    m = {(r["bin"]): r["cnt"] for r in merged.collect()}
    assert w == m


def test_qsketch_clamps_out_of_range(spark):
    from vanus_spark.operators.qsketch import histogram_sketch

    df = spark.createDataFrame(
        [("g", -5.0), ("g", 9999.0), ("g", 1.0)], "g string, v double"
    )
    bins = {r["bin"]: r["cnt"] for r in
            histogram_sketch(df, "v", ["g"], 0.0, 100.0, 10).collect()}
    assert bins == {0: 2, 9: 1}  # -5 and 1.0 land in bin 0; 9999 clamps to 9


def test_qsketch_error_bounded_by_bin_width(spark):
    """Estimate minus exact type-1 quantile is within one bin width."""
    from vanus_spark.operators.qsketch import histogram_sketch, sketch_quantiles

    df = spark.range(0, 5000).select(
        F.lit("g").alias("g"),
        ((F.col("id") * 37) % 500).cast("double").alias("v"),
    )
    sk = histogram_sketch(df, "v", ["g"], 0.0, 512.0, 256)
    est = {
        r["q"]: r["est"]
        for r in sketch_quantiles(
            spark, sk, ["g"], [0.5, 0.9, 0.99], 0.0, 512.0, 256
        ).collect()
    }
    vals = sorted(((i * 37) % 500) for i in range(5000))
    import math

    for q in (0.5, 0.9, 0.99):
        exact = vals[math.ceil(q * 5000) - 1]
        assert 0 <= est[q] - exact <= 2.0 + 1e-9, (q, est[q], exact)


# ------------------------------------------------------------- skyline


def test_skyline_known_points(spark):
    """(3,1) and (1,3) and (2,2) are mutually non-dominating; (1,1)
    and (2,1) are dominated; duplicate skyline points both survive."""
    from vanus_spark.operators.skyline import skyline_2d

    df = spark.createDataFrame(
        [("a", 3, 1), ("b", 1, 3), ("c", 2, 2), ("d", 1, 1), ("e", 2, 1),
         ("f", 2, 2)],
        "id string, v1 long, v2 long",
    )
    got = {r["id"] for r in skyline_2d(df, "v1", "v2").collect()}
    assert got == {"a", "b", "c", "f"}


def test_skyline_matches_quadratic_truth(spark):
    """Two-phase prune equals the brute-force dominance filter on a
    pseudo-random point set that exercises ties in both dimensions."""
    from vanus_spark.operators.skyline import skyline_2d

    pts = [(i, (i * 37) % 101, (i * 59) % 103) for i in range(400)]
    df = spark.createDataFrame(pts, "id long, v1 long, v2 long")
    got = {r["id"] for r in skyline_2d(df, "v1", "v2", buckets=8).collect()}
    truth = {
        i
        for (i, a1, a2) in pts
        if not any(
            b1 >= a1 and b2 >= a2 and (b1 > a1 or b2 > a2)
            for (_, b1, b2) in pts
        )
    }
    assert got == truth and len(truth) > 2


# ----------------------------------------------------------------- KMV


def test_kmv_sketch_is_exact_k_smallest(spark):
    """The two-phase build must equal the brute-force k smallest
    distinct hashes — the property that lets a SQL oracle restate it."""
    from vanus_spark.llm.dedup import md5_long
    from vanus_spark.operators.kmv import kmv_sketch

    df = spark.range(0, 3000).select(
        (F.col("id") % 3).cast("string").alias("grp"),
        (F.col("id") % 700).alias("v"),
    )
    got = {
        (r["g"], r["h"])
        for r in kmv_sketch(df, "v", "grp", k=32).collect()
    }
    brute = (
        df.select(F.col("grp").alias("g"), md5_long(F.col("v")).alias("h"))
        .distinct()
        .collect()
    )
    import collections

    by_g = collections.defaultdict(set)
    for r in brute:
        by_g[r["g"]].add(r["h"])
    truth = {
        (g, h) for g, hs in by_g.items() for h in sorted(hs)[:32]
    }
    assert got == truth


def test_kmv_distinct_estimate(spark):
    """Full sketch estimates within ~2/sqrt(k); under-full sketch is
    exact."""
    from vanus_spark.operators.kmv import kmv_distinct_estimate, kmv_sketch

    df = spark.range(0, 10000).select(
        F.when(F.col("id") < 9000, "big").otherwise("small").alias("grp"),
        F.when(F.col("id") < 9000, F.col("id") % 2000)
        .otherwise(F.col("id") % 10)
        .alias("v"),
    )
    sk = kmv_sketch(df, "v", "grp", k=64)
    est = {r["g"]: r for r in kmv_distinct_estimate(sk, k=64).collect()}
    assert est["small"]["n_sketch"] == 10
    assert est["small"]["distinct_est"] == 10.0
    assert abs(est["big"]["distinct_est"] - 2000) / 2000 < 0.5


def test_kmv_jaccard_identical_and_disjoint(spark):
    """Identical sets estimate J = 1; disjoint sets J = 0."""
    from vanus_spark.operators.kmv import kmv_jaccard_pairs, kmv_sketch

    rows = (
        [("a", i) for i in range(200)]
        + [("b", i) for i in range(200)]
        + [("c", i) for i in range(1000, 1200)]
    )
    df = spark.createDataFrame(rows, "grp string, v long")
    sk = kmv_sketch(df, "v", "grp", k=32)
    j = {
        (r["g_a"], r["g_b"]): r["j_est"]
        for r in kmv_jaccard_pairs(sk, k=32).collect()
    }
    assert j[("a", "b")] == 1.0
    assert j[("a", "c")] == 0.0 and j[("b", "c")] == 0.0
