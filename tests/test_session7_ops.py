"""Seventh-session operators: all-pairs TF-IDF cosine join, k-core
peeling, linear interpolation, survivorship / journey / Benford
query-level fixtures."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

# ------------------------------------------------- all-pairs cosine


def _toy_docs(spark):
    return spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"),  # exact dup of 1
            (3, "alpha beta gamma epsilon"),  # near dup of 1/2
            (4, "zeta eta theta iota"),  # disjoint
            (5, "common common common words"),  # shares only df-pruned terms
            (6, "common words here too"),
        ],
        ["doc_id", "text"],
    )


def test_tfidf_cosine_exact_dup_scores_one(spark):
    from vanus_spark.llm.allpairs import tfidf_cosine_pairs

    out = {
        (r["id_l"], r["id_r"]): r["cosine"]
        for r in tfidf_cosine_pairs(
            _toy_docs(spark), threshold=0.0, max_df_ratio=1.0
        ).collect()
    }
    assert abs(out[(1, 2)] - 1.0) < 1e-12  # identical vectors
    assert 0.0 < out[(1, 3)] < 1.0  # overlapping
    assert (1, 4) not in out  # no shared term -> no candidate row


def test_tfidf_cosine_df_pruning_bounds_fanout(spark):
    """A term in > max_df_ratio of docs must not generate candidate
    pairs (the quadratic stop-word blowup the cap exists for): docs 5
    and 6 share only 'common'/'words' and both appear in 2/6 docs; at
    max_df_ratio=0.2 every shared term is pruned and the pair
    disappears entirely."""
    from vanus_spark.llm.allpairs import tfidf_cosine_pairs

    pairs = tfidf_cosine_pairs(
        _toy_docs(spark), threshold=0.0, max_df_ratio=0.2
    )
    got = {(r["id_l"], r["id_r"]) for r in pairs.collect()}
    assert (5, 6) not in got


def test_tfidf_unit_vectors_are_unit(spark):
    from vanus_spark.llm.allpairs import tfidf_unit_vectors

    norms = (
        tfidf_unit_vectors(_toy_docs(spark), max_df_ratio=1.0)
        .groupBy("doc_id")
        .agg(F.sum(F.col("w") * F.col("w")).alias("n2"))
        .collect()
    )
    for r in norms:
        assert abs(r["n2"] - 1.0) < 1e-9


def test_tfidf_cosine_plan_has_no_cartesian(spark):
    from vanus_spark.llm.allpairs import tfidf_cosine_pairs

    plan = (
        tfidf_cosine_pairs(_toy_docs(spark), threshold=0.5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the only nested-loop is the bounded ONE-ROW n_docs stats
    # broadcast (the bm25 pattern); a true cartesian over the postings
    # would appear as CartesianProduct
    assert "CartesianProduct" not in plan


# ------------------------------------------------------------ k-core


def _ring_plus_clique(spark):
    """Ring of 20 (degree 2) + a 6-clique on nodes 100..105."""
    ring = [(i, (i + 1) % 20) for i in range(20)]
    clique = [
        (100 + a, 100 + b) for a in range(6) for b in range(6) if a < b
    ]
    return spark.createDataFrame(ring + clique, ["src", "dst"])


def test_kcore_peels_ring_keeps_clique(spark):
    from vanus_spark.llm.graphs import kcore

    nodes = {
        r["node"] for r in kcore(_ring_plus_clique(spark), k=3).collect()
    }
    assert nodes == {100 + i for i in range(6)}  # 6-clique is a 5-core


def test_kcore_k2_keeps_everything(spark):
    from vanus_spark.llm.graphs import kcore

    assert kcore(_ring_plus_clique(spark), k=2).count() == 26


def test_kcore_duplicate_and_reverse_edges_count_once(spark):
    """Simple-graph degrees: feeding (a,b), (b,a) and a duplicate
    (a,b) again must not inflate degrees past 1."""
    from vanus_spark.llm.graphs import kcore

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 2), (2, 3), (3, 1)], ["src", "dst"]
    )
    # triangle: every node has simple degree 2
    nodes = {r["node"] for r in kcore(edges, k=2).collect()}
    assert nodes == {1, 2, 3}
    assert kcore(edges, k=3).count() == 0


def test_kcore_raises_past_max_rounds(spark):
    """A long chain peels one layer of endpoints per round; with
    max_rounds too small the vote-to-halt contract must raise, never
    return a non-fixed-point."""
    import pytest

    from vanus_spark.llm.graphs import kcore

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], ["src", "dst"]
    )
    with pytest.raises(RuntimeError, match="converge"):
        kcore(chain, k=2, max_rounds=2)


# ------------------------------------------- linear interpolation


def test_interpolate_linear_fills_gap_linearly(spark):
    from vanus_spark.operators.timeseries import interpolate_linear

    df = spark.createDataFrame(
        [
            ("k", "2024-01-01 00:00:00", 10.0),
            ("k", "2024-01-01 04:00:00", 30.0),
        ],
        ["key", "ts_s", "v"],
    ).select("key", F.to_timestamp("ts_s").alias("ts"), "v")
    out = {
        r["bucket"].hour: (r["value_interp"], r["filled"])
        for r in interpolate_linear(df, "ts", "key", "v").collect()
    }
    assert out[0] == (10.0, False)
    assert out[1] == (15.0, True)
    assert out[2] == (20.0, True)
    assert out[3] == (25.0, True)
    assert out[4] == (30.0, False)


def test_interpolate_linear_observed_rows_untouched(spark):
    """Buckets with observations keep the exact aggregate value even
    when neighbors would interpolate to something else."""
    from vanus_spark.operators.timeseries import interpolate_linear

    df = spark.createDataFrame(
        [
            ("k", "2024-01-01 00:00:00", 10.0),
            ("k", "2024-01-01 01:00:00", 99.0),
            ("k", "2024-01-01 02:00:00", 30.0),
        ],
        ["key", "ts_s", "v"],
    ).select("key", F.to_timestamp("ts_s").alias("ts"), "v")
    rows = interpolate_linear(df, "ts", "key", "v").collect()
    assert [r["value_interp"] for r in sorted(rows, key=lambda r: r["bucket"])] == [
        10.0,
        99.0,
        30.0,
    ]


# ------------------------------------------------- query fixtures


def test_golden_record_survivorship(spark, entry_mod, sf_dir):
    """Every entity keeps the master (lowest rec_id) name — which is
    always a BASE record (even rec_id), since typo rec_ids are odd and
    larger — and a non-null balance (typo rows carry NULL)."""
    out = entry_mod.queries()["er_golden_record"](spark, sf_dir)
    rows = out.collect()
    assert all(r["acctbal"] is not None for r in rows)
    multi = [r for r in rows if r["n_members"] > 1]
    assert multi, "fixture must produce real clusters"
    assert all(r["n_members"] <= 4 for r in rows)


def test_benford_report_is_complete_and_consistent(spark, entry_mod, sf_dir):
    out = entry_mod.queries()["quality_benford"](spark, sf_dir).collect()
    assert {r["digit"] for r in out} == set(range(1, 10))
    assert abs(sum(r["obs_freq"] for r in out) - 1.0) < 1e-3
    exp = {d: math.log10(1 + 1 / d) for d in range(1, 10)}
    for r in out:
        assert abs(r["exp_freq"] - exp[r["digit"]]) < 1e-6


def test_top_paths_are_bounded_and_ordered(spark, entry_mod, sf_dir):
    rows = entry_mod.queries()["events_top_paths"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    counts = [r["n_users"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(1 <= len(r["path"].split(">")) <= 5 for r in rows)


# ------------------------------------------------- exact-integer PCA


def test_gram_exact_equals_join_form(spark):
    """The mapInPandas partial-Gram path (scale form) must equal the
    d^2-per-row self-join (reference form) exactly — integer algebra."""
    from vanus_spark.operators.pca import gram_matrix_exact, gram_matrix_join

    rows = [(i, [(i * 7 + j * 3) % 11 - 5 for j in range(8)]) for i in range(40)]
    df = spark.createDataFrame(rows, ["vec_id", "qvec"]).repartition(4)
    fast = gram_matrix_exact(df, dim=8)
    lng = df.select(
        "vec_id", F.posexplode("qvec").alias("d", "q")
    )
    ref = gram_matrix_join(lng)
    assert fast.exceptAll(ref).count() == 0
    assert ref.exceptAll(fast).count() == 0


def test_power_iteration_exact_matches_numpy_int(spark):
    """4 decimal(38,0) matvec rounds from ones must equal exact python
    integer arithmetic (no drift anywhere before the final division)."""
    from vanus_spark.operators.pca import power_iteration_exact

    import numpy as np

    G = [[(i * 5 + j * 3) % 7 + (10 if i == j else 0) for j in range(4)] for i in range(4)]
    gdf = spark.createDataFrame(
        [(i, j, G[i][j]) for i in range(4) for j in range(4)],
        ["i", "j", "g"],
    )
    out = {
        r["dim"]: r["component"]
        for r in power_iteration_exact(spark, gdf, dim=4, iters=4).collect()
    }
    v = [1] * 4
    for _ in range(4):
        v = [sum(G[i][j] * v[j] for j in range(4)) for i in range(4)]
    mx = max(abs(x) for x in v)
    for i in range(4):
        assert abs(out[i] - v[i] / mx) < 1e-15


def test_pca_fixture_recovers_planted_direction(spark, entry_mod):
    """The registered query's output must align with the planted
    direction g_d = (d % 5) - 2 (the eigengap makes 4 iterations
    converge to ~1e-11 residual)."""
    import math

    out = entry_mod.queries()["embedding_pca"](spark, "/root/testdata/sf0.01")
    comp = {r["dim"]: r["component"] for r in out.collect()}
    g = [(d % 5) - 2 for d in range(64)]
    dot = sum(comp[d] * g[d] for d in range(64))
    ng = math.sqrt(sum(x * x for x in g))
    nc = math.sqrt(sum(x * x for x in comp.values()))
    assert abs(dot) / (ng * nc) > 0.99


# ------------------------------------------------- greedy coverage


def test_greedy_max_coverage_picks_best_first(spark):
    from vanus_spark.llm.selection import greedy_max_coverage

    rows = (
        [(1, f"s{i}") for i in range(10)]  # doc 1 covers 10
        + [(2, f"s{i}") for i in range(8)]  # subset of doc 1
        + [(2, "x1"), (2, "x2")]  # +2 unique -> gain 2 after doc 1
        + [(3, "y1"), (3, "y2"), (3, "y3")]  # disjoint 3
    )
    ds = spark.createDataFrame(rows, ["doc_id", "shingle"]).distinct()
    picks = greedy_max_coverage(ds, k=3)
    assert picks == [(1, 1, 10), (2, 3, 3), (3, 2, 2)]


def test_greedy_stops_when_exhausted(spark):
    from vanus_spark.llm.selection import greedy_max_coverage

    ds = spark.createDataFrame([(1, "a"), (2, "a")], ["doc_id", "shingle"])
    picks = greedy_max_coverage(ds, k=5)
    assert picks == [(1, 1, 1)]  # doc 2's gain collapses to 0, loop ends


# ------------------------------------------- exact Jaccard prefix join


def test_jaccard_prefix_join_is_lossless_vs_quadratic(spark):
    """Prefix filtering must find EXACTLY the pairs the quadratic join
    finds — the PPJoin guarantee the oracle also checks at sf0.01."""
    from vanus_spark.llm.allpairs import jaccard_prefix_join
    from vanus_spark.llm.dedup import shingles_df

    rows = [
        (i, f"tok{i} " + "the quick brown fox jumps over the lazy dog word" + f" tail{i % 4}")
        for i in range(30)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["id_a"], r["id_b"])
        for r in jaccard_prefix_join(docs, threshold=0.5).collect()
    }
    sh = shingles_df(docs)
    a, b = sh.alias("a"), sh.alias("b")
    truth = {
        (r["id_a"], r["id_b"])
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            (
                F.size(F.array_intersect("a.sh", "b.sh")).cast("double")
                / F.size(F.array_union("a.sh", "b.sh"))
            ).alias("j"),
        )
        .where(F.col("j") >= 0.5)
        .collect()
    }
    assert truth, "fixture must contain similar pairs"
    assert got == truth


def test_jaccard_prefix_join_prunes_candidates(spark):
    """The prefix candidate set must be strictly smaller than the full
    inverted-index candidate set on a corpus with shared common tokens
    (otherwise the operator is just the naive index join)."""
    from vanus_spark.llm.allpairs import jaccard_prefix_join
    from vanus_spark.llm.dedup import shingles_df

    rows = [
        (i, "common base text shared by every document here " + f"unique{i} bit{i}")
        for i in range(20)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    sh = shingles_df(docs)
    lng = sh.select("doc_id", F.explode("sh").alias("g"))
    full_cand = (
        lng.alias("x")
        .join(lng.alias("y"), F.col("x.g") == F.col("y.g"))
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select("x.doc_id", "y.doc_id")
        .distinct()
        .count()
    )
    # count candidates the operator verifies by running it at a
    # threshold of 0.9: high threshold -> short prefixes -> few pairs
    out = jaccard_prefix_join(docs, threshold=0.9).count()
    assert full_cand == 190  # every pair shares the common base
    assert out == 0  # but none is actually 0.9-similar


# ------------------------------------------------- entropy / forecast


def test_events_entropy_bounds(spark, entry_mod, sf_dir):
    import math

    rows = entry_mod.queries()["events_entropy"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1e-9 <= r["entropy"] <= math.log2(5) + 1e-9  # 5 event types


def test_seasonal_naive_forecast_lags_exactly_12(spark, entry_mod, sf_dir):
    rows = entry_mod.queries()["orders_forecast"](spark, sf_dir).collect()
    assert rows
    by_month = {r["month"]: r for r in rows}
    # recompute one point: forecast(m) must equal actual(m-12 months)
    import datetime

    some = sorted(by_month)[12]
    y, m = map(int, some.split("-"))
    prev = f"{y - 1:04d}-{m:02d}"
    if prev in by_month:
        assert by_month[some]["forecast"] == by_month[prev]["actual"]
    for r in rows:
        assert abs(r["abs_err"] - round(abs(r["actual"] - r["forecast"]), 4)) < 1e-9


# --------------------------------------------- grid clusters / whiten


def test_grid_clusters_merge_adjacent_cells(spark, entry_mod):
    """Cells sharing a cluster id must be connected through core-cell
    adjacency; spot-check structure: every cluster's cells form one
    component under the 8-neighborhood."""
    out = entry_mod.queries()["geo_grid_clusters"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert out
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["cluster"], []).append((r["cx"], r["cy"]))
    multi = {k: v for k, v in by_cluster.items() if len(v) > 1}
    assert multi, "fixture must produce multi-cell clusters"
    for cells in multi.values():
        # BFS within the cluster's own cells proves internal connectivity
        todo, seen = [cells[0]], {cells[0]}
        cs = set(cells)
        while todo:
            x, y = todo.pop()
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    nb = (x + dx, y + dy)
                    if nb in cs and nb not in seen:
                        seen.add(nb)
                        todo.append(nb)
        assert seen == cs


def test_whiten_removes_planted_direction(spark, entry_mod):
    """Residual norms must be dramatically smaller than projections on
    the planted-direction fixture scale: the projection carries the
    dominant variance, so var(proj) >> mean(resid per-dim share)."""
    rows = entry_mod.queries()["embedding_whiten"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert len(rows) == 500
    import statistics

    projs = [r["proj"] for r in rows]
    resid = [r["resid_norm2"] for r in rows]
    assert all(r >= -1e-6 for r in resid)  # residual norm^2 is nonnegative
    # variance captured by the top component exceeds the mean residual
    # variance per remaining dimension by a wide margin
    var_proj = statistics.pvariance(projs)
    mean_resid_per_dim = statistics.mean(resid) / 63
    assert var_proj > 10 * mean_resid_per_dim
