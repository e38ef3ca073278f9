"""Link-graph operators (crawl frontier ranking)."""

from __future__ import annotations


def test_pagerank_hand_computed(spark):
    from vanus_spark.llm.graphs import pagerank

    # 1 -> 2, 2 -> 1, 3 -> 1 : node 1 should dominate
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (3, 1)], "src long, dst long"
    )
    ranks = {r.node: r.rank for r in pagerank(edges, iters=2).collect()}
    # hand-roll 2 iterations: r0 = 1/3 each
    d, n = 0.85, 3
    t = 0.15 / n
    r1 = {1: t + d * (1 / 3 + 1 / 3), 2: t + d * (1 / 3), 3: t}
    r2 = {1: t + d * (r1[2] + r1[3]), 2: t + d * r1[1], 3: t}
    for node in (1, 2, 3):
        assert abs(ranks[node] - r2[node]) < 1e-12
    # node 3 has no in-links: pure teleport mass, strictly smallest
    assert ranks[3] == min(ranks.values())


def test_pagerank_mass_conservation_without_dangling(spark):
    from vanus_spark.llm.graphs import pagerank

    # ring graph: no dangling nodes -> total mass stays 1
    n = 50
    edges = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)], "src long, dst long"
    )
    ranks = pagerank(edges, iters=4).collect()
    total = sum(r.rank for r in ranks)
    assert abs(total - 1.0) < 1e-9
    # ring is symmetric: every node identical
    vals = {round(r.rank, 12) for r in ranks}
    assert len(vals) == 1


def test_label_propagation_two_components(spark):
    from vanus_spark.llm.graphs import label_propagation

    # component A: 1-2-3 chain; component B: 10-11; a self-loop (20,20)
    # contributes no edge (and, having no other edge, no node either)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 20)], "src long, dst long"
    )
    out = {
        r.node: r.community
        for r in label_propagation(edges, iters=3).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_label_propagation_round_semantics_synchronous(spark):
    from vanus_spark.llm.graphs import label_propagation

    # path 1-2-3-4-5: after ONE synchronous round each node only sees
    # direct neighbors (min of self+neighbors), not the transitive min
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "src long, dst long"
    )
    one = {
        r.node: r.community
        for r in label_propagation(edges, iters=1).collect()
    }
    assert one == {1: 1, 2: 1, 3: 2, 4: 3, 5: 4}
    # diameter 4 -> converged by 4 rounds
    four = {
        r.node: r.community
        for r in label_propagation(edges, iters=4).collect()
    }
    assert set(four.values()) == {1}


def test_label_propagation_direction_blind(spark):
    from vanus_spark.llm.graphs import label_propagation

    # min label flows AGAINST edge direction too (undirected closure)
    edges = spark.createDataFrame([(5, 1), (6, 5)], "src long, dst long")
    out = {
        r.node: r.community
        for r in label_propagation(edges, iters=3).collect()
    }
    assert out == {1: 1, 5: 1, 6: 1}
