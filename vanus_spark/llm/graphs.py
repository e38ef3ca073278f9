"""Link-graph operators for crawl-derived corpora.

Crawl pipelines rank pages/domains to prioritize the frontier and to
weight training mixtures (Common Crawl publishes harmonic-centrality
and PageRank-style rankings for exactly this). ``pagerank`` is the
power-iteration form in pure DataFrame ops: each iteration is one
join (ranks to out-edges) + one partial-agg groupBy(dst) — O(iters)
shuffles over the edge table, never an adjacency matrix.

At 100 TB: edges live partitioned by src; ranks is a (node, rank)
table co-partitioned by node, so each iteration's join is
shuffle-on-one-side; for many iterations checkpoint ``ranks`` every
few rounds (the ``checkpoint_every`` knob) to cut lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 3,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 8,
) -> DataFrame:
    """(node, rank) after ``iters`` power iterations.

    rank_{k+1}(n) = (1-d)/N + d * sum_{e: e.dst=n} rank_k(e.src)/deg(e.src)

    Simple-teleport variant (dangling mass not redistributed) — the
    form an engine-exact SQL oracle can mirror. The teleport constant
    is computed driver-side ((1-d)/N, one float division) so every
    engine folds the identical double. N (#nodes) is the only
    driver-side scalar."""
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_total = nodes.count()
    teleport = round(1.0 - damping, 12) / float(n_total)
    out_deg = edges.groupBy(src).agg(F.count("*").alias("deg"))
    ranks = nodes.withColumn("rank", F.lit(1.0 / float(n_total)))
    for k in range(iters):
        contribs = (
            edges.join(ranks, edges[src] == ranks["node"])
            .join(out_deg, src)
            .select(
                F.col(dst).alias("node"),
                (F.col("rank") / F.col("deg")).alias("c"),
            )
        )
        agg = contribs.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = nodes.join(agg, "node", "left").select(
            "node",
            (
                F.lit(teleport)
                + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
            ).alias("rank"),
        )
        if (k + 1) % checkpoint_every == 0 and k + 1 < iters:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
