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


def label_propagation(
    edges: DataFrame,
    iters: int = 3,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 8,
) -> DataFrame:
    """(node, community) after ``iters`` synchronous min-label
    propagation rounds over the UNDIRECTED closure of ``edges``.

    label_{k+1}(n) = min(label_k(n), min_{m in N(n)} label_k(m)),
    seeded with label_0(n) = n. Deterministic (min is order-free), so
    an engine-exact SQL oracle can unroll the same k rounds as chained
    CTEs. For components this converges in O(diameter) rounds; the
    fixed-``iters`` form is the community/"sparsify the frontier"
    variant crawl pipelines use to group mutually-linked hosts
    (reference semantics: vanus has no graph layer; this mirrors the
    GraphX/Pregel LPA shape re-expressed as DataFrame joins).

    At 100 TB: one join + one partial-agg shuffle per round over the
    symmetrized edge table — never an adjacency matrix; labels are a
    (node, long) table co-partitioned with the edge src."""
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    nodes = und.select(F.col("a").alias("node")).distinct()
    labels = nodes.withColumn("community", F.col("node").cast("long"))
    for k in range(iters):
        neigh = (
            und.join(labels, und["b"] == labels["node"])
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("community").alias("nmin"))
        )
        labels = (
            labels.join(neigh, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("community"),
                    F.coalesce(F.col("nmin"), F.col("community")),
                ).alias("community"),
            )
        )
        if (k + 1) % checkpoint_every == 0 and k + 1 < iters:
            labels = labels.localCheckpoint(eager=True)
    return labels


def sssp(
    edges: DataFrame,
    sources: DataFrame,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    node: str = "node",
) -> DataFrame:
    """(node, dist): weighted single-source (multi-source) shortest
    paths after ``rounds`` Bellman-Ford relaxations — hop-bounded, the
    distributed form (GraphX/Pregel's SSSP without the framework).

    Per round: ONE join of the current distance table to the edge
    table + ONE partial-aggregated min per dst, then a min-merge with
    the standing distances. Integer weights relax exactly (no float
    accumulation drift), so a SQL oracle can unroll the same rounds
    as CTEs. The distance table is checkpointed per round to keep the
    lineage linear in rounds, not exponential.

    At 100 TB: edges partition by ``src`` and the distance table by
    ``node``, so the relax join shuffles only the (shrinking) set of
    improved distances; ``rounds`` bounds the hop radius explored —
    callers iterate to a fixed point by comparing successive counts
    (the same vote-to-halt contract as ``pagerank``)."""
    dist = sources.select(F.col(node), F.col("dist")).localCheckpoint(
        eager=True
    )
    for _ in range(rounds):
        relaxed = (
            edges.join(dist, edges[src] == dist[node])
            .select(
                F.col(dst).alias(node),
                (F.col("dist") + F.col(weight)).alias("dist"),
            )
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy(node)
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
    return dist


def kcore(
    edges: DataFrame,
    k: int,
    max_rounds: int = 50,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(node,) — the k-core of the undirected graph: the maximal
    subgraph in which every node has degree >= k, computed by
    iterative peeling (remove all nodes of degree < k, recompute
    degrees on the surviving subgraph, repeat to a fixed point).

    Community/spam analysis on crawl graphs uses the core number as a
    robustness signal (link farms collapse at low k; genuine hub
    neighborhoods survive). Peeling is the textbook distributed form:
    each round is ONE degree aggregate over the surviving edge table +
    ONE semi-join to drop edges touching peeled nodes — no adjacency
    matrix, no per-node messaging framework.

    The fixed point is unique (the k-core is well-defined), so extra
    rounds after convergence are no-ops — an unrolled-SQL oracle with
    >= the convergence round count restates the result exactly; all
    arithmetic is integer. Raises if ``max_rounds`` is hit while still
    shrinking (same vote-to-halt contract as duplicate_components).

    At 100 TB: the edge table shrinks monotonically; each round's
    degree aggregate is map-side combined on the src partitioning, and
    the survivor filter is a broadcast-able semi-join once the peel
    set is small. Rounds needed = peeling depth (typically tens even
    on billion-edge graphs). localCheckpoint keeps lineage linear in
    rounds."""
    und = edges.select(src, dst).unionByName(
        edges.select(F.col(dst).alias(src), F.col(src).alias(dst))
    )
    # simple-graph degrees: a pair present in both directions (or a
    # duplicate input edge) must count once, so dedupe after
    # symmetrizing — one up-front shuffle, amortized over every round.
    live = und.distinct().localCheckpoint(eager=True)
    n_prev = live.count()
    for _ in range(max_rounds):
        deg = live.groupBy(src).agg(F.count("*").alias("deg"))
        keep = deg.where(F.col("deg") >= k).select(src)
        live = (
            live.join(keep, src, "left_semi")
            .join(keep.select(F.col(src).alias(dst)), dst, "left_semi")
            .localCheckpoint(eager=True)
        )
        n = live.count()
        if n == n_prev:
            return live.select(F.col(src).alias("node")).distinct()
        n_prev = n
    raise RuntimeError(f"kcore did not converge within {max_rounds} rounds")


def clustering_coefficient(edges: DataFrame) -> DataFrame:
    """Per-node local clustering coefficient over an undirected simple
    graph given as canonical edges (a < b, distinct): coeff =
    2*triangles(v) / (deg(v) * (deg(v) - 1)), 0.0 for degree < 2.

    Shape: degree is one groupBy over the exploded endpoints; the
    triangle enumeration is the standard two-join a<b<c wedge close
    (each triangle materializes ONCE, then fans out to its three
    vertices), shuffling on the shared vertex — AQE's skew split
    covers hub vertices, and the a<b<c ordering keeps the join
    frontier a strict fraction of the edge set. Counts stay integers;
    the coefficient is one engine-exact double division, rounded
    after.

    Returns (node, degree, triangles, clustering_coeff).
    """
    e = edges.select(F.col("a").cast("long").alias("a"), F.col("b").cast("long").alias("b"))
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("degree"))
    )
    e1 = e.select(F.col("a"), F.col("b"))
    e2 = e.select(F.col("a").alias("b"), F.col("b").alias("c"))
    e3 = e.select(F.col("a").alias("ta"), F.col("b").alias("c2"))
    tri = (
        e1.join(e2, "b")
        .join(e3, (F.col("a") == F.col("ta")) & (F.col("c") == F.col("c2")))
        .select("a", "b", "c")
    )
    per_node = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("triangles"))
    )
    joined = deg.join(per_node, "node", "left").select(
        "node",
        "degree",
        F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles"),
    )
    coeff = F.when(
        F.col("degree") >= 2,
        F.round(
            (2 * F.col("triangles"))
            / (F.col("degree") * (F.col("degree") - 1)).cast("double"),
            6,
        ),
    ).otherwise(F.lit(0.0))
    return joined.withColumn("clustering_coeff", coeff)


def personalized_pagerank(
    edges: DataFrame,
    seed_nodes: list[int],
    alpha: float = 0.15,
    iters: int = 3,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 8,
) -> DataFrame:
    """Personalized PageRank: teleport mass returns to the SEED set
    instead of spreading uniformly, so ranks measure proximity to the
    seeds — the similar-documents / related-entities primitive on the
    same crawl graph pagerank scores globally.

    rank_{k+1}(n) = alpha*seed(n) + (1-alpha) * sum_{e: e.dst=n}
    rank_k(e.src)/deg(e.src), with seed(n) = 1/|S| on the seed set and
    0 elsewhere; rank_0 = seed. Same shape as pagerank: one join + one
    partial-agg shuffle per iteration, constants folded driver-side so
    the SQL oracle replays identical doubles; the seed set broadcasts
    as an isin literal (seed sets are query-sized by definition)."""
    if not seed_nodes:
        raise ValueError("seed_nodes must be non-empty")
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    seed_mass = 1.0 / float(len(seed_nodes))
    tele = alpha * seed_mass
    damp = 1.0 - alpha
    out_deg = edges.groupBy(src).agg(F.count("*").alias("deg"))
    is_seed = F.col("node").isin([int(x) for x in seed_nodes])
    ranks = nodes.withColumn(
        "rank", F.when(is_seed, F.lit(seed_mass)).otherwise(F.lit(0.0))
    )
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
                F.when(is_seed, F.lit(tele)).otherwise(F.lit(0.0))
                + F.lit(damp) * F.coalesce(F.col("s"), F.lit(0.0))
            ).alias("rank"),
        )
        if (k + 1) % checkpoint_every == 0 and k + 1 < iters:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def link_prediction_jaccard(und: DataFrame, k: int = 50) -> DataFrame:
    """Neighbor-Jaccard link prediction: for every 2-hop NON-edge pair
    (a < b), score = |N(a) n N(b)| / (deg(a)+deg(b)-common), top-k —
    the classic common-neighbors recommender (missing-citation /
    follow-suggestion shape).

    ``und`` is the undirected edge set as (a, b) with a < b.
    Candidates come from the wedge join (quadratic only in per-node
    degree — cap hub degrees upstream on power-law graphs); existing
    edges drop via one anti-join; the degree table broadcasts; top-k
    is TakeOrderedAndProject on the rounded score with a full (a, b)
    tiebreak, so results are deterministic cross-engine."""
    sym = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = (
        sym.groupBy("a").agg(F.count("*").alias("deg"))
        .withColumnRenamed("a", "node")
    )
    l = sym.select(F.col("a").alias("x"), F.col("b").alias("m"))
    r = sym.select(F.col("a").alias("m"), F.col("b").alias("y"))
    wedges = (
        l.join(r, "m")
        .where(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count("*").alias("common"))
    )
    non_edges = wedges.join(
        und.select(F.col("a").alias("x"), F.col("b").alias("y")),
        ["x", "y"],
        "left_anti",
    )
    da = deg.select(F.col("node").alias("x"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("y"), F.col("deg").alias("deg_b"))
    scored = (
        non_edges.join(F.broadcast(da), "x")
        .join(F.broadcast(db), "y")
        .select(
            F.col("x").alias("a"),
            F.col("y").alias("b"),
            "common",
            F.round(
                F.col("common")
                / (F.col("deg_a") + F.col("deg_b") - F.col("common")).cast(
                    "double"
                ),
                6,
            ).alias("score"),
        )
    )
    return scored.orderBy(F.desc("score"), F.asc("a"), F.asc("b")).limit(k)
