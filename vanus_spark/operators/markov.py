"""First-order Markov (removal-effect) attribution.

Reference parity: the reference event engine has no attribution
surface (SURVEY §2.6-2.8 absences); this completes the Spark port's
attribution family — q_events_attribution (last-touch),
q_attribution_linear, q_attribution_time_decay are all HEURISTIC
position rules, while the Markov removal effect (Anderl et al. 2014,
the model behind most data-driven attribution products) measures each
channel's causal share: how much conversion probability the chain
loses if the channel is deleted.

Scale shape — the split every at-scale Markov attribution takes:

- ``journey_edges`` is the distributed part: per-user ordered paths
  (one window partitioned by user — parallel across users), cut at
  the first conversion, emitting (src, dst) transition counts via one
  map-side-combined groupBy. The raw events are touched exactly once.
- ``removal_effect`` is the driver part: the transition matrix is
  BOUNDED by the channel alphabet (here 4 channels + start/conv/null
  = at most ~50 cells), so the absorption fixed point runs as plain
  Python over collected counts — the same bounded-collect contract as
  the k-means / PCA model loops. K Jacobi sweeps in a FIXED term
  order (alphabetical dst, conv last, left-associated) so the DuckDB
  oracle's recursive CTE replays the identical IEEE walk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

START, CONV, NULL = "start", "conv", "null"


def journey_edges(
    events: DataFrame,
    user_col: str = "user_id",
    state_col: str = "event_type",
    order_cols: tuple[str, str] = ("ts", "event_id"),
    conv_state: str = "purchase",
) -> DataFrame:
    """(src, dst, cnt) first-order transition counts over per-user
    journeys: start -> first touch, touch -> touch, last touch ->
    conv (user converted: path is everything strictly before the
    FIRST conversion event) or -> null (user never converted). A user
    whose very first event converts contributes the single edge
    start -> conv."""
    w = Window.partitionBy(user_col).orderBy(*order_cols)
    ranked = events.select(
        user_col, F.col(state_col).alias("_state"), *order_cols
    ).withColumn("_rn", F.row_number().over(w))
    first_conv = (
        ranked.where(F.col("_state") == conv_state)
        .groupBy(user_col)
        .agg(F.min("_rn").alias("_fp"))
    )
    tagged = ranked.join(first_conv, user_col, "left")
    path = tagged.where(
        F.col("_fp").isNull() | (F.col("_rn") < F.col("_fp"))
    )
    w_path = Window.partitionBy(user_col).orderBy("_rn")
    end_state = F.when(F.col("_fp").isNotNull(), F.lit(CONV)).otherwise(
        F.lit(NULL)
    )
    chain = path.select(
        user_col,
        "_rn",
        "_fp",
        F.col("_state").alias("src"),
        F.coalesce(F.lead("_state").over(w_path), end_state).alias("dst"),
        F.row_number().over(w_path).alias("_prn"),
    )
    starts = chain.where(F.col("_prn") == 1).select(
        F.lit(START).alias("src"), F.col("src").alias("dst")
    )
    # users whose first event converts: empty path, start -> conv
    empty = (
        tagged.where((F.col("_rn") == 1) & (F.col("_fp") == 1))
        .select(
            F.lit(START).alias("src"), F.lit(CONV).alias("dst")
        )
    )
    edges = chain.select("src", "dst").unionByName(starts).unionByName(
        empty
    )
    return edges.groupBy("src", "dst").agg(F.count("*").alias("cnt"))


def removal_effect(
    edge_counts: list[tuple[str, str, int]],
    channels: list[str],
    iters: int = 50,
) -> list[dict]:
    """Driver-side absorption math on the bounded transition matrix.

    Returns one dict per channel with the full-chain conversion
    probability, the probability with the channel removed (all flow
    into it dies — equivalent to pinning u(channel) = 0), the removal
    effect (full - removed) / full, and the normalized attribution
    share. Term order is FROZEN (sorted channels, then conv,
    left-associated) — the oracle's recursive CTE uses the same text
    order, so both engines produce bit-identical doubles."""
    chans = sorted(channels)
    cnt: dict[str, dict[str, int]] = {}
    for src, dst, c in edge_counts:
        cnt.setdefault(src, {})[dst] = c
    p: dict[str, dict[str, float]] = {}
    for src, outs in cnt.items():
        tot = sum(outs.values())
        p[src] = {d: c / tot for d, c in outs.items()}

    def pr(s: str, d: str) -> float:
        return p.get(s, {}).get(d, 0.0)

    def converge(removed: str | None) -> float:
        u = {c: 0.0 for c in chans}
        for _ in range(iters):
            nu = {}
            for s in chans:
                if s == removed:
                    nu[s] = 0.0
                    continue
                acc = 0.0
                for d in chans:
                    acc = acc + pr(s, d) * (
                        0.0 if d == removed else u[d]
                    )
                acc = acc + pr(s, CONV) * 1.0
                nu[s] = acc
            u = nu
        acc = 0.0
        for d in chans:
            acc = acc + pr(START, d) * (0.0 if d == removed else u[d])
        return acc + pr(START, CONV) * 1.0

    pc_full = converge(None)
    pcs = {c: converge(c) for c in chans}
    # degenerate chains (nothing converts, or removals change nothing)
    # report zero effect/attribution instead of 0/0
    res = {
        c: ((pc_full - pcs[c]) / pc_full if pc_full > 0.0 else 0.0)
        for c in chans
    }
    re_tot = 0.0
    for c in chans:
        re_tot = re_tot + res[c]
    return [
        {
            "channel": c,
            "p_conv_full": pc_full,
            "p_conv_removed": pcs[c],
            "removal_effect": res[c],
            "attribution": res[c] / re_tot if re_tot > 0.0 else 0.0,
        }
        for c in chans
    ]


def stationary_distribution(
    counts: list[tuple[str, str, int]],
    states: list[str],
    iters: int = 50,
    with_residual: bool = False,
):
    """Stationary distribution of the first-order transition chain by
    power iteration from the uniform start, in FROZEN IEEE order (pi
    components updated with a left-associated ascending-i sum; the
    oracle's recursive CTE unrolls the identical 25 expressions), so
    both engines land on bit-identical doubles after ``iters`` sweeps.

    Driver-side by design: the matrix is BOUNDED by the state
    alphabet (the journey_edges / removal_effect contract) — the
    distributed work is the one edge-count aggregate that feeds
    ``counts``. Every state must have at least one outgoing
    transition (true for any chain built from consecutive-event
    bigrams, where only the final event of a user lacks a successor
    but its type appears elsewhere).

    ASSUMES APERIODICITY in addition to the irreducibility check
    below: on a periodic chain (e.g. a 2-cycle) the fixed 50 power
    sweeps oscillate and never converge — both engines still
    hash-match (they replay the identical 50 sweeps) but the returned
    vector is the sweep-50 iterate, not the stationary distribution.
    Event-bigram chains are aperiodic in practice (self-loops exist
    whenever any event type repeats consecutively). To make the
    failure OBSERVABLE rather than silent, pass
    ``with_residual=True``: the return becomes
    ``(pairs, residual)`` where ``residual = max_j |pi50_j - pi49_j|``
    (the final-sweep movement, 0.0 at convergence, ~O(1) on a
    periodic chain). The max folds over ascending j from 0.0 —
    identical to the oracle twin's ``greatest(abs(...), ...)`` on the
    same bit-identical iterates."""
    n = len(states)
    idx = {s: i for i, s in enumerate(states)}
    c = [[0] * n for _ in range(n)]
    for src, dst, cnt in counts:
        if src in idx and dst in idx:
            c[idx[src]][idx[dst]] += cnt
    p = []
    for i in range(n):
        rs = 0
        for j in range(n):
            rs += c[i][j]
        if rs == 0:
            raise ValueError(
                f"state {states[i]!r} has no outgoing transitions; "
                "the chain is not irreducible"
            )
        p.append([float(c[i][j]) / float(rs) for j in range(n)])
    pi = [1.0 / n] * n
    residual = 0.0
    for _ in range(iters):
        new = []
        for j in range(n):
            s = 0.0
            for i in range(n):
                s = s + pi[i] * p[i][j]
            new.append(s)
        residual = 0.0
        for j in range(n):
            d = abs(new[j] - pi[j])
            if d > residual:
                residual = d
        pi = new
    pairs = list(zip(states, pi))
    if with_residual:
        return pairs, residual
    return pairs
