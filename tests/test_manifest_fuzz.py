"""Randomized two-writer serializability fuzz for ManifestTable.

Two writer handles on one table interleave a seeded random sequence of
merge / delete_keys / compact_files ops WITHOUT refreshing between ops
(each handle's manifest view goes stale whenever the other commits).
The invariant: the final table content equals a plain Python dict
model to which the SUCCESSFUL ops were applied in COMMIT (epoch)
order. ConcurrentWriterError is an acceptable outcome for any op —
the op must then have left the table untouched — but a SILENT wrong
result (e.g. a delete that misses a concurrently-inserted key, the
write-skew this fuzz originally caught in delete_keys) is not.
Time travel is checked against model snapshots recorded per epoch.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from vanus_spark.sources.manifest_table import (
    ConcurrentWriterError,
    ManifestTable,
)

KEYSPACE = 120
N_BUCKETS = 8
N_OPS = 36


def _mk_rows(spark, kv: dict[int, int]):
    return spark.createDataFrame(
        [(k, v) for k, v in sorted(kv.items())], "k long, v long"
    )


def _table_dict(t: ManifestTable) -> dict[int, int]:
    return {r["k"]: r["v"] for r in t.read().collect()}


def test_two_writer_interleaving_is_serializable(spark, tmp_path):
    """Three seeded schedules, run CONCURRENTLY on separate table
    paths: each schedule is inherently sequential (36 committed ops),
    but the seeds are independent, so overlapping them on a thread
    pool cuts the suite's wall from sum to max of the three (~3x)
    with the identical op sequences and assertions."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=3) as pool:
        for _ in pool.map(
            lambda seed: _run_interleaving_seed(spark, tmp_path, seed),
            [11, 23, 47],
        ):
            pass


def _run_interleaving_seed(spark, tmp_path, seed):
    rng = random.Random(seed)
    path = str(tmp_path / f"fuzz_{seed}")
    w1 = ManifestTable(spark, path, "k", n_buckets=N_BUCKETS)
    init = {k: k * 10 for k in range(0, KEYSPACE, 3)}
    w1.write_full(_mk_rows(spark, init))
    w2 = ManifestTable(spark, path, "k", n_buckets=N_BUCKETS)

    model = dict(init)
    snapshots: dict[int, dict[int, int]] = {w1._epoch: dict(model)}
    outcomes = {"ok": 0, "conflict": 0, "merge": 0, "delete": 0, "compact": 0}

    for i in range(N_OPS):
        w = rng.choice((w1, w2))
        # occasionally act like a well-behaved client and refresh; the
        # interesting schedules are the stale ones
        if rng.random() < 0.25:
            w.refresh()
        kind = rng.choices(
            ("merge", "delete", "compact"), weights=(6, 3, 1)
        )[0]
        keys = rng.sample(range(KEYSPACE), rng.randint(1, 6))
        try:
            if kind == "merge":
                upd = {k: i * 1000 + k for k in keys}
                w.merge(_mk_rows(spark, upd))
                model.update(upd)
            elif kind == "delete":
                w.delete_keys(
                    spark.createDataFrame([(k,) for k in keys], "k long")
                )
                for k in keys:
                    model.pop(k, None)
            else:
                w.compact_files(max_files=1)
                # content-neutral
            outcomes["ok"] += 1
            outcomes[kind] += 1
            snapshots[w._epoch] = dict(model)
        except ConcurrentWriterError:
            outcomes["conflict"] += 1
            # the losing op must not have changed the committed table:
            # verify lazily via the final model comparison; here just
            # bring the loser up to date like a real client would
            w.refresh()

    # the fuzz is only meaningful if both paths actually happened
    assert outcomes["ok"] > 10, outcomes
    assert outcomes["conflict"] > 0, (
        f"seed {seed} produced no conflicts — widen the schedule: {outcomes}"
    )

    w1.refresh()
    assert _table_dict(w1) == model, outcomes

    # fsck: no referenced dir may be missing; orphans (losers'
    # abandoned generations) are expected and reported, not errors
    report = w1.fsck()
    assert not report.get("missing_dirs"), report

    # time travel: a sample of recorded epochs must replay exactly
    for epoch in sorted(snapshots)[-3:]:
        got = {
            r["k"]: r["v"] for r in w1.read_at_epoch(epoch).collect()
        }
        assert got == snapshots[epoch], f"epoch {epoch} diverged"

    # change feed: for sampled epoch pairs the feed must equal the
    # model-snapshot diff — inserted-then-deleted keys vanish, carried
    # rows in rewritten buckets are digest-suppressed, and a span
    # crossing a content-neutral compact_files commit shows rows only
    # for genuine content changes
    eps = sorted(snapshots)
    pairs = list(zip(eps, eps[1:]))[-4:]
    if len(eps) > 1:
        pairs.append((eps[0], eps[-1]))
    for e1, e2 in pairs:
        s1, s2 = snapshots[e1], snapshots[e2]
        want: set[tuple[int, str]] = set()
        for k in s2.keys() - s1.keys():
            want.add((k, "insert"))
        for k in s1.keys() - s2.keys():
            want.add((k, "delete"))
        for k in s1.keys() & s2.keys():
            if s1[k] != s2[k]:
                want.add((k, "update_preimage"))
                want.add((k, "update_postimage"))
        got_feed = {
            (r["k"], r["_change_type"])
            for r in w1.changes(e1, e2).collect()
        }
        assert got_feed == want, f"changes({e1},{e2}) diverged from model"


def test_stale_delete_conflicts_instead_of_skipping(spark, tmp_path):
    """The targeted write-skew case: writer B (stale) deletes a key
    that writer A concurrently INSERTED into a bucket B's snapshot
    has never seen. The old behavior silently skipped the bucket; the
    fixed read set pins it at None and must raise."""
    path = str(tmp_path / "skew")
    a = ManifestTable(spark, path, "k", n_buckets=8)
    # choose two keys in DIFFERENT buckets; seed only with key_a
    probe = spark.createDataFrame(
        [(k,) for k in range(40)], "k long"
    ).select(
        "k", F.pmod(F.xxhash64(F.col("k")), F.lit(8)).alias("b")
    )
    by_bucket: dict[int, list[int]] = {}
    for r in probe.collect():
        by_bucket.setdefault(r["b"], []).append(r["k"])
    (b1, ks1), (b2, ks2) = sorted(by_bucket.items())[:2]
    key_a, key_new = ks1[0], ks2[0]
    a.write_full(_mk_rows(spark, {key_a: 1}))

    b = ManifestTable(spark, path, "k", n_buckets=8)  # snapshot: only b1
    a.merge(_mk_rows(spark, {key_new: 2}))  # A creates bucket b2

    with pytest.raises(ConcurrentWriterError):
        b.delete_keys(spark.createDataFrame([(key_new,)], "k long"))
    b.refresh()
    b.delete_keys(spark.createDataFrame([(key_new,)], "k long"))
    assert _table_dict(b) == {key_a: 1}
