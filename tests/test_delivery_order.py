"""Ordered-delivery equivalence harness (r10 verdict #8).

DeliveryLoop's per-tick drain jobs are candidates for folding in a
later round (dlq_resend_cli / sink_payload_roundtrip spend most of
their time in per-tick job overhead), but the loop's ORDER semantics
are the operator under test: with backpressure active, each tick's
send is one TakeOrdered drain — the sink observes the FIFO (time, id)
prefix of (fresh immediates ∪ due pending), in that order, as a
single ordered call. Any future fold of the per-tick jobs must keep
this suite green; it is the order oracle the r10 round said must
exist BEFORE touching the loop.

Two layers:
  1. an order-recording sink that spools the exact row sequence of
     every sink invocation (one file per call);
  2. a pure-Python reference simulator of the documented drain
     semantics (trigger.go backoff schedule, maxUACK cap, FIFO by
     (time, id), overflow parks due-now), compared order-SENSITIVELY
     against the spool, tick by tick.
"""

from __future__ import annotations

import datetime as dt
import os
import uuid

from vanus_spark.delivery import backoff_seconds
from vanus_spark.streaming.runner import DeliveryLoop
from vanus_spark.subscription import Subscription

T0 = dt.datetime(2024, 6, 1, 12, 0, 0)


def _envelope(spark, rows):
    return spark.createDataFrame(
        rows,
        "id string, source string, specversion string, type string, "
        "time timestamp, datacontenttype string, dataschema string, "
        "subject string, attributes map<string,string>, data string",
    )


def _row(i: str, time: dt.datetime):
    return (i, "/s", "1.0", "purchase", time, "application/json",
            None, None, {}, '{"v":1}')


class OrderSpoolSink:
    """Records the exact ordered id sequence of every sink call (one
    spool file per invocation) and fails id until its retry attempt
    reaches ``fail_until[id]`` (503, retriable)."""

    def __init__(self, spool_dir: str, fail_until: dict[str, int]):
        self.spool_dir = spool_dir
        self.fail_until = dict(fail_until)

    def __call__(self, rows):
        statuses = []
        seq = []
        for r in rows:
            attempts = int((r["attributes"] or {}).get("xvanusretryattempts", 0))
            seq.append(r["id"])
            if self.fail_until.get(r["id"], 0) > attempts:
                statuses.append(503)
            else:
                statuses.append(200)
        if seq:
            path = os.path.join(self.spool_dir, uuid.uuid4().hex)
            with open(path, "w") as f:
                f.write("\n".join(seq))
        return statuses


def simulate_drain(events, fail_until, cap, n_ticks, tick_seconds=1.0):
    """Pure-Python oracle of DeliveryLoop.process_batch's drain order:
    per tick, eligible = fresh immediates + due pending, sorted FIFO by
    (time, id); the first ``cap`` reach the sink IN THAT ORDER; 503s
    re-enter pending at batch_time + backoff (trigger.go schedule);
    overflow parks due-now. Returns (per-tick sink sequences, per-tick
    delivered sequences)."""
    pending = []  # (due_time, id, time, attempts)
    fresh = [(i, tm, 0) for i, tm in events]
    sink_seqs, delivered_seqs = [], []
    t = T0
    for k in range(n_ticks):
        batch = fresh if k == 0 else []
        due = [p for p in pending if p[0] <= t]
        pending = [p for p in pending if p[0] > t]
        eligible = list(batch) + [(i, tm, a) for (_, i, tm, a) in due]
        eligible.sort(key=lambda x: (x[1], x[0]))
        sendable = eligible[:cap] if cap is not None else eligible
        overflow = eligible[cap:] if cap is not None else []
        tick_sink, tick_ok = [], []
        for i, tm, a in sendable:
            tick_sink.append(i)
            if fail_until.get(i, 0) > a:
                na = a + 1
                pending.append(
                    (t + dt.timedelta(seconds=backoff_seconds(na)), i, tm, na)
                )
            else:
                tick_ok.append(i)
        for i, tm, a in overflow:
            pending.append((t, i, tm, a))
        sink_seqs.append(tick_sink)
        delivered_seqs.append(tick_ok)
        t += dt.timedelta(seconds=tick_seconds)
    return sink_seqs, delivered_seqs


def _drive(spark, tmp_path, events, fail_until, cap, n_ticks):
    """Run the real loop tick-by-tick; returns per-tick sink-call file
    contents (list of per-call ordered id lists) and delivered ids."""
    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    sink = OrderSpoolSink(spool, fail_until)
    spec = {"config": {"max_uack": cap}} if cap is not None else {}
    loop = DeliveryLoop(spark, Subscription.from_spec(spec), sink)
    seen_files: set[str] = set()
    per_tick_calls, per_tick_delivered = [], []
    t = T0
    for k in range(n_ticks):
        batch = _envelope(spark, [_row(i, tm) for i, tm in events] if k == 0 else [])
        res = loop.process_batch(batch, t, tick_seconds=1.0)
        delivered = [r.id for r in res.delivered.collect()]
        new = sorted(set(os.listdir(spool)) - seen_files)
        seen_files |= set(new)
        calls = []
        for name in new:
            with open(os.path.join(spool, name)) as f:
                calls.append([x for x in f.read().splitlines() if x])
        per_tick_calls.append(calls)
        per_tick_delivered.append(delivered)
        t += dt.timedelta(seconds=1.0)
    return per_tick_calls, per_tick_delivered


def test_backpressured_drain_is_one_ordered_call_per_tick(spark, tmp_path):
    """With maxUACK active each tick's drain reaches the sink as ONE
    call whose rows are FIFO (time, id)-ordered — the TakeOrdered
    contract a fold must preserve."""
    t_early, t_late = T0 - dt.timedelta(hours=2), T0 - dt.timedelta(hours=1)
    # later-time rows get SMALLER ids so time-major order is actually
    # exercised (lexicographic id order would be the wrong answer)
    events = [(f"b{i}", t_early) for i in range(6)] + [
        (f"a{i}", t_late) for i in range(4)
    ]
    calls, _ = _drive(spark, tmp_path, events, {}, cap=3, n_ticks=5)
    flat = []
    for tick_calls in calls:
        assert len(tick_calls) <= 1, "drain must be a single sink call per tick"
        for seq in tick_calls:
            assert len(seq) <= 3  # the enforced cap
            assert seq == sorted(seq), seq  # within-call order
            flat += seq
    # every event delivered exactly once, whole-run order = FIFO by
    # (time, id): all early-time b's before any late-time a's
    assert flat == [f"b{i}" for i in range(6)] + [f"a{i}" for i in range(4)]


def test_drain_order_matches_reference_simulator(spark, tmp_path):
    """Order-sensitive equivalence against the pure-Python drain
    oracle under backpressure + interleaved 503 retries: the sink must
    observe exactly the simulated sequences, tick by tick."""
    events = [(f"e{i}", T0 - dt.timedelta(hours=1)) for i in range(8)]
    fail_until = {"e1": 2, "e4": 1}  # e1 heals on attempt 2, e4 on 1
    n_ticks, cap = 7, 3  # e1's 5 s second backoff lands at tick 6
    exp_sink, exp_ok = simulate_drain(events, fail_until, cap, n_ticks)
    calls, delivered = _drive(spark, tmp_path, events, fail_until, cap, n_ticks)
    got_sink = [[i for seq in tick for i in seq] for tick in calls]
    assert got_sink == exp_sink
    # delivered rows per tick match too (set per tick: delivered frames
    # don't promise an order, the sink sequence above does)
    assert [sorted(d) for d in delivered] == [sorted(d) for d in exp_ok]
    # nothing lost, nothing duplicated across the whole run
    all_ok = [i for tick in delivered for i in tick]
    assert sorted(all_ok) == sorted(i for i, _ in events)
