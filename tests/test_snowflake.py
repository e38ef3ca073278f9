"""Snowflake ID generation (vanus_spark/snowflake.py)."""

from __future__ import annotations

import pytest


def test_layout_and_monotonicity_with_fake_clock():
    from vanus_spark.snowflake import Snowflake

    t = {"ms": 1000}
    g = Snowflake(machine_id=42, start_time_ms=0, clock_ms=lambda: t["ms"])
    a = g.next_id()
    assert a & 0xFFFF == 42  # machine id in the low 16 bits
    assert (a >> 24) == 100  # 1000 ms / 10 ms units
    b = g.next_id()  # same tick -> sequence bump
    assert b == a + (1 << 16)
    t["ms"] = 1010
    c = g.next_id()  # next tick -> sequence resets
    assert (c >> 24) == 101 and (c >> 16) & 0xFF == 0
    assert a < b < c


def test_sequence_exhaustion_spins_to_next_tick():
    from vanus_spark.snowflake import Snowflake

    t = {"ms": 0, "calls": 0}

    def clock():
        # advance the clock slowly so exhaustion forces a spin
        t["calls"] += 1
        if t["calls"] > 300:
            t["ms"] = 10
        return t["ms"]

    g = Snowflake(machine_id=1, start_time_ms=0, clock_ms=clock)
    ids = [g.next_id() for _ in range(257)]  # 256 per tick max
    assert len(set(ids)) == 257
    assert (ids[-1] >> 24) == 1  # the 257th landed on the next tick


def test_clock_rollback_detected():
    from vanus_spark.snowflake import Snowflake

    t = {"ms": 1000}
    g = Snowflake(machine_id=1, start_time_ms=0, clock_ms=lambda: t["ms"])
    g.next_id()
    t["ms"] = 500
    with pytest.raises(RuntimeError):
        g.next_id()


def test_node_ranges_match_reference():
    from vanus_spark.snowflake import NodeRange, new_node_generator

    assert NodeRange("controller", 0).logic_id() == 16
    assert NodeRange("controller", 15).valid()
    assert not NodeRange("controller", 16).valid()  # [16, 32)
    assert NodeRange("store", 0).logic_id() == 1024
    assert not NodeRange("store", 8192 - 1024).valid()
    assert not NodeRange("unknown", 0).valid()

    g = new_node_generator("controller", 3, start_time_ms=0)
    assert g.machine_id == 19
    with pytest.raises(ValueError):
        new_node_generator("controller", 99)


def test_distinct_machines_never_collide():
    from vanus_spark.snowflake import Snowflake

    t = {"ms": 1000}
    g1 = Snowflake(machine_id=1, start_time_ms=0, clock_ms=lambda: t["ms"])
    g2 = Snowflake(machine_id=2, start_time_ms=0, clock_ms=lambda: t["ms"])
    ids = {g.next_id() for g in (g1, g2) for _ in range(5)}
    assert len(ids) == 10
