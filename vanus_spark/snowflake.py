"""Cluster-unique ID generation (reference parity:
/root/reference/pkg/snowflake/{snowflake,node,id}.go).

The reference wraps the public Sonyflake scheme: 63-bit IDs laid out
as ``elapsed_time(39) | sequence(8) | machine_id(16)`` with 10 ms time
units from a cluster-wide start time; node ids are partitioned per
service (controllers get [16, 32), stores [1024, 8192)) so no two
processes can mint colliding IDs without coordination beyond the
one-time range grant — the property that matters on a 1000-executor
cluster.

This port keeps the algorithm and the node-range discipline; the
controller RPC (cluster start time + node registration) is replaced
by constructor arguments, and an injectable clock makes the sequence/
spin behavior deterministically testable.
"""

from __future__ import annotations

import time

# node.go:9-12
CONTROLLER_NODE_ID_START = 16
RESERVED_CONTROL_PANEL_NODE_ID_START = 32
STORE_NODE_ID_START = 1024
RESERVED_NODE_ID_START = 8192

_SEQUENCE_BITS = 8
_MACHINE_BITS = 16
_TIME_UNIT_MS = 10


class NodeRange:
    """node.go NewNode: per-service logical-id ranges."""

    RANGES = {
        "controller": (CONTROLLER_NODE_ID_START, RESERVED_CONTROL_PANEL_NODE_ID_START),
        "store": (STORE_NODE_ID_START, RESERVED_NODE_ID_START),
    }

    def __init__(self, service: str, node_id: int):
        start, end = self.RANGES.get(
            service, (RESERVED_NODE_ID_START, RESERVED_NODE_ID_START)
        )
        self.service = service
        self.start, self.end = start, end
        self.id = node_id

    def logic_id(self) -> int:
        return self.start + self.id

    def valid(self) -> bool:
        return self.start <= self.logic_id() < self.end


class Snowflake:
    """Sonyflake-layout generator: monotone, unique per machine id."""

    def __init__(
        self,
        machine_id: int,
        start_time_ms: int | None = None,
        clock_ms=lambda: int(time.time() * 1000),
    ):
        if not (0 <= machine_id < (1 << _MACHINE_BITS)):
            raise ValueError(f"machine_id out of range: {machine_id}")
        self.machine_id = machine_id
        self.clock_ms = clock_ms
        self.start_ms = start_time_ms if start_time_ms is not None else clock_ms()
        self._elapsed = -1
        self._seq = 0

    def next_id(self) -> int:
        while True:
            elapsed = (self.clock_ms() - self.start_ms) // _TIME_UNIT_MS
            if elapsed < self._elapsed:
                raise RuntimeError("clock moved backwards")
            if elapsed == self._elapsed:
                self._seq += 1
                if self._seq < (1 << _SEQUENCE_BITS):
                    break
                # sequence exhausted for this 10 ms tick: spin to next
                while (self.clock_ms() - self.start_ms) // _TIME_UNIT_MS == elapsed:
                    time.sleep(_TIME_UNIT_MS / 2000)
                continue
            self._elapsed, self._seq = elapsed, 0
            break
        self._elapsed = max(self._elapsed, elapsed)
        return (
            (self._elapsed << (_SEQUENCE_BITS + _MACHINE_BITS))
            | (self._seq << _MACHINE_BITS)
            | self.machine_id
        )


def new_node_generator(
    service: str, node_id: int, start_time_ms: int | None = None, clock_ms=None
) -> Snowflake:
    """snowflake.go Initialize: validate the node's range, then build
    the generator with the node's LOGICAL id as machine id."""
    n = NodeRange(service, node_id)
    if not n.valid():
        raise ValueError(
            f"the nodeID number: {n.logic_id()} exceeded, range of "
            f"{service} is [{n.start}, {n.end})"
        )
    kwargs = {"start_time_ms": start_time_ms}
    if clock_ms is not None:
        kwargs["clock_ms"] = clock_ms
    return Snowflake(n.logic_id(), **kwargs)
