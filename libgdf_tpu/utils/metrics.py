"""Per-operator metrics: rows, estimated bytes moved, wall time.

≅ the reference's single real telemetry system — RMM's memory event log
(RAII LogIt, libgdf/src/memory/memory.cpp:55-110, CSV via rmmWriteLog,
include/memory.h:160-184) — generalized from allocations to operators:
every instrumented operator appends an event (name, rows in/out, bytes
estimate, wall seconds), dumpable as CSV with the same ergonomics.

Under jit, wall time is the TRACE time (the operator runs fused inside a
larger program; XLA owns the schedule), so events carry a `traced` flag:
rows/bytes are exact logical quantities either way, and eager calls get
real wall time. bench.py uses the bytes estimates for its roofline
table, replacing hand-maintained constants.
"""
from __future__ import annotations

import contextlib
import csv
import io
import threading
import time
from dataclasses import dataclass, field

import jax


@dataclass
class OpEvent:
    name: str
    rows_in: int
    rows_out: int
    bytes_est: int
    wall_s: float
    traced: bool


@dataclass
class _Registry:
    enabled: bool = False
    events: list = field(default_factory=list)
    lock: threading.Lock = field(default_factory=threading.Lock)


_REG = _Registry()


def enable(on: bool = True) -> None:
    """Turn per-op event recording on/off (≅ rmmOptions_t.enable_logging,
    include/memory.h:44-73)."""
    _REG.enabled = on


def reset() -> None:
    with _REG.lock:
        _REG.events.clear()


def events() -> list:
    with _REG.lock:
        return list(_REG.events)


def write_log() -> str:
    """CSV dump (≅ rmmWriteLog / rmmGetLog, include/memory.h:160-184)."""
    buf = io.StringIO()
    w = csv.writer(buf)
    w.writerow(["op", "rows_in", "rows_out", "bytes_est", "wall_s",
                "traced"])
    for e in events():
        w.writerow([e.name, e.rows_in, e.rows_out, e.bytes_est,
                    round(e.wall_s, 6), int(e.traced)])
    return buf.getvalue()


def _is_tracing() -> bool:
    return isinstance(jnp_zero(), jax.core.Tracer)


def jnp_zero():
    import jax.numpy as jnp
    return jnp.zeros(())


def table_bytes(table) -> int:
    """Logical byte footprint of a Table's live buffers."""
    total = 0
    for c in table.columns:
        total += c.data.dtype.itemsize * c.data.shape[0]
        if c.valid is not None:
            total += c.valid.shape[0] // 8 + 1  # bitmask-equivalent cost
    return total


@contextlib.contextmanager
def op_metrics(name: str, rows_in: int = 0, bytes_est: int = 0):
    """Record one operator event; yields a dict the op may update with
    `rows_out`. Wall time is real when eager, trace time under jit."""
    if not _REG.enabled:
        yield {}
        return
    info = {"rows_out": 0}
    t0 = time.perf_counter()
    traced = False
    try:
        yield info
    finally:
        wall = time.perf_counter() - t0
        ro = info.get("rows_out", 0)
        try:
            ro = int(ro)
        except Exception:  # traced count
            ro, traced = -1, True
        with _REG.lock:
            _REG.events.append(OpEvent(name, int(rows_in), ro,
                                       int(bytes_est), wall, traced))
