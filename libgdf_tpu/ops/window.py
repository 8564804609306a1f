"""Window functions: partitioned, ordered rolling reductions.

≅ reference gpu_window_function — declared in the ABI (enums
window_function_type / window_reduction_type, types.h:197-210) but left
INCOMPLETE and compiled out of the reference build (CMakeLists.txt:154,
src/windowedops.cu:46-148 is a sketch: hash partition columns, stable
multi-col sort, "perform windowed functions here"). This module finishes
the design the sketch describes, TPU-natively:

  1. partition columns → row hash (the sketch's gpu_hash_columns step);
  2. ONE stable lax.sort by (partition id, order keys) — the sketch's
     backwards-stable-sort plan, as a single fused multi-key sort;
  3. windowed reduction = cumulative-scan difference over the sorted
     frame, segment-reset at partition starts — O(n), no per-window
     loops, pure VPU;
  4. scatter results back to the original row order.

Supported reductions mirror window_reduction_type: SUM MIN MAX COUNT AVG
STDDEV VAR; window_function_type GDF_WINDOW_ROW (rows-preceding frames).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from ..core.column import Column
from ..core.dtypes import DtypeInfo, GDFDtype
from ..core.errors import GDFStatus, require
from ..core.table import Table
from .hashing import hash_columns
from .sort import radix_encode
from . import engine

WINDOW_REDUCTIONS = ("sum", "min", "max", "count", "avg", "stddev", "var")


def _segmented_running(vals, seg_start, op):
    """Running `op` over vals with reset at segment starts — the engine's
    segmented scans (Pallas kernels on TPU for 4-byte dtypes, the
    (carry, value) associative scan elsewhere)."""
    if op == "sum":
        return engine.seg_scan_sum(vals, seg_start)
    if op == "min":
        return engine.seg_scan_min(vals, seg_start)
    if op == "max":
        return engine.seg_scan_max(vals, seg_start)
    raise ValueError(op)


def _windowed(vals, valid, seg_start, preceding: int, op: str):
    """Rolling reduction over the frame [i-preceding+1, i] clipped to the
    current partition. O(n) via prefix sums (sum-family) or log-steps of
    shifted min/max (min/max family)."""
    n = vals.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    # first row index of each row's partition: segment-reset running max
    # of (idx at starts, 0 elsewhere) propagates each start index forward
    part_first = _segmented_running(jnp.where(seg_start, idx, 0),
                                    seg_start, "max")
    frame_lo = jnp.maximum(part_first, idx - (preceding - 1))
    w = valid.astype(jnp.float64)
    v = jnp.where(valid, vals.astype(jnp.float64), 0.0)

    if op in ("sum", "count", "avg", "var", "stddev"):
        csum = engine.cumsum(v)
        csq = engine.cumsum(v * v)
        ccnt = engine.cumsum(w)

        def rangesum(c):
            lo_excl = jnp.where(frame_lo > 0, jnp.take(c, frame_lo - 1,
                                                       mode="clip"), 0.0)
            lo_excl = jnp.where(frame_lo > 0, lo_excl, 0.0)
            return c - lo_excl

        s, sq, cnt = rangesum(csum), rangesum(csq), rangesum(ccnt)
        if op == "sum":
            return s, cnt > 0
        if op == "count":
            return cnt, jnp.ones_like(cnt, jnp.bool_)
        safe = jnp.maximum(cnt, 1.0)
        mean = s / safe
        if op == "avg":
            return mean, cnt > 0
        varv = jnp.maximum(sq / safe - mean * mean, 0.0)
        if op == "var":
            return varv, cnt > 0
        return jnp.sqrt(varv), cnt > 0

    # min/max.
    ident = jnp.asarray(jnp.inf if op == "min" else -jnp.inf, jnp.float64)
    cur = jnp.where(valid, vals.astype(jnp.float64), ident)
    if preceding >= n:
        # unbounded-preceding (running) frame: one segment-reset scan
        run = _segmented_running(cur, seg_start, op)
        has = _segmented_running(w, seg_start, "sum") > 0
        return run, has
    # bounded frame: gather the window band [i-preceding+1, i] and reduce
    # across it — vectorized O(n * preceding) on the VPU, exact at
    # partition boundaries via the frame_lo clip.
    offs = jnp.arange(preceding, dtype=jnp.int32)
    pos = idx[:, None] - offs[None, :]
    ok = pos >= frame_lo[:, None]
    gathered = jnp.take(cur, jnp.clip(pos, 0, n - 1), mode="clip")
    gathered = jnp.where(ok, gathered, ident)
    red = jnp.min(gathered, axis=1) if op == "min" else jnp.max(gathered,
                                                                axis=1)
    has = jnp.any(jnp.logical_and(ok, gathered != ident), axis=1)
    return red, has


def window_function(table: Table, value_name: str, reduction: str,
                    preceding: int | None = None,
                    partition_by: Sequence[str] = (),
                    order_by: Sequence[str] = ()) -> Column:
    """Rolling `reduction` over `value_name`, per partition, in sort
    order; frame = `preceding` rows up to the current row (None = all
    preceding, i.e. running/cumulative). Result is aligned to the INPUT
    row order (scatter-back, like SQL window semantics).

    ≅ gpu_window_function's intended contract (windowedops.cu:46-148,
    GDF_WINDOW_ROW frames)."""
    require(reduction in WINDOW_REDUCTIONS,
            GDFStatus.GDF_INVALID_AGGREGATOR, reduction)
    n = table.capacity
    require(n > 0, GDFStatus.GDF_DATASET_EMPTY)
    col = table.column(value_name)

    # 1. partition id (hash of partition columns — windowedops.cu:72-81)
    operands = []
    if partition_by:
        ph = hash_columns([table.column(c) for c in partition_by])
        operands.append(ph)
    # 2. order keys
    for name in order_by:
        c = table.column(name)
        operands.append(radix_encode(c.data, True))
    iota = jnp.arange(n, dtype=jnp.int32)
    if operands:
        sorted_ops = jax.lax.sort(tuple(operands) + (iota,),
                                  num_keys=len(operands), is_stable=True)
        perm = sorted_ops[-1]
        sorted_part = sorted_ops[0] if partition_by else None
    else:
        perm = iota
        sorted_part = None

    vals = jnp.take(col.data, perm)
    valid = (jnp.ones((n,), jnp.bool_) if col.valid is None
             else jnp.take(col.valid, perm))
    if table.num_rows is not None:
        valid = jnp.logical_and(valid, jnp.take(table.live_mask(), perm))

    if sorted_part is not None:
        seg_start = jnp.concatenate([
            jnp.ones((1,), jnp.bool_),
            sorted_part[1:] != sorted_part[:-1]])
    else:
        seg_start = jnp.zeros((n,), jnp.bool_).at[0].set(True)

    prec = n if preceding is None else int(preceding)
    require(prec >= 1, GDFStatus.GDF_INVALID_API_CALL,
            "preceding must be >= 1")
    out_sorted, has = _windowed(vals, valid, seg_start, prec, reduction)

    # 4. scatter back to input order
    out = jnp.zeros((n,), jnp.float64).at[perm].set(out_sorted)
    outv = jnp.zeros((n,), jnp.bool_).at[perm].set(has)
    return Column(data=out, valid=outv, info=DtypeInfo(GDFDtype.FLOAT64),
                  name=f"{value_name}_{reduction}")
