"""Execution-engine primitives shared by every relational operator.

TPU cost model (measured on v5e, benchmarks/probe_primitives.py):

    copy/elementwise      ~550 GB/s   (the roofline)
    cumsum / assoc. scan  ~40 GB/s
    jax.lax.sort          0.4-1.4 Grows/s
    jnp.take (gather)     0.12-0.14 Grows/s   <-- 4-10x slower than sort!
    scatter / .at[].set   0.12-0.18 Grows/s

The single most important consequence: **never apply a sort permutation
with `take`**. A `lax.sort` carries any number of payload operands through
the permutation at a fraction of the cost of one gather — so every
operator in this package routes ALL its columns through one fused sort
(`multi_sort`) instead of sorting indices and gathering. Likewise
`jax.ops.segment_sum` (scatter-add) is replaced by segmented scans
(`seg_scan`) which run at memory-ish speed.

The reference never faced this: CUDA gathers are memory-speed
(thrust::gather, libgdf/src/gdf_table.cuh:874-963), so its operators
permute via index buffers. On TPU the fused-payload-sort *is* the gather.

`multi_sort` currently lowers to `jax.lax.sort` on every backend; the
Pallas kernels that bypass it live beside the operators that use them
(ops/pallas/compact.py for stream compaction) rather than behind this
function.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

# Toggle for the Pallas kernel backend (ops/pallas). Set by configure().
# None = auto: Pallas kernels on TPU, XLA fallbacks elsewhere (CPU tests).
_USE_PALLAS = None
_INTERPRET = False  # run Pallas kernels in interpreter mode (debugging)
_PALLAS_COMPACT_MAX_ROWS = None  # None = ops.compaction default
_COMPACT_BACKEND = "auto"  # "auto" | "v2" | "v1"


def configure(use_pallas: bool | None = None,
              interpret: bool = False,
              pallas_compact_max_rows: int | None = None,
              compact_backend: str = "auto") -> None:
    """Select the compute backend for data-movement primitives.

    use_pallas=None (default) picks Pallas kernels on TPU and the XLA
    lax.sort fallbacks on CPU; True/False forces. interpret=True runs the
    Pallas kernels in interpreter mode (any backend; slow — testing only).
    compact_backend picks the Pallas compaction kernel: "auto" (default:
    v1 routing kernel up to pallas_compact_max_rows — faster in its
    sweet spot — v2 offset-prefetched kernel above), or force "v2" /
    "v1" (where v1 falls back to the fused payload sort past the size
    cap; None = the measured default in ops/compaction.py)."""
    global _USE_PALLAS, _INTERPRET, _PALLAS_COMPACT_MAX_ROWS
    global _COMPACT_BACKEND
    _USE_PALLAS = use_pallas
    _INTERPRET = interpret
    _PALLAS_COMPACT_MAX_ROWS = pallas_compact_max_rows
    if compact_backend not in ("auto", "v1", "v2"):
        raise ValueError(f"unknown compact_backend {compact_backend!r}")
    _COMPACT_BACKEND = compact_backend


def compact_backend() -> str:
    return _COMPACT_BACKEND


def pallas_compact_max_rows() -> int:
    if _PALLAS_COMPACT_MAX_ROWS is not None:
        return _PALLAS_COMPACT_MAX_ROWS
    from .compaction import PALLAS_COMPACT_MAX_ROWS
    return PALLAS_COMPACT_MAX_ROWS


def use_pallas() -> bool:
    if _USE_PALLAS is not None:
        return _USE_PALLAS
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


def pallas_interpret() -> bool:
    return _INTERPRET


def multi_sort(operands: Sequence[jax.Array], num_keys: int,
               stable: bool = True):
    """Stable lexicographic sort of the first `num_keys` operands; ALL
    operands are permuted consistently. This is the engine's one data-
    movement primitive: filter, partition, order-by, groupby and join all
    lower to it (plus scans).

    ≅ every thrust::sort/sort_by_key/stable_sort_by_key call in the
    reference (sqls_rtti_comp.hpp:299-320, joining.cu, hashing.cu) — but
    carrying whole tables as payload instead of gathering afterwards."""
    operands = tuple(operands)
    return jax.lax.sort(operands, num_keys=num_keys, is_stable=stable)


def argsort_keys(keys: Sequence[jax.Array], payloads: Sequence[jax.Array] = ()):
    """multi_sort of keys + iota + payloads; returns (sorted_keys, perm,
    sorted_payloads)."""
    keys = tuple(keys)
    n = keys[0].shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    out = multi_sort(keys + (iota,) + tuple(payloads), num_keys=len(keys))
    return out[:len(keys)], out[len(keys)], out[len(keys) + 1:]


# ---------------------------------------------------------------------------
# 1-D scans — the engine's second data-movement primitive.
#
# Axon server-compile costs measured round 4 (11M rows, quiet chip):
# native jnp.cumsum first-run = 105 s (steady 8.4 ms); an
# associative_scan-based blocked reformulation was WORSE (>550 s). Sorts
# by contrast compile fast (orderby 50M cold = 27 s in r3). Every scan
# here routes through these wrappers so a Pallas scan backend
# (ops/pallas/scan.py — Mosaic-compiled, compile time flat in n) can
# replace the XLA lowering on TPU.
# ---------------------------------------------------------------------------


def _assoc_scan(comb, xs, reverse: bool = False):
    """1-D associative scan over a tuple of equally-shaped arrays.
    Inclusive; `reverse=True` scans suffixes."""
    return jax.lax.associative_scan(comb, tuple(xs), reverse=reverse)


def _pallas_scans() -> bool:
    return use_pallas() or pallas_interpret()


def _warn_xla_scan_fallback(what: str, n: int) -> None:
    """XLA scan lowerings cost ~100 s+ of (lazy) server compile per
    multi-million-row instance on the axon TPU backend (PERF.md). Every
    sum dtype now has a Pallas route (i32/u32/f32 native, 64-bit int
    carry pairs, f64 double-float, f16 via f32); this warning remains
    for any residual shape (e.g. f64 min/max reverse scans) so a
    silently slow compile is at least attributable."""
    if n < 1_000_000 or not use_pallas():
        return
    import warnings
    key = ("scan-fallback", what)
    if key in _WARNED:
        return
    _WARNED.add(key)
    warnings.warn(
        f"{what} over {n} rows is falling back to XLA's scan lowering "
        "on TPU (no Pallas kernel for this dtype); expect a very slow "
        "first compile (~100 s+ per scan at 10M rows). Consider a "
        "4-byte or 64-bit-integer accumulator dtype.", stacklevel=3)


_WARNED: set = set()


def cumsum(x: jax.Array, dtype=None) -> jax.Array:
    """Inclusive prefix sum (see module scan note).

    TPU dtype routing: i32/u32/f32 -> native Pallas scan; int64/uint64
    -> exact (hi,lo) u32 carry pairs; float64 -> compensated double-
    float pairs (deterministic, ~2^-47 relative — see pallas/scan.py);
    float16 -> the f32 kernel, rounded back. Nothing sum-shaped reaches
    XLA's scan lowering (the axon compile bomb) anymore."""
    if dtype is not None:
        x = x.astype(dtype)
    if _pallas_scans():
        from .pallas.scan import (cumsum64_pallas, cumsum_f64_pallas,
                                  scan_pallas, scan_pallas_supported,
                                  sum64_supported, sumff_supported)
        if scan_pallas_supported(x):
            return scan_pallas("sum", x, interpret=pallas_interpret())
        if sum64_supported(x):
            return cumsum64_pallas(x, interpret=pallas_interpret())
        if sumff_supported(x):
            return cumsum_f64_pallas(x, interpret=pallas_interpret())
        if x.dtype == jnp.float16:
            return scan_pallas("sum", x.astype(jnp.float32),
                               interpret=pallas_interpret()).astype(
                jnp.float16)
        _warn_xla_scan_fallback(f"cumsum[{x.dtype}]", x.shape[0])
    return jnp.cumsum(x)


def cummax(x: jax.Array) -> jax.Array:
    if _pallas_scans():
        from .pallas.scan import scan_pallas, scan_pallas_supported
        if scan_pallas_supported(x):
            return scan_pallas("max", x, interpret=pallas_interpret())
    return jax.lax.cummax(x)


def cummin(x: jax.Array, reverse: bool = False) -> jax.Array:
    if not reverse and _pallas_scans():
        from .pallas.scan import scan_pallas, scan_pallas_supported
        if scan_pallas_supported(x):
            return scan_pallas("min", x, interpret=pallas_interpret())
    return jax.lax.cummin(x, reverse=reverse)


def _seg_scan(kind: str, vals, starts):
    """Segmented scan dispatch: Pallas pair kernel for 4-byte values on
    TPU (plus the exact hi/lo-pair kernel for 64-bit integer sums),
    associative_scan elsewhere / for the remaining 64-bit cases."""
    if _pallas_scans():
        from .pallas.scan import (scan_pallas_pair, scan_pallas_supported,
                                  seg_sel64_pallas, seg_sum64_pallas,
                                  seg_sum_f64_pallas, sum64_supported,
                                  sumff_supported)
        if scan_pallas_supported(vals, starts):
            return scan_pallas_pair(kind, starts, vals,
                                    interpret=pallas_interpret())
        if kind == "sum" and sum64_supported(vals):
            return seg_sum64_pallas(starts, vals,
                                    interpret=pallas_interpret())
        if kind == "sum" and sumff_supported(vals):
            return seg_sum_f64_pallas(starts, vals,
                                      interpret=pallas_interpret())
        if kind == "sum" and vals.dtype == jnp.float16:
            return scan_pallas_pair(
                kind, starts, vals.astype(jnp.float32),
                interpret=pallas_interpret()).astype(jnp.float16)
        if kind in ("min", "max") and jnp.dtype(vals.dtype) in (
                jnp.dtype(jnp.int64), jnp.dtype(jnp.uint64),
                jnp.dtype(jnp.float64)):
            # order-preserving u64 encoding -> lexicographic (hi, lo)
            # pair select -> decode. NOTE: f64 NaNs follow the same
            # TOTAL ORDER as sorts (NaN greatest) rather than
            # jnp.minimum's NaN propagation — consistent with order_by.
            from .sort import radix_decode, radix_encode
            enc = radix_encode(vals, ascending=True)
            out = seg_sel64_pallas("min64" if kind == "min" else "max64",
                                   starts, enc,
                                   interpret=pallas_interpret())
            return radix_decode(out, vals.dtype)
        _warn_xla_scan_fallback(f"seg_scan_{kind}[{vals.dtype}]",
                                vals.shape[0])
    op = {"sum": lambda a, b: a + b, "max": jnp.maximum,
          "min": jnp.minimum}[kind]

    def comb(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, jnp.where(fb, vb, op(va, vb))
    _, out = _assoc_scan(comb, (starts, vals))
    return out


# ---------------------------------------------------------------------------
# Segmented scans — the TPU replacement for scatter-add segment reductions
# (jax.ops.segment_sum measured at 0.116 Grows/s: it lowers to scatter-add,
#  which serializes on TPU; an associative segmented scan runs ~40x faster).
# ---------------------------------------------------------------------------

def seg_scan_sum(vals: jax.Array, starts: jax.Array) -> jax.Array:
    """Inclusive segmented sum scan. `starts` marks segment heads (bool).
    Value at each segment's last row = the segment total.

    ≅ thrust::reduce_by_key's sum path (sqls_rtti_comp.hpp:496-505)."""
    return _seg_scan("sum", vals, starts)


def seg_scan_min(vals, starts):
    return _seg_scan("min", vals, starts)


def seg_scan_max(vals, starts):
    return _seg_scan("max", vals, starts)


def last_valid_scan(valid: jax.Array, vals: jax.Array,
                    with_flag: bool = False):
    """For each position i, the value at the latest j <= i with valid[j]
    (carry-forward fill). Positions before the first valid keep vals[i].
    Returns (filled, seen) — `seen` (whether any valid j <= i exists) is
    only computed when with_flag=True (it costs a second scan on the
    Pallas path); otherwise it may be None.

    Replaces gather-by-cummax-index patterns (a 10M-row gather costs ~70ms;
    this scan ~4ms)."""
    if _pallas_scans():
        from .pallas.scan import scan_pallas_pair, scan_pallas_supported
        if scan_pallas_supported(vals, valid):
            out = scan_pallas_pair("carry", valid, vals,
                                   interpret=pallas_interpret())
            seen = (cummax(valid.astype(jnp.int32)) > 0 if with_flag
                    else None)
            return out, seen

    def comb(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, jnp.where(fb, vb, va)
    f, out = _assoc_scan(comb, (valid, vals))
    return jnp.where(f, out, vals), f
