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

`multi_sort` is the single seam where a Pallas sort backend replaces
XLA's comparator-network sort (see ops/pallas/).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

# Toggle for the Pallas kernel backend (ops/pallas). Set by configure().
# None = auto: Pallas kernels on TPU, XLA fallbacks elsewhere (CPU tests).
_USE_PALLAS = None
_INTERPRET = False  # run Pallas kernels in interpreter mode (debugging)


def configure(use_pallas: bool | None = None,
              interpret: bool = False) -> None:
    """Select the compute backend for data-movement primitives.

    use_pallas=None (default) picks Pallas kernels on TPU and the XLA
    lax.sort fallbacks on CPU; True/False forces. interpret=True runs the
    Pallas kernels in interpreter mode (any backend; slow — testing only)."""
    global _USE_PALLAS, _INTERPRET
    _USE_PALLAS = use_pallas
    _INTERPRET = interpret


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
# Segmented scans — the TPU replacement for scatter-add segment reductions
# (jax.ops.segment_sum measured at 0.116 Grows/s: it lowers to scatter-add,
#  which serializes on TPU; an associative segmented scan runs ~40x faster).
# ---------------------------------------------------------------------------

def seg_scan_sum(vals: jax.Array, starts: jax.Array) -> jax.Array:
    """Inclusive segmented sum scan. `starts` marks segment heads (bool).
    Value at each segment's last row = the segment total.

    ≅ thrust::reduce_by_key's sum path (sqls_rtti_comp.hpp:496-505)."""
    def comb(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, jnp.where(fb, vb, va + vb)
    _, out = jax.lax.associative_scan(comb, (starts, vals))
    return out


def seg_scan_min(vals, starts):
    def comb(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, jnp.where(fb, vb, jnp.minimum(va, vb))
    _, out = jax.lax.associative_scan(comb, (starts, vals))
    return out


def seg_scan_max(vals, starts):
    def comb(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, jnp.where(fb, vb, jnp.maximum(va, vb))
    _, out = jax.lax.associative_scan(comb, (starts, vals))
    return out


def last_valid_scan(valid: jax.Array, vals: jax.Array):
    """For each position i, the value at the latest j <= i with valid[j]
    (carry-forward fill). Positions before the first valid keep vals[i].

    Replaces gather-by-cummax-index patterns (a 10M-row gather costs ~70ms;
    this scan ~4ms)."""
    def comb(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, jnp.where(fb, vb, va)
    f, out = jax.lax.associative_scan(comb, (valid, vals))
    return out, f
