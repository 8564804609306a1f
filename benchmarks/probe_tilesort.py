"""Kill-or-keep probe (VERDICT r4 #5): block-local VMEM bitonic sort.

Sorts each (512, 128) = 64K-element block's flat order in VMEM with the
classic bitonic network — partner at XOR distance 2^j via two static
flat shifts + selects, 153 compare-exchange stages for 2^17 elements —
carrying one payload word. This is the tile-sort half of a full
tile-sort + merge Pallas sort; a full sort of N=2^24 adds ~119 more
in-block CE stages (the s<64K tail of cross-block merge passes) plus 28
elementwise cross-block passes (HBM-bound, ~free), so:

    full-sort rows/s ~= tile_rate * 153 / 272 / pad
    (pad = 2^ceil(log2(n)) / n, bitonic needs a power of two)

Run: PYTHONPATH=/root/.axon_site:/root/repo python \
         benchmarks/probe_tilesort.py [n]
Emits a JSON line with the measured tile rate, the full-sort estimate,
and the lax.sort baseline on the same data for the PERF.md verdict.
"""
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from libgdf_tpu.ops.pallas.compact import LANES, _i32

ROWS = 512
BLOCK = ROWS * LANES
K = BLOCK.bit_length() - 1      # 17


def _shift_fwd(x, s):
    """y[p] = x[p + s] (garbage wrap — masked by the pair select)."""
    if s % LANES == 0:
        return pltpu.roll(x, np.int32(ROWS - s // LANES), 0)
    a = pltpu.roll(x, np.int32(LANES - s), 1)
    b = pltpu.roll(a, np.int32(ROWS - 1), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(c < LANES - s, a, b)


def _shift_back(x, s):
    """y[p] = x[p - s]."""
    if s % LANES == 0:
        return pltpu.roll(x, np.int32(s // LANES), 0)
    a = pltpu.roll(x, np.int32(s), 1)
    b = pltpu.roll(a, np.int32(1), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(c >= s, a, b)


def _kernel(key_ref, pay_ref, ko_ref, po_ref):
    key = key_ref[...]
    pay = pay_ref[...]
    row = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1)
    i = row * LANES + lane
    for k_exp in range(1, K + 1):
        dirmask = np.int32(1 << k_exp) if k_exp < K else None
        asc = (jnp.ones((ROWS, LANES), jnp.bool_) if dirmask is None
               else (i & dirmask) == 0)
        for j_exp in reversed(range(k_exp)):
            s = 1 << j_exp
            i_low = (i & np.int32(s)) == 0
            pk = jnp.where(i_low, _shift_fwd(key, s), _shift_back(key, s))
            pp = jnp.where(i_low, _shift_fwd(pay, s), _shift_back(pay, s))
            take_min = jnp.logical_not(jnp.logical_xor(i_low, asc))
            # strict total order (payload = unique iota tie-break) so the
            # two sides of a tied pair decide consistently — a real sort
            # gets this for free from index-in-low-bits keys
            pv_smaller = jnp.logical_or(
                pk < key, jnp.logical_and(pk == key, pp < pay))
            swap = jnp.logical_xor(pv_smaller, jnp.logical_not(take_min))
            key = jnp.where(swap, pk, key)
            pay = jnp.where(swap, pp, pay)
    ko_ref[...] = key
    po_ref[...] = pay


@jax.jit
def tile_sort(key, pay):
    n = key.shape[0]
    nblocks = n // BLOCK
    k2 = key.reshape(nblocks * ROWS, LANES)
    p2 = pay.reshape(nblocks * ROWS, LANES)
    ko, po = pl.pallas_call(
        _kernel,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((ROWS, LANES), lambda b: (b, jnp.int32(0)),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=[pl.BlockSpec((ROWS, LANES),
                                lambda b: (b, jnp.int32(0)),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((nblocks * ROWS, LANES),
                                        jnp.int32)] * 2,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(k2, p2)
    return ko.reshape(-1), po.reshape(-1)


def _sync(x):
    np.asarray(x[:1])


def _timeit(f, *args, reps=3):
    out = f(*args)
    _sync(out[0] if isinstance(out, tuple) else out)
    best = np.inf
    for _ in range(reps):
        k = 8
        t0 = time.perf_counter()
        for _ in range(k):
            out = f(*args)
        _sync(out[0] if isinstance(out, tuple) else out)
        t1 = time.perf_counter()
        for _ in range(2 * k):
            out = f(*args)
        _sync(out[0] if isinstance(out, tuple) else out)
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / k)
    return best


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 11 * 2**20
    n = (n // BLOCK) * BLOCK
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 2**31 - 1, n).astype(np.int32))
    pay = jnp.asarray(np.arange(n, dtype=np.int32))

    # correctness: every block independently sorted
    t0 = time.perf_counter()
    ko, po = tile_sort(key, pay)
    kh = np.asarray(ko)
    compile_s = time.perf_counter() - t0
    knp = np.asarray(key).reshape(-1, BLOCK)
    np.testing.assert_array_equal(kh.reshape(-1, BLOCK), np.sort(knp, 1))
    ph = np.asarray(po)
    np.testing.assert_array_equal(np.asarray(key)[ph], kh)

    dt_tile = _timeit(tile_sort, key, pay)

    sortfn = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=1,
                                               is_stable=False))
    dt_lax = _timeit(sortfn, key, pay)

    npad = 1 << (n - 1).bit_length()
    full_est = (n / dt_tile) * 153 / 272 * (n / npad)
    print(json.dumps({
        "n": n, "compile_s": round(compile_s, 1),
        "tile_sort_rows_per_s": round(n / dt_tile),
        "tile_sort_ms": round(dt_tile * 1e3, 2),
        "full_sort_est_rows_per_s": round(full_est),
        "lax_sort_2op_rows_per_s": round(n / dt_lax),
        "lax_sort_ms": round(dt_lax * 1e3, 2),
        "verdict": "keep" if full_est > 1.3 * n / dt_lax else "kill",
    }))


if __name__ == "__main__":
    main()
