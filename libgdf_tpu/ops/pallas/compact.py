"""Stream compaction as a Pallas TPU kernel.

≅ reference `gpu_apply_stencil` (libgdf/src/streamcompactionops.cu:163-260,
thrust::copy_if) — redesigned for TPU: no atomics, no sort.

Algorithm (per 64x128-element block, sequential grid):

  1. dist[i] = #dropped elements before i (exclusive scan of the drop
     flags: lane cumsum + row-offset cumsum — all VPU).
  2. **Monotone binary routing**: survivors move left by dist[i] via
     log2(B) staged shifts (bit b of the remaining distance moves an
     element 2^b slots left). Stable compaction's destination map is
     injective + order-preserving, which makes the staged routing
     conflict-free: a collision at stage b would imply two elements with
     the same final slot. Each stage is two lane/sublane rotates and a
     select per routed array — pure VPU, no gather/scatter.
  3. The compacted block is DMA'd to the output at the running offset.
     Offsets are kept 128-lane aligned by carrying the partial last row
     (<128 elements) in VMEM into the next block (re-emitted, then
     overwritten by that block's DMA — the grid is sequential, so later
     blocks legally overwrite earlier blocks' padding tails).

TPU constraint (measured on v5e): a VMEM->HBM DMA's source row count must
be a multiple of the 8-sublane tile — a (65,128) staging buffer aborts the
program at runtime (TPU backend error). The augmented block is therefore
ROWS+8 rows: row 0 = carry, rows 1..ROWS = data, last 7 rows dead.

The count output equals the true survivor total (the tail of the output
buffer past it is garbage — the capacity+count convention of
core/table.py).

Cost model: ~14 stages x ~3 VPU ops per routed word — ~10 Grows/s-class
for 2 payload words, vs 0.11 Grows/s for the lax.sort compaction path it
replaces (the round-1/2 bottleneck: BENCH_r01 filter = 0.16% of roofline).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
ROWS = 512                     # rows per block (VMEM-bounded; bigger rows
                               # amortize per-block DMA/sequencing overhead)
BLOCK = ROWS * LANES           # elements per grid step


def _i32(v):
    """Python int -> strong int32 scalar (under jax_enable_x64 a bare
    literal binds as int64, which Mosaic cannot lower)."""
    return jnp.asarray(v, jnp.int32)


def _ceil_log2(x: int) -> int:
    return max(1, (x - 1).bit_length())


def _cumsum(x, axis):
    """Inclusive prefix sum via log-step shifted adds (Mosaic has no
    cumsum primitive). Shift amounts are STATIC Python ints — a traced
    shift makes pltpu.roll lower to a dynamic rotate, ~10x slower."""
    size = x.shape[axis]
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    s = 1
    while s < size:
        shifted = pltpu.roll(x, np.int32(s), axis)
        x = x + jnp.where(idx >= s, shifted, _i32(0))
        s <<= 1
    return x


def _flat_shift(x, s, rows, zero_fill):
    """y[p] = x[p + s] over the row-major flattening of (rows, LANES).
    Positions past the end get `zero_fill` (must be 0 for the distance
    array so wrapped values read as dead). All shifts static."""
    if s % LANES == 0:
        k = s // LANES
        y = pltpu.roll(x, np.int32(rows - k), 0)  # left-rotate rows by k
        if zero_fill:
            r = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
            y = jnp.where(r < rows - k, y, _i32(0))
        return y
    a = pltpu.roll(x, np.int32(LANES - s), 1)  # [r, c] = x[r, (c+s) % LANES]
    b = pltpu.roll(a, np.int32(rows - 1), 0)   # [r, c] = x[r+1, (c+s) % LANES]
    c = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    y = jnp.where(c < LANES - s, a, b)
    if zero_fill:
        r = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
        flat = r * LANES + c
        y = jnp.where(flat < (rows - 1) * LANES + (LANES - s), y, _i32(0))
    return y


def _kernel(n, nblocks, nops, keep_ref, *refs):
    # refs layout: nops input refs, nops output refs (ANY/HBM), count_ref
    # (SMEM), then scratch: nops staging VMEM, nops carry VMEM, state SMEM,
    # dma sems.
    in_refs = refs[:nops]
    out_refs = refs[nops:2 * nops]
    count_ref = refs[2 * nops]
    staging = refs[2 * nops + 1:3 * nops + 1]
    carry = refs[3 * nops + 1:4 * nops + 1]
    state = refs[4 * nops + 1]             # SMEM (2,): base_row, carry_len
    sems = refs[4 * nops + 2]

    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        state[0] = 0
        state[1] = 0
        for w in range(nops):
            carry[w][:] = jnp.zeros((1, LANES), jnp.int32)

    base_row = state[0]
    carry_len = state[1]

    rows_aug = ROWS + 8   # 8-sublane-aligned: DMA source rows must be %8
    pad_rows = rows_aug - ROWS - 1
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows_aug, LANES), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (rows_aug, LANES), 0)

    # augmented arrays: row 0 = carry, rows 1..ROWS = this block, tail dead
    keep_blk = keep_ref[:]
    flat_in = b * BLOCK + (row - 1) * LANES + lane
    keep_aug = jnp.where(
        row == 0, (lane < carry_len).astype(jnp.int32),
        jnp.where(jnp.logical_and(row <= ROWS, flat_in < n),
                  jnp.concatenate(
                      [jnp.zeros((1, LANES), jnp.int32), keep_blk,
                       jnp.zeros((pad_rows, LANES), jnp.int32)]), _i32(0)))

    vals = []
    zpad = jnp.zeros((pad_rows, LANES), jnp.int32)
    for w in range(nops):
        vals.append(jnp.concatenate([carry[w][:], in_refs[w][:], zpad]))

    # exclusive scan of drops over the row-major flat order
    dropped = 1 - keep_aug
    lane_cs = _cumsum(dropped, axis=1)
    row_tot = lane_cs[:, LANES - 1:LANES]
    row_off = _cumsum(row_tot, axis=0) - row_tot
    dist = lane_cs - dropped + row_off
    # d = remaining distance + 1 for live elements, 0 for dead
    d = jnp.where(keep_aug != 0, dist + 1, _i32(0))

    for stage in range(_ceil_log2(rows_aug * LANES)):
        s = 1 << stage
        sd = _flat_shift(d, s, rows_aug, zero_fill=True)
        moved_in = jnp.logical_and(sd > 0, ((sd - 1) & s) != 0)
        moved_out = jnp.logical_and(d > 0, ((d - 1) & s) != 0)
        d = jnp.where(moved_in, sd - s, jnp.where(moved_out, _i32(0), d))
        vals = [jnp.where(moved_in, _flat_shift(v, s, rows_aug, False), v)
                for v in vals]

    # New running total from the drop-count scans (any jnp.sum/lax.reduce
    # to scalar widens through int64 under jax_enable_x64, which Mosaic
    # cannot lower). keep_aug's carry row holds exactly carry_len ones.
    drops_total = row_off[rows_aug - 1, 0] + row_tot[rows_aug - 1, 0]
    new_total = _i32(rows_aug * LANES) - drops_total

    for w in range(nops):
        staging[w][:] = vals[w]
    for w in range(nops):
        pltpu.make_async_copy(
            staging[w], out_refs[w].at[pl.ds(base_row, rows_aug)],
            sems.at[np.int32(w)]).start()
    for w in range(nops):
        pltpu.make_async_copy(
            staging[w], out_refs[w].at[pl.ds(base_row, rows_aug)],
            sems.at[np.int32(w)]).wait()

    full = jax.lax.div(new_total, _i32(LANES))
    rem = new_total - full * LANES
    for w in range(nops):
        carry[w][:] = staging[w][pl.ds(full, 1), :]
    state[0] = base_row + full
    state[1] = rem

    @pl.when(b == nblocks - 1)
    def _():
        count_ref[0] = (base_row + full) * LANES + rem


def _pad_to(x, size):
    n = x.shape[0]
    if n == size:
        return x
    return jnp.pad(x, (0, size - n))


def _to_words(arr):
    """Split an array into 4-byte i32 route words + a descriptor for
    reassembly.

    8-byte dtypes CANNOT use lax.bitcast_convert_type on TPU (the X64
    rewrite pass lacks 64-bit bitcast — see core/bits.py); the bit
    pattern is taken arithmetically instead (core.bits.to_unsigned_bits)
    and split by shifts. For float64 this canonicalizes -0.0 → +0.0,
    denormals → 0 and NaN payloads → the canonical qNaN — the same
    (sort/hash-benign) canonicalization the engine's f64 key encodings
    already apply."""
    dt = arr.dtype
    if dt == jnp.bool_:
        return [arr.astype(jnp.int32)], ("bool",)
    nbytes = dt.itemsize
    if nbytes <= 2:
        return [arr.astype(jnp.int32)], ("small", dt)
    if nbytes == 4:
        return [jax.lax.bitcast_convert_type(arr, jnp.int32)], ("cast4", dt)
    # 8-byte: arithmetic bit pattern → two u32 halves → i32 route words
    from ...core.bits import to_unsigned_bits
    u = to_unsigned_bits(arr)                     # uint64, TPU-safe
    hi = (u >> jnp.uint64(32)).astype(jnp.uint32)
    lo = (u & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    return [jax.lax.bitcast_convert_type(hi, jnp.int32),
            jax.lax.bitcast_convert_type(lo, jnp.int32)], ("bits8", dt)


def _from_words(words, desc):
    kind = desc[0]
    if kind == "bool":
        return words[0] != 0
    if kind == "small":
        return words[0].astype(desc[1])
    if kind == "cast4":
        return jax.lax.bitcast_convert_type(words[0], desc[1])
    # bits8: reassemble u64 arithmetically, then decode (TPU-safe)
    from ...core.bits import from_unsigned_bits
    hi = jax.lax.bitcast_convert_type(words[0], jnp.uint32).astype(
        jnp.uint64)
    lo = jax.lax.bitcast_convert_type(words[1], jnp.uint32).astype(
        jnp.uint64)
    return from_unsigned_bits((hi << jnp.uint64(32)) | lo, desc[1])


def compact_pallas_supported(arrays) -> bool:
    try:
        for a in arrays:
            if a.dtype.itemsize > 8:
                return False
        return True
    except Exception:  # pragma: no cover
        return False


@functools.partial(jax.jit, static_argnames=("interpret",))
def _run(keep_i32, words, *, interpret=False):
    n = keep_i32.shape[0]
    npad = -(-n // BLOCK) * BLOCK
    nblocks = npad // BLOCK
    keep2 = _pad_to(keep_i32, npad).reshape(nblocks * ROWS, LANES)
    words2 = [_pad_to(w, npad).reshape(nblocks * ROWS, LANES)
              for w in words]
    nops = len(words2)
    out_rows = nblocks * ROWS + ROWS + 16

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((ROWS, LANES),
                               lambda b: (b, jnp.int32(0)),
                               memory_space=pltpu.VMEM)] * (1 + nops),
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * nops +
                  [pl.BlockSpec((1,), lambda b: (jnp.int32(0),),
                                memory_space=pltpu.SMEM)],
        scratch_shapes=(
            [pltpu.VMEM((ROWS + 8, LANES), jnp.int32)] * nops +
            [pltpu.VMEM((1, LANES), jnp.int32)] * nops +
            [pltpu.SMEM((2,), jnp.int32),
             pltpu.SemaphoreType.DMA((nops,))]),
    )
    outs = pl.pallas_call(
        functools.partial(_kernel, n, nblocks, nops),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((out_rows, LANES), jnp.int32)
                   for _ in range(nops)] +
                  [jax.ShapeDtypeStruct((1,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(keep2, *words2)
    word_outs = [o.reshape(-1)[:n] for o in outs[:nops]]
    count = outs[nops][0]
    return word_outs, count


def compact_pallas(arrays, keep, *, interpret: bool = False):
    """Stable stream compaction of 1-D `arrays` by boolean `keep`.

    Returns (compacted arrays — same shapes, survivors first, garbage
    tail; count). Drop-in replacement for
    ops/compaction.py::compact_arrays on TPU."""
    arrays = list(arrays)
    n = keep.shape[0]
    if n == 0:
        return arrays, jnp.int32(0)
    words, descs, spans = [], [], []
    for a in arrays:
        w, desc = _to_words(a)
        spans.append((len(words), len(words) + len(w)))
        descs.append(desc)
        words.extend(w)
    word_outs, count = _run(keep.astype(jnp.int32), words,
                            interpret=interpret)
    outs = [_from_words(word_outs[lo:hi], desc)
            for (lo, hi), desc in zip(spans, descs)]
    return outs, count
