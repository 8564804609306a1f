"""Stream compaction, take 2: offset-prefetched block pipeline.

≅ reference `gpu_apply_stencil` (libgdf/src/streamcompactionops.cu:163-260,
thrust::copy_if) — redesigned for TPU; supersedes the v1 kernel
(compact.py) whose per-block cost grew super-linearly with grid size
(measured v5e: 59 µs/block at 16 blocks → 1.2 ms/block + 1022 s compile
at 168 blocks). v1's suspects — SMEM state carried across a sequential
grid, manual DMA at dynamic offsets into one big ANY-space output — are
all gone here:

  1. (XLA) per-block survivor counts = one reshape+sum over the keep
     mask; exclusive cumsum gives each block's global output offset.
     This replaces v1's in-kernel SMEM running state.
  2. (Pallas, grid over blocks) each step routes its block's survivors
     to the block front (the same monotone binary routing as v1: the
     stable-compaction destination map is injective + order-preserving,
     so staged power-of-2 shifts are conflict-free), then merges them
     into a 2-block VMEM accumulator at the block's offset-within-
     output-block — ONE dynamic flat rotate (3 pltpu.rolls + selects)
     per array instead of v1's per-element carry bookkeeping.
  3. The output rides a REGULAR blocked out_spec whose index_map reads
     the prefetched offsets (PrefetchScalarGridSpec): consecutive steps
     revisit the same output block until it completes; Pallas flushes it
     when the index advances — no manual DMA, no ANY memory, and the
     pipeline can overlap fetch/compute/flush normally.

The count output equals the true survivor total (the tail of the output
buffer past it is garbage — the capacity+count convention of
core/table.py)."""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .compact import (FLAG_BASE, LANES, _ceil_log2, _cumsum, _flat_shift,
                      flag_offsets,
                      _FLAGS_MASK, _from_words, _i32, _pad_to, _route_m,
                      _to_words, pack_keep_word, reassemble_words,
                      split_flag_words)

ROWS = 512                     # rows per block
BLOCK = ROWS * LANES           # elements per grid step


def _flat_rot_right_dyn(x, r):
    """Flat rotate-right of the row-major (rows, LANES) view by a TRACED
    element count r in [0, rows*LANES): out[p] = x[(p - r) mod N].
    Decomposes into one dynamic lane roll + two dynamic sublane rolls +
    one select (dynamic rolls lower to Mosaic dynamic rotates — slower
    than static rolls, but O(1) of them per block)."""
    rows = x.shape[0]
    rr = jax.lax.div(r, _i32(LANES))
    rl = jax.lax.rem(r, _i32(LANES))
    y = pltpu.roll(x, rl, 1)            # y[row, c] = x[row, (c - rl)%128]
    z1 = pltpu.roll(y, rr, 0)           # rows down by rr
    z2 = pltpu.roll(y, rr + 1, 0)       # rows down by rr+1 (lane borrow)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    return jnp.where(lane >= rl, z1, z2)


def _kernel(ndata, flag_widths, rows, q_ref, r_ref, cnt_ref, qn_ref,
            keep_ref, *refs):
    block = rows * LANES
    nflag = len(flag_widths)
    foffs = flag_offsets(flag_widths)
    nops = ndata + nflag
    in_refs = refs[:ndata]
    out_refs = refs[ndata:ndata + nops]
    acc = refs[ndata + nops:ndata + 2 * nops]  # VMEM (2*rows, LANES)/word

    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        for w in range(nops):
            acc[w][...] = jnp.zeros((2 * rows, LANES), jnp.int32)

    # --- within-block monotone routing: survivors to the block front.
    # keep_ref is PACKED (bit 0 = keep, high bits = bool flag planes
    # riding the routing word — see compact.py FLAG_BASE). ---
    keep_word = keep_ref[...]
    keep = keep_word & 1
    dropped = 1 - keep
    lane_cs = _cumsum(dropped, axis=1)
    row_tot = lane_cs[:, LANES - 1:LANES]
    row_off = _cumsum(row_tot, axis=0) - row_tot
    dist = lane_cs - dropped + row_off
    m = jnp.where(keep != 0, dist | (keep_word & np.int32(_FLAGS_MASK)),
                  _i32(0))
    vals = [in_refs[w][...] for w in range(ndata)]
    m, vals = _route_m(m, vals, rows, block)
    vals = vals + [(m >> _i32(foffs[k]))
                   & np.int32((1 << flag_widths[k]) - 1)
                   for k in range(nflag)]

    # --- merge into the 2-block accumulator at [r, r+cnt) ---
    r = r_ref[b]
    cnt = cnt_ref[b]
    row2 = jax.lax.broadcasted_iota(jnp.int32, (2 * rows, LANES), 0)
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (2 * rows, LANES), 1)
    pos = row2 * LANES + lane2
    in_range = jnp.logical_and(pos >= r, pos < r + cnt)
    zpad = jnp.zeros((rows, LANES), jnp.int32)
    for w in range(nops):
        ext = jnp.concatenate([vals[w], zpad])
        rot = _flat_rot_right_dyn(ext, r)
        acc[w][...] = jnp.where(in_range, rot, acc[w][...])

    # --- stage the current output block; flushed when q advances ---
    for w in range(nops):
        out_refs[w][...] = acc[w][0:rows]

    # --- crossing into the next output block: shift the accumulator ---
    @pl.when(qn_ref[b] != q_ref[b])
    def _():
        for w in range(nops):
            a = pltpu.roll(acc[w][...], np.int32(rows), 0)
            acc[w][...] = jnp.where(row2 < rows, a, _i32(0))


@functools.partial(jax.jit, static_argnames=("flag_widths", "interpret"))
def _run(keep_packed, data_words, flag_widths, *, interpret=False):
    n = keep_packed.shape[0]
    nflag = len(flag_widths)
    nops = len(data_words) + nflag
    # VMEM budget: each output word needs ~3x a (2*rows, LANES) i32
    # buffer (accumulator + double-buffered in/out); shrink the block
    # when many words ride one compaction (8 words at rows=512 blew the
    # 16 MB scoped-vmem limit). nops*rows <= 2048 keeps the proven
    # rows=512 geometry for <=4 words.
    rows = ROWS
    while nops * rows > 2048 and rows > 64:
        rows //= 2
    block = rows * LANES
    npad = -(-n // block) * block
    nblocks = npad // block
    keep2 = _pad_to(keep_packed, npad).reshape(nblocks * rows, LANES)
    words2 = [_pad_to(w, npad).reshape(nblocks * rows, LANES)
              for w in data_words]
    ndata = len(words2)

    # offsets pre-pass (XLA): per-block survivor counts + exclusive scan
    counts = jnp.sum(keep2.reshape(nblocks, block) & 1, axis=1,
                     dtype=jnp.int32)
    off = jnp.cumsum(counts, dtype=jnp.int32) - counts
    total = off[-1] + counts[-1]
    q = off // block                    # output block being accumulated
    r = off - q * block                 # offset within it
    # One EXTRA grid step flushes the final spill: when the last input
    # block crosses an output-block boundary, the spilled survivors sit
    # in the accumulator with no step left to stage them. The extra step
    # merges nothing (cnt=0) and stages block q_extra = the block holding
    # `total` (clamped; garbage territory when total lands on a boundary).
    q_extra = jnp.minimum(total // block, nblocks - 1)
    q = jnp.concatenate([q, q_extra[None]])
    r = jnp.concatenate([r, jnp.zeros((1,), jnp.int32)])
    counts_k = jnp.concatenate([counts, jnp.zeros((1,), jnp.int32)])
    qn = jnp.concatenate([q[1:], q[-1:]])

    last = nblocks - 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nblocks + 1,),
        in_specs=[pl.BlockSpec((rows, LANES),
                               lambda b, *_: (jnp.minimum(b, last), jnp.int32(0)),
                               memory_space=pltpu.VMEM)] * (1 + ndata),
        out_specs=[pl.BlockSpec((rows, LANES),
                                lambda b, q_ref, *_: (q_ref[b], jnp.int32(0)),
                                memory_space=pltpu.VMEM)] * nops,
        scratch_shapes=[pltpu.VMEM((2 * rows, LANES), jnp.int32)] * nops,
    )
    outs = pl.pallas_call(
        functools.partial(_kernel, ndata, flag_widths, rows),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((nblocks * rows, LANES), jnp.int32)
                   for _ in range(nops)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(q, r, counts_k, qn, keep2, *words2)
    word_outs = [o.reshape(-1)[:n] for o in outs]
    return word_outs, total


def compact_pallas2(arrays, keep, *, interpret: bool = False):
    """Stable stream compaction of 1-D `arrays` by boolean `keep`.

    Returns (compacted arrays — same shapes, survivors first, garbage
    tail; count). Drop-in replacement for
    ops/compaction.py::compact_arrays on TPU."""
    from .compact import compact_words_via

    def run(kw, data_words, flag_widths, interp):
        return _run(kw, data_words, flag_widths, interpret=interp)
    return compact_words_via(run, arrays, keep, interpret)
