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


# Routing word layout: bits [0, FLAG_BASE) hold the element's routing
# distance (= #dropped before it; 17 bits covers the largest augmented
# block, (512+8)*128); bits [FLAG_BASE, 31) carry up to MAX_FLAGS bits
# of payload FIELDS through the routing for free — bool validity planes
# (1 bit each) and, when a lone data word's runtime value span fits the
# spare bits, the range-compressed data itself (see fold_candidate in
# ops/compaction.py). Bit 31 stays clear so i32 compares behave.
FLAG_BASE = 17
MAX_FLAGS = 14
_FLAGS_MASK = ((1 << MAX_FLAGS) - 1) << FLAG_BASE


def flag_offsets(flag_widths):
    """Bit offset of each flag field above FLAG_BASE."""
    offs, pos = [], FLAG_BASE
    for wd in flag_widths:
        offs.append(pos)
        pos += wd
    assert pos <= FLAG_BASE + MAX_FLAGS, flag_widths
    return offs


def _route_m(m, vals, rows, block):
    """Monotone binary routing of survivors to the block front.

    `m` packs dist | flags (see FLAG_BASE); m == 0 marks dead slots.
    An element moves left by 2^b at stage b iff bit b of its DIST is
    set — the bit decomposition of the total distance is static, so this
    walks the exact same staged trajectory as the round-4 scheme
    (d = remaining+1, decremented per move) with the per-stage distance
    arithmetic deleted: moved tests are one AND + compare, the update is
    two selects, and bool payloads ride m's high bits through every
    stage at zero marginal cost (the dominant routed word in a null-
    bearing filter was the validity plane). Conflict-freedom is the same
    injectivity argument as before: stable compaction's destination map
    is order-preserving, so no two live elements ever contend for a slot
    at any stage.

    Returns (routed m — flag planes at their routed positions, routed
    vals)."""
    for stage in range(_ceil_log2(block)):
        s = 1 << stage
        sm = _flat_shift(m, s, rows, zero_fill=True)
        moved_in = (sm & np.int32(s)) != 0
        moved_out = (m & np.int32(s)) != 0
        m = jnp.where(moved_in, sm, jnp.where(moved_out, _i32(0), m))
        vals = [jnp.where(moved_in, _flat_shift(v, s, rows, False), v)
                for v in vals]
    return m, vals


def _kernel(n, nblocks, ndata, flag_widths, keep_ref, *refs):
    # refs layout: ndata input refs, nops output refs (ANY/HBM), count_ref
    # (SMEM), then scratch: nops staging VMEM, nops carry VMEM, state SMEM,
    # dma sems — where nops = ndata + len(flag_widths) (flag FIELDS ride
    # the keep word's high bits through routing but get their own
    # staging/carry/output slots at indices ndata..nops).
    nflag = len(flag_widths)
    foffs = flag_offsets(flag_widths)
    nops = ndata + nflag
    in_refs = refs[:ndata]
    out_refs = refs[ndata:ndata + nops]
    count_ref = refs[ndata + nops]
    staging = refs[ndata + nops + 1:ndata + 2 * nops + 1]
    carry = refs[ndata + 2 * nops + 1:ndata + 3 * nops + 1]
    state = refs[ndata + 3 * nops + 1]     # SMEM (2,): base_row, carry_len
    sems = refs[ndata + 3 * nops + 2]

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

    # augmented arrays: row 0 = carry, rows 1..ROWS = this block, tail
    # dead. keep_ref is PACKED: bit 0 = keep, bits FLAG_BASE+ = flag
    # planes; the carry row re-injects the flag carries into the word.
    keep_blk = keep_ref[:]
    flat_in = b * BLOCK + (row - 1) * LANES + lane
    carry_row = (lane[0:1, :] < carry_len).astype(jnp.int32)
    for k in range(nflag):
        carry_row = carry_row | (carry[ndata + k][:] << _i32(foffs[k]))
    keep_aug = jnp.where(
        row == 0, carry_row,
        jnp.where(jnp.logical_and(row <= ROWS, flat_in < n),
                  jnp.concatenate(
                      [jnp.zeros((1, LANES), jnp.int32), keep_blk,
                       jnp.zeros((pad_rows, LANES), jnp.int32)]), _i32(0)))

    vals = []
    zpad = jnp.zeros((pad_rows, LANES), jnp.int32)
    for w in range(ndata):
        vals.append(jnp.concatenate([carry[w][:], in_refs[w][:], zpad]))

    # exclusive scan of drops over the row-major flat order
    keep_bit = keep_aug & 1
    dropped = 1 - keep_bit
    lane_cs = _cumsum(dropped, axis=1)
    row_tot = lane_cs[:, LANES - 1:LANES]
    row_off = _cumsum(row_tot, axis=0) - row_tot
    dist = lane_cs - dropped + row_off
    m = jnp.where(keep_bit != 0, dist | (keep_aug & np.int32(_FLAGS_MASK)),
                  _i32(0))
    m, vals = _route_m(m, vals, rows_aug, rows_aug * LANES)

    # New running total from the drop-count scans (any jnp.sum/lax.reduce
    # to scalar widens through int64 under jax_enable_x64, which Mosaic
    # cannot lower). keep_aug's carry row holds exactly carry_len ones.
    drops_total = row_off[rows_aug - 1, 0] + row_tot[rows_aug - 1, 0]
    new_total = _i32(rows_aug * LANES) - drops_total

    for w in range(ndata):
        staging[w][:] = vals[w]
    for k in range(nflag):
        staging[ndata + k][:] = ((m >> _i32(foffs[k]))
                                 & np.int32((1 << flag_widths[k]) - 1))
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


def split_flag_words(words, descs, spans):
    """Partition route words into (data word indices, flag word indices).

    Flag words are the 1-bit planes (bool arrays): up to MAX_FLAGS of
    them ride the packed keep word's high bits through the routing
    (FLAG_BASE layout) at zero per-stage cost instead of being routed as
    full i32 words. Returns (data_idx, flag_idx)."""
    flag_idx = []
    for (lo, hi), desc in zip(spans, descs):
        if desc[0] == "bool" and len(flag_idx) < MAX_FLAGS:
            flag_idx.append(lo)
    flag_set = set(flag_idx)
    data_idx = [i for i in range(len(words)) if i not in flag_set]
    return data_idx, flag_idx


def pack_keep_word(keep, words, flag_idx):
    """keep bool + 1-bit flag planes -> the packed routing word input.
    (Multi-bit fold fields are OR'd on top by the caller at
    flag_offsets position len(flag_idx) — see ops/compaction.py.)"""
    kw = keep.astype(jnp.int32)
    for k, i in enumerate(flag_idx):
        kw = kw | (words[i].astype(jnp.int32) << (FLAG_BASE + k))
    return kw


def reassemble_words(data_outs, flag_outs, data_idx, flag_idx, nwords):
    """Inverse of the split: word outputs back in original order."""
    out = [None] * nwords
    for o, i in zip(data_outs, data_idx):
        out[i] = o
    for o, i in zip(flag_outs, flag_idx):
        out[i] = o
    return out


@functools.partial(jax.jit, static_argnames=("flag_widths", "interpret"))
def _run(keep_packed, data_words, flag_widths, *, interpret=False):
    n = keep_packed.shape[0]
    npad = -(-n // BLOCK) * BLOCK
    nblocks = npad // BLOCK
    keep2 = _pad_to(keep_packed, npad).reshape(nblocks * ROWS, LANES)
    words2 = [_pad_to(w, npad).reshape(nblocks * ROWS, LANES)
              for w in data_words]
    ndata = len(words2)
    nops = ndata + len(flag_widths)
    out_rows = nblocks * ROWS + ROWS + 16

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((ROWS, LANES),
                               lambda b: (b, jnp.int32(0)),
                               memory_space=pltpu.VMEM)] * (1 + ndata),
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * nops +
                  [pl.BlockSpec((1,), lambda b: (jnp.int32(0),),
                                memory_space=pltpu.SMEM)],
        scratch_shapes=(
            [pltpu.VMEM((ROWS + 8, LANES), jnp.int32)] * nops +
            [pltpu.VMEM((1, LANES), jnp.int32)] * nops +
            [pltpu.SMEM((2,), jnp.int32),
             pltpu.SemaphoreType.DMA((nops,))]),
    )
    outs = pl.pallas_call(
        functools.partial(_kernel, n, nblocks, ndata, flag_widths),
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


def compact_words_via(run, arrays, keep, interpret):
    """Shared wrapper for both compaction kernels: word split, bool
    planes into the routing word, and the DYNAMIC single-word fold —
    when exactly one data word remains and its runtime value span fits
    the spare flag bits, the range-compressed word ALSO rides the
    routing word and the kernel routes ZERO data words (a lax.cond
    picks at runtime; both kernel variants compile — the same
    discipline as the groupby/join key folds). `run(kw, data_words,
    flag_widths, interpret)` -> (outs, count)."""
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
    data_idx, flag_idx = split_flag_words(words, descs, spans)
    base_widths = (1,) * len(flag_idx)
    kw = pack_keep_word(keep, words, flag_idx)
    fold_bits = MAX_FLAGS - len(flag_idx)

    def finish(data_outs, flag_outs, count):
        word_outs = reassemble_words(list(data_outs), list(flag_outs),
                                     data_idx, flag_idx, len(words))
        outs = [_from_words(word_outs[lo:hi], desc)
                for (lo, hi), desc in zip(spans, descs)]
        return outs, count

    if len(data_idx) == 1 and fold_bits >= 4:
        wu = jax.lax.bitcast_convert_type(words[data_idx[0]], jnp.uint32)
        lo = jnp.min(wu)
        fits = (jnp.max(wu) - lo) < jnp.uint32(1 << fold_bits)
        shift = FLAG_BASE + len(flag_idx)

        def folded(_):
            comp = jax.lax.bitcast_convert_type(
                (wu - lo) << jnp.uint32(shift), jnp.int32)
            outs_run, count = run(kw | comp, [],
                                  base_widths + (fold_bits,),
                                  interpret)
            rec = jax.lax.bitcast_convert_type(
                jax.lax.bitcast_convert_type(outs_run[-1],
                                             jnp.uint32) + lo, jnp.int32)
            return (rec,) + tuple(outs_run[:len(flag_idx)]), count

        def plain(_):
            outs_run, count = run(kw, [words[data_idx[0]]], base_widths,
                                  interpret)
            return (outs_run[0],) + tuple(outs_run[1:]), count

        (data0, *flag_outs), count = jax.lax.cond(fits, folded, plain, 0)
        return finish([data0], flag_outs, count)

    outs_run, count = run(kw, [words[i] for i in data_idx], base_widths,
                          interpret)
    return finish(outs_run[:len(data_idx)], outs_run[len(data_idx):],
                  count)


def compact_pallas(arrays, keep, *, interpret: bool = False):
    """Stable stream compaction of 1-D `arrays` by boolean `keep`.

    Returns (compacted arrays — same shapes, survivors first, garbage
    tail; count). Drop-in replacement for
    ops/compaction.py::compact_arrays on TPU."""
    def run(kw, data_words, flag_widths, interp):
        return _run(kw, data_words, flag_widths, interpret=interp)
    return compact_words_via(run, arrays, keep, interpret)
