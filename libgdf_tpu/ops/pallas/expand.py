"""Monotone expand-fill as a Pallas TPU kernel.

The inverse of stream compaction: given STRICTLY INCREASING output
positions `pos[i]` and value words `w[i]` (i < count; tail padded with
a huge sentinel), produce dense outputs of size `cap`:

    out_w[j] = w[i_last(j)],  i_last(j) = max{ i : pos[i] <= j }
    (0 where no source precedes j)

which is exactly `scatter-at-pos + carry-fill-forward` — the expansion
step of the join's many-to-many emit path (ops/join.py general_path)
and of any run-length decode. XLA's scatter costs ~120 ms per 11M->40M
i32 word on v5e (serialized); this kernel replaces BOTH scatters and
the fills with one ~10 ms pass over the output.

≅ reference: the probe kernel's warp-cooperative output writing — each
match emits into a shared output cache flushed at an atomicAdd global
write index (libgdf/src/join/hash/join_kernels.cuh:259-455). On TPU
there are no global atomics; the deterministic emit offsets come from
the exact count pass, and this kernel is the atomics-free materializer
of those offsets.

Structure (mirror of compact2's offset-prefetched pipeline, but output
blocks are single-visit and the INPUT block index is data-dependent):

  1. (XLA) s[b] = searchsorted(pos, b*BLOCK): the contiguous source
     range feeding output block b is [s[b], s[b+1]) — at most BLOCK
     long (positions within a block are unique), spanning at most two
     input blocks.
  2. (kernel, sequential grid over output blocks) load the two input
     blocks, ONE dynamic flat rotate aligns the range to the front,
     then rightward monotone routing sends source r to local slot
     pos[r] - b*BLOCK (>= r because pos is strictly increasing — the
     same staged bit-indexed m-scheme as compact.py, mirrored).
  3. in-block carry-forward fill (log-step pair scans) + a cross-block
     (1, LANES) carry per word.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .compact import LANES, _ceil_log2, _i32
from .scan import _scan_axis_pair

ROWS = 512
BLOCK = ROWS * LANES
_PLACED = 1 << 17               # flag bit riding the routing word
SENTINEL = np.int32(2 ** 30)    # tail positions (never land in a block)


def _flat_shift_right(x, s, rows, zero_fill):
    """y[p] = x[p - s] over the row-major flat order (static s)."""
    if s % LANES == 0:
        k = s // LANES
        y = pltpu.roll(x, np.int32(k), 0)
        if zero_fill:
            r = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
            y = jnp.where(r >= k, y, _i32(0))
        return y
    a = pltpu.roll(x, np.int32(s), 1)          # [r,c] = x[r, (c-s)%128]
    b = pltpu.roll(a, np.int32(1), 0)          # [r,c] = x[r-1, (c-s)%128]
    c = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    y = jnp.where(c >= s, a, b)
    if zero_fill:
        r = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
        flat = r * LANES + c
        y = jnp.where(flat >= s, y, _i32(0))
    return y


def _route_m_right(m, vals, rows, block):
    """Rightward mirror of compact.py::_route_m: element moves RIGHT by
    2^b at stage b iff bit b of its distance is set; m == 0 = dead.

    Stages run MSB-FIRST — the mirror of compaction's LSB-first order.
    Proof sketch: distances are non-decreasing in source rank (pos is
    strictly increasing), so a collision after the high-bit stages
    would force the low bits of two distances to differ by at least
    2^k (the unprocessed span), which a k-bit field cannot do. The
    LSB-first order used by compaction is NOT safe here (measured:
    sources overwrote each other mid-network)."""
    for stage in reversed(range(_ceil_log2(block))):
        s = 1 << stage
        sm = _flat_shift_right(m, s, rows, zero_fill=True)
        moved_in = (sm & np.int32(s)) != 0
        moved_out = (m & np.int32(s)) != 0
        m = jnp.where(moved_in, sm, jnp.where(moved_out, _i32(0), m))
        vals = [jnp.where(moved_in,
                          _flat_shift_right(v, s, rows, zero_fill=False),
                          v) for v in vals]
    return m, vals


def _flat_rot_left_dyn(x, r, rows):
    """Flat rotate-LEFT of (rows, LANES) by TRACED r: out[p] = x[(p+r)%N].
    One dynamic lane roll + two dynamic sublane rolls + select."""
    rr = jax.lax.div(r, _i32(LANES))
    rl = jax.lax.rem(r, _i32(LANES))
    y = pltpu.roll(x, _i32(LANES) - rl, 1)     # [row,c] = x[row,(c+rl)%128]
    z1 = pltpu.roll(y, _i32(rows) - rr, 0)     # rows up by rr
    z2 = pltpu.roll(y, _i32(rows) - rr - 1, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    return jnp.where(lane < _i32(LANES) - rl, z1, z2)


def _kernel(nops, s_ref, *refs):
    # refs: 2*nops input refs (two consecutive blocks per word, pos is
    # word 0), nops-1 out refs, then nops-1 value-carry VMEM rows. The
    # value carries are self-sufficient (unplaced slots fill with the
    # carry row, which propagates itself through empty blocks).
    in_refs = refs[:2 * nops]
    out_refs = refs[2 * nops:3 * nops - 1]
    carry = refs[3 * nops - 1:4 * nops - 2]

    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        for w in range(nops - 1):
            carry[w][...] = jnp.zeros((1, LANES), jnp.int32)

    lo = s_ref[b]
    hi = s_ref[b + 1]
    cnt = hi - lo
    rot = jax.lax.rem(lo, _i32(BLOCK))

    # stack the two input blocks and align the source range to front
    words = []
    for w in range(nops):
        buf = jnp.concatenate([in_refs[2 * w][...],
                               in_refs[2 * w + 1][...]])
        words.append(_flat_rot_left_dyn(buf, rot, 2 * ROWS)[:ROWS])

    row = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1)
    r = row * LANES + lane
    pos = words[0]
    live = r < cnt
    dist = pos - b * _i32(BLOCK) - r            # >= 0 for live sources
    m = jnp.where(live, dist | _i32(_PLACED), _i32(0))
    m, routed = _route_m_right(m, words[1:], ROWS, BLOCK)
    placed = ((m >> 17) & 1).astype(jnp.int32)

    # in-block carry-forward fill + cross-block carry
    for w in range(nops - 1):
        v = jnp.where(placed != 0, routed[w], _i32(0))
        f, v = _scan_axis_pair("carry", placed, v, 1)
        lf, lv = f[:, LANES - 1:LANES], v[:, LANES - 1:LANES]
        lf, lv = _scan_axis_pair("carry", lf, lv, 0)
        ef = pltpu.roll(lf, np.int32(1), 0)
        ev = pltpu.roll(lv, np.int32(1), 0)
        rowi = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 1), 0)
        ef = jnp.where(rowi >= 1, ef, jnp.zeros((ROWS, 1), jnp.int32))
        ev = jnp.where(rowi >= 1, ev, jnp.zeros((ROWS, 1), jnp.int32))
        v = jnp.where(f != 0, v, jnp.where(ef != 0, ev, v))
        f = ef | f
        v = jnp.where(f != 0, v, carry[w][0:1, :])
        out_refs[w][...] = v
        carry[w][...] = jnp.broadcast_to(v[ROWS - 1:ROWS,
                                           LANES - 1:LANES], (1, LANES))


@functools.partial(jax.jit, static_argnames=("cap", "interpret"))
def _run(pos, words, cap, *, interpret=False):
    nblocks = -(-cap // BLOCK)
    cap_pad = nblocks * BLOCK
    n = pos.shape[0]
    npad_in = (-(-n // BLOCK) + 1) * BLOCK      # +1 spare block (i0+1)
    nin = npad_in // BLOCK

    def pad_in(x, fill):
        return jnp.concatenate(
            [x, jnp.full((npad_in - n,), fill, x.dtype)])

    pos_p = pad_in(pos, SENTINEL).reshape(nin * ROWS, LANES)
    words_p = [pad_in(w, 0).reshape(nin * ROWS, LANES) for w in words]

    # source range per output block (tiny: nblocks+1 searches)
    bounds = jnp.searchsorted(
        pad_in(pos, SENTINEL),
        jnp.arange(nblocks + 1, dtype=jnp.int32) * BLOCK).astype(jnp.int32)

    nops = 1 + len(words)
    last_in = nin - 1

    def mk_in_spec(which):
        def idx(b, s_ref):
            blk = jax.lax.div(s_ref[b], jnp.int32(BLOCK)) + which
            return (jnp.minimum(blk, last_in), jnp.int32(0))
        return pl.BlockSpec((ROWS, LANES), idx, memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[mk_in_spec(w) for _ in range(nops) for w in (0, 1)],
        out_specs=[pl.BlockSpec((ROWS, LANES),
                                lambda b, s_ref: (b, jnp.int32(0)),
                                memory_space=pltpu.VMEM)] * len(words),
        scratch_shapes=[pltpu.VMEM((1, LANES), jnp.int32)] * len(words),
    )
    ins = []
    for arr in [pos_p] + words_p:
        ins += [arr, arr]
    outs = pl.pallas_call(
        functools.partial(_kernel, nops),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((nblocks * ROWS, LANES),
                                        jnp.int32)] * len(words),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(bounds, *ins)
    return [o.reshape(-1)[:cap] for o in outs]


def expand_fill_supported(words) -> bool:
    return all(jnp.dtype(w.dtype) == jnp.dtype(jnp.int32) for w in words)


def expand_fill_pallas(pos, words, cap: int, *, interpret: bool = False):
    """out_w[j] = w[i_last(j)] (0 before the first source).

    `pos` must be int32, strictly increasing over the live prefix, with
    tail entries >= cap (use SENTINEL); `words` are int32 arrays of the
    same length. cap must stay below SENTINEL (the caller falls back to
    the XLA scatter path for larger outputs)."""
    if cap == 0:
        return [jnp.zeros((0,), jnp.int32) for _ in words]
    if cap >= int(SENTINEL):
        raise ValueError("expand_fill_pallas: cap >= SENTINEL")
    if not expand_fill_supported(words) or pos.dtype != jnp.int32:
        raise TypeError("expand_fill_pallas wants int32 pos/words")
    return _run(pos, list(words), int(cap), interpret=interpret)
