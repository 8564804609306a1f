"""1-D prefix scans as Pallas TPU kernels.

Why: XLA's scan lowerings are the axon backend's server-compile bomb —
measured round 4 on a quiet chip at 11M rows: `jnp.cumsum` first-run
105 s (the server compiles lazily at first execution), an
associative_scan-based blocked reformulation >550 s. Sorts compile fast
(50M orderby cold = 27 s), so scans were the reason the join/groupby
bench graphs could not land. A Mosaic-compiled scan kernel's compile
time is flat in n (the grid is a runtime parameter).

Kernels (all inclusive, forward, over the row-major flat order):

  scan_pallas(kind, vals)            kind ∈ {sum, max, min}
  scan_pallas_pair(kind, flags, vals)  kind ∈ {sum, max, min, carry}
      segmented scan: `flags` marks segment heads; "carry" is the
      carry-forward-last-flagged fill (ops/engine.py::last_valid_scan).

Supported value dtypes: int32 / uint32 / float32 (native VPU words).
64-bit dtypes fall back to XLA in the engine wrappers (Mosaic has no
64-bit lanes; x64 emulation would re-introduce the compile bomb).

Structure: sequential grid over (ROWS, LANES) blocks; within a block a
log-step lane scan + row-total scan (pltpu.roll with STATIC shifts);
the cross-block running prefix is carried in a (1, LANES) VMEM scratch.

≅ reference: thrust::inclusive_scan / reduce_by_key uses
(prefixsumops.cu, sqls_rtti_comp.hpp:468-509) — re-expressed for the
8x128 VPU instead of CUB's warp scans."""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .compact import LANES, _i32, _pad_to

ROWS = 512
BLOCK = ROWS * LANES

# identities as PYTHON scalars: they fold into the kernel as compile-time
# constants (a jnp scalar would be a captured tracer, which pallas_call
# rejects).
_IDENT = {
    "sum": lambda dt: 0,
    "max": lambda dt: (-np.inf if jnp.issubdtype(dt, jnp.floating)
                       else int(jnp.iinfo(dt).min)),
    "min": lambda dt: (np.inf if jnp.issubdtype(dt, jnp.floating)
                       else int(jnp.iinfo(dt).max)),
    "carry": lambda dt: 0,
}

_VOP = {
    "sum": lambda a, b: a + b,
    "max": jnp.maximum,
    "min": jnp.minimum,
}


def _scan_axis_val(op, x, axis):
    """Inclusive scan along one axis, static log-step rolls."""
    size = x.shape[axis]
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    s = 1
    while s < size:
        shifted = pltpu.roll(x, np.int32(s), axis)
        x = jnp.where(idx >= s, op(shifted, x), x)
        s <<= 1
    return x


def _scan_axis_pair(kind, f, v, axis):
    """Inclusive PAIR scan: f segment-head flags (i32 0/1), v values.
    combine((fa,va),(fb,vb)) = (fa|fb, fb ? vb : op(va, vb))
    ("carry": op keeps va — carry-forward of the last flagged value)."""
    size = f.shape[axis]
    idx = jax.lax.broadcasted_iota(jnp.int32, f.shape, axis)
    s = 1
    while s < size:
        fs = pltpu.roll(f, np.int32(s), axis)
        vs = pltpu.roll(v, np.int32(s), axis)
        live = idx >= s
        if kind == "carry":
            nv = jnp.where(f != 0, v, vs)
        else:
            nv = jnp.where(f != 0, v, _VOP[kind](vs, v))
        v = jnp.where(live, nv, v)
        f = jnp.where(live, fs | f, f)
        s <<= 1
    return f, v


def _bcast_last(x):
    """(ROWS, LANES) -> (1, LANES) broadcast of the flat-last element."""
    return jnp.broadcast_to(x[ROWS - 1:ROWS, LANES - 1:LANES], (1, LANES))


def _val_kernel(kind, ident, in_ref, out_ref, carry_ref):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        carry_ref[...] = jnp.full((1, LANES), ident, carry_ref.dtype)

    x = in_ref[...]
    # flat scan: lanes within rows, then row totals down rows
    x = _scan_axis_val(_VOP[kind], x, 1)
    row_tot = _scan_axis_val(_VOP[kind], x[:, LANES - 1:LANES], 0)
    row_excl = pltpu.roll(row_tot, np.int32(1), 0)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 1), 0)
    row_excl = jnp.where(rowi >= 1, row_excl,
                         jnp.full((ROWS, 1), ident, x.dtype))
    x = _VOP[kind](row_excl, x)
    x = _VOP[kind](carry_ref[0:1, :], x)
    out_ref[...] = x
    carry_ref[...] = _bcast_last(x)


def _pair_kernel(kind, ident, f_ref, v_ref, out_ref, cf_ref, cv_ref):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        cf_ref[...] = jnp.zeros((1, LANES), jnp.int32)
        cv_ref[...] = jnp.full((1, LANES), ident, cv_ref.dtype)

    f = f_ref[...]
    v = v_ref[...]
    v_orig = v
    f, v = _scan_axis_pair(kind, f, v, 1)
    lf, lv = f[:, LANES - 1:LANES], v[:, LANES - 1:LANES]
    lf, lv = _scan_axis_pair(kind, lf, lv, 0)
    ef = pltpu.roll(lf, np.int32(1), 0)
    ev = pltpu.roll(lv, np.int32(1), 0)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 1), 0)
    ef = jnp.where(rowi >= 1, ef, jnp.zeros((ROWS, 1), jnp.int32))
    ev = jnp.where(rowi >= 1, ev, jnp.full((ROWS, 1), ident, v.dtype))
    # combine row-exclusive prefix (a) into each element (b):
    if kind == "carry":
        v = jnp.where(f != 0, v, ev)
    else:
        v = jnp.where(f != 0, v, _VOP[kind](ev, v))
    f = ef | f
    # combine cross-block carry
    if kind == "carry":
        v = jnp.where(f != 0, v, cv_ref[0:1, :])
    else:
        v = jnp.where(f != 0, v, _VOP[kind](cv_ref[0:1, :], v))
    f = cf_ref[0:1, :] | f
    if kind == "carry":
        # positions with NO flagged element at or before them keep their
        # own value (the fill semantics of engine.last_valid_scan)
        out_ref[...] = jnp.where(f != 0, v, v_orig)
    else:
        out_ref[...] = v
    cf_ref[...] = _bcast_last(f)
    cv_ref[...] = _bcast_last(v)


# ---------------------------------------------------------------------------
# 64-bit SUM scans: an int64/uint64 value is carried as a (hi, lo) uint32
# pair; combine((ha,la),(hb,lb)) = (ha+hb+carry, la+lb) with
# carry = (la+lb) < la — exactly 64-bit wrapping addition, which is
# associative, so the same log-step structure applies. This keeps 64-bit
# sum aggregations on the Mosaic path (XLA's scan lowering at multi-M
# rows is the axon compile bomb; Mosaic has no 64-bit lanes, hence the
# word split). min/max/f64 still fall back to XLA.
# ---------------------------------------------------------------------------


def _add64(ha, la, hb, lb):
    l = la + lb
    carry = (l < la).astype(ha.dtype)
    return ha + hb + carry, l


def _scan_axis_add64(h, low, axis):
    size = h.shape[axis]
    idx = jax.lax.broadcasted_iota(jnp.int32, h.shape, axis)
    s = 1
    while s < size:
        hs = pltpu.roll(h, np.int32(s), axis)
        ls = pltpu.roll(low, np.int32(s), axis)
        nh, nl = _add64(hs, ls, h, low)
        live = idx >= s
        h = jnp.where(live, nh, h)
        low = jnp.where(live, nl, low)
        s <<= 1
    return h, low


def _scan_axis_seg64(f, h, low, axis):
    size = f.shape[axis]
    idx = jax.lax.broadcasted_iota(jnp.int32, f.shape, axis)
    s = 1
    while s < size:
        fs = pltpu.roll(f, np.int32(s), axis)
        hs = pltpu.roll(h, np.int32(s), axis)
        ls = pltpu.roll(low, np.int32(s), axis)
        ah, al = _add64(hs, ls, h, low)
        head = f != 0
        nh = jnp.where(head, h, ah)
        nl = jnp.where(head, low, al)
        live = idx >= s
        h = jnp.where(live, nh, h)
        low = jnp.where(live, nl, low)
        f = jnp.where(live, fs | f, f)
        s <<= 1
    return f, h, low


def _sum64_kernel(h_ref, l_ref, oh_ref, ol_ref, ch_ref, cl_ref):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        ch_ref[...] = jnp.zeros((1, LANES), ch_ref.dtype)
        cl_ref[...] = jnp.zeros((1, LANES), cl_ref.dtype)

    h = h_ref[...]
    low = l_ref[...]
    h, low = _scan_axis_add64(h, low, 1)
    th, tl = _scan_axis_add64(h[:, LANES - 1:LANES],
                              low[:, LANES - 1:LANES], 0)
    eh = pltpu.roll(th, np.int32(1), 0)
    el = pltpu.roll(tl, np.int32(1), 0)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 1), 0)
    eh = jnp.where(rowi >= 1, eh, jnp.zeros((ROWS, 1), h.dtype))
    el = jnp.where(rowi >= 1, el, jnp.zeros((ROWS, 1), low.dtype))
    h, low = _add64(eh, el, h, low)
    h, low = _add64(ch_ref[0:1, :], cl_ref[0:1, :], h, low)
    oh_ref[...] = h
    ol_ref[...] = low
    ch_ref[...] = _bcast_last(h)
    cl_ref[...] = _bcast_last(low)


def _seg_sum64_kernel(f_ref, h_ref, l_ref, oh_ref, ol_ref,
                      cf_ref, ch_ref, cl_ref):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        cf_ref[...] = jnp.zeros((1, LANES), jnp.int32)
        ch_ref[...] = jnp.zeros((1, LANES), ch_ref.dtype)
        cl_ref[...] = jnp.zeros((1, LANES), cl_ref.dtype)

    f = f_ref[...]
    h = h_ref[...]
    low = l_ref[...]
    f, h, low = _scan_axis_seg64(f, h, low, 1)
    lf, lh, ll = (f[:, LANES - 1:LANES], h[:, LANES - 1:LANES],
                  low[:, LANES - 1:LANES])
    lf, lh, ll = _scan_axis_seg64(lf, lh, ll, 0)
    ef = pltpu.roll(lf, np.int32(1), 0)
    eh = pltpu.roll(lh, np.int32(1), 0)
    el = pltpu.roll(ll, np.int32(1), 0)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 1), 0)
    ef = jnp.where(rowi >= 1, ef, jnp.zeros((ROWS, 1), jnp.int32))
    eh = jnp.where(rowi >= 1, eh, jnp.zeros((ROWS, 1), h.dtype))
    el = jnp.where(rowi >= 1, el, jnp.zeros((ROWS, 1), low.dtype))
    head = f != 0
    ah, al = _add64(eh, el, h, low)
    h = jnp.where(head, h, ah)
    low = jnp.where(head, low, al)
    f = ef | f
    head = f != 0
    ah, al = _add64(ch_ref[0:1, :], cl_ref[0:1, :], h, low)
    h = jnp.where(head, h, ah)
    low = jnp.where(head, low, al)
    f = cf_ref[0:1, :] | f
    oh_ref[...] = h
    ol_ref[...] = low
    cf_ref[...] = _bcast_last(f)
    ch_ref[...] = _bcast_last(h)
    cl_ref[...] = _bcast_last(low)


# ---------------------------------------------------------------------------
# f64 SUM scans: a float64 value is carried as a DOUBLE-FLOAT (hi, lo)
# f32 pair (x = hi + lo exactly at split time); the combine is Knuth
# TwoSum on the hi terms with the rounding error folded into lo. Unlike
# the integer pair kernels this is not bit-exact f64 — the combine is
# only quasi-associative — but the scan applies it in a fixed tree
# order, so results are DETERMINISTIC with ~2^-47 relative error
# (validated against numpy f64 in tests/test_pallas_scan.py), versus
# the alternative of XLA's scan lowering: ~100 s+ of server compile per
# multi-M-row instance on axon (PERF.md) for f64 rounding that is
# itself association-order-dependent. |x| must fit float32's exponent
# range (~1e38) — beyond it hi overflows to inf (documented in README).
# ---------------------------------------------------------------------------


def _addff(ha, la, hb, lb):
    """Double-float add: TwoSum(ha, hb) + low-order terms."""
    s = ha + hb
    bv = s - ha
    err = (ha - (s - bv)) + (hb - bv)
    return s, la + lb + err


def _scan_axis_addff(h, low, axis):
    size = h.shape[axis]
    idx = jax.lax.broadcasted_iota(jnp.int32, h.shape, axis)
    s = 1
    while s < size:
        hs = pltpu.roll(h, np.int32(s), axis)
        ls = pltpu.roll(low, np.int32(s), axis)
        nh, nl = _addff(hs, ls, h, low)
        live = idx >= s
        h = jnp.where(live, nh, h)
        low = jnp.where(live, nl, low)
        s <<= 1
    return h, low


def _scan_axis_seg_ff(f, h, low, axis):
    size = f.shape[axis]
    idx = jax.lax.broadcasted_iota(jnp.int32, f.shape, axis)
    s = 1
    while s < size:
        fs = pltpu.roll(f, np.int32(s), axis)
        hs = pltpu.roll(h, np.int32(s), axis)
        ls = pltpu.roll(low, np.int32(s), axis)
        ah, al = _addff(hs, ls, h, low)
        head = f != 0
        nh = jnp.where(head, h, ah)
        nl = jnp.where(head, low, al)
        live = idx >= s
        h = jnp.where(live, nh, h)
        low = jnp.where(live, nl, low)
        f = jnp.where(live, fs | f, f)
        s <<= 1
    return f, h, low


def _sumff_kernel(h_ref, l_ref, oh_ref, ol_ref, ch_ref, cl_ref):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        ch_ref[...] = jnp.zeros((1, LANES), ch_ref.dtype)
        cl_ref[...] = jnp.zeros((1, LANES), cl_ref.dtype)

    h = h_ref[...]
    low = l_ref[...]
    h, low = _scan_axis_addff(h, low, 1)
    th, tl = _scan_axis_addff(h[:, LANES - 1:LANES],
                              low[:, LANES - 1:LANES], 0)
    eh = pltpu.roll(th, np.int32(1), 0)
    el = pltpu.roll(tl, np.int32(1), 0)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 1), 0)
    eh = jnp.where(rowi >= 1, eh, jnp.zeros((ROWS, 1), h.dtype))
    el = jnp.where(rowi >= 1, el, jnp.zeros((ROWS, 1), low.dtype))
    h, low = _addff(eh, el, h, low)
    h, low = _addff(ch_ref[0:1, :], cl_ref[0:1, :], h, low)
    oh_ref[...] = h
    ol_ref[...] = low
    ch_ref[...] = _bcast_last(h)
    cl_ref[...] = _bcast_last(low)


def _seg_sumff_kernel(f_ref, h_ref, l_ref, oh_ref, ol_ref,
                      cf_ref, ch_ref, cl_ref):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        cf_ref[...] = jnp.zeros((1, LANES), jnp.int32)
        ch_ref[...] = jnp.zeros((1, LANES), ch_ref.dtype)
        cl_ref[...] = jnp.zeros((1, LANES), cl_ref.dtype)

    f = f_ref[...]
    h = h_ref[...]
    low = l_ref[...]
    f, h, low = _scan_axis_seg_ff(f, h, low, 1)
    lf, lh, ll = (f[:, LANES - 1:LANES], h[:, LANES - 1:LANES],
                  low[:, LANES - 1:LANES])
    lf, lh, ll = _scan_axis_seg_ff(lf, lh, ll, 0)
    ef = pltpu.roll(lf, np.int32(1), 0)
    eh = pltpu.roll(lh, np.int32(1), 0)
    el = pltpu.roll(ll, np.int32(1), 0)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 1), 0)
    ef = jnp.where(rowi >= 1, ef, jnp.zeros((ROWS, 1), jnp.int32))
    eh = jnp.where(rowi >= 1, eh, jnp.zeros((ROWS, 1), h.dtype))
    el = jnp.where(rowi >= 1, el, jnp.zeros((ROWS, 1), low.dtype))
    head = f != 0
    ah, al = _addff(eh, el, h, low)
    h = jnp.where(head, h, ah)
    low = jnp.where(head, low, al)
    f = ef | f
    head = f != 0
    ah, al = _addff(ch_ref[0:1, :], cl_ref[0:1, :], h, low)
    h = jnp.where(head, h, ah)
    low = jnp.where(head, low, al)
    f = cf_ref[0:1, :] | f
    oh_ref[...] = h
    ol_ref[...] = low
    cf_ref[...] = _bcast_last(f)
    ch_ref[...] = _bcast_last(h)
    cl_ref[...] = _bcast_last(low)


def _split_ff(x):
    """f64 -> (hi f32, lo f32) with x == hi + lo exactly (hi in f32
    range; the residual is representable unless it underflows f32's
    denormal floor, which XLA flushes to zero anyway — core/bits.py)."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo


def _join_ff(hi, lo):
    return hi.astype(jnp.float64) + lo.astype(jnp.float64)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _run_sumff(x, *, interpret=False):
    n = x.shape[0]
    npad = -(-n // BLOCK) * BLOCK
    nblocks = npad // BLOCK
    hi, lo = _split_ff(_pad_to(x, npad))
    h2 = hi.reshape(nblocks * ROWS, LANES)
    l2 = lo.reshape(nblocks * ROWS, LANES)
    oh, ol = pl.pallas_call(
        _sumff_kernel,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((ROWS, LANES), lambda b: (b, jnp.int32(0)),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=[pl.BlockSpec((ROWS, LANES),
                                lambda b: (b, jnp.int32(0)),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((nblocks * ROWS, LANES),
                                        jnp.float32)] * 2,
        scratch_shapes=[pltpu.VMEM((1, LANES), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(h2, l2)
    return _join_ff(oh.reshape(-1)[:n], ol.reshape(-1)[:n])


@functools.partial(jax.jit, static_argnames=("interpret",))
def _run_seg_sumff(flags, x, *, interpret=False):
    n = x.shape[0]
    npad = -(-n // BLOCK) * BLOCK
    nblocks = npad // BLOCK
    f = _pad_to(flags.astype(jnp.int32), npad)
    hi, lo = _split_ff(_pad_to(x, npad))
    f2 = f.reshape(nblocks * ROWS, LANES)
    h2 = hi.reshape(nblocks * ROWS, LANES)
    l2 = lo.reshape(nblocks * ROWS, LANES)
    oh, ol = pl.pallas_call(
        _seg_sumff_kernel,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((ROWS, LANES), lambda b: (b, jnp.int32(0)),
                               memory_space=pltpu.VMEM)] * 3,
        out_specs=[pl.BlockSpec((ROWS, LANES),
                                lambda b: (b, jnp.int32(0)),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((nblocks * ROWS, LANES),
                                        jnp.float32)] * 2,
        scratch_shapes=[pltpu.VMEM((1, LANES), jnp.int32),
                        pltpu.VMEM((1, LANES), jnp.float32),
                        pltpu.VMEM((1, LANES), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(f2, h2, l2)
    return _join_ff(oh.reshape(-1)[:n], ol.reshape(-1)[:n])


def sumff_supported(vals) -> bool:
    return jnp.dtype(vals.dtype) == jnp.dtype(jnp.float64)


def cumsum_f64_pallas(vals, *, interpret: bool = False):
    """Compensated double-float inclusive f64 prefix sum."""
    if vals.shape[0] == 0:
        return vals
    return _run_sumff(vals, interpret=interpret)


def seg_sum_f64_pallas(flags, vals, *, interpret: bool = False):
    """Compensated double-float segmented f64 sum scan."""
    if vals.shape[0] == 0:
        return vals
    return _run_seg_sumff(flags, vals, interpret=interpret)


# --- 64-bit MIN/MAX over order-preserving u64 encodings -------------------
# The caller encodes (ops.sort.radix_encode: int64/f64 -> u64, order-
# preserving), the kernel selects lexicographically on the (hi, lo) u32
# pair — an associative combine — and the caller decodes. Identity:
# (0xffffffff, 0xffffffff) for min, (0, 0) for max.


def _sel64(kind, ha, la, hb, lb):
    """Lexicographic (hi, lo) select: the smaller (min) / larger (max).
    Boolean algebra only — a select BETWEEN bool vectors lowers to an
    i8->i1 truncation Mosaic rejects."""
    a_wins = jnp.logical_or(ha < hb,
                            jnp.logical_and(ha == hb, la < lb))
    if kind == "max64":
        a_wins = jnp.logical_not(a_wins)
    return (jnp.where(a_wins, ha, hb), jnp.where(a_wins, la, lb))


def _scan_axis_sel64(kind, h, low, axis):
    size = h.shape[axis]
    idx = jax.lax.broadcasted_iota(jnp.int32, h.shape, axis)
    s = 1
    while s < size:
        hs = pltpu.roll(h, np.int32(s), axis)
        ls = pltpu.roll(low, np.int32(s), axis)
        nh, nl = _sel64(kind, hs, ls, h, low)
        live = idx >= s
        h = jnp.where(live, nh, h)
        low = jnp.where(live, nl, low)
        s <<= 1
    return h, low


def _scan_axis_seg_sel64(kind, f, h, low, axis):
    size = f.shape[axis]
    idx = jax.lax.broadcasted_iota(jnp.int32, f.shape, axis)
    s = 1
    while s < size:
        fs = pltpu.roll(f, np.int32(s), axis)
        hs = pltpu.roll(h, np.int32(s), axis)
        ls = pltpu.roll(low, np.int32(s), axis)
        ah, al = _sel64(kind, hs, ls, h, low)
        head = f != 0
        nh = jnp.where(head, h, ah)
        nl = jnp.where(head, low, al)
        live = idx >= s
        h = jnp.where(live, nh, h)
        low = jnp.where(live, nl, low)
        f = jnp.where(live, fs | f, f)
        s <<= 1
    return f, h, low


def _ident64(kind):
    return (0xFFFFFFFF, 0xFFFFFFFF) if kind == "min64" else (0, 0)


def _seg_sel64_kernel(kind, f_ref, h_ref, l_ref, oh_ref, ol_ref,
                      cf_ref, ch_ref, cl_ref):
    b = pl.program_id(0)
    ih, il = _ident64(kind)

    @pl.when(b == 0)
    def _():
        cf_ref[...] = jnp.zeros((1, LANES), jnp.int32)
        ch_ref[...] = jnp.full((1, LANES), ih, ch_ref.dtype)
        cl_ref[...] = jnp.full((1, LANES), il, cl_ref.dtype)

    f = f_ref[...]
    h = h_ref[...]
    low = l_ref[...]
    f, h, low = _scan_axis_seg_sel64(kind, f, h, low, 1)
    lf, lh, ll = (f[:, LANES - 1:LANES], h[:, LANES - 1:LANES],
                  low[:, LANES - 1:LANES])
    lf, lh, ll = _scan_axis_seg_sel64(kind, lf, lh, ll, 0)
    ef = pltpu.roll(lf, np.int32(1), 0)
    eh = pltpu.roll(lh, np.int32(1), 0)
    el = pltpu.roll(ll, np.int32(1), 0)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 1), 0)
    ef = jnp.where(rowi >= 1, ef, jnp.zeros((ROWS, 1), jnp.int32))
    eh = jnp.where(rowi >= 1, eh, jnp.full((ROWS, 1), ih, h.dtype))
    el = jnp.where(rowi >= 1, el, jnp.full((ROWS, 1), il, low.dtype))
    head = f != 0
    ah, al = _sel64(kind, eh, el, h, low)
    h = jnp.where(head, h, ah)
    low = jnp.where(head, low, al)
    f = ef | f
    head = f != 0
    ah, al = _sel64(kind, ch_ref[0:1, :], cl_ref[0:1, :], h, low)
    h = jnp.where(head, h, ah)
    low = jnp.where(head, low, al)
    f = cf_ref[0:1, :] | f
    oh_ref[...] = h
    ol_ref[...] = low
    cf_ref[...] = _bcast_last(f)
    ch_ref[...] = _bcast_last(h)
    cl_ref[...] = _bcast_last(low)


@functools.partial(jax.jit, static_argnames=("kind", "interpret"))
def _run_seg_sel64(kind, flags, enc, *, interpret=False):
    n = enc.shape[0]
    npad = -(-n // BLOCK) * BLOCK
    nblocks = npad // BLOCK
    ih, il = _ident64(kind)
    encp = enc
    if npad != n:
        pad_val = (jnp.uint64(ih) << jnp.uint64(32)) | jnp.uint64(il)
        encp = jnp.concatenate([enc, jnp.full((npad - n,), pad_val,
                                              jnp.uint64)])
    f = _pad_to(flags.astype(jnp.int32), npad)
    hi = (encp >> jnp.uint64(32)).astype(jnp.uint32)
    lo = (encp & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    f2 = f.reshape(nblocks * ROWS, LANES)
    h2 = hi.reshape(nblocks * ROWS, LANES)
    l2 = lo.reshape(nblocks * ROWS, LANES)
    oh, ol = pl.pallas_call(
        functools.partial(_seg_sel64_kernel, kind),
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((ROWS, LANES), lambda b: (b, jnp.int32(0)),
                               memory_space=pltpu.VMEM)] * 3,
        out_specs=[pl.BlockSpec((ROWS, LANES),
                                lambda b: (b, jnp.int32(0)),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((nblocks * ROWS, LANES),
                                        jnp.uint32)] * 2,
        scratch_shapes=[pltpu.VMEM((1, LANES), jnp.int32),
                        pltpu.VMEM((1, LANES), jnp.uint32),
                        pltpu.VMEM((1, LANES), jnp.uint32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(f2, h2, l2)
    oh = oh.reshape(-1)[:n].astype(jnp.uint64)
    ol = ol.reshape(-1)[:n].astype(jnp.uint64)
    return (oh << jnp.uint64(32)) | ol


def seg_sel64_pallas(kind, flags, enc_u64, *, interpret: bool = False):
    """Segmented min/max scan over order-preserving u64 encodings.
    kind in {"min64", "max64"}; returns the scanned u64 encodings."""
    if enc_u64.shape[0] == 0:
        return enc_u64
    return _run_seg_sel64(kind, flags, enc_u64, interpret=interpret)


def _split64(x):
    """int64/uint64 -> (hi uint32, lo uint32) via the TPU-safe arithmetic
    bit pattern (64-bit bitcast does not compile on TPU)."""
    from ...core.bits import to_unsigned_bits
    u = to_unsigned_bits(x)
    hi = (u >> jnp.uint64(32)).astype(jnp.uint32)
    lo = (u & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    return hi, lo


def _join64(hi, lo, dtype):
    from ...core.bits import from_unsigned_bits
    u = (hi.astype(jnp.uint64) << jnp.uint64(32)) | lo.astype(jnp.uint64)
    return from_unsigned_bits(u, dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _run_sum64(x, *, interpret=False):
    n = x.shape[0]
    npad = -(-n // BLOCK) * BLOCK
    nblocks = npad // BLOCK
    hi, lo = _split64(_pad_to(x, npad))
    h2 = hi.reshape(nblocks * ROWS, LANES)
    l2 = lo.reshape(nblocks * ROWS, LANES)
    oh, ol = pl.pallas_call(
        _sum64_kernel,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((ROWS, LANES), lambda b: (b, jnp.int32(0)),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=[pl.BlockSpec((ROWS, LANES),
                                lambda b: (b, jnp.int32(0)),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((nblocks * ROWS, LANES),
                                        jnp.uint32)] * 2,
        scratch_shapes=[pltpu.VMEM((1, LANES), jnp.uint32)] * 2,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(h2, l2)
    return _join64(oh.reshape(-1)[:n], ol.reshape(-1)[:n], x.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _run_seg_sum64(flags, x, *, interpret=False):
    n = x.shape[0]
    npad = -(-n // BLOCK) * BLOCK
    nblocks = npad // BLOCK
    f = _pad_to(flags.astype(jnp.int32), npad)
    hi, lo = _split64(_pad_to(x, npad))
    f2 = f.reshape(nblocks * ROWS, LANES)
    h2 = hi.reshape(nblocks * ROWS, LANES)
    l2 = lo.reshape(nblocks * ROWS, LANES)
    oh, ol = pl.pallas_call(
        _seg_sum64_kernel,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((ROWS, LANES), lambda b: (b, jnp.int32(0)),
                               memory_space=pltpu.VMEM)] * 3,
        out_specs=[pl.BlockSpec((ROWS, LANES),
                                lambda b: (b, jnp.int32(0)),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((nblocks * ROWS, LANES),
                                        jnp.uint32)] * 2,
        scratch_shapes=[pltpu.VMEM((1, LANES), jnp.int32),
                        pltpu.VMEM((1, LANES), jnp.uint32),
                        pltpu.VMEM((1, LANES), jnp.uint32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(f2, h2, l2)
    return _join64(oh.reshape(-1)[:n], ol.reshape(-1)[:n], x.dtype)


def sum64_supported(vals) -> bool:
    return jnp.dtype(vals.dtype) in (jnp.dtype(jnp.int64),
                                     jnp.dtype(jnp.uint64))


def cumsum64_pallas(vals, *, interpret: bool = False):
    """Exact inclusive 64-bit prefix sum (int64/uint64)."""
    if vals.shape[0] == 0:
        return vals
    return _run_sum64(vals, interpret=interpret)


def seg_sum64_pallas(flags, vals, *, interpret: bool = False):
    """Exact segmented 64-bit sum scan (int64/uint64)."""
    if vals.shape[0] == 0:
        return vals
    return _run_seg_sum64(flags, vals, interpret=interpret)


def _supported_dtype(dt) -> bool:
    return jnp.dtype(dt) in (jnp.dtype(jnp.int32), jnp.dtype(jnp.uint32),
                             jnp.dtype(jnp.float32))


def scan_pallas_supported(vals, flags=None) -> bool:
    ok = _supported_dtype(vals.dtype)
    if flags is not None:
        ok = ok and flags.dtype in (jnp.bool_, jnp.int32)
    return bool(ok)


@functools.partial(jax.jit,
                   static_argnames=("kind", "interpret"))
def _run_val(kind, x, *, interpret=False):
    n = x.shape[0]
    npad = -(-n // BLOCK) * BLOCK
    nblocks = npad // BLOCK
    ident = _IDENT[kind](x.dtype)
    xp = x
    if npad != n:
        xp = jnp.concatenate([x, jnp.full((npad - n,), ident, x.dtype)])
    x2 = xp.reshape(nblocks * ROWS, LANES)
    out = pl.pallas_call(
        functools.partial(_val_kernel, kind, ident),
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((ROWS, LANES), lambda b: (b, jnp.int32(0)),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((ROWS, LANES), lambda b: (b, jnp.int32(0)),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblocks * ROWS, LANES), x.dtype),
        scratch_shapes=[pltpu.VMEM((1, LANES), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(x2)
    return out.reshape(-1)[:n]


@functools.partial(jax.jit,
                   static_argnames=("kind", "interpret"))
def _run_pair(kind, flags, vals, *, interpret=False):
    n = vals.shape[0]
    npad = -(-n // BLOCK) * BLOCK
    nblocks = npad // BLOCK
    ident = _IDENT[kind](vals.dtype)
    f = _pad_to(flags.astype(jnp.int32), npad)
    v = vals
    if npad != n:
        v = jnp.concatenate([v, jnp.full((npad - n,), ident, v.dtype)])
    f2 = f.reshape(nblocks * ROWS, LANES)
    v2 = v.reshape(nblocks * ROWS, LANES)
    out = pl.pallas_call(
        functools.partial(_pair_kernel, kind, ident),
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((ROWS, LANES), lambda b: (b, jnp.int32(0)),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((ROWS, LANES), lambda b: (b, jnp.int32(0)),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblocks * ROWS, LANES),
                                       vals.dtype),
        scratch_shapes=[pltpu.VMEM((1, LANES), jnp.int32),
                        pltpu.VMEM((1, LANES), vals.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(f2, v2)
    return out.reshape(-1)[:n]


def scan_pallas(kind: str, vals, *, interpret: bool = False):
    """Inclusive 1-D scan (sum/max/min) of a 4-byte array."""
    if vals.shape[0] == 0:
        return vals
    return _run_val(kind, vals, interpret=interpret)


def scan_pallas_pair(kind: str, flags, vals, *, interpret: bool = False):
    """Inclusive segmented scan ("sum"/"max"/"min", `flags` = segment
    heads) or flagged carry-forward fill ("carry"). Returns values only
    (the scanned flag word is an implementation detail)."""
    if vals.shape[0] == 0:
        return vals
    return _run_pair(kind, flags, vals, interpret=interpret)
