"""Capability probe: which Mosaic/Pallas features lower + run on this chip.

Run on the real TPU (axon). Each probe is tiny and independently gated so
one failure doesn't kill the rest."""
import functools
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name):
    def deco(fn):
        def run():
            t0 = time.perf_counter()
            try:
                fn()
                print(f"OK   {name}  ({time.perf_counter()-t0:.1f}s)", flush=True)
            except Exception as e:
                msg = str(e).split("\n")[0][:160]
                print(f"FAIL {name}: {type(e).__name__}: {msg}", flush=True)
        return run
    return deco


@probe("dyn_vmem_store_1d")  # ref[pl.ds(dyn, K)] = v on flat (N,) VMEM scratch
def p1():
    def kernel(x_ref, o_ref):
        def body(s_ref):
            s_ref[:] = jnp.zeros_like(s_ref)
            start = jnp.sum(x_ref[0, :1]).astype(jnp.int32)  # dynamic 0
            s_ref[pl.ds(start + 3, 8), :] = x_ref[:8, :]
            o_ref[:] = s_ref[:x_ref.shape[0], :]
        pl.run_scoped(body, pltpu.VMEM((32, 128), jnp.int32))
    x = jnp.zeros((16, 128), jnp.int32)
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((16, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)
    np.asarray(out)


@probe("cumsum_axis0_and_1")
def p2():
    def kernel(x_ref, o_ref):
        a = jnp.cumsum(x_ref[:], axis=0)
        b = jnp.cumsum(a, axis=1)
        o_ref[:] = b
    x = jnp.ones((64, 128), jnp.int32)
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((64, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)
    assert int(np.asarray(out)[-1, -1]) == 64 * 128


@probe("onehot_matmul_i32_payload")
def p3():
    # stable-compaction within a 256-tile via one-hot fp32 matmul
    def kernel(x_ref, keep_ref, o_ref):
        v = x_ref[:]                      # (2,128) i32
        keep = keep_ref[:] != 0
        flat_keep = keep.astype(jnp.float32)
        # dest = exclusive cumsum over row-major flattened (2,128)
        cs1 = jnp.cumsum(flat_keep, axis=1)
        rows = jnp.cumsum(jnp.sum(flat_keep, axis=1, keepdims=True), axis=0)
        dest = (cs1 - flat_keep + jnp.concatenate(
            [jnp.zeros((1, 1), jnp.float32), rows[:-1]], axis=0)).astype(jnp.int32)
        B = 256
        flatv = v.reshape(B)
        flatd = dest.reshape(B)
        flatk = keep.reshape(B)
        j = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
        onehot = ((flatd[:, None] == j) & flatk[:, None]).astype(jnp.float32)
        lo = (flatv & 0xffff).astype(jnp.float32)
        hi = ((flatv >> 16) & 0xffff).astype(jnp.float32)
        out_lo = jax.lax.dot_general(lo[None, :], onehot, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)[0]
        out_hi = jax.lax.dot_general(hi[None, :], onehot, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)[0]
        res = (out_lo.astype(jnp.int32) | (out_hi.astype(jnp.int32) << 16))
        o_ref[:] = res.reshape(2, 128)
    x = jnp.arange(256, dtype=jnp.int32).reshape(2, 128) * 100001
    keep = (jnp.arange(256, dtype=jnp.int32) % 3 == 0).reshape(2, 128).astype(jnp.int32)
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((2, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x, keep)
    got = np.asarray(out).reshape(-1)
    exp = (np.arange(256) * 100001)[np.arange(256) % 3 == 0].astype(np.int32)
    np.testing.assert_array_equal(got[:len(exp)], exp)


@probe("dma_hbm_dyn_offset")
def p4():
    # DMA VMEM scratch -> HBM out at dynamic sublane offset, sequential grid
    def kernel(x_ref, o_ref, stage, sem, off_ref):
        b = pl.program_id(0)

        @pl.when(b == 0)
        def _():
            off_ref[0] = 0
        stage[:] = x_ref[:] + 1000
        start = off_ref[0]
        dma = pltpu.make_async_copy(stage, o_ref.at[pl.ds(start, 8)], sem)
        dma.start()
        dma.wait()
        off_ref[0] = start + 5  # overlapping writes; later blocks overwrite
    x = jnp.arange(24 * 128, dtype=jnp.int32).reshape(24, 128)
    out = pl.pallas_call(
        kernel,
        grid=(3,),
        out_shape=jax.ShapeDtypeStruct((24, 128), jnp.int32),
        in_specs=[pl.BlockSpec((8, 128), lambda b: (b, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.int32),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SMEM((1,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(x)
    got = np.asarray(out)
    # block b writes rows [5b, 5b+8) = x[8b:8b+8]+1000; later overwrite earlier
    exp0 = np.arange(24 * 128).reshape(24, 128)
    assert (got[5, :] == exp0[8, :] + 1000).all(), got[:, 0]


@probe("dyn_gather_vmem")
def p5():
    def kernel(x_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=1)
    x = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
    idx = jnp.flip(jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1), 1)
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x, idx)
    got = np.asarray(out)
    assert got[0, 0] == 127, got[0, :4]


@probe("smem_carry_across_grid")
def p6():
    def kernel(x_ref, o_ref, acc_ref):
        b = pl.program_id(0)

        @pl.when(b == 0)
        def _():
            acc_ref[0] = 0
        acc_ref[0] = acc_ref[0] + jnp.sum(x_ref[:])
        o_ref[0, 0] = acc_ref[0]
    x = jnp.ones((4 * 8, 128), jnp.int32)
    out = pl.pallas_call(
        kernel,
        grid=(4,),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        in_specs=[pl.BlockSpec((8, 128), lambda b: (b, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )(x)
    assert int(np.asarray(out)[0, 0]) == 4 * 8 * 128


@probe("dyn_trip_fori_loop")
def p7():
    def kernel(x_ref, o_ref):
        n = (x_ref[0, 0] & 7) + 2  # dynamic
        def body(i, acc):
            return acc + x_ref[i & 7, :]
        o_ref[0, :] = jax.lax.fori_loop(0, n, body, jnp.zeros((128,), jnp.int32))
    x = jnp.ones((8, 128), jnp.int32)
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)
    assert int(np.asarray(out)[0, 0]) == 3


if __name__ == "__main__":
    for fn in [p1, p2, p3, p4, p5, p6, p7]:
        fn()
