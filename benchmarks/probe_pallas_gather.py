"""Can Mosaic lower dynamic gathers inside a Pallas TPU kernel, and how fast?

Tests, in increasing generality:
  1. take_along_axis within lanes     (axis=-1, per-row 128-lane gather)
  2. take_along_axis across sublanes  (axis=0)
  3. flat jnp.take of a VMEM-resident table by a vector of indices
"""
import functools
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fetch(out):
    np.asarray(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[:1])


def timeit(fn, *args, k1=2, k2=10):
    def run(k):
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = fn(*args)
        fetch(out)
        return time.perf_counter() - t0
    run(1)
    t1 = min(run(k1), run(k1))
    t2 = min(run(k2), run(k2))
    return max((t2 - t1) / (k2 - k1), 1e-9)


def try_case(name, build):
    try:
        fn, args, check = build()
        out = fn(*args)
        ok = check(np.asarray(out))
        dt = timeit(fn, *args)
        n = args[1].size
        print(f"{name:46s} ok={ok}  {dt*1e6:9.1f} us  {n/dt/1e9:7.3f} Grows/s",
              flush=True)
    except Exception as e:
        msg = str(e).split(chr(10))[0][:120]
        print(f"{name:46s} FAILED: {type(e).__name__}: {msg}", flush=True)


rng = np.random.default_rng(0)


# --- 1. lane gather: out[i, j] = x[i, idx[i, j]] ---------------------------
def build_lane_gather():
    M, N = 1024, 128
    x = jnp.asarray(rng.standard_normal((M, N)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, N, (M, N)).astype(np.int32))

    def kernel(x_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=1)

    @jax.jit
    def f(x, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, idx)

    def check(out):
        xe, ie = np.asarray(x), np.asarray(idx)
        return np.array_equal(out, np.take_along_axis(xe, ie, axis=1))
    return f, (x, idx), check


# --- 2. sublane gather: out[i, j] = x[idx[i, j], j] ------------------------
def build_sublane_gather():
    M, N = 1024, 128
    x = jnp.asarray(rng.standard_normal((M, N)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, M, (M, N)).astype(np.int32))

    def kernel(x_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=0)

    @jax.jit
    def f(x, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, idx)

    def check(out):
        xe, ie = np.asarray(x), np.asarray(idx)
        return np.array_equal(out, np.take_along_axis(xe, ie, axis=0))
    return f, (x, idx), check


# --- 3. flat take: table of 64K floats, 1M random indices ------------------
def build_flat_take():
    T, M, N = 1 << 16, 8192, 128
    table = jnp.asarray(rng.standard_normal(T).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, T, (M, N)).astype(np.int32))

    def kernel(t_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take(t_ref[:], idx_ref[:], axis=0)

    @jax.jit
    def f(table, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(idx.shape, table.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table, idx)

    def check(out):
        return np.array_equal(out, np.asarray(table)[np.asarray(idx)])
    return f, (table, idx), check


# --- 4. flat take via 2D reshape: table (512,128), gather by row+lane -----
def build_take_2d_decomp():
    # gather from table[r, c] where flat = r*128 + c, using lane gather for c
    # after selecting rows... needs both axes dynamic; try take_along_axis
    # composition: first gather rows (axis 0), then lanes (axis 1).
    TR, TC = 512, 128
    M, N = 8192, 128
    table = jnp.asarray(rng.standard_normal((TR, TC)).astype(np.float32))
    flat_idx = jnp.asarray(
        rng.integers(0, TR * TC, (M, N)).astype(np.int32))

    def kernel(t_ref, idx_ref, o_ref):
        idx = idx_ref[:]
        t = t_ref[:]
        out = jnp.take(t.reshape(-1), idx, axis=0)
        o_ref[:] = out

    @jax.jit
    def f(table, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(idx.shape, table.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table, flat_idx)

    def check(out):
        return np.array_equal(
            out, np.asarray(table).reshape(-1)[np.asarray(flat_idx)])
    return f, (table, flat_idx), check


if __name__ == "__main__":
    try_case("lane gather take_along_axis(axis=1)", build_lane_gather)
    try_case("sublane gather take_along_axis(axis=0)", build_sublane_gather)
    try_case("flat take 64K-table 1M idx", build_flat_take)
    try_case("flat take 2d-reshaped table", build_take_2d_decomp)
