"""Probe: static vs dynamic pltpu.roll cost on the VPU.

Decides whether a strip-hierarchical compaction (in-strip routing + one
dynamic flat rotate per strip to merge) can beat the single-level staged
routing: the hierarchy replaces ~16 data-movement stages by ~3 dynamic
rolls per strip, so it wins iff a dynamic roll costs <~3x a static roll.
Run: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/probe_roll.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, LANES, REPS = 512, 128, 1024


def _kernel_static(x_ref, o_ref):
    x = x_ref[...]
    for i in range(REPS):
        x = pltpu.roll(x, np.int32(1 + (i % 7)), 1) + 1
    o_ref[...] = x


def _kernel_dynamic(s_ref, x_ref, o_ref):
    x = x_ref[...]
    for i in range(REPS):
        x = pltpu.roll(x, s_ref[i % 8], 1) + 1
    o_ref[...] = x


def run(kind):
    x = jnp.arange(ROWS * LANES, dtype=jnp.int32).reshape(ROWS, LANES)
    if kind == "static":
        f = jax.jit(lambda x: pl.pallas_call(
            _kernel_static,
            out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x))
        args = (x,)
    else:
        s = jnp.arange(1, 9, dtype=jnp.int32)
        f = jax.jit(lambda s, x: pl.pallas_call(
            _kernel_dynamic,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)),
            out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.int32))(s, x))
        args = (s, x)

    np.asarray(f(*args))[:1]          # compile+warm

    def t(k):
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = f(*args)
        np.asarray(out)[:1, :1]
        return time.perf_counter() - t0

    k = 16
    w = min(min(t(2 * k), t(2 * k)) - min(t(k), t(k)) for _ in range(3))
    per_call = w / k
    per_roll_ns = per_call / REPS * 1e9
    print(f"{kind}: {per_call*1e6:8.2f} us/call  {per_roll_ns:7.1f} ns/roll"
          f"  ({per_roll_ns / (ROWS/8):0.3f} ns/vreg-roll)")
    return per_roll_ns


if __name__ == "__main__":
    print("devices:", jax.devices())
    s = run("static")
    d = run("dynamic")
    print(f"dynamic/static ratio: {d/s:0.2f}x")
