import time
import numpy as np
import jax
import jax.numpy as jnp
from libgdf_tpu import Table, ops

rng = np.random.default_rng(0)
n = 10_000_000
k = jnp.asarray(rng.integers(0, 100_000, n).astype(np.int64))
v = jnp.asarray(rng.standard_normal(n).astype(np.float32))


def timeit(fn, *args, reps=3):
    f = jax.jit(fn)
    out = f(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    return (time.perf_counter() - t0) / reps


def full(k, v):
    t = Table.from_dict({"k": k, "v": v})
    out = ops.groupby(t, ["k"], [("v", "sum", "s"), ("v", "count", "n"),
                                 ("v", "avg", "m")])
    return out["s"].data, out.num_rows

print("full groupby sum/count/avg:", timeit(full, k, v))


def sum_only(k, v):
    t = Table.from_dict({"k": k, "v": v})
    out = ops.groupby(t, ["k"], [("v", "sum", "s")])
    return out["s"].data, out.num_rows

print("groupby sum only:", timeit(sum_only, k, v))


from libgdf_tpu.ops.sort import radix_encode

def sort_stage(k):
    enc = radix_encode(k, True)
    dropped = jnp.zeros((n,), jnp.uint8)
    iota = jnp.arange(n, dtype=jnp.int32)
    return jax.lax.sort((dropped, enc, iota), num_keys=2, is_stable=True)[-1]

print("sort stage (u8+u64+i32):", timeit(sort_stage, k))

def sort_stage32(k):
    enc = radix_encode(k.astype(jnp.int32), True)
    iota = jnp.arange(n, dtype=jnp.int32)
    return jax.lax.sort((enc, iota), num_keys=1, is_stable=True)[-1]

print("sort stage (u32+i32):", timeit(sort_stage32, k))

seg = jnp.asarray(np.sort(rng.integers(0, 100_000, n)).astype(np.int32))
vals = v

def segsum(vals, seg):
    return jax.ops.segment_sum(vals, seg, num_segments=100_001,
                               indices_are_sorted=True)

print("segment_sum f32 10M->100k:", timeit(segsum, vals, seg))

def segsum_cumsum(vals, seg):
    c = jnp.cumsum(vals.astype(jnp.float32))
    last = jnp.zeros((100_001,), jnp.float32).at[seg].max(0)  # placeholder
    return c

def segsum64(vals, seg):
    return jax.ops.segment_sum(vals.astype(jnp.float64), seg,
                               num_segments=100_001, indices_are_sorted=True)

print("segment_sum f64 10M->100k:", timeit(segsum64, vals, seg))

def cumsum64(vals):
    return jnp.cumsum(vals.astype(jnp.float64))

print("cumsum f64 10M:", timeit(cumsum64, vals))
print("cumsum f32 10M:", timeit(lambda x: jnp.cumsum(x), vals))
