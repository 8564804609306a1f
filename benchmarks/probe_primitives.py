"""Probe the cost of JAX/XLA primitives on the real TPU chip.

Used to choose implementation strategies for the hot operators
(what to build in Pallas vs what XLA already does at speed).
Methodology matches bench.py: marginal time over k dispatches with a
single fetch, cancelling the axon tunnel overhead.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp


def fetch(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jnp.ravel(leaf)[:1])


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


def report(name, dt, nbytes=None, rows=None):
    parts = [f"{name:44s} {dt*1e6:10.1f} us"]
    if nbytes:
        parts.append(f"{nbytes/dt/1e9:8.1f} GB/s")
    if rows:
        parts.append(f"{rows/dt/1e9:8.3f} Grows/s")
    print("  ".join(parts), flush=True)


def main():
    rng = np.random.default_rng(0)

    # -- copy roofline -----------------------------------------------------
    for n in (1 << 20, 1 << 24, 1 << 26):
        x = jnp.asarray(rng.integers(0, 1 << 30, n).astype(np.int32))
        f = jax.jit(lambda x: x + 1)
        dt = timeit(f, x)
        report(f"add1 int32 n={n}", dt, nbytes=2 * 4 * n, rows=n)

    # -- lax.sort ------------------------------------------------------------
    for n in (1 << 20, 1 << 23, 1 << 25):
        x = jnp.asarray(rng.integers(0, 1 << 30, n).astype(np.int32))
        f = jax.jit(lambda x: jax.lax.sort((x, x), num_keys=1)[0])
        dt = timeit(f, x, k1=1, k2=3)
        report(f"lax.sort kv int32 n={n}", dt, rows=n)

    # -- cumsum ----------------------------------------------------------
    for n in (1 << 24, 1 << 26):
        x = jnp.asarray(rng.integers(0, 2, n).astype(np.int32))
        f = jax.jit(lambda x: jnp.cumsum(x))
        dt = timeit(f, x)
        report(f"cumsum int32 n={n}", dt, nbytes=2 * 4 * n, rows=n)

    # -- gather (take) random vs sorted indices ---------------------------
    for n in (1 << 22, 1 << 24):
        x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        idx_r = jnp.asarray(rng.integers(0, n, n).astype(np.int32))
        idx_s = jnp.sort(idx_r)
        f = jax.jit(lambda x, i: jnp.take(x, i))
        dt = timeit(f, x, idx_r)
        report(f"take random idx n={n}", dt, nbytes=3 * 4 * n, rows=n)
        dt = timeit(f, x, idx_s)
        report(f"take sorted idx n={n}", dt, nbytes=3 * 4 * n, rows=n)

    # -- scatter -----------------------------------------------------------
    for n in (1 << 22,):
        x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        perm = jnp.asarray(rng.permutation(n).astype(np.int32))

        def scat(x, idx):
            return jnp.zeros_like(x).at[idx].set(x)

        f = jax.jit(scat)
        dt = timeit(f, x, perm, k1=1, k2=3)
        report(f"scatter perm n={n}", dt, rows=n)

    # -- argsort path used by compaction (sort by 1-bit key) ----------------
    n = 1 << 20
    x = jnp.asarray(rng.integers(0, 1000, n).astype(np.int32))

    def filt_sort(x):
        keep = x < 500
        iota = jnp.arange(n, dtype=jnp.int32)
        _, perm = jax.lax.sort(((~keep).astype(jnp.uint8), iota), num_keys=1,
                               is_stable=True)
        return jnp.take(x, perm), jnp.sum(keep)

    dt = timeit(jax.jit(filt_sort), x, k1=1, k2=3)
    report(f"filter-via-sort n={n}", dt, rows=n)

    def filt_cumsum(x):
        keep = x < 500
        pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
        dst = jnp.where(keep, pos, n - 1)
        out = jnp.zeros_like(x).at[dst].set(x, mode="drop")
        return out, pos[-1] + 1

    dt = timeit(jax.jit(filt_cumsum), x, k1=1, k2=3)
    report(f"filter-via-cumsum-scatter n={n}", dt, rows=n)

    # -- associative_scan segment ops --------------------------------------
    n = 1 << 24
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    seg = jnp.asarray(np.sort(rng.integers(0, 100000, n)).astype(np.int32))

    def segsum(x, seg):
        return jnp.zeros((100000,), x.dtype).at[seg].add(x)

    dt = timeit(jax.jit(segsum), x, seg, k1=1, k2=3)
    report(f"segment-sum scatter-add n={n}", dt, rows=n)

    # -- one-hot matmul groupby (MXU trick) ---------------------------------
    n = 1 << 20
    k = 128
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    g = jnp.asarray(rng.integers(0, k, n).astype(np.int32))

    def onehot_sum(x, g):
        oh = jax.nn.one_hot(g, k, dtype=jnp.bfloat16)
        return jnp.einsum("nk,n->k", oh, x.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    dt = timeit(jax.jit(onehot_sum), x, g, k1=1, k2=3)
    report(f"one-hot-matmul segsum n={n} k={k}", dt, rows=n)


if __name__ == "__main__":
    main()
