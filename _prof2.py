import time
import numpy as np
import jax
import jax.numpy as jnp

np_, nb = 10_000_000, 1_000_000
L = np_ + nb
cap = np_


def timeit(fn, *args, k=3):
    out = jax.jit(fn)(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(k):
        out = jax.jit(fn)(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    return (time.perf_counter() - t0) / k


rng = np.random.default_rng(0)
src = jnp.asarray(np.sort(rng.integers(0, cap, L)).astype(np.int32))
payload = jnp.arange(L, dtype=jnp.int32)
big = jnp.asarray(rng.integers(0, 2**30, cap).astype(np.int32))
idx = jnp.asarray(rng.integers(0, L, cap).astype(np.int32))
tbl = jnp.asarray(rng.integers(0, 2**30, L).astype(np.int32))
tbl2 = jnp.stack([tbl, tbl + 1], axis=1)

print("scatter-max 11M->10M:", timeit(
    lambda s, p: jnp.zeros((cap,), jnp.int32).at[s].max(p, mode="drop"), src, payload))
print("cummax 10M:", timeit(lambda x: jax.lax.cummax(x), big))
print("cumsum 11M:", timeit(lambda x: jnp.cumsum(x), payload))
print("gather 10M from 11M (1-wide):", timeit(lambda t, i: jnp.take(t, i), tbl, idx))
print("gather 10M from 11M (2-wide row):", timeit(lambda t, i: t[i], tbl2, idx))
print("sorted gather 10M from 11M:", timeit(lambda t, i: jnp.take(t, i), tbl, jnp.sort(idx)))
