import time
import numpy as np
import jax
import jax.numpy as jnp
from libgdf_tpu import Table, ops
from libgdf_tpu.ops import join as J
from libgdf_tpu.ops.sort import radix_encode

rng = np.random.default_rng(0)
np_, nb = 10_000_000, 1_000_000
pk = jnp.asarray(rng.integers(0, nb, np_).astype(np.int32))
pnull = jnp.asarray(rng.random(np_) < 0.05)
bk = jnp.asarray(rng.permutation(nb).astype(np.int32))


def timeit(fn, *args, k=3):
    out = jax.jit(fn)(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(k):
        out = jax.jit(fn)(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    return (time.perf_counter() - t0) / k


# stage A: full join_indices
def full(pk, pnull, bk):
    left = Table.from_dict({"k": pk}, nulls={"k": pnull})
    right = Table.from_dict({"k": bk})
    return ops.inner_join(left, right, ["k"], ["k"], out_capacity=np_)

print("full join_indices:", timeit(full, pk, pnull, bk))


# stage B: just the big merged sort
def bigsort(pk, bk):
    n, m = bk.shape[0], pk.shape[0]
    flag = jnp.zeros((n + m,), jnp.uint8)
    keys = jnp.concatenate([radix_encode(bk, True), radix_encode(pk, True)])
    is_query = jnp.concatenate([jnp.zeros((n,), jnp.uint8), jnp.ones((m,), jnp.uint8)])
    back = jnp.concatenate([jnp.arange(n, dtype=jnp.int32), jnp.arange(m, dtype=jnp.int32)])
    ctl = jnp.concatenate([jnp.full((n,), 3, jnp.uint8), jnp.full((m,), 3, jnp.uint8)])
    res = jax.lax.sort((flag, keys, is_query, back, ctl), num_keys=2, is_stable=True)
    return res[1]

print("merged 11M sort (5 ops, 2 keys):", timeit(bigsort, pk, bk))


# stage B2: sort without flag word, 1 key
def sort1(pk, bk):
    keys = jnp.concatenate([radix_encode(bk, True), radix_encode(pk, True)])
    back = jnp.concatenate([jnp.arange(bk.shape[0], dtype=jnp.int32),
                            jnp.arange(pk.shape[0], dtype=jnp.int32)])
    res = jax.lax.sort((keys, back), num_keys=1, is_stable=True)
    return res[0]

print("merged 11M sort (2 ops, 1 key):", timeit(sort1, pk, bk))


# stage C: scatter-max + cummax + gathers on 10M
def emitinv(s_back, run_lower, offsets, emit):
    L = s_back.shape[0]
    cap = np_
    p = jnp.arange(L, dtype=jnp.int32)
    payload = ((p + 1) << 2) | 3
    src = jnp.where(emit > 0, offsets, cap)
    inv0 = jnp.zeros((cap,), jnp.int32).at[src].max(payload, mode="drop")
    inv = jax.lax.cummax(inv0)
    jj = jnp.arange(cap, dtype=jnp.int32)
    base = jax.lax.cummax(jnp.where(inv0 > 0, jj, -1))
    rank = jj - base
    pj = jnp.maximum((inv >> 2) - 1, 0)
    sb_lo = jnp.stack([s_back, run_lower], axis=1)[pj]
    return sb_lo

L = np_ + nb
s_back = jnp.arange(L, dtype=jnp.int32)
run_lower = jnp.zeros((L,), jnp.int32)
emit = jnp.ones((L,), jnp.int32)
offsets = jnp.cumsum(emit) - emit
print("emit inversion (scatter+cummax+2wide gather):",
      timeit(emitinv, s_back, run_lower, offsets.astype(jnp.int32), emit))


# stage D: build sort 1M
def bsort(bk):
    return jax.lax.sort((jnp.zeros_like(bk, shape=(nb,), dtype=jnp.uint8),
                         radix_encode(bk, True),
                         jnp.arange(nb, dtype=jnp.int32)), num_keys=2, is_stable=True)[-1]
print("build sort 1M:", timeit(bsort, bk))
