"""Benchmark runner — BASELINE.json single-chip configs.

Prints ONE JSON line: the geometric mean of per-operator rows/s across
the four single-chip configs (filter / groupby / join / order-by),
with vs_baseline = geomean of (achieved / target) where target is the
BASELINE.md goal of memory-bandwidth-roofline/1.3 per operator on this
chip (v5e HBM ≈ 819 GB/s; roofline bytes/row = minimal input+output
traffic). Per-op detail lands in BENCH_DETAILS.json.
"""
import json
import time

import numpy as np

HBM_GBPS = 819e9  # TPU v5e


def _fetch_scalar(out):
    """Force device execution to completion. NOTE: on the axon remote
    backend jax.block_until_ready returns before execution finishes —
    only fetching data truly synchronizes. The device queue is in-order,
    so fetching one element of the LAST output waits for every dispatched
    program."""
    import jax
    import jax.numpy as jnp
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jnp.ravel(leaf)[:1])


def _time(fn, *args, k1=1, k2=5):
    """Marginal per-iteration time: dispatch k calls then fetch once;
    (t(k2) - t(k1)) / (k2 - k1) cancels the fixed fetch/tunnel overhead
    (~30 ms on axon)."""

    def run(k):
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = fn(*args)
        _fetch_scalar(out)
        return time.perf_counter() - t0

    run(1)  # compile + warm
    t1 = min(run(k1), run(k1))
    t2 = min(run(k2), run(k2))
    return max((t2 - t1) / (k2 - k1), 1e-9)


def main():
    import jax
    import jax.numpy as jnp

    from libgdf_tpu import Table, ops

    rng = np.random.default_rng(0)
    results = {}

    # -- config 1: filter, int32 predicate + null mask, 1M rows ----------
    n = 1_000_000
    a = jnp.asarray(rng.integers(0, 1000, n).astype(np.int32))
    nullm = jnp.asarray(rng.random(n) < 0.1)

    @jax.jit
    def run_filter(a, nullm):
        t = Table.from_dict({"a": a}, nulls={"a": nullm})
        stencil = ops.compare_scalar(t["a"], 500, "lt")
        out = ops.filter_table(t, stencil)
        return out["a"].data, out.num_rows

    dt = _time(run_filter, a, nullm)
    results["filter_1M"] = dict(rows=n, secs=dt, rows_per_s=n / dt,
                                min_bytes_per_row=9)

    # -- config 2: hash groupby sum/count/avg, int64 keys, 10M rows ------
    n = 10_000_000
    k = jnp.asarray(rng.integers(0, 100_000, n).astype(np.int64))
    v = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    @jax.jit
    def run_groupby(k, v):
        t = Table.from_dict({"k": k, "v": v})
        out = ops.groupby(t, ["k"], [("v", "sum", "s"), ("v", "count", "n"),
                                     ("v", "avg", "m")])
        return out["s"].data, out.num_rows

    dt = _time(run_groupby, k, v)
    results["groupby_10M"] = dict(rows=n, secs=dt, rows_per_s=n / dt,
                                  min_bytes_per_row=24)

    # -- config 3: inner join int32 keys 10M x 1M, nullable keys ---------
    np_, nb = 10_000_000, 1_000_000
    pk = jnp.asarray(rng.integers(0, nb, np_).astype(np.int32))
    pnull = jnp.asarray(rng.random(np_) < 0.05)
    bk = jnp.asarray(rng.permutation(nb).astype(np.int32))
    bv = jnp.asarray(rng.standard_normal(nb).astype(np.float32))

    @jax.jit
    def run_join(pk, pnull, bk, bv):
        left = Table.from_dict({"k": pk}, nulls={"k": pnull})
        right = Table.from_dict({"k": bk, "w": bv})
        li, ri, cnt = ops.inner_join(left, right, ["k"], ["k"],
                                     out_capacity=np_)
        return li, ri, cnt

    dt = _time(run_join, pk, pnull, bk, bv)
    results["join_10Mx1M"] = dict(rows=np_, secs=dt, rows_per_s=np_ / dt,
                                  min_bytes_per_row=16)

    # -- config 4: multi-col order-by (int64, float32) desc, 50M rows ----
    n = 50_000_000
    k1 = jnp.asarray(rng.integers(0, 1 << 40, n).astype(np.int64))
    k2 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    k2null = jnp.asarray(rng.random(n) < 0.02)

    @jax.jit
    def run_orderby(k1, k2, k2null):
        t = Table.from_dict({"a": k1, "b": k2}, nulls={"b": k2null})
        return ops.order_by(t, ["a", "b"], ascending=[False, False],
                            nulls_last=True)

    dt = _time(run_orderby, k1, k2, k2null)
    results["orderby_50M"] = dict(rows=n, secs=dt, rows_per_s=n / dt,
                                  min_bytes_per_row=24)

    # -- aggregate ---------------------------------------------------------
    ratios, rates = [], []
    for cfg in results.values():
        target = HBM_GBPS / cfg["min_bytes_per_row"] / 1.3
        cfg["target_rows_per_s"] = target
        cfg["vs_target"] = cfg["rows_per_s"] / target
        ratios.append(cfg["vs_target"])
        rates.append(cfg["rows_per_s"])

    geomean_rate = float(np.exp(np.mean(np.log(rates))))
    geomean_ratio = float(np.exp(np.mean(np.log(ratios))))
    with open("BENCH_DETAILS.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({
        "metric": "single_chip_operator_geomean",
        "value": round(geomean_rate),
        "unit": "rows/s",
        "vs_baseline": round(geomean_ratio, 4),
    }))


if __name__ == "__main__":
    main()
