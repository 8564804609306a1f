"""BASELINE config 5: skewed distributed pipeline.

filter → shuffle hash join → groupby over Zipf-skewed keys, hash-
partitioned across a device mesh. Runs on any mesh: real multi-chip, or
the virtual CPU mesh (JAX_PLATFORMS=cpu with jax_num_cpu_devices=N) —
same code path either way (SURVEY.md §2.8).

Usage: python benchmarks/dist_bench.py [rows_per_shard] [n_devices]
Prints a JSON line with pipeline rows/s and the skew report.
"""
import json
import sys
import time

import numpy as np


def main():
    rows_per_shard = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
    import jax

    n_dev = int(sys.argv[2]) if len(sys.argv) > 2 else len(jax.devices())

    from libgdf_tpu import Table, ops
    from libgdf_tpu import parallel as par

    mesh = par.make_mesh(n_dev)
    n = rows_per_shard * n_dev
    rng = np.random.default_rng(0)

    # Zipf-skewed fact keys (hot keys dominate), uniform dim keys.
    zipf = rng.zipf(1.3, n).astype(np.int64) % 100_000
    fact = Table.from_dict({
        "k": zipf,
        "v": rng.standard_normal(n).astype(np.float32),
    })
    dim = Table.from_dict({
        "k": np.arange(100_000, dtype=np.int64),
        "w": rng.random(100_000).astype(np.float32),
    })
    sf = par.distribute(fact, mesh)
    sd = par.distribute(dim, mesh)

    hist, hot = par.detect_skew(mesh, sf, ["k"], num_bins=n_dev)
    skew_ratio = float(hist.max() / max(hist.mean(), 1.0))

    @jax.jit
    def pipeline(sf, sd):
        def filt(local):
            stencil = ops.compare_scalar(local["v"], -1.0, "gt")
            return ops.filter_table(local, stencil)

        filtered = par.map_shards(mesh, filt, sf)
        joined = par.dist_join(
            mesh, filtered, sd, ["k"], ["k"], how="inner",
            slot_capacity=2 * rows_per_shard,
            out_capacity_per_shard=4 * rows_per_shard)
        return par.dist_groupby(
            mesh, joined, ["k"],
            [("v", "sum", "s"), ("v", "count", "c")],
            slot_capacity=2 * rows_per_shard)

    out = pipeline(sf, sd)  # compile + warm
    total = int(out.total_rows())
    t0 = time.perf_counter()
    iters = 3
    for _ in range(iters):
        out = pipeline(sf, sd)
        _ = np.asarray(out.counts)  # sync
    dt = (time.perf_counter() - t0) / iters

    print(json.dumps({
        "metric": "dist_pipeline_zipf",
        "rows": n,
        "devices": n_dev,
        "groups_out": total,
        "skew_max_over_mean": round(skew_ratio, 2),
        "secs": round(dt, 4),
        "value": round(n / dt),
        "unit": "rows/s",
    }))


if __name__ == "__main__":
    main()
