"""BASELINE config 5: skewed distributed pipeline + scaling efficiency.

filter → shuffle hash join → groupby over Zipf-skewed keys, hash-
partitioned across a device mesh. Runs on any mesh: real multi-chip, or
the virtual CPU mesh (JAX_PLATFORMS=cpu with jax_num_cpu_devices=N) —
same code path either way (SURVEY.md §2.8).

Measures the SAME per-shard workload at n_dev=1 and n_dev=N, reporting
rows/s at each plus scaling efficiency = rate_N / (N * rate_1)
(BASELINE target: >= 0.70). The exchange is pipelined (num_batches=2).

Usage: python benchmarks/dist_bench.py [rows_per_shard] [n_devices]
Prints ONE JSON line.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def bench_at(n_dev: int, rows_per_shard: int, num_batches: int = 2,
             variant: str = "plain"):
    import jax

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

    hist, hot = par.detect_skew(mesh, sf, ["k"], num_bins=max(n_dev, 2))
    skew_ratio = float(hist.max() / max(hist.mean(), 1.0))

    aggs = [("v", "sum", "s"), ("v", "count", "c")]

    def filt(local):
        stencil = ops.compare_scalar(local["v"], -1.0, "gt")
        return ops.filter_table(local, stencil)

    if variant == "salted":
        # The engine's actual answer to the config-5 skew clause: plan
        # once eagerly (skew detection + loss-proof sizing), execute the
        # salted join inside the fully-jitted pipeline.
        filtered0 = par.map_shards(mesh, filt, sf)
        plan = par.plan_salted_join(mesh, filtered0, sd, ["k"], ["k"],
                                    how="inner", threshold=3.0)

        def front(sf, sd):
            filtered = par.map_shards(mesh, filt, sf)
            return par.dist_join_salted(mesh, filtered, sd, ["k"], ["k"],
                                        plan=plan)
    else:
        # Exact loss-proof slot sizing, computed eagerly so the jitted
        # pipeline gets static shapes (dist ops validate explicit
        # capacities eagerly and skip the check under trace).
        slot_join = par.exact_slot_capacity(
            mesh, [(sf, ["k"]), (sd, ["k"])], num_batches=num_batches)
        out_cap = 4 * rows_per_shard

        def front(sf, sd):
            filtered = par.map_shards(mesh, filt, sf)
            return par.dist_join(
                mesh, filtered, sd, ["k"], ["k"], how="inner",
                slot_capacity=slot_join, out_capacity_per_shard=out_cap,
                num_batches=num_batches)

    # The groupby exchange's input is the JOIN OUTPUT (whose per-shard
    # distinct-key count can exceed any bound from sf/sd alone — ADVICE
    # r3): run the join eagerly once and size the slot from its actual
    # output, so the fully-jitted pipeline can never silently drop rows.
    slot_gb = par.exact_groupby_slot_capacity(
        mesh, front(sf, sd), ["k"], aggs, num_batches=num_batches)

    @jax.jit
    def pipeline(sf, sd):
        return par.dist_groupby(
            mesh, front(sf, sd), ["k"], aggs,
            slot_capacity=slot_gb, num_batches=num_batches)

    out = pipeline(sf, sd)  # compile + warm
    total = int(out.total_rows())
    t0 = time.perf_counter()
    iters = 3
    for _ in range(iters):
        out = pipeline(sf, sd)
        _ = np.asarray(out.counts)  # sync
    dt = (time.perf_counter() - t0) / iters
    return dict(rows=n, secs=dt, rows_per_s=n / dt, groups_out=total,
                skew_max_over_mean=round(skew_ratio, 2))


def main():
    rows_per_shard = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
    import jax

    # Default to a virtual CPU device mesh: this environment pre-imports
    # jax pinned to the single-chip axon TPU (env vars are too late — see
    # tests/conftest.py), so the multi-device scaling measurement must
    # force the CPU platform through jax.config BEFORE backend init.
    # Set DIST_BENCH_PLATFORM=tpu to run on real multi-chip hardware.
    want = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    if os.environ.get("DIST_BENCH_PLATFORM", "cpu") == "cpu":
        jax.config.update("jax_platforms", "cpu")
        try:
            jax.config.update("jax_num_cpu_devices", want)
        except Exception:
            os.environ["XLA_FLAGS"] = (
                os.environ.get("XLA_FLAGS", "") +
                f" --xla_force_host_platform_device_count={want}")

    n_dev = min(want, len(jax.devices()))

    out = {"metric": "dist_pipeline_zipf", "devices": n_dev,
           "unit": "rows/s"}
    for variant in ("plain", "salted"):
        r1 = bench_at(1, rows_per_shard, variant=variant)
        rN = (bench_at(n_dev, rows_per_shard, variant=variant)
              if n_dev > 1 else r1)
        eff = (rN["rows_per_s"] / (n_dev * r1["rows_per_s"])
               if n_dev > 1 else 1.0)
        entry = {
            "rows": rN["rows"],
            "groups_out": rN["groups_out"],
            "skew_max_over_mean": rN["skew_max_over_mean"],
            "secs": round(rN["secs"], 4),
            "rows_per_s": round(rN["rows_per_s"]),
            "rows_per_s_1dev": round(r1["rows_per_s"]),
            "scaling_efficiency": round(eff, 3),
        }
        out[variant] = entry
    # headline = the plain pipeline (comparable to prior rounds)
    out["value"] = out["plain"]["rows_per_s"]
    out["scaling_efficiency"] = out["plain"]["scaling_efficiency"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
