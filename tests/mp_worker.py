"""Multi-process worker: one of N jax.distributed processes on the CPU
backend (4 local devices each). Run by tests/test_multiprocess.py.

Validates a distributed groupby over a mesh SPANNING PROCESSES against a
pandas oracle via psum'd checksums (per-process collect() is impossible —
remote shards are non-addressable). Exit 0 = this process's view agrees.

≅ SURVEY.md §4's multi-host test prescription (the reference had no
distributed runtime to test, §2.8).
"""
import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)

coordinator = sys.argv[1]
num_procs = int(sys.argv[2])
pid = int(sys.argv[3])

jax.distributed.initialize(coordinator_address=coordinator,
                           num_processes=num_procs, process_id=pid)

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402

from libgdf_tpu import Table  # noqa: E402
from libgdf_tpu import parallel as par  # noqa: E402
from libgdf_tpu.parallel.distributed import distribute_global  # noqa: E402

assert len(jax.devices()) == 4 * num_procs, jax.devices()

mesh = par.make_mesh()  # all global devices
n = 4096
rng = np.random.default_rng(7)  # SAME data on every process
k = rng.integers(0, 300, n).astype(np.int64)
v = rng.standard_normal(n).astype(np.float64)

st = distribute_global(Table.from_dict({"k": k, "v": v}), mesh)
out = par.dist_groupby(mesh, st, ["k"],
                       [("v", "sum", "s"), ("v", "count", "c")])

per = out.capacity // int(mesh.devices.size)


@partial(jax.shard_map, mesh=mesh, in_specs=P(par.DEFAULT_AXIS),
         out_specs=P())
def summarize(stl):
    t = stl.table
    live = jax.numpy.arange(per, dtype=jax.numpy.int32) < stl.counts[0]
    s = jax.numpy.where(live, t["s"].data, 0.0)
    c = jax.numpy.where(live, t["c"].data, 0)
    ks = jax.numpy.where(live, t["k"].data, 0)
    return jax.numpy.stack([
        jax.lax.psum(jax.numpy.sum(s), par.DEFAULT_AXIS),
        jax.lax.psum(jax.numpy.sum(c).astype(jax.numpy.float64),
                     par.DEFAULT_AXIS),
        jax.lax.psum(jax.numpy.sum(live).astype(jax.numpy.float64),
                     par.DEFAULT_AXIS),
        jax.lax.psum(jax.numpy.sum(ks).astype(jax.numpy.float64),
                     par.DEFAULT_AXIS),
    ])


got = np.asarray(summarize(out))
exp = pd.DataFrame({"k": k, "v": v}).groupby("k")["v"].agg(
    ["sum", "count"]).reset_index()

np.testing.assert_allclose(got[0], exp["sum"].sum(), rtol=1e-9)
assert got[1] == exp["count"].sum() == n
assert got[2] == len(exp)  # number of groups
assert got[3] == exp["k"].sum()
print(f"proc {pid}: OK ({int(got[2])} groups over "
      f"{len(jax.devices())} devices, {num_procs} processes)")
