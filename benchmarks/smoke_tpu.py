"""On-chip smoke of the TPU-only paths CPU tests cannot reach: window
ladder/RANGE at 2M, salted + broadcast joins under shard_map with the
Pallas kernels active (the round-5 check_vma regression class).
Run: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/smoke_tpu.py
"""
import time, numpy as np, jax
from libgdf_tpu import Table, ops
from libgdf_tpu import parallel as par
import pandas as pd

rng = np.random.default_rng(0)

# 1) window functions at 2M on chip (ROW ladder + RANGE sparse table)
n = 2_000_000
part = rng.integers(0, 50, n).astype(np.int32)
order = rng.permutation(n).astype(np.int32)
v = rng.standard_normal(n).astype(np.float32)
t = Table.from_dict({"p": part, "o": order, "v": v})
t0 = time.perf_counter()
out = ops.window_function(t, "v", "min", preceding=10_000,
                          partition_by=["p"], order_by=["o"])
x = np.asarray(out.data)
print(f"window ROW min 2M preceding=10K: {time.perf_counter()-t0:.1f}s (compile+run)")
df = pd.DataFrame({"p": part, "o": order, "v": v})
exp = (df.sort_values("o").groupby("p")["v"].rolling(10_000, min_periods=1)
       .min().reset_index(level=0, drop=True).sort_index().to_numpy())
assert np.allclose(x, exp, rtol=1e-6), "window ROW mismatch"
print("window ROW ok")

t0 = time.perf_counter()
out2 = ops.window_function(t, "v", "sum", preceding=500_000,
                           order_by=["o"], frame="range")
x2 = np.asarray(out2.data)
print(f"window RANGE sum 2M: {time.perf_counter()-t0:.1f}s")
# spot-check 50 rows
so = np.sort(order)
svals = v[np.argsort(order)]
cs = np.cumsum(svals.astype(np.float64))
for i in rng.integers(0, n, 50):
    pos = np.searchsorted(so, order[i])
    lo = np.searchsorted(so, order[i] - 500_000)
    expv = cs[pos] - (cs[lo-1] if lo > 0 else 0.0)
    assert abs(x2[i] - expv) < 1e-3 * max(1, abs(expv)), (i, x2[i], expv)
print("window RANGE ok")

# 2) salted join on chip
mesh = par.make_mesh(1)
nl, nr = 100_000, 5_000
lk = np.where(rng.random(nl) < 0.5, 3, rng.integers(0, 4000, nl)).astype(np.int32)
lv = rng.standard_normal(nl).astype(np.float32)
rk = np.arange(nr, dtype=np.int32)
rv = rng.standard_normal(nr).astype(np.float32)
sl = par.distribute(Table.from_dict({"k": lk, "lv": lv}), mesh)
sr = par.distribute(Table.from_dict({"k": rk, "rv": rv}), mesh)
outj = par.dist_join_salted(mesh, sl, sr, ["k"], ["k"], how="inner",
                            num_bins=64, threshold=3.0)
got = par.collect(outj)
exp = pd.DataFrame({"k": lk, "lv": lv}).merge(pd.DataFrame({"k": rk, "rv": rv}), on="k")
assert got.capacity == len(exp), (got.capacity, len(exp))
print("salted join ok:", got.capacity)

# 3) broadcast join on chip
outb = par.broadcast_join(mesh, sl, sr, ["k"], ["k"],
                          out_capacity_per_shard=2 * nl)
gotb = par.collect(outb)
assert gotb.capacity == len(exp), (gotb.capacity, len(exp))
print("broadcast join ok:", gotb.capacity)
print("ALL TPU SMOKES PASSED")
