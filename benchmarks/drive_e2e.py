"""End-to-end drive on the real TPU: filter -> join -> groupby ->
sort_table -> quantile, asserted against a pandas oracle.

The /verify recipe for this repo: run as
    PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/drive_e2e.py
(the axon plugin path must stay on PYTHONPATH; the repo root must be
added because script-dir is benchmarks/)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import numpy as np
import pandas as pd

import jax
import jax.numpy as jnp

import libgdf_tpu
from libgdf_tpu import Table, ops

print("devices:", jax.devices())
rng = np.random.default_rng(7)
n, nb = 200_000, 20_000

fact = pd.DataFrame({
    "k": rng.integers(0, nb, n).astype(np.int32),
    "v": rng.standard_normal(n).astype(np.float32),
})
dim = pd.DataFrame({
    "k": np.arange(nb, dtype=np.int32),
    "w": rng.random(nb).astype(np.float32),
})

t = Table.from_dict({"k": jnp.asarray(fact.k.values),
                     "v": jnp.asarray(fact.v.values)})
d = Table.from_dict({"k": jnp.asarray(dim.k.values),
                     "w": jnp.asarray(dim.w.values)})

# filter
stencil = ops.compare_scalar(t["v"], 0.0, "gt")
ft = ops.filter_table(t, stencil)
ref = fact[fact.v > 0.0]
assert int(ft.row_count()) == len(ref), (int(ft.row_count()), len(ref))
print("filter ok:", len(ref))

# join (materialized)
ft = ft.compact()
j = ops.join(ft, d, ["k"], ["k"], how="inner")
jref = ref.merge(dim, on="k", how="inner")
assert int(j.row_count()) == len(jref), (int(j.row_count()), len(jref))
print("join ok:", len(jref))

# groupby
g = ops.groupby(j.compact(), ["k"], [("v", "sum", "s"), ("v", "count", "c")])
gref = jref.groupby("k", as_index=False).agg(s=("v", "sum"), c=("v", "size"))
assert int(g.row_count()) == len(gref)
gc = g.compact()
gk = np.asarray(gc["k"].data)
gs = np.asarray(gc["s"].data)
order = np.argsort(gk)
refo = gref.sort_values("k")
np.testing.assert_array_equal(gk[order], refo.k.values)
np.testing.assert_allclose(gs[order], refo.s.values, rtol=2e-4, atol=2e-4)
print("groupby ok:", len(gref))

# sort_table
st = ops.sort_table(gc, ["s"], ascending=False)
ss = np.asarray(st["s"].data)
np.testing.assert_allclose(ss, np.sort(gref.s.values)[::-1], rtol=1e-6)
print("sort ok")

# quantile
q = ops.quantile_exact(gc["s"], 0.5, method="linear")
print("median:", float(q), "pandas:", float(gref.s.quantile(0.5)))
np.testing.assert_allclose(float(q), float(gref.s.quantile(0.5)), rtol=2e-4)
print("ALL E2E CHECKS PASSED")
