"""Randomized end-to-end pipeline property test.

filter → join → groupby → order_by over random shapes/dtypes/null
densities, validated row-for-row against a pandas oracle. Catches
operator-interaction regressions the per-op oracle tests cannot (e.g.
capacity+count padding flowing into a downstream op, key folds
interacting with validity).

≅ the reference's integration pytest style (libgdf/python/tests/) with
randomized parameters instead of fixed seeds per test.
"""
import numpy as np
import pandas as pd
import pytest

from libgdf_tpu import Table, ops


@pytest.mark.parametrize("seed", [1, 2, 3])
@pytest.mark.parametrize("kdt", [np.int32, np.int64])
def test_pipeline_fuzz(seed, kdt):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(500, 3000))
    m = int(rng.integers(50, 400))
    nkeys = int(rng.integers(5, 60))
    # occasionally stretch int64 keys past 2^32 to hit the general
    # (uncompressed) sort branches of the join/groupby key folds
    stretch = kdt == np.int64 and seed % 2 == 1
    keys = rng.integers(0, nkeys, n).astype(kdt)
    if stretch:
        keys = keys + (keys % 3).astype(kdt) * kdt(1 << 40)
    knull = rng.random(n) < rng.uniform(0, 0.2)
    v = rng.standard_normal(n).astype(np.float32)
    vnull = rng.random(n) < rng.uniform(0, 0.2)
    thresh = float(np.quantile(v, rng.uniform(0.2, 0.8)))

    dk = np.unique(rng.integers(0, nkeys, m).astype(kdt))
    if stretch:
        dk = dk + (dk % 3).astype(kdt) * kdt(1 << 40)
        dk = np.unique(dk)
    w = rng.standard_normal(len(dk)).astype(np.float32)

    fact = Table.from_dict({"k": keys, "v": v},
                           nulls={"k": knull, "v": vnull})
    dim = Table.from_dict({"k": dk, "w": w})

    # engine pipeline
    filt = ops.filter_table(fact, ops.compare_scalar(fact["v"], thresh,
                                                     "lt"))
    joined = ops.join(filt, dim, ["k"], ["k"], how="inner",
                      out_capacity=n)
    gb = ops.groupby(joined, ["k"], [("v", "sum", "s"),
                                     ("v", "count", "c"),
                                     ("w", "max", "hi")]).compact()

    # pandas oracle (NULL semantics: null keys never join; filter needs
    # a valid, passing stencil value; count counts non-null v)
    pdf = pd.DataFrame({
        "k": np.where(knull, np.nan, keys.astype(np.float64)),
        "v": np.where(vnull, np.nan, v.astype(np.float64)),
        "vs": v.astype(np.float64), "vnull": vnull})
    keep = (~vnull) & (v < thresh)
    pdf = pdf[keep]
    ddf = pd.DataFrame({"k": dk.astype(np.float64),
                        "w": w.astype(np.float64)})
    j = pdf.merge(ddf, on="k", how="inner")
    g = j.groupby("k", sort=True).agg(s=("v", "sum"), c=("v", "count"),
                                      hi=("w", "max"))

    assert gb.capacity == len(g), (gb.capacity, len(g))
    np.testing.assert_array_equal(
        np.asarray(gb["k"].data).astype(np.float64), g.index.to_numpy())
    np.testing.assert_allclose(np.asarray(gb["s"].data),
                               g["s"].to_numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(gb["c"].data),
                                  g["c"].to_numpy())
    np.testing.assert_allclose(np.asarray(gb["hi"].data),
                               g["hi"].to_numpy(), rtol=1e-6)

    # order_by the groupby result descending by sum, nulls last
    perm = ops.order_by(gb, ["s"], ascending=False, nulls_last=True)
    got_sorted = np.asarray(gb["s"].data)[np.asarray(perm)]
    np.testing.assert_allclose(
        got_sorted, np.sort(g["s"].to_numpy())[::-1], rtol=1e-4,
        atol=1e-4)
