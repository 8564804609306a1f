"""Groupby tests vs pandas oracles.

≅ reference tests/groupby/groupby-test.cu:228-441: host std::map oracle,
with the contention stress regimes (AllKeysSame / AllKeysDifferent /
WarpKeysSame / BlockKeysSame) — irrelevant to a segment reduction but kept
as shape coverage."""
import jax
import numpy as np
import pandas as pd
import pytest

from libgdf_tpu import GDFError, Table, ops


def _oracle(keys_df, vals, op):
    df = keys_df.copy()
    df["v"] = vals
    g = df.groupby(list(keys_df.columns), sort=True)["v"]
    return getattr(g, {"avg": "mean"}.get(op, op))()


@pytest.mark.parametrize("op", ["sum", "min", "max", "avg", "count"])
def test_groupby_single_key(op, rng):
    n = 1000
    keys = rng.integers(0, 37, n).astype(np.int64)
    vals = rng.integers(0, 100, n).astype(np.int64)
    t = Table.from_dict({"k": keys, "v": vals})
    out = ops.groupby(t, ["k"], [("v", op, "agg")]).compact()
    expect = _oracle(pd.DataFrame({"k": keys}), vals, op)
    got_k = np.asarray(out["k"].data)
    got_v = np.asarray(out["agg"].data)
    np.testing.assert_array_equal(got_k, expect.index.to_numpy())
    if op == "avg":
        np.testing.assert_allclose(got_v, expect.to_numpy(), rtol=1e-12)
    else:
        np.testing.assert_array_equal(got_v, expect.to_numpy())


@pytest.mark.parametrize("regime", ["all_same", "all_different", "warp",
                                    "block"])
def test_groupby_contention_regimes(regime, rng):
    """≅ groupby-test.cu:369-441 key-distribution stress shapes."""
    n = 4096
    if regime == "all_same":
        keys = np.zeros(n, np.int64)
    elif regime == "all_different":
        keys = np.arange(n, dtype=np.int64)
    elif regime == "warp":
        keys = (np.arange(n) // 32).astype(np.int64)
    else:
        keys = (np.arange(n) // 256).astype(np.int64)
    vals = rng.integers(0, 10, n).astype(np.int64)
    t = Table.from_dict({"k": keys, "v": vals})
    out = ops.groupby(t, ["k"], [("v", "sum", "s")]).compact()
    expect = _oracle(pd.DataFrame({"k": keys}), vals, "sum")
    np.testing.assert_array_equal(np.asarray(out["s"].data),
                                  expect.to_numpy())


def test_groupby_multi_key_multi_agg(rng):
    n = 800
    k1 = rng.integers(0, 5, n).astype(np.int32)
    k2 = rng.integers(0, 7, n).astype(np.int64)
    v = rng.standard_normal(n).astype(np.float64)
    t = Table.from_dict({"k1": k1, "k2": k2, "v": v})
    out = ops.groupby(t, ["k1", "k2"],
                      [("v", "sum", "s"), ("v", "min", "lo"),
                       ("v", "max", "hi"), ("v", "count", "n")]).compact()
    df = pd.DataFrame({"k1": k1, "k2": k2, "v": v})
    g = df.groupby(["k1", "k2"], sort=True)["v"]
    np.testing.assert_allclose(np.asarray(out["s"].data),
                               g.sum().to_numpy(), rtol=1e-12)
    np.testing.assert_array_equal(np.asarray(out["lo"].data),
                                  g.min().to_numpy())
    np.testing.assert_array_equal(np.asarray(out["hi"].data),
                                  g.max().to_numpy())
    np.testing.assert_array_equal(np.asarray(out["n"].data),
                                  g.count().to_numpy())


def test_groupby_dropna_and_null_aggs(rng):
    n = 500
    keys = rng.integers(0, 10, n).astype(np.int64)
    knull = rng.random(n) < 0.2
    vals = rng.standard_normal(n).astype(np.float64)
    vnull = rng.random(n) < 0.3
    t = Table.from_dict({"k": keys, "v": vals},
                        nulls={"k": knull, "v": vnull})
    out = ops.groupby(t, ["k"], [("v", "sum", "s"), ("v", "count", "n"),
                                 ("v", "avg", "m")]).compact()
    df = pd.DataFrame({"k": np.where(knull, np.nan, keys),
                       "v": np.where(vnull, np.nan, vals)})
    g = df.groupby("k", sort=True)["v"]
    np.testing.assert_allclose(np.asarray(out["s"].data),
                               g.sum().to_numpy(), rtol=1e-12, atol=1e-12)
    np.testing.assert_array_equal(np.asarray(out["n"].data),
                                  g.count().to_numpy())
    m_vals, m_null = out["m"].to_numpy_masked()
    expect_mean = g.mean().to_numpy()
    has = ~np.isnan(expect_mean)
    np.testing.assert_allclose(m_vals[has], expect_mean[has], rtol=1e-12)
    np.testing.assert_array_equal(m_null, ~has)


def test_groupby_keep_nulls_each_own_group(rng):
    """dropna=False: NULL != NULL ⇒ every null-key row is its own group
    (the semantics gdf_table::rows_equal implies, gdf_table.cuh:588-591)."""
    keys = np.asarray([1, 1, 2, 3], np.int64)
    knull = np.asarray([False, False, True, True])
    vals = np.asarray([10, 20, 30, 40], np.int64)
    t = Table.from_dict({"k": keys, "v": vals}, nulls={"k": knull})
    out = ops.groupby(t, ["k"], [("v", "sum", "s")], dropna=False).compact()
    assert out.capacity == 3  # {1}, {null@2}, {null@3}
    s = sorted(np.asarray(out["s"].data).tolist())
    assert s == [30, 30, 40]


def test_groupby_null_key_inside_valid_run(rng):
    """Regression (round-5 advisor finding): a null-key row whose DATA
    equals a live key must not split that key's group. Round 4 carried
    key-null flags as sort payload, so the unstable sort could interleave
    the null row inside the equal-data run (k=5 with one interleaved null
    yielded sums [1,2,7] instead of [8,2]). The flags now sort inside the
    key words."""
    keys = np.asarray([5, 5, 5, 5, 2], np.int64)
    knull = np.asarray([False, False, True, False, False])
    vals = np.asarray([1, 3, 7, 4, 2], np.int64)
    t = Table.from_dict({"k": keys, "v": vals}, nulls={"k": knull})
    out = ops.groupby(t, ["k"], [("v", "sum", "s")], dropna=False).compact()
    assert out.capacity == 3  # {2}, {5}, {null@2}
    kv, kn = out["k"].to_numpy_masked()
    s = np.asarray(out["s"].data)
    # valid-key groups sort first (by key), null groups last
    np.testing.assert_array_equal(kn, [False, False, True])
    np.testing.assert_array_equal(kv[:2], [2, 5])
    np.testing.assert_array_equal(s, [2, 8, 7])


def test_groupby_null_key_multikey_runs(rng):
    """Same regression, multi-key: nulls in the SECOND key column with
    equal data must not fragment the (k1, k2) runs around them."""
    k1 = np.asarray([1, 1, 1, 1, 1, 2], np.int64)
    k2 = np.asarray([7, 7, 7, 7, 7, 7], np.int32)
    k2null = np.asarray([False, True, False, True, False, False])
    vals = np.asarray([1, 10, 2, 20, 4, 8], np.int64)
    t = Table.from_dict({"k1": k1, "k2": k2, "v": vals},
                        nulls={"k2": k2null})
    out = ops.groupby(t, ["k1", "k2"], [("v", "sum", "s")],
                      dropna=False).compact()
    assert out.capacity == 4  # (1,7), (1,null), (1,null), (2,7)
    s = sorted(np.asarray(out["s"].data).tolist())
    assert s == [7, 8, 10, 20]


def test_groupby_wide_key_range_general_branch(rng):
    """int64 keys spanning more than 2^32: the dynamic payload-fold
    cond must take the general (2-operand) sort branch and still match
    pandas exactly."""
    n = 400
    base = rng.integers(0, 20, n).astype(np.int64)
    keys = np.where(base < 10, base, base + (np.int64(1) << 40))
    keys[0] = -(np.int64(1) << 52)       # stretch the span, negative too
    vals = rng.integers(-100, 100, n).astype(np.int64)
    t = Table.from_dict({"k": keys, "v": vals})
    out = ops.groupby(t, ["k"], [("v", "sum", "s")]).compact()
    g = pd.DataFrame({"k": keys, "v": vals}).groupby("k", sort=True)["v"]
    np.testing.assert_array_equal(np.asarray(out["k"].data),
                                  g.sum().index.to_numpy())
    np.testing.assert_array_equal(np.asarray(out["s"].data),
                                  g.sum().to_numpy())


def test_groupby_i32_keys_static_fold(rng):
    """Exactly-32-bit key fields with no flag bits: the first payload
    statically rides the key word's free low half (1-operand sort).
    With null keys a drop bit pushes the fields to 33 bits, so that
    shape takes the plain path — both must match pandas."""
    n = 600
    keys = rng.integers(-1000, 1000, n).astype(np.int32)
    vals = rng.standard_normal(n).astype(np.float32)
    t = Table.from_dict({"k": keys, "v": vals})
    out = ops.groupby(t, ["k"], [("v", "sum", "s")]).compact()
    g = pd.DataFrame({"k": keys, "v": vals}).groupby(
        "k", sort=True)["v"].sum()
    np.testing.assert_allclose(
        np.asarray(out["s"].data).astype(np.float64),
        g.to_numpy(), rtol=1e-5)

    knull = rng.random(n) < 0.15
    t2 = Table.from_dict({"k": keys, "v": vals}, nulls={"k": knull})
    out2 = ops.groupby(t2, ["k"], [("v", "sum", "s")]).compact()
    df = pd.DataFrame({"k": np.where(knull, np.nan, keys), "v": vals})
    g2 = df.groupby("k", sort=True)["v"].sum()
    np.testing.assert_allclose(
        np.asarray(out2["s"].data)[:len(g2)].astype(np.float64),
        g2.to_numpy(), rtol=1e-5)


def test_count_distinct(rng):
    keys = rng.integers(0, 23, 500).astype(np.int32)
    t = Table.from_dict({"k": keys})
    assert int(ops.count_distinct_keys(t, ["k"])) == len(np.unique(keys))


def test_groupby_respects_num_rows(rng):
    """Groupby on a filtered (capacity+count) table."""
    keys = np.asarray([0, 0, 1, 1, 2, 2], np.int64)
    vals = np.asarray([1, 2, 3, 4, 5, 6], np.int64)
    t = Table.from_dict({"k": keys, "v": vals})
    t = ops.filter_table(t, ops.compare_scalar(t["v"], 5, "lt"))
    out = ops.groupby(t, ["k"], [("v", "sum", "s")]).compact()
    np.testing.assert_array_equal(np.asarray(out["k"].data), [0, 1])
    np.testing.assert_array_equal(np.asarray(out["s"].data), [3, 7])


def test_groupby_under_jit(rng):
    keys = rng.integers(0, 8, 256).astype(np.int64)
    vals = rng.integers(0, 50, 256).astype(np.int64)
    t = Table.from_dict({"k": keys, "v": vals})

    @jax.jit
    def f(t):
        return ops.groupby(t, ["k"], [("v", "sum", "s")])

    out = f(t).compact()
    expect = _oracle(pd.DataFrame({"k": keys}), vals, "sum")
    np.testing.assert_array_equal(np.asarray(out["s"].data),
                                  expect.to_numpy())


def test_quantiles(rng):
    x = rng.standard_normal(999).astype(np.float64)
    from libgdf_tpu import Column
    col = Column.from_array(x)
    for method, interp in [("linear", "linear"), ("lower", "lower"),
                           ("higher", "higher"), ("midpoint", "midpoint"),
                           ("nearest", "nearest")]:
        for q in [0.0, 0.25, 0.5, 0.77, 1.0]:
            got = float(ops.quantile_exact(col, q, method))
            expect = np.quantile(x, q, method=interp)
            assert np.isclose(got, expect), (method, q)


def test_quantile_with_nulls(rng):
    x = rng.standard_normal(500).astype(np.float64)
    null = rng.random(500) < 0.3
    from libgdf_tpu import Column
    col = Column.from_masked(x, null)
    got = float(ops.quantile_exact(col, 0.5, "linear"))
    expect = np.quantile(x[~null], 0.5)
    assert np.isclose(got, expect)


# ---------------------------------------------------------------------------
# Window functions (≅ the reference's gpu_window_function, which was left
# incomplete and compiled out — windowedops.cu:46-148; finished here)
# ---------------------------------------------------------------------------

def test_window_running_sum_partitioned(rng):
    import pandas as pd
    n = 500
    part = rng.integers(0, 7, n).astype(np.int32)
    order = rng.permutation(n).astype(np.int32)
    v = rng.standard_normal(n)
    t = Table.from_dict({"p": part, "o": order, "v": v})
    out = ops.window_function(t, "v", "sum", preceding=None,
                              partition_by=["p"], order_by=["o"])
    df = pd.DataFrame({"p": part, "o": order, "v": v})
    expect = df.sort_values("o").groupby("p")["v"].cumsum()
    expect = expect.sort_index().to_numpy()
    np.testing.assert_allclose(np.asarray(out.data), expect, rtol=1e-9)


@pytest.mark.parametrize("red,pd_fn", [
    ("sum", "sum"), ("min", "min"), ("max", "max"), ("count", "count"),
    ("avg", "mean"), ("var", "var"), ("stddev", "std"),
])
def test_window_rolling_matches_pandas(rng, red, pd_fn):
    import pandas as pd
    n, w = 300, 5
    part = rng.integers(0, 4, n).astype(np.int32)
    order = rng.permutation(n).astype(np.int32)
    v = rng.standard_normal(n)
    t = Table.from_dict({"p": part, "o": order, "v": v})
    out = ops.window_function(t, "v", red, preceding=w,
                              partition_by=["p"], order_by=["o"])
    df = pd.DataFrame({"p": part, "o": order, "v": v})
    g = (df.sort_values("o").groupby("p")["v"]
         .rolling(w, min_periods=1))
    expect = getattr(g, pd_fn)().reset_index(level=0, drop=True)
    expect = expect.sort_index().to_numpy()
    got = np.asarray(out.data)
    if red in ("var", "stddev"):
        # pandas uses ddof=1; the engine uses population (ddof=0) like
        # the reference's enum implies no ddof option — convert.
        cnt = (df.sort_values("o").groupby("p")["v"]
               .rolling(w, min_periods=1).count()
               .reset_index(level=0, drop=True).sort_index().to_numpy())
        pop_var = expect ** 2 * (cnt - 1) / np.maximum(cnt, 1) \
            if red == "stddev" else expect * (cnt - 1) / np.maximum(cnt, 1)
        expect = np.sqrt(pop_var) if red == "stddev" else pop_var
        expect = np.where(cnt >= 1, expect, np.nan)
        got = np.where(np.isnan(expect), np.nan, got)
    np.testing.assert_allclose(got, expect, rtol=1e-7, atol=1e-9,
                               equal_nan=True)


def test_window_nulls_skipped(rng):
    n = 64
    v = rng.standard_normal(n)
    null = rng.random(n) < 0.3
    t = Table.from_dict({"o": np.arange(n, dtype=np.int32), "v": v},
                        nulls={"v": null})
    out = ops.window_function(t, "v", "sum", preceding=4, order_by=["o"])
    got = np.asarray(out.data)
    vv = np.where(null, 0.0, v)
    for i in range(n):
        lo = max(0, i - 3)
        np.testing.assert_allclose(got[i], vv[lo:i + 1].sum(), rtol=1e-9)


@pytest.mark.parametrize("w", [1, 2, 7, 8, 50])
@pytest.mark.parametrize("red", ["min", "max"])
def test_window_minmax_ladder_widths(rng, red, w):
    """The O(n log p) two-block ladder across power-of-2 edge widths
    (w=8: the second block is a zero shift; w=1: empty ladder) and
    partition boundaries."""
    import pandas as pd
    n = 400
    part = rng.integers(0, 5, n).astype(np.int32)
    order = rng.permutation(n).astype(np.int32)
    v = rng.standard_normal(n)
    t = Table.from_dict({"p": part, "o": order, "v": v})
    out = ops.window_function(t, "v", red, preceding=w,
                              partition_by=["p"], order_by=["o"])
    df = pd.DataFrame({"p": part, "o": order, "v": v})
    g = df.sort_values("o").groupby("p")["v"].rolling(w, min_periods=1)
    expect = getattr(g, red)().reset_index(level=0, drop=True)
    expect = expect.sort_index().to_numpy()
    np.testing.assert_allclose(np.asarray(out.data), expect, rtol=1e-12)


@pytest.mark.parametrize("red", ["sum", "min", "max", "count", "avg"])
def test_window_range_frame(rng, red):
    """GDF_WINDOW_RANGE: frame = rows of the partition whose order VALUE
    is within [o_i - delta, o_i]; numpy loop oracle."""
    n, delta = 300, 7
    part = rng.integers(0, 4, n).astype(np.int32)
    order = rng.integers(0, 60, n).astype(np.int32)  # with ties
    v = rng.standard_normal(n)
    t = Table.from_dict({"p": part, "o": order, "v": v})
    out = ops.window_function(t, "v", red, preceding=delta,
                              partition_by=["p"], order_by=["o"],
                              frame="range")
    got = np.asarray(out.data)
    from libgdf_tpu.ops.hashing import hash_columns
    ph = np.asarray(hash_columns([t["p"]]))
    sidx = np.lexsort((order, ph))  # the engine's (hash, order) sort
    expect = np.empty(n)
    for pos, i in enumerate(sidx):
        in_frame = [j for j in sidx[:pos + 1]
                    if part[j] == part[i] and order[i] - delta <= order[j]]
        # ties ABOVE the current row in sort order are excluded (frame
        # ends at the current ROW, like SQL RANGE ... AND CURRENT ROW
        # over a stable sort); include tied rows at or before pos
        vals = v[in_frame]
        if red == "sum":
            expect[i] = vals.sum()
        elif red == "min":
            expect[i] = vals.min()
        elif red == "max":
            expect[i] = vals.max()
        elif red == "count":
            expect[i] = len(vals)
        else:
            expect[i] = vals.mean()
    np.testing.assert_allclose(got, expect, rtol=1e-9, atol=1e-12)


def test_window_range_frame_floats_no_partition(rng):
    n, delta = 200, 0.5
    order = np.sort(rng.standard_normal(n)).astype(np.float64)
    v = rng.standard_normal(n)
    t = Table.from_dict({"o": order, "v": v})
    out = ops.window_function(t, "v", "sum", preceding=delta,
                              order_by=["o"], frame="range")
    got = np.asarray(out.data)
    for i in range(n):
        mask = (order >= order[i] - delta) & (np.arange(n) <= i)
        np.testing.assert_allclose(got[i], v[mask].sum(), rtol=1e-9)


def test_window_range_full_span_power_of_two(rng):
    """Regression (round-5 review): with n a power of two and a delta
    covering the whole partition, the per-row sparse-table level reaches
    log2(n) — one level short returned NaN for the last row."""
    n = 8
    order = np.arange(n, dtype=np.int32)
    v = np.asarray([5, 1, 9, 4, 2, 8, 0, 3], np.float64)
    t = Table.from_dict({"o": order, "v": v})
    out = ops.window_function(t, "v", "min", preceding=100,
                              order_by=["o"], frame="range")
    got = np.asarray(out.data)
    exp = np.minimum.accumulate(v)
    np.testing.assert_array_equal(got, exp)


def test_window_range_rejects_negative_delta():
    t = Table.from_dict({"o": np.arange(4, dtype=np.int32),
                         "v": np.arange(4, dtype=np.float64)})
    with pytest.raises(GDFError):
        ops.window_function(t, "v", "sum", preceding=-5,
                            order_by=["o"], frame="range")


def test_window_range_requires_single_order_key():
    t = Table.from_dict({"o": np.arange(4, dtype=np.int32),
                         "o2": np.arange(4, dtype=np.int32),
                         "v": np.arange(4, dtype=np.float64)})
    with pytest.raises(GDFError):
        ops.window_function(t, "v", "sum", preceding=2,
                            order_by=["o", "o2"], frame="range")


def test_window_rejects_bad_reduction():
    t = Table.from_dict({"v": np.arange(4, dtype=np.float64)})
    with pytest.raises(GDFError):
        ops.window_function(t, "v", "median")


def test_groupby_agg_validity_masks(rng):
    """Aggregate output validity: all-True for live groups on null-free
    input, False past num_groups (regression: a positional group-live mask
    must not ride through the compaction sort as payload)."""
    keys = np.array([1, 1, 2, 2, 3], np.int64)
    vals = np.arange(5, dtype=np.int64)
    t = Table.from_dict({"k": keys, "v": vals})
    out = ops.groupby(t, ["k"], [("v", "sum", "s"), ("v", "count", "n"),
                                 ("v", "avg", "m"), ("v", "min", "lo")])
    ng = int(out.num_rows)
    assert ng == 3
    for name in ("s", "n", "m", "lo"):
        v = np.asarray(out[name].valid)
        np.testing.assert_array_equal(v[:ng], True, err_msg=name)
        np.testing.assert_array_equal(v[ng:], False, err_msg=name)
    np.testing.assert_array_equal(np.asarray(out["n"].data)[:ng], [2, 2, 1])


def test_groupby_count_validity_with_null_values(rng):
    """COUNT of an all-null group is 0 but still a VALID (live) output."""
    keys = np.array([1, 1, 2, 2], np.int64)
    vals = np.array([5, 6, 7, 8], np.int64)
    vvalid = np.array([True, True, False, False])
    t = Table.from_dict({"k": keys, "v": vals}, nulls={"v": ~vvalid})
    out = ops.groupby(t, ["k"], [("v", "count", "n"), ("v", "sum", "s")])
    ng = int(out.num_rows)
    assert ng == 2
    np.testing.assert_array_equal(np.asarray(out["n"].data)[:ng], [2, 0])
    np.testing.assert_array_equal(np.asarray(out["n"].valid)[:ng],
                                  [True, True])
    # sum over an all-null group is NULL
    np.testing.assert_array_equal(np.asarray(out["s"].valid)[:ng],
                                  [True, False])
