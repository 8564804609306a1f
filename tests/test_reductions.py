"""Reductions / scan / compaction tests vs numpy oracles.

≅ reference test_reductions (gtests reductions.cu oracle pattern),
python test_prefixsum / stream compaction semantics."""
import jax.numpy as jnp
import numpy as np
import pytest

from libgdf_tpu import Column, GDFError, Table, ops


@pytest.mark.parametrize("dtype", [np.int32, np.int64, np.float32, np.float64])
def test_sum_min_max_product(dtype, rng):
    x = rng.integers(1, 5, 100).astype(dtype)
    col = Column.from_array(x)
    assert np.isclose(float(ops.sum(col)), x.sum(dtype=dtype))
    assert float(ops.min(col)) == x.min()
    assert float(ops.max(col)) == x.max()
    assert np.isclose(float(ops.sum_of_squares(col)),
                      (x.astype(np.float64) ** 2).sum(), rtol=1e-6)


def test_reductions_skip_nulls(rng):
    x = rng.standard_normal(100).astype(np.float64)
    null = rng.random(100) < 0.4
    col = Column.from_masked(x, null)
    assert np.isclose(float(ops.sum(col)), x[~null].sum())
    assert float(ops.min(col)) == x[~null].min()
    assert float(ops.max(col)) == x[~null].max()


def test_prefixsum_inclusive_exclusive(rng):
    x = rng.integers(0, 10, 50).astype(np.int64)
    col = Column.from_array(x)
    inc = ops.prefixsum(col, inclusive=True)
    np.testing.assert_array_equal(np.asarray(inc.data), np.cumsum(x))
    exc = ops.prefixsum(col, inclusive=False)
    np.testing.assert_array_equal(np.asarray(exc.data),
                                  np.cumsum(x) - x)


def test_prefixsum_rejects_masks():
    col = Column.from_masked(np.arange(4, dtype=np.int32),
                             [False, True, False, False])
    with pytest.raises(GDFError):
        ops.prefixsum(col)


def test_apply_stencil(rng):
    n = 500
    x = rng.standard_normal(n).astype(np.float32)
    stencil_vals = rng.integers(0, 2, n).astype(np.int8)
    stencil_null = rng.random(n) < 0.2
    col = Column.from_array(x)
    stencil = Column.from_masked(stencil_vals, stencil_null)
    out, count = ops.apply_stencil(col, stencil)
    keep = (stencil_vals != 0) & ~stencil_null
    assert int(count) == keep.sum()
    np.testing.assert_array_equal(np.asarray(out.data)[: int(count)],
                                  x[keep])


def test_filter_table_preserves_order_and_nulls(rng):
    n = 300
    a = rng.integers(0, 100, n).astype(np.int32)
    na = rng.random(n) < 0.25
    nb = rng.random(n) < 0.25
    b = rng.standard_normal(n).astype(np.float64)
    t = Table.from_dict({"a": a, "b": b}, nulls={"a": na, "b": nb})
    stencil = ops.compare_scalar(t["a"], 50, "lt")
    out = ops.filter_table(t, stencil)
    # Reference semantics (streamcompactionops.cu:163-260): rows where the
    # stencil is NULL are dropped, and compare on a nullable column yields a
    # nullable stencil — so null 'a' rows do not survive the filter.
    keep = (a < 50) & ~na
    cnt = int(out.num_rows)
    assert cnt == keep.sum()
    c = out.compact()
    np.testing.assert_array_equal(np.asarray(c["a"].data), a[keep])
    np.testing.assert_array_equal(np.asarray(c["b"].data)[~nb[keep]],
                                  b[keep][~nb[keep]])
    _, nulls = c["b"].to_numpy_masked()
    np.testing.assert_array_equal(nulls, nb[keep])


def test_filter_table_composes_with_count(rng):
    """Second filter on an already-padded table respects live rows."""
    n = 100
    a = np.arange(n, dtype=np.int32)
    t = Table.from_dict({"a": a})
    t1 = ops.filter_table(t, ops.compare_scalar(t["a"], 50, "lt"))
    t2 = ops.filter_table(t1, ops.compare_scalar(t1["a"], 10, "ge"))
    c = t2.compact()
    np.testing.assert_array_equal(np.asarray(c["a"].data),
                                  np.arange(10, 50, dtype=np.int32))
