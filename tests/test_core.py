"""Core data model tests: Column, Table, bitmask utils.

Oracle style ≅ reference python tests (libgdf/python/tests/test_validity.py
checks NULL bits via buffer_as_bits, utils.py:86-94)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libgdf_tpu import Column, GDFDtype, GDFError, Table, column_concat, table_concat
from libgdf_tpu.core import bitmask


def test_pack_unpack_roundtrip(rng):
    for n in [1, 7, 8, 9, 63, 64, 65, 1000]:
        valid = rng.random(n) < 0.5
        packed = bitmask.pack_bool_mask(jnp.asarray(valid))
        assert packed.shape[0] == (n + 7) // 8
        back = bitmask.unpack_bitmask(packed, n)
        np.testing.assert_array_equal(np.asarray(back), valid)


def test_pack_lsb_first():
    # row 0 -> bit 0 (LSB), matching gdf_is_valid (include/gdf/utils.h:10-16)
    valid = jnp.asarray([True] + [False] * 7)
    packed = bitmask.pack_bool_mask(valid)
    assert int(packed[0]) == 1
    valid = jnp.asarray([False] * 7 + [True])
    packed = bitmask.pack_bool_mask(valid)
    assert int(packed[0]) == 128


def test_count_valid(rng):
    valid = rng.random(1000) < 0.7
    c = bitmask.count_valid(jnp.asarray(valid), 1000)
    assert int(c) == valid.sum()
    assert int(bitmask.count_valid(None, 42)) == 42


def test_column_from_array_and_null_count(rng):
    data = rng.integers(0, 100, 50, dtype=np.int32)
    null = rng.random(50) < 0.3
    col = Column.from_masked(data, null, name="x")
    assert col.size == 50
    assert col.gdf_dtype == GDFDtype.INT32
    assert int(col.null_count()) == null.sum()


def test_column_packed_bitmask_roundtrip(rng):
    data = rng.standard_normal(33).astype(np.float32)
    null = rng.random(33) < 0.5
    col = Column.from_masked(data, null)
    packed = col.packed_bitmask()
    col2 = Column.from_array(data, valid=packed)
    np.testing.assert_array_equal(np.asarray(col2.valid),
                                  np.asarray(col.valid))


def test_column_concat_validity():
    a = Column.from_masked(np.arange(3, dtype=np.int32), [True, False, False])
    b = Column.from_array(np.arange(5, dtype=np.int32))
    out = column_concat([a, b])
    assert out.size == 8
    vals, nulls = out.to_numpy_masked()
    np.testing.assert_array_equal(nulls,
                                  [True, False, False] + [False] * 5)


def test_column_concat_dtype_mismatch():
    a = Column.from_array(np.arange(3, dtype=np.int32))
    b = Column.from_array(np.arange(3, dtype=np.int64))
    with pytest.raises(GDFError):
        column_concat([a, b])


def test_table_row_validity(rng):
    n = 20
    na = rng.random(n) < 0.3
    nb = rng.random(n) < 0.3
    t = Table.from_dict(
        {"a": np.arange(n, dtype=np.int32),
         "b": np.arange(n, dtype=np.float32)},
        nulls={"a": na, "b": nb})
    rv = np.asarray(t.row_validity())
    np.testing.assert_array_equal(rv, ~(na | nb))


def test_table_gather_fill_invalid():
    t = Table.from_dict({"a": np.arange(5, dtype=np.int32)})
    out = t.gather(jnp.asarray([3, -1, 0], jnp.int32), fill_invalid=True)
    vals, nulls = out["a"].to_numpy_masked()
    np.testing.assert_array_equal(vals[[0, 2]], [3, 0])
    np.testing.assert_array_equal(nulls, [False, True, False])


def test_table_is_pytree():
    t = Table.from_dict({"a": np.arange(5, dtype=np.int32)})
    leaves = jax.tree_util.tree_leaves(t)
    assert len(leaves) == 1

    @jax.jit
    def f(tbl):
        return tbl.replace_column("a", tbl["a"].with_data(tbl["a"].data + 1))

    out = f(t)
    np.testing.assert_array_equal(np.asarray(out["a"].data),
                                  np.arange(5) + 1)


def test_table_concat():
    t1 = Table.from_dict({"a": np.arange(3, dtype=np.int32)})
    t2 = Table.from_dict({"a": np.arange(4, dtype=np.int32)})
    out = table_concat([t1, t2])
    assert out.capacity == 7


def test_rows_equal_null_semantics():
    # NULL != NULL (gdf_table.cuh:588-591)
    t1 = Table.from_dict({"a": np.asarray([1, 2], np.int32)},
                         nulls={"a": np.asarray([False, True])})
    eq = t1.rows_equal(t1, jnp.asarray([0, 1]), jnp.asarray([0, 1]))
    np.testing.assert_array_equal(np.asarray(eq), [True, False])
