"""Elementwise op tests vs numpy oracles.

≅ reference python tests test_unaryops.py / test_binaryops.py (assert vs
numpy with assert_array_max_ulp) and test_validity.py NULL propagation."""
import numpy as np
import pytest

from libgdf_tpu import Column, GDFDtype, TimeUnit, ops


@pytest.mark.parametrize("op", ["sin", "cos", "tan", "asin", "acos", "atan",
                                "exp", "log", "sqrt", "ceil", "floor"])
@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_unary_math(op, dtype, rng):
    x = rng.random(100).astype(dtype) * 0.9 + 0.05
    col = Column.from_array(x)
    out = ops.unary_op(col, op)
    expect = getattr(np, {"asin": "arcsin", "acos": "arccos",
                          "atan": "arctan"}.get(op, op))(x)
    rtol, atol = (1e-5, 2e-6) if dtype == np.float32 else (1e-12, 1e-14)
    np.testing.assert_allclose(np.asarray(out.data), expect,
                               rtol=rtol, atol=atol)


@pytest.mark.parametrize("op,npop", [
    ("add", np.add), ("sub", np.subtract), ("mul", np.multiply),
    ("floordiv", np.floor_divide),
])
def test_binary_arith(op, npop, rng):
    a = rng.integers(1, 100, 200).astype(np.int32)
    b = rng.integers(1, 100, 200).astype(np.int32)
    out = ops.binary_op(Column.from_array(a), Column.from_array(b), op)
    np.testing.assert_array_equal(np.asarray(out.data), npop(a, b))


def test_binary_null_propagation(rng):
    n = 100
    a = rng.standard_normal(n).astype(np.float32)
    b = rng.standard_normal(n).astype(np.float32)
    na = rng.random(n) < 0.3
    nb = rng.random(n) < 0.3
    out = ops.add(Column.from_masked(a, na), Column.from_masked(b, nb))
    _, nulls = out.to_numpy_masked()
    # valid only where BOTH valid (binaryops.cu:22-24)
    np.testing.assert_array_equal(nulls, na | nb)


@pytest.mark.parametrize("op,npop", [
    ("gt", np.greater), ("ge", np.greater_equal), ("lt", np.less),
    ("le", np.less_equal), ("eq", np.equal), ("ne", np.not_equal),
])
def test_comparisons_int8_output(op, npop, rng):
    a = rng.integers(0, 10, 100).astype(np.int64)
    b = rng.integers(0, 10, 100).astype(np.int64)
    out = ops.binary_op(Column.from_array(a), Column.from_array(b), op)
    assert out.gdf_dtype == GDFDtype.INT8
    np.testing.assert_array_equal(np.asarray(out.data),
                                  npop(a, b).astype(np.int8))


def test_compare_scalar_stencil(rng):
    a = rng.integers(0, 100, 100).astype(np.int32)
    out = ops.compare_scalar(Column.from_array(a), 50, "gt")
    np.testing.assert_array_equal(np.asarray(out.data),
                                  (a > 50).astype(np.int8))


def test_bitwise(rng):
    a = rng.integers(0, 1 << 20, 100).astype(np.int32)
    b = rng.integers(0, 1 << 20, 100).astype(np.int32)
    for op, npop in [("bitwise_and", np.bitwise_and),
                     ("bitwise_or", np.bitwise_or),
                     ("bitwise_xor", np.bitwise_xor)]:
        out = ops.binary_op(Column.from_array(a), Column.from_array(b), op)
        np.testing.assert_array_equal(np.asarray(out.data), npop(a, b))


def test_cast_numeric(rng):
    x = rng.standard_normal(50).astype(np.float64) * 100
    out = ops.cast(Column.from_array(x), GDFDtype.INT32)
    np.testing.assert_array_equal(np.asarray(out.data), x.astype(np.int32))


def test_cast_date32_date64_scaling():
    # date32→date64 multiplies by 86400000 (unaryops.cu:387-388)
    days = np.asarray([0, 1, -1, 17897], np.int32)
    col = Column.from_array(days, gdf_dtype=GDFDtype.DATE32)
    out = ops.cast(col, GDFDtype.DATE64)
    np.testing.assert_array_equal(np.asarray(out.data),
                                  days.astype(np.int64) * 86400000)
    # and back down with floor semantics (unaryops.cu:354-361)
    back = ops.cast(out, GDFDtype.DATE32)
    np.testing.assert_array_equal(np.asarray(back.data), days)


def test_cast_timestamp_units():
    ms = np.asarray([1528935590000, -1000], np.int64)
    col = Column.from_array(ms, gdf_dtype=GDFDtype.TIMESTAMP,
                            time_unit=TimeUnit.ms)
    us = ops.cast(col, GDFDtype.TIMESTAMP, TimeUnit.us)
    np.testing.assert_array_equal(np.asarray(us.data), ms * 1000)
    s = ops.cast(col, GDFDtype.TIMESTAMP, TimeUnit.s)
    np.testing.assert_array_equal(np.asarray(s.data),
                                  np.floor_divide(ms, 1000))
