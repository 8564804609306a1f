"""Sort tests vs numpy argsort oracles.

≅ reference python tests test_sorting.py:21-64 (argsort-vs-radixsort) and
test_segmented_sorting.py:27-60 (per-segment mergesort oracle)."""
import numpy as np
import pytest

from libgdf_tpu import Column, Table, ops


@pytest.mark.parametrize("dtype", [np.int8, np.int16, np.int32, np.int64,
                                   np.float32, np.float64])
@pytest.mark.parametrize("descending", [False, True])
def test_radixsort_matches_argsort(dtype, descending, rng):
    n = 1000
    if np.issubdtype(dtype, np.floating):
        keys = (rng.standard_normal(n) * 100).astype(dtype)
    else:
        info = np.iinfo(dtype)
        keys = rng.integers(info.min, info.max, n, endpoint=True,
                            dtype=np.int64).astype(dtype)
    vals = np.arange(n, dtype=np.int64)
    sk, sv = ops.radixsort(Column.from_array(keys),
                           Column.from_array(vals),
                           descending=descending)
    order = np.argsort(keys, kind="stable")
    if descending:
        order = np.argsort(-keys.astype(np.float64), kind="stable")
    np.testing.assert_array_equal(np.asarray(sk.data), keys[order])
    np.testing.assert_array_equal(np.asarray(sv.data), vals[order])


def test_radixsort_bit_range(rng):
    """Restricted bit range sorts by masked bits only, stable elsewhere
    (≅ CUB begin_bit/end_bit, sorting.cu:48-135)."""
    n = 200
    keys = rng.integers(0, 1 << 16, n).astype(np.int32)
    vals = np.arange(n, dtype=np.int32)
    # sort only on bits [8, 16) of the (sign-flipped) radix representation
    sk, sv = ops.radixsort(Column.from_array(keys), Column.from_array(vals),
                           begin_bit=8, end_bit=16)
    enc = (keys.view(np.uint32) ^ 0x80000000) >> 8 & 0xFF
    order = np.argsort(enc, kind="stable")
    np.testing.assert_array_equal(np.asarray(sv.data), vals[order])


def test_segmented_radixsort(rng):
    """Per-segment sort oracle (test_segmented_sorting.py:27-60)."""
    n = 500
    keys = rng.integers(0, 1000, n).astype(np.int64)
    vals = np.arange(n, dtype=np.int64)
    offsets = np.asarray([0, 100, 250, 251, 400], np.int32)
    sk, sv = ops.segmented_radixsort(Column.from_array(keys),
                                     Column.from_array(vals), offsets)
    got_k = np.asarray(sk.data)
    bounds = list(offsets) + [n]
    for i in range(len(offsets)):
        lo, hi = bounds[i], bounds[i + 1]
        np.testing.assert_array_equal(got_k[lo:hi], np.sort(keys[lo:hi]))


def test_order_by_multi_key(rng):
    n = 400
    a = rng.integers(0, 10, n).astype(np.int64)
    b = rng.standard_normal(n).astype(np.float32)
    t = Table.from_dict({"a": a, "b": b})
    perm = np.asarray(ops.order_by(t, ["a", "b"]))
    expect = np.lexsort((b, a))
    got = list(zip(a[perm], b[perm]))
    want = list(zip(a[expect], b[expect]))
    assert got == want


def test_order_by_descending_nulls_last(rng):
    """BASELINE config 4 semantics: (int64 desc, float32 desc), nulls last."""
    n = 300
    a = rng.integers(0, 5, n).astype(np.int64)
    na = rng.random(n) < 0.2
    b = rng.standard_normal(n).astype(np.float32)
    t = Table.from_dict({"a": a, "b": b}, nulls={"a": na})
    perm = np.asarray(ops.order_by(t, ["a", "b"],
                                   ascending=[False, False],
                                   nulls_last=True))
    # nulls of 'a' must occupy the tail
    k = (~na).sum()
    assert na[perm][k:].all() and not na[perm][:k].any()
    # non-null region: descending lexicographic
    aa, bb = a[perm][:k], b[perm][:k]
    order = np.lexsort((-bb.astype(np.float64), -aa))
    assert (order == np.arange(k)).all()


def test_order_by_nulls_first(rng):
    n = 100
    a = rng.integers(0, 5, n).astype(np.int32)
    na = rng.random(n) < 0.3
    t = Table.from_dict({"a": a}, nulls={"a": na})
    perm = np.asarray(ops.order_by(t, ["a"], nulls_last=False))
    k = na.sum()
    assert na[perm][:k].all()


def test_sort_table_dead_rows_stay_dead(rng):
    """capacity+count tables: dead rows sort to the end."""
    n = 100
    a = np.arange(n, dtype=np.int32)[::-1].copy()
    t = Table.from_dict({"a": a})
    filtered = ops.filter_table(t, ops.compare_scalar(t["a"], 50, "lt"))
    out = ops.sort_table(filtered, ["a"])
    c = out.compact()
    np.testing.assert_array_equal(np.asarray(c["a"].data),
                                  np.arange(50, dtype=np.int32))
