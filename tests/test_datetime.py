"""Datetime extraction tests vs numpy datetime64 oracle.

≅ reference python test_datetime.py / gtests over datetimeops.cu."""
import numpy as np
import pytest

from libgdf_tpu import Column, GDFDtype, TimeUnit, ops


def _oracle(ms):
    dt = ms.astype("datetime64[ms]")
    Y = dt.astype("datetime64[Y]")
    M = dt.astype("datetime64[M]")
    D = dt.astype("datetime64[D]")
    h = dt.astype("datetime64[h]")
    m = dt.astype("datetime64[m]")
    s = dt.astype("datetime64[s]")
    return {
        "year": Y.astype(int) + 1970,
        "month": (M - Y).astype(int) + 1,
        "day": (D - M).astype(int) + 1,
        "hour": (h - D).astype(int),
        "minute": (m - h).astype(int),
        "second": (s - m).astype(int),
    }


@pytest.fixture
def times_ms(rng):
    # span 1890..2120, including pre-epoch negatives
    return rng.integers(-2_500_000_000_000, 4_700_000_000_000, 500)


@pytest.mark.parametrize("field", ["year", "month", "day", "hour",
                                   "minute", "second"])
def test_extract_from_date64(field, times_ms):
    col = Column.from_array(times_ms.astype(np.int64),
                            gdf_dtype=GDFDtype.DATE64)
    out = getattr(ops, f"extract_{field}")(col)
    assert np.asarray(out.data).dtype == np.int16
    np.testing.assert_array_equal(np.asarray(out.data),
                                  _oracle(times_ms)[field])


@pytest.mark.parametrize("unit,scale", [(TimeUnit.s, 1),
                                        (TimeUnit.ms, 1000),
                                        (TimeUnit.us, 1000000)])
def test_extract_from_timestamp_units(unit, scale, times_ms):
    secs = times_ms // 1000
    col = Column.from_array(secs * scale, gdf_dtype=GDFDtype.TIMESTAMP,
                            time_unit=unit)
    out = ops.extract_year(col)
    expect = _oracle(secs * 1000)["year"]
    np.testing.assert_array_equal(np.asarray(out.data), expect)


def test_extract_from_date32(times_ms):
    days = times_ms // 86400000
    col = Column.from_array(days.astype(np.int32),
                            gdf_dtype=GDFDtype.DATE32)
    out = ops.extract_month(col)
    expect = _oracle(days * 86400000)["month"]
    np.testing.assert_array_equal(np.asarray(out.data), expect)


def test_extract_validity_passthrough(rng):
    ms = rng.integers(0, 4_000_000_000_000, 50)
    null = rng.random(50) < 0.3
    col = Column.from_masked(ms.astype(np.int64), null,
                             gdf_dtype=GDFDtype.DATE64)
    out = ops.extract_year(col)
    _, nulls = out.to_numpy_masked()
    np.testing.assert_array_equal(nulls, null)
