"""I/O tests: CSV (native + fallback), Arrow IPC round-trip, CSR.

≅ reference tests/csv/csv-test.cu:42-95 (write temp csv, read back),
python/tests/test_ipc.py:52-70 (pyarrow RecordBatch → parser → schema/
layout JSON), and gdf-to-csr semantics."""
import json
import os

import numpy as np
import pytest

from libgdf_tpu import Table
from libgdf_tpu.io import CSVReadArg, gdf_to_csr, read_csv
from libgdf_tpu.io import ipc as ipc_mod


@pytest.fixture
def csv_file(tmp_path):
    p = tmp_path / "simple.csv"
    p.write_text(
        "0,0.0,10,a\n"
        "1,1.5,,b\n"
        "2,-2.25,30,\n"
        "3,,40,a\n"
        ",4.75,50,c\n")
    return str(p)


def _check_simple(t: Table):
    a, an = t["a"].to_numpy_masked()
    b, bn = t["b"].to_numpy_masked()
    c, cn = t["c"].to_numpy_masked()
    np.testing.assert_array_equal(an, [0, 0, 0, 0, 1])
    np.testing.assert_array_equal(a[:4], [0, 1, 2, 3])
    np.testing.assert_array_equal(bn, [0, 0, 0, 1, 0])
    np.testing.assert_allclose(b[[0, 1, 2, 4]], [0.0, 1.5, -2.25, 4.75])
    np.testing.assert_array_equal(cn, [0, 1, 0, 0, 0])
    np.testing.assert_array_equal(c[[0, 2, 3, 4]], [10, 30, 40, 50])


def test_read_csv_native(csv_file):
    from libgdf_tpu.native import csv_scan_available
    if not csv_scan_available():
        pytest.skip("native lib not built")
    arg = CSVReadArg(file_path=csv_file,
                     names=["a", "b", "c", "s"],
                     dtype=["int32", "float64", "int64", "str"])
    t = read_csv(arg)
    assert arg.num_rows_out == 5 and arg.num_cols_out == 4
    _check_simple(t)
    # category column: dictionary codes + dictionary
    s, sn = t["s"].to_numpy_masked()
    np.testing.assert_array_equal(sn, [0, 0, 1, 0, 0])
    cats = t.categories["s"]
    assert [cats[i] for i in s[[0, 1, 3, 4]]] == ["a", "b", "a", "c"]


def test_read_csv_python_fallback(csv_file, monkeypatch):
    import libgdf_tpu.native as native
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_load", lambda: None)
    arg = CSVReadArg(file_path=csv_file,
                     names=["a", "b", "c", "s"],
                     dtype=["int32", "float64", "int64", "str"])
    t = read_csv(arg)
    _check_simple(t)


def test_read_csv_dates(tmp_path):
    p = tmp_path / "dates.csv"
    p.write_text("2019-01-01,01/02/2003\n1970-01-02,\n")
    arg = CSVReadArg(file_path=str(p), names=["d", "e"],
                     dtype=["date32", "date64"], dayfirst=True)
    t = read_csv(arg)
    d, dn = t["d"].to_numpy_masked()
    assert dn.sum() == 0
    assert d[1] == 1  # one day after epoch
    e, en = t["e"].to_numpy_masked()
    np.testing.assert_array_equal(en, [0, 1])
    # dayfirst: 01/02/2003 = 1 Feb 2003
    import pandas as pd
    assert e[0] == int(pd.Timestamp("2003-02-01").value // 1_000_000)


def test_read_csv_options(tmp_path):
    p = tmp_path / "opt.csv"
    p.write_text("# header\n1| 2\n3|4\n5|6\n# trailer\n")
    arg = CSVReadArg(file_path=str(p), delimiter="|", skiprows=1,
                     skipfooter=1, skipinitialspace=True,
                     names=["x", "y"], dtype=["int32", "int32"])
    t = read_csv(arg)
    np.testing.assert_array_equal(np.asarray(t["x"].data), [1, 3, 5])
    np.testing.assert_array_equal(np.asarray(t["y"].data), [2, 4, 6])


def test_ipc_roundtrip(rng):
    pa = pytest.importorskip("pyarrow")
    a = rng.integers(0, 100, 32).astype(np.int64)
    b = rng.standard_normal(32)
    mask = rng.random(32) < 0.25
    batch = pa.record_batch({
        "a": pa.array(a),
        "b": pa.array(np.where(mask, np.nan, b), mask=mask),
    })
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, batch.schema) as w:
        w.write_batch(batch)
    stream = sink.getvalue().to_pybytes()
    # split schema message from the record batches like the reference's
    # consumers do (test_ipc.py:52-70): schema = first IPC message.
    import pyarrow.ipc as paipc
    first = paipc.read_message(pa.BufferReader(stream))
    schema_len = first.serialize().size
    handle = ipc_mod.gdf_ipc_parser_open(stream[:schema_len])
    assert not ipc_mod.gdf_ipc_parser_failed(handle), \
        ipc_mod.gdf_ipc_parser_get_error(handle)
    schema = json.loads(ipc_mod.gdf_ipc_parser_get_schema_json(handle))
    assert [f["name"] for f in schema["fields"]] == ["a", "b"]
    ipc_mod.gdf_ipc_parser_open_recordbatches(handle, stream[schema_len:])
    assert not ipc_mod.gdf_ipc_parser_failed(handle), \
        ipc_mod.gdf_ipc_parser_get_error(handle)
    layout = json.loads(ipc_mod.gdf_ipc_parser_get_layout_json(handle))
    assert layout["columns"][0]["length"] == 32
    assert layout["columns"][1]["null_count"] == int(mask.sum())
    t = handle.to_table()
    np.testing.assert_array_equal(np.asarray(t["a"].data), a)
    bv, bn = t["b"].to_numpy_masked()
    np.testing.assert_array_equal(bn, mask)
    np.testing.assert_allclose(bv[~mask], b[~mask])


def test_ipc_bad_schema():
    handle = ipc_mod.gdf_ipc_parser_open(b"not arrow data")
    assert ipc_mod.gdf_ipc_parser_failed(handle)
    assert ipc_mod.gdf_ipc_parser_get_error(handle)


def test_gdf_to_csr(rng):
    a = np.array([1.0, 0.5, 2.0], np.float64)
    b = np.array([3.0, 4.0, 5.0], np.float64)
    na = np.array([False, True, False])
    nb = np.array([True, False, False])
    t = Table.from_dict({"a": a, "b": b}, nulls={"a": na, "b": nb})
    csr = gdf_to_csr(t.columns)
    assert csr.rows == 3 and csr.cols == 2
    assert int(csr.nnz) == 4
    np.testing.assert_array_equal(np.asarray(csr.IA), [0, 1, 2, 4])
    nnz = int(csr.nnz)
    np.testing.assert_array_equal(np.asarray(csr.JA)[:nnz], [0, 1, 0, 1])
    np.testing.assert_allclose(np.asarray(csr.A)[:nnz], [1.0, 4.0, 2.0, 5.0])


def test_ipc_layout_offsets(rng):
    """Per-buffer offsets in the layout JSON index into the record-batch
    blob at data_offset + offset (≅ ipc.cu:167-200 zero-copy views,
    reference python/tests/test_ipc.py:52-70)."""
    pa = pytest.importorskip("pyarrow")
    a = rng.integers(0, 1 << 30, 64).astype(np.int32)
    mask = rng.random(64) < 0.3
    b = rng.standard_normal(64)
    batch = pa.record_batch({
        "a": pa.array(a),
        "b": pa.array(np.where(mask, np.nan, b), mask=mask),
    })
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, batch.schema) as w:
        w.write_batch(batch)
    stream = sink.getvalue().to_pybytes()
    import pyarrow.ipc as paipc
    first = paipc.read_message(pa.BufferReader(stream))
    schema_len = first.serialize().size
    handle = ipc_mod.gdf_ipc_parser_open(stream[:schema_len])
    rb = stream[schema_len:]
    ipc_mod.gdf_ipc_parser_open_recordbatches(handle, rb)
    assert not ipc_mod.gdf_ipc_parser_failed(handle), \
        ipc_mod.gdf_ipc_parser_get_error(handle)
    layout = json.loads(ipc_mod.gdf_ipc_parser_get_layout_json(handle))
    base = ipc_mod.gdf_ipc_parser_get_data_offset(handle)
    assert base > 0
    cols = layout["columns"]
    # data buffer of column a: raw int32 bytes at the stated offset
    da = cols[0]["data_buffer"]
    assert da["length"] >= a.nbytes
    got = np.frombuffer(rb, np.int32, count=64,
                        offset=base + da["offset"])
    np.testing.assert_array_equal(got, a)
    # null buffer of column b: Arrow validity bitmap (LSB-first, 1=valid)
    nb = cols[1]["null_buffer"]
    assert nb["length"] > 0
    bits = np.unpackbits(
        np.frombuffer(rb, np.uint8, count=(64 + 7) // 8,
                      offset=base + nb["offset"]), bitorder="little")[:64]
    np.testing.assert_array_equal(bits.astype(bool), ~mask)
    # no-null column: empty null buffer descriptor is allowed
    assert "data_buffer" in cols[1]
