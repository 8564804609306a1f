"""Memory-manager surface tests.

≅ reference tests/memory/memory_tests.cpp:50-178 (alloc/realloc/free
lifecycles) and python/tests/test_rmm.py:34-45 (CSV event log)."""
import numpy as np
import pytest

from libgdf_tpu import memory as rmm


@pytest.fixture(autouse=True)
def _init():
    rmm.rmmInitialize()
    yield
    rmm.rmmFinalize()


def test_alloc_free_lifecycle():
    h = rmm.rmmAlloc(1024, dtype=np.float32)
    arr = rmm.rmmGetArray(h)
    assert arr.shape == (1024,)
    assert rmm.rmmFree(h) == rmm.rmmError_t.RMM_SUCCESS
    with pytest.raises(rmm.RMMError):
        rmm.rmmFree(h)


def test_zero_and_large_sizes():
    h0 = rmm.rmmAlloc(0)
    assert rmm.rmmGetArray(h0).shape == (0,)
    rmm.rmmFree(h0)
    h = rmm.rmmAlloc(1 << 20)
    assert rmm.rmmGetArray(h).shape == (1 << 20,)
    rmm.rmmFree(h)


def test_realloc_preserves_prefix():
    h = rmm.rmmAlloc(8, dtype=np.int32)
    arr = rmm.rmmGetArray(h).at[:].set(np.arange(8, dtype=np.int32))
    from libgdf_tpu.memory import manager
    manager._mgr.allocations[h].array = arr  # simulate engine writing
    rmm.rmmRealloc(h, 16)
    out = np.asarray(rmm.rmmGetArray(h))
    np.testing.assert_array_equal(out[:8], np.arange(8))
    assert out.shape == (16,)
    rmm.rmmRealloc(h, 4)
    np.testing.assert_array_equal(np.asarray(rmm.rmmGetArray(h)),
                                  np.arange(4))


def test_not_initialized_errors():
    rmm.rmmFinalize()
    with pytest.raises(rmm.RMMError) as e:
        rmm.rmmAlloc(4)
    assert e.value.errcode == rmm.rmmError_t.RMM_ERROR_NOT_INITIALIZED
    rmm.rmmInitialize()


def test_csv_event_log(tmp_path):
    h1 = rmm.rmmAlloc(256)
    rmm.rmmRealloc(h1, 512)
    rmm.rmmFree(h1)
    log = rmm.csv_log()
    lines = log.strip().splitlines()
    assert lines[0].startswith("Event Type,Device ID,Address")
    events = [ln.split(",")[0] for ln in lines[1:]]
    assert events == ["Alloc", "Realloc", "Free"]
    assert rmm.rmmLogSize() == len(log)
    p = tmp_path / "rmm.csv"
    rmm.rmmWriteLog(str(p))
    assert p.read_text() == log


def test_get_info_and_error_strings():
    free, total = rmm.rmmGetInfo()
    assert free >= 0 and total >= 0
    assert rmm.rmmGetErrorString(0) == "RMM_SUCCESS"
    assert rmm.rmmGetErrorString(3) == "RMM_ERROR_NOT_INITIALIZED"
    assert rmm.rmmGetAllocationOffset(1) == 0


def test_to_device_logs():
    arr = rmm.to_device(np.arange(10, dtype=np.int64))
    np.testing.assert_array_equal(np.asarray(arr), np.arange(10))
    assert "Alloc" in rmm.csv_log()
