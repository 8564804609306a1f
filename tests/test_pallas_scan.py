"""Pallas scan kernels (ops/pallas/scan.py) — logic tests.

Tiny (8x128) block geometry in interpreter mode so block-boundary and
cross-block-carry logic runs in CPU-test time; the production geometry
runs on real TPU (benchmarks/probe_pscan.py measured 13-22 Grows/s at
11M with ~1 s Mosaic compiles — the fix for the axon scan-compile bomb).

≅ reference prefix-sum tests (libgdf/src/tests/prefixsum/...)."""
import numpy as np
import pandas as pd
import jax.numpy as jnp
import pytest

from libgdf_tpu.ops.pallas import scan as ps


@pytest.fixture(autouse=True)
def tiny_geometry(monkeypatch):
    monkeypatch.setattr(ps, "ROWS", 8)
    monkeypatch.setattr(ps, "BLOCK", 8 * 128)
    ps._run_val.clear_cache()
    ps._run_pair.clear_cache()
    yield
    ps._run_val.clear_cache()
    ps._run_pair.clear_cache()


B = 8 * 128


@pytest.mark.parametrize("n", [100, B, 3 * B, 2 * B + 101])
def test_val_scans(rng, n):
    x = rng.integers(-50, 50, n).astype(np.int32)
    got = np.asarray(ps.scan_pallas("sum", jnp.asarray(x), interpret=True))
    np.testing.assert_array_equal(got, np.cumsum(x))
    got = np.asarray(ps.scan_pallas("max", jnp.asarray(x), interpret=True))
    np.testing.assert_array_equal(got, np.maximum.accumulate(x))
    got = np.asarray(ps.scan_pallas("min", jnp.asarray(x), interpret=True))
    np.testing.assert_array_equal(got, np.minimum.accumulate(x))
    xf = rng.standard_normal(n).astype(np.float32)
    got = np.asarray(ps.scan_pallas("sum", jnp.asarray(xf),
                                    interpret=True))
    np.testing.assert_allclose(got, np.cumsum(xf), rtol=2e-5, atol=2e-4)


@pytest.mark.parametrize("n", [100, 3 * B, 2 * B + 101])
def test_pair_scans(rng, n):
    x = rng.integers(-50, 50, n).astype(np.int32)
    f = rng.random(n) < 0.03
    gid = np.cumsum(f)
    for kind, pd_op in [("sum", "cumsum"), ("max", "cummax"),
                        ("min", "cummin")]:
        got = np.asarray(ps.scan_pallas_pair(
            kind, jnp.asarray(f), jnp.asarray(x), interpret=True))
        exp = getattr(pd.Series(x).groupby(gid), pd_op)().values
        np.testing.assert_array_equal(got, exp.astype(np.int32))


@pytest.mark.parametrize("n", [100, 3 * B])
def test_carry_forward(rng, n):
    f = rng.random(n) < 0.03
    vals = (np.arange(n, dtype=np.int32) + 1000)
    got = np.asarray(ps.scan_pallas_pair(
        "carry", jnp.asarray(f), jnp.asarray(vals), interpret=True))
    lastidx = np.maximum.accumulate(np.where(f, np.arange(n), -1))
    exp = np.where(lastidx >= 0, np.maximum(lastidx, 0) + 1000, vals)
    np.testing.assert_array_equal(got, exp)


@pytest.mark.parametrize("n", [100, 2 * B + 101])
def test_sum64_exact(rng, n):
    # values whose prefix sums overflow 32 bits immediately and exercise
    # the lo-word carry in both directions (negative int64 too)
    x = (rng.integers(-2**40, 2**40, n).astype(np.int64)
         * np.int64(2**20))
    got = np.asarray(ps.cumsum64_pallas(jnp.asarray(x), interpret=True))
    np.testing.assert_array_equal(got, np.cumsum(x))
    f = rng.random(n) < 0.05
    gid = np.cumsum(f)
    got = np.asarray(ps.seg_sum64_pallas(jnp.asarray(f), jnp.asarray(x),
                                         interpret=True))
    exp = pd.Series(x).groupby(gid).cumsum().values
    np.testing.assert_array_equal(got, exp)


@pytest.mark.parametrize("n", [100, 2 * B + 101])
def test_sum_f64_compensated(rng, n):
    """Double-float f64 sum scans: ~2^-47 relative vs numpy's f64
    cumsum, across magnitude mixing that would lose digits in f32."""
    x = rng.standard_normal(n) * np.exp(rng.uniform(-20, 20, n))
    got = np.asarray(ps.cumsum_f64_pallas(jnp.asarray(x), interpret=True))
    exp = np.cumsum(x)
    np.testing.assert_allclose(got, exp, rtol=1e-12,
                               atol=np.abs(x).max() * 1e-12)
    f = rng.random(n) < 0.05
    gid = np.cumsum(f)
    got = np.asarray(ps.seg_sum_f64_pallas(jnp.asarray(f), jnp.asarray(x),
                                           interpret=True))
    exp = pd.Series(x).groupby(gid).cumsum().values
    np.testing.assert_allclose(got, exp, rtol=1e-12,
                               atol=np.abs(x).max() * 1e-12)


def test_engine_f64_and_f16_sum_dispatch(rng):
    """engine.cumsum / seg_scan_sum route f64 to the double-float kernel
    and f16 through the f32 kernel under the Pallas backend."""
    from libgdf_tpu.ops import engine
    n = 2 * B + 9
    x = rng.standard_normal(n)
    f = rng.random(n) < 0.05
    engine.configure(use_pallas=False, interpret=True)
    try:
        # compensated pairs: ~2^-47 of the running magnitude; after
        # cancellation the RELATIVE error vs a small prefix value can
        # exceed 1e-12, hence the absolute term.
        got = np.asarray(engine.cumsum(jnp.asarray(x)))
        np.testing.assert_allclose(got, np.cumsum(x), rtol=1e-11,
                                   atol=1e-11)
        gid = np.cumsum(f)
        gots = np.asarray(engine.seg_scan_sum(jnp.asarray(x),
                                              jnp.asarray(f)))
        exps = pd.Series(x).groupby(gid).cumsum().values
        np.testing.assert_allclose(gots, exps, rtol=1e-11, atol=1e-11)
        h = (rng.standard_normal(n) / 8).astype(np.float16)
        goth = engine.cumsum(jnp.asarray(h))
        assert goth.dtype == jnp.float16
        np.testing.assert_allclose(
            np.asarray(goth).astype(np.float64),
            np.cumsum(h.astype(np.float32)).astype(np.float16)
            .astype(np.float64), rtol=2e-3, atol=2e-2)
    finally:
        engine.configure()


@pytest.mark.parametrize("dtype", [np.int64, np.float64])
@pytest.mark.parametrize("kind", ["min", "max"])
def test_sel64_seg_minmax(rng, dtype, kind):
    from libgdf_tpu.ops import engine
    n = 2 * B + 55
    if dtype is np.int64:
        x = rng.integers(-2**60, 2**60, n).astype(np.int64)
    else:
        x = (rng.standard_normal(n) * 1e12).astype(np.float64)
    f = rng.random(n) < 0.04
    gid = np.cumsum(f)
    engine.configure(use_pallas=False, interpret=True)
    try:
        fn = engine.seg_scan_min if kind == "min" else engine.seg_scan_max
        got = np.asarray(fn(jnp.asarray(x), jnp.asarray(f)))
    finally:
        engine.configure()
    op = "cummin" if kind == "min" else "cummax"
    exp = getattr(pd.Series(x).groupby(gid), op)().values
    np.testing.assert_array_equal(got, exp)


def test_engine_dispatch_matches_xla(rng):
    """engine scans give identical results via the XLA path and the
    Pallas path (interpret mode)."""
    from libgdf_tpu.ops import engine
    n = 2 * B + 7
    f = jnp.asarray(rng.random(n) < 0.05)
    v = jnp.asarray(rng.integers(0, 99, n).astype(np.int32))
    xla = {}
    xla["cumsum"] = engine.cumsum(v, jnp.int32)
    xla["cummax"] = engine.cummax(v)
    xla["seg"] = engine.seg_scan_sum(v, f)
    xla["lvs"] = engine.last_valid_scan(f, v)[0]
    engine.configure(use_pallas=False, interpret=True)
    try:
        for name, ref in xla.items():
            got = {
                "cumsum": lambda: engine.cumsum(v, jnp.int32),
                "cummax": lambda: engine.cummax(v),
                "seg": lambda: engine.seg_scan_sum(v, f),
                "lvs": lambda: engine.last_valid_scan(f, v)[0],
            }[name]()
            np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    finally:
        engine.configure()
