"""Pallas compaction kernel v2 (ops/pallas/compact2.py) — logic tests.

Runs the kernel in interpreter mode on a TINY block geometry (8x128)
so the grid/accumulator/spill logic — including the final-spill extra
step — is exercised across many block-boundary shapes in CPU-test time.
The full-size geometry runs on real TPU via bench.py / probe_compact2.

≅ reference streamcompaction tests
(libgdf/src/tests/streamcompaction/...)."""
import numpy as np
import jax.numpy as jnp
import pytest

from libgdf_tpu.ops.pallas import compact2


@pytest.fixture(autouse=True)
def tiny_geometry(monkeypatch):
    monkeypatch.setattr(compact2, "ROWS", 8)
    monkeypatch.setattr(compact2, "BLOCK", 8 * 128)
    # jitted _run caches per (shape, static args); tiny shapes differ from
    # production shapes so no stale-constant risk, but clear anyway.
    compact2._run.clear_cache()
    yield
    compact2._run.clear_cache()


B = 8 * 128


@pytest.mark.parametrize("n,p", [
    (100, 0.5), (B, 0.0), (B, 1.0), (3 * B, 0.95), (2 * B, 1.0),
    (5 * B + 777, 0.3), (4 * B, 0.02), (2 * B + 1, 0.6),
])
def test_compact2_matches_numpy(rng, n, p):
    x = rng.integers(-2**31, 2**31, n).astype(np.int32)
    y = rng.standard_normal(n).astype(np.float32)
    keep = (rng.random(n) < p) if 0 < p < 1 else np.full(n, bool(p))
    (xo, yo), cnt = compact2.compact_pallas2(
        [jnp.asarray(x), jnp.asarray(y)], jnp.asarray(keep),
        interpret=True)
    cnt = int(cnt)
    assert cnt == int(keep.sum())
    np.testing.assert_array_equal(np.asarray(xo)[:cnt], x[keep])
    np.testing.assert_array_equal(np.asarray(yo)[:cnt], y[keep])


def test_compact2_8byte_and_bool_words(rng):
    n = 3 * B + 100
    a = rng.integers(-2**62, 2**62, n).astype(np.int64)
    b = rng.standard_normal(n).astype(np.float64)
    v = rng.random(n) < 0.7
    keep = rng.random(n) < 0.4
    (ao, bo, vo), cnt = compact2.compact_pallas2(
        [jnp.asarray(a), jnp.asarray(b), jnp.asarray(v)],
        jnp.asarray(keep), interpret=True)
    cnt = int(cnt)
    assert cnt == int(keep.sum())
    np.testing.assert_array_equal(np.asarray(ao)[:cnt], a[keep])
    np.testing.assert_array_equal(np.asarray(bo)[:cnt], b[keep])
    np.testing.assert_array_equal(np.asarray(vo)[:cnt], v[keep])


def test_compact2_many_bools_overflow_flag_slots(rng):
    """More bool arrays than MAX_FLAGS: the overflow routes as regular
    words — results identical either way."""
    from libgdf_tpu.ops.pallas.compact import MAX_FLAGS
    n = 2 * B + 33
    nb = MAX_FLAGS + 2
    bools = [rng.random(n) < 0.5 for _ in range(nb)]
    keep = rng.random(n) < 0.6
    outs, cnt = compact2.compact_pallas2(
        [jnp.asarray(b) for b in bools], jnp.asarray(keep),
        interpret=True)
    cnt = int(cnt)
    assert cnt == int(keep.sum())
    for o, b in zip(outs, bools):
        np.testing.assert_array_equal(np.asarray(o)[:cnt], b[keep])


def test_compact_v1_flags_and_carry(rng):
    """v1 routing kernel (ops/pallas/compact.py) on tiny geometry:
    bool planes ride the packed routing word's high bits, and their
    values survive the cross-block partial-row carry."""
    from libgdf_tpu.ops.pallas import compact
    import pytest as _pytest
    mp = _pytest.MonkeyPatch()
    mp.setattr(compact, "ROWS", 8)
    mp.setattr(compact, "BLOCK", 8 * 128)
    compact._run.clear_cache()
    try:
        n = 4 * B + 57
        x = rng.integers(-2**31, 2**31, n).astype(np.int32)
        v = rng.random(n) < 0.7
        w = rng.random(n) < 0.3
        keep = rng.random(n) < 0.4
        (xo, vo, wo), cnt = compact.compact_pallas(
            [jnp.asarray(x), jnp.asarray(v), jnp.asarray(w)],
            jnp.asarray(keep), interpret=True)
        cnt = int(cnt)
        assert cnt == int(keep.sum())
        np.testing.assert_array_equal(np.asarray(xo)[:cnt], x[keep])
        np.testing.assert_array_equal(np.asarray(vo)[:cnt], v[keep])
        np.testing.assert_array_equal(np.asarray(wo)[:cnt], w[keep])
    finally:
        mp.undo()
        compact._run.clear_cache()


@pytest.mark.parametrize("narrow", [True, False])
def test_compact2_single_word_fold(rng, narrow):
    """Dynamic single-word fold: a lone data word whose runtime span
    fits the spare flag bits rides the routing word (zero data words);
    a wide-range word takes the plain branch of the same cond."""
    n = 2 * B + 41
    base = 12345 if narrow else 0
    hi = base + (200 if narrow else 2**31 - 1)
    x = rng.integers(base, hi, n).astype(np.int32)
    v = rng.random(n) < 0.6
    keep = rng.random(n) < 0.5
    (xo, vo), cnt = compact2.compact_pallas2(
        [jnp.asarray(x), jnp.asarray(v)], jnp.asarray(keep),
        interpret=True)
    cnt = int(cnt)
    assert cnt == int(keep.sum())
    np.testing.assert_array_equal(np.asarray(xo)[:cnt], x[keep])
    np.testing.assert_array_equal(np.asarray(vo)[:cnt], v[keep])


def test_compact_v1_single_word_fold(rng):
    from libgdf_tpu.ops.pallas import compact
    mp = pytest.MonkeyPatch()
    mp.setattr(compact, "ROWS", 8)
    mp.setattr(compact, "BLOCK", 8 * 128)
    compact._run.clear_cache()
    try:
        n = 3 * B + 9
        x = rng.integers(100, 1100, n).astype(np.int32)  # span 1000: fold
        keep = rng.random(n) < 0.4
        (xo,), cnt = compact.compact_pallas(
            [jnp.asarray(x)], jnp.asarray(keep), interpret=True)
        cnt = int(cnt)
        assert cnt == int(keep.sum())
        np.testing.assert_array_equal(np.asarray(xo)[:cnt], x[keep])
    finally:
        mp.undo()
        compact._run.clear_cache()


def test_compact2_empty():
    (out,), cnt = compact2.compact_pallas2(
        [jnp.zeros((0,), jnp.int32)], jnp.zeros((0,), bool),
        interpret=True)
    assert int(cnt) == 0 and out.shape == (0,)
