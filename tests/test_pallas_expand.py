"""Monotone expand-fill kernel (ops/pallas/expand.py) — logic tests.

Tiny (8x128) block geometry in interpreter mode so block-boundary
shapes (empty blocks, range-straddles, full blocks, long empty runs)
are exercised in CPU-test time. The full geometry runs on real TPU via
the join's general path (bench.py join_dup_10Mx1M)."""
import numpy as np
import jax.numpy as jnp
import pytest

from libgdf_tpu.ops.pallas import expand


@pytest.fixture(autouse=True)
def tiny_geometry(monkeypatch):
    monkeypatch.setattr(expand, "ROWS", 8)
    monkeypatch.setattr(expand, "BLOCK", 8 * 128)
    expand._run.clear_cache()
    yield
    expand._run.clear_cache()


B = 8 * 128


def _oracle(pos, words, cap):
    outs = [np.zeros(cap, np.int32) for _ in words]
    k = np.searchsorted(pos, np.arange(cap), side="right") - 1
    for o, w in zip(outs, words):
        live = k >= 0
        o[live] = w[k[live]]
    return outs


@pytest.mark.parametrize("cap,density", [
    (B, 0.5), (3 * B, 0.1), (2 * B + 77, 0.9), (4 * B, 0.01),
    (3 * B, 1.0),
])
def test_expand_fill_matches_oracle(rng, cap, density):
    nsrc = max(1, int(cap * density))
    pos = np.sort(rng.choice(cap, nsrc, replace=False)).astype(np.int32)
    w1 = rng.integers(1, 2**30, nsrc).astype(np.int32)
    w2 = rng.integers(-2**30, 2**30, nsrc).astype(np.int32)
    got = expand.expand_fill_pallas(
        jnp.asarray(pos), [jnp.asarray(w1), jnp.asarray(w2)], cap,
        interpret=True)
    exp = _oracle(pos, [w1, w2], cap)
    np.testing.assert_array_equal(np.asarray(got[0]), exp[0])
    np.testing.assert_array_equal(np.asarray(got[1]), exp[1])


def test_expand_fill_padded_tail_and_empty_blocks(rng):
    """Sources only in the first block; later blocks fill from carry.
    The input carries a sentinel tail (the join pads to capacity)."""
    cap = 5 * B
    pos = np.asarray([0, 3, B - 1], np.int32)
    w = np.asarray([10, 20, 30], np.int32)
    pos_pad = np.concatenate([pos, np.full(7, expand.SENTINEL, np.int32)])
    w_pad = np.concatenate([w, np.zeros(7, np.int32)])
    (got,) = expand.expand_fill_pallas(
        jnp.asarray(pos_pad), [jnp.asarray(w_pad)], cap, interpret=True)
    exp = _oracle(pos, [w], cap)[0]
    np.testing.assert_array_equal(np.asarray(got), exp)


def test_join_general_path_via_expand_kernel(rng):
    """Duplicate-key join with the Pallas expand-fill path (interpret
    mode, full-size geometry restored) matches the XLA scatter path."""
    from libgdf_tpu import Table, ops
    from libgdf_tpu.ops import engine
    expand._run.clear_cache()
    mp = pytest.MonkeyPatch()
    mp.setattr(expand, "ROWS", 512)
    mp.setattr(expand, "BLOCK", 512 * 128)
    try:
        nl, nr = 700, 300
        lk = rng.integers(0, 80, nl).astype(np.int32)
        rk = rng.integers(0, 80, nr).astype(np.int32)
        lt = Table.from_dict({"k": lk})
        rt = Table.from_dict({"k": rk})
        li0, ri0, c0 = ops.join_indices(lt, rt, ["k"], ["k"], how="inner")
        engine.configure(use_pallas=False, interpret=True)
        try:
            li1, ri1, c1 = ops.join_indices(lt, rt, ["k"], ["k"],
                                            how="inner",
                                            out_capacity=int(c0))
        finally:
            engine.configure()
        assert int(c0) == int(c1)
        a = sorted(zip(np.asarray(li0)[:int(c0)].tolist(),
                       np.asarray(ri0)[:int(c0)].tolist()))
        b = sorted(zip(np.asarray(li1)[:int(c1)].tolist(),
                       np.asarray(ri1)[:int(c1)].tolist()))
        assert a == b
    finally:
        mp.undo()
        expand._run.clear_cache()


def test_expand_fill_no_source_before_first(rng):
    cap = 2 * B
    pos = np.asarray([B + 5], np.int32)
    w = np.asarray([42], np.int32)
    (got,) = expand.expand_fill_pallas(
        jnp.asarray(pos), [jnp.asarray(w)], cap, interpret=True)
    exp = np.zeros(cap, np.int32)
    exp[B + 5:] = 42
    np.testing.assert_array_equal(np.asarray(got), exp)
