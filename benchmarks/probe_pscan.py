"""Measure the Pallas scan kernels (ops/pallas/scan.py) on the real
chip: compile + first-run + steady at a given size. The whole point is
compile time FLAT in n (XLA's cumsum at 11M costs 105 s server compile).

Usage: python benchmarks/probe_pscan.py [n]
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import libgdf_tpu  # noqa: F401,E402
from libgdf_tpu.ops.pallas import scan as ps  # noqa: E402


def sync(x):
    np.asarray(jnp.ravel(x)[:1])


def bench(label, fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    sync(out)
    t_first = time.perf_counter() - t0
    k = 8
    t0 = time.perf_counter()
    for _ in range(k):
        out = fn(*args)
    sync(out)
    t_k = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(2 * k):
        out = fn(*args)
    sync(out)
    t2k = time.perf_counter() - t0
    dt = max((t2k - t_k) / k, 1e-9)
    n = args[-1].shape[0]
    print(json.dumps({"scan": label, "n": n,
                      "compile_first_s": round(t_first, 2),
                      "steady_s": round(dt, 5),
                      "grows_per_s": round(n / dt / 1e9, 3)}), flush=True)
    return out


def main():
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 11_000_000
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 3, n).astype(np.int32))
    f = jnp.asarray(rng.random(n) < 0.01)
    out = bench("sum_i32", lambda a: ps.scan_pallas("sum", a), x)
    exp = np.cumsum(np.asarray(x))
    ok = bool((np.asarray(out) == exp).all())
    print(json.dumps({"sum_i32_correct": ok}), flush=True)
    bench("pair_sum_i32", lambda ff, a: ps.scan_pallas_pair("sum", ff, a),
          f, x)
    bench("carry_i32", lambda ff, a: ps.scan_pallas_pair("carry", ff, a),
          f, x)
    bench("max_i32", lambda a: ps.scan_pallas("max", a), x)


if __name__ == "__main__":
    main()
