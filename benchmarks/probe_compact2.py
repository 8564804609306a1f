"""Measure compact2 (offset-prefetched compaction kernel) on the real
chip: compile seconds + steady-state Grows/s at 1M / 4M / 11M rows, to
confirm per-block cost no longer grows with grid size (v1's failure).

Usage: python benchmarks/probe_compact2.py [sizes...]
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

import libgdf_tpu  # noqa: F401,E402  (x64 on)
from libgdf_tpu.ops.pallas.compact2 import compact_pallas2  # noqa: E402


def sync(x):
    np.asarray(jnp.ravel(x)[:1])


def main():
    sizes = ([int(float(s)) for s in sys.argv[1:]]
             or [1_000_000, 4_000_000, 11_000_000])
    rng = np.random.default_rng(0)
    for n in sizes:
        x = jnp.asarray(rng.integers(-2**31, 2**31, n).astype(np.int32))
        y = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        keep = jnp.asarray(rng.random(n) < 0.5)
        t0 = time.perf_counter()
        (xo, yo), cnt = compact_pallas2([x, y], keep)
        sync(xo)
        t_first = time.perf_counter() - t0
        # steady state: marginal timing
        k = 8
        t0 = time.perf_counter()
        for _ in range(k):
            (xo, yo), cnt = compact_pallas2([x, y], keep)
        sync(xo)
        t_k = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(2 * k):
            (xo, yo), cnt = compact_pallas2([x, y], keep)
        sync(xo)
        t_2k = time.perf_counter() - t0
        dt = max((t_2k - t_k) / k, 1e-9)
        cnt_ok = int(cnt) == int(np.asarray(keep).sum())
        print(json.dumps({
            "n": n, "compile_first_s": round(t_first, 2),
            "steady_s": round(dt, 5),
            "grows_per_s": round(n / dt / 1e9, 3),
            "count_ok": bool(cnt_ok)}), flush=True)


if __name__ == "__main__":
    main()
