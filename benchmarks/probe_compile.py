"""Bisect axon-TPU compile/run time of the join/groupby graph pieces.

Round-3 found compile time (not runtime) decides whether the 10M bench
configs land. This probe compiles each structural piece of the join graph
in ISOLATION (own subprocess per piece — concurrent axon compiles degrade
each other) and prints trace/compile/first-run/steady wall seconds.

Usage:
    python benchmarks/probe_compile.py            # run all pieces
    python benchmarks/probe_compile.py PIECE      # child: one piece
"""
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

N = 11_000_000
PIECES = [
    "sort_u64_unstable_1op",
    "sort_stable_3op",
    "cumsum_i32",
    "cummax_i32",
    "assoc_scan_pair",
    "emit_plan",
    "fast_path_join",
    "groupby_10M",
]


def run_piece(name):
    import jax
    import jax.numpy as jnp

    import libgdf_tpu  # noqa: F401  (enables x64, like the bench)
    from libgdf_tpu import Table, ops

    rng = np.random.default_rng(0)

    if name == "sort_u64_unstable_1op":
        x = jnp.asarray(rng.integers(0, 1 << 62, N, dtype=np.int64)
                        ).astype(jnp.uint64)
        fn = jax.jit(lambda a: jax.lax.sort((a,), num_keys=1,
                                            is_stable=False)[0])
        args = (x,)
    elif name == "sort_u32_2key":
        # is 2 x u32 keys cheaper than one x64-emulated u64 operand?
        hi = jnp.asarray(rng.integers(0, 1 << 31, N, dtype=np.int64)
                         ).astype(jnp.uint32)
        lo = jnp.asarray(rng.integers(0, 1 << 31, N, dtype=np.int64)
                         ).astype(jnp.uint32)
        fn = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=2,
                                               is_stable=False)[0])
        args = (hi, lo)
    elif name == "sort_stable_3op":
        k = jnp.asarray(rng.integers(0, 2, N, dtype=np.int64)
                        ).astype(jnp.uint8)
        a = jnp.arange(N, dtype=jnp.int32)
        fn = jax.jit(lambda k, a, b: jax.lax.sort((k, a, b), num_keys=1,
                                                  is_stable=True))
        args = (k, a, a)
    elif name == "cumsum_i32":
        x = jnp.asarray(rng.integers(0, 3, N).astype(np.int32))
        fn = jax.jit(lambda a: jnp.cumsum(a, dtype=jnp.int32))
        args = (x,)
    elif name == "cumsum_blocked":
        from libgdf_tpu.ops.engine import cumsum as blocked_cumsum
        x = jnp.asarray(rng.integers(0, 3, N).astype(np.int32))
        fn = jax.jit(lambda a: blocked_cumsum(a, jnp.int32))
        args = (x,)
    elif name == "cummax_i32":
        x = jnp.asarray(rng.integers(0, 100, N).astype(np.int32))
        fn = jax.jit(jax.lax.cummax)
        args = (x,)
    elif name == "assoc_scan_pair":
        from libgdf_tpu.ops.engine import last_valid_scan
        v = jnp.asarray(rng.integers(0, 2, N).astype(np.int32)) > 0
        x = jnp.arange(N, dtype=jnp.int32)
        fn = jax.jit(lambda f, a: last_valid_scan(f, a)[0])
        args = (v, x)
    elif name == "emit_plan":
        from libgdf_tpu.ops.join import _emit_plan, _join_keys
        nb, m = 1_000_000, 10_000_000
        bk = jnp.asarray(rng.permutation(nb).astype(np.int32))
        pk = jnp.asarray(rng.integers(0, nb, m).astype(np.int32))

        @jax.jit
        def fn(bk, pk):
            right = Table.from_dict({"k": bk})
            left = Table.from_dict({"k": pk})
            bkeys, b_nm = _join_keys(right, ["k"])
            pkeys, p_nm = _join_keys(left, ["k"])
            b_live = jnp.ones((nb,), jnp.bool_)
            p_live = jnp.ones((m,), jnp.bool_)
            total, emit, offsets, s_back, run_lower, fb, aux = _emit_plan(
                "inner", bkeys, pkeys, b_nm, p_nm, b_live, p_live)
            return total, s_back

        args = (bk, pk)
    elif name == "fast_path_join":
        nb, m = 1_000_000, 10_000_000
        bk = jnp.asarray(rng.permutation(nb).astype(np.int32))
        pk = jnp.asarray(rng.integers(0, nb, m).astype(np.int32))
        pnull = jnp.asarray(rng.random(m) < 0.05)

        @jax.jit
        def fn(pk, pnull, bk):
            left = Table.from_dict({"k": pk}, nulls={"k": pnull})
            right = Table.from_dict({"k": bk})
            return ops.inner_join(left, right, ["k"], ["k"],
                                  out_capacity=m,
                                  assume_unique_build=True)

        args = (pk, pnull, bk)
    elif name == "join_nohint":
        nb, m = 1_000_000, 10_000_000
        bk = jnp.asarray(rng.permutation(nb).astype(np.int32))
        pk = jnp.asarray(rng.integers(0, nb, m).astype(np.int32))

        @jax.jit
        def fn(pk, bk):
            left = Table.from_dict({"k": pk})
            right = Table.from_dict({"k": bk})
            return ops.inner_join(left, right, ["k"], ["k"],
                                  out_capacity=m)

        args = (pk, bk)
    elif name == "groupby_10M":
        m = 10_000_000
        k = jnp.asarray(rng.integers(0, 100_000, m).astype(np.int64))
        v = jnp.asarray(rng.standard_normal(m).astype(np.float32))

        @jax.jit
        def fn(k, v):
            t = Table.from_dict({"k": k, "v": v})
            out = ops.groupby(t, ["k"], [("v", "sum", "s"),
                                         ("v", "count", "n"),
                                         ("v", "avg", "m")])
            return out["s"].data, out.num_rows
        args = (k, v)
    else:
        raise SystemExit(f"unknown piece {name}")

    t0 = time.perf_counter()
    lowered = fn.lower(*args)
    t_trace = time.perf_counter() - t0
    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = compiled(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jnp.ravel(leaf)[:1])
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(4):
        out = compiled(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jnp.ravel(leaf)[:1])
    t_steady = (time.perf_counter() - t0) / 4
    print(json.dumps({"piece": name, "trace_s": round(t_trace, 2),
                      "compile_s": round(t_compile, 2),
                      "first_s": round(t_first, 2),
                      "steady_s": round(t_steady, 4)}))


def main():
    pieces = sys.argv[1:] if len(sys.argv) > 1 else PIECES
    timeout = int(os.environ.get("PROBE_TIMEOUT_S", "420"))
    for p in pieces:
        t0 = time.perf_counter()
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child", p],
                capture_output=True, text=True, timeout=timeout,
                cwd=os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__))))
            out = proc.stdout.strip().splitlines()
            print(out[-1] if out else
                  f'{{"piece": "{p}", "error": "rc={proc.returncode}", '
                  f'"stderr": {json.dumps(proc.stderr[-400:])}}}',
                  flush=True)
        except subprocess.TimeoutExpired:
            print(f'{{"piece": "{p}", "error": "TIMEOUT after '
                  f'{timeout}s"}}', flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        run_piece(sys.argv[2])
    else:
        main()
