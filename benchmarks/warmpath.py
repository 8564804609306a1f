"""Warm-path evidence: two consecutive FRESH-PROCESS runs per bench
config with the persistent XLA cache dir primed (./.jax_cache), writing
WARMPATH_r{N}.json with first-run vs second-run compile seconds and the
steady rows/s of each.

Round-3/4 context: the axon backend was observed to never hit the
persistent cache across processes (VERDICT r4 weak #2, memory notes) —
this artifact records whatever is true THIS round rather than asserting
either way. Run: python benchmarks/warmpath.py [round_tag]
"""
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = ["filter_1M", "orderby_50M", "join_10Mx1M", "groupby_10M"]
TIMEOUT_S = 560


def one_run(name):
    t0 = time.perf_counter()
    p = subprocess.run([sys.executable, os.path.join(ROOT, "bench.py"),
                        name], capture_output=True, text=True,
                       timeout=TIMEOUT_S, cwd=ROOT)
    wall = time.perf_counter() - t0
    if p.returncode != 0 or not p.stdout.strip():
        return {"failed": True, "wall_s": round(wall, 1),
                "stderr_tail": "\n".join(
                    p.stderr.strip().splitlines()[-5:])[:800]}
    e = json.loads(p.stdout.strip().splitlines()[-1])
    return {"compile_s": e.get("compile_s"), "rows_per_s": e["rows_per_s"],
            "wall_s": round(wall, 1)}


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "r05"
    out = {"note": ("two consecutive fresh-process runs per config; "
                    "persistent cache dir ./.jax_cache set by bench.py "
                    "run_config")}
    for name in CONFIGS:
        runs = []
        for i in range(2):
            try:
                r = one_run(name)
            except subprocess.TimeoutExpired:
                r = {"failed": True, "timeout_s": TIMEOUT_S}
            runs.append(r)
            print(f"{name} run{i + 1}: {r}", flush=True)
        out[name] = {"first": runs[0], "second": runs[1]}
        c1, c2 = runs[0].get("compile_s"), runs[1].get("compile_s")
        if c1 is not None and c2 is not None:
            out[name]["cache_effective"] = bool(c2 < max(2.0, 0.3 * c1))
    path = os.path.join(ROOT, f"WARMPATH_{tag}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
