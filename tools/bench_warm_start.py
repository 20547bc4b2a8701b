"""Cold vs warm time-to-first-query with the persistent XLA compile
cache (VERDICT r4 item 5).

Serving pays 36-115 s of remote compile before the first query on every
process start (benchmarks/military_scale.json, serving_latency.json).
Round 5 wired jax's persistent compilation cache into every entry point
(utils/platform.py::enable_compilation_cache); this tool measures what
that buys: it runs the SAME serving child twice in fresh processes —
once against an empty cache directory (cold), once against the
directory the first run populated (warm) — and records the per-config
compile_plus-first-dispatch seconds from both.

The child is tools/bench_serving_latency.py restricted to the two
steady-state serving programs (fixed b=32, adaptive b=512), writing its
artifact to a temp path; this tool extracts the compile_s fields.

Writes benchmarks/warm_start.json.

Usage (real TPU; serialize with other TPU work):
    python -u tools/bench_warm_start.py
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_child(cache_dir: str, tag: str, tmo: int):
    env = dict(os.environ)
    env["ANNCUR_COMPILE_CACHE"] = cache_dir
    child_out = f"/tmp/warm_start_{tag}.json"
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, "-u", os.path.join(REPO, "tools", "bench_serving_latency.py"),
         "--out", child_out, "--reps", "2",
         "--fixed_batches", "32", "--ada_batches", "512"],
        env=env, capture_output=True, timeout=tmo, text=True,
    )
    wall = time.time() - t0
    if r.returncode != 0:
        tail = r.stderr.strip().splitlines()[-3:]
        raise RuntimeError(f"{tag} child failed rc={r.returncode}: {tail}")
    with open(child_out) as f:
        res = json.load(f)["results"]
    row = {
        "child_wall_s": round(wall, 1),
        "fixed_b32_compile_s": res["fixed_b32"]["compile_s"],
        "adaptive_b512_compile_s": res["adaptive_b512"]["compile_s"],
        "fixed_b32_p50_ms": res["fixed_b32"]["p50_ms"],
        "adaptive_b512_p50_ms": res["adaptive_b512"]["p50_ms"],
    }
    if "add_then_query" in res:
        row["add_then_query"] = res["add_then_query"]
    return row


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default=os.path.join(REPO, "benchmarks", "warm_start.json"))
    ap.add_argument("--cache_dir", default="/tmp/warm_start_xla_cache")
    ap.add_argument("--timeout", type=int, default=4800)
    args = ap.parse_args(argv)

    shutil.rmtree(args.cache_dir, ignore_errors=True)
    os.makedirs(args.cache_dir)
    out = {"cache_dir": args.cache_dir}
    out["cold"] = run_child(args.cache_dir, "cold", args.timeout)
    print(json.dumps({"cold": out["cold"]}), flush=True)
    out["cache_entries"] = sum(len(fs) for _, _, fs in os.walk(args.cache_dir))
    out["cache_mb"] = round(
        sum(
            os.path.getsize(os.path.join(d, f))
            for d, _, fs in os.walk(args.cache_dir) for f in fs
        ) / 1e6, 1,
    )
    out["warm"] = run_child(args.cache_dir, "warm", args.timeout)
    print(json.dumps({"warm": out["warm"]}), flush=True)
    for k in ("fixed_b32_compile_s", "adaptive_b512_compile_s"):
        c, w = out["cold"][k], out["warm"][k]
        out[k.replace("_compile_s", "_speedup")] = round(c / max(w, 1e-9), 1)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
