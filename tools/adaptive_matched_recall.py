"""Matched-recall budget search: the evidence artifact behind bench.py
line 3 (query_throughput_at_matched_recall).

The fixed-anchor query path is AT its CE-pairs/s roofline (CLAUDE.md:
5.07 q/s x 600 calls = the builder's own pairs/s ceiling), so the honest
route to higher effective q/s is spending FEWER CE calls per query at
the same recall. This tool measures, on yugioh-scale synthetic score
matrices (10k items, 500 train rows — BASELINE config #1 shape), the
recall@10 of the fused adaptive engine (core/adaptive_fused.py) across
budgets vs the fixed-anchor path at cost=600 (500 anchors + 100 rerank,
the reference cost axis at run_retrieval_eval_wrt_exact_crossenc.py:
480-481), and reports the smallest budget whose recall matches.

Runs on CPU (oracle matrices, no encoder); deterministic. Writes
benchmarks/adaptive_matched_recall.json, which bench.py reads for the
budget of its third line.

Usage: python tools/adaptive_matched_recall.py [--quick]
"""

import argparse
import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from anncur_tpu.core.adaptive_fused import matched_recall_budget  # noqa: E402


def make_matrix(seed, n_q, n_train, n_items, rank, noise):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n_q + n_train, rank)).astype(np.float32)
    b = rng.standard_normal((rank, n_items)).astype(np.float32)
    m = a @ b + noise * np.sqrt(rank) * rng.standard_normal(
        (n_q + n_train, n_items)
    ).astype(np.float32)
    return m[:n_q], m[n_q:]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small shapes (CI smoke)")
    ap.add_argument("--out", default=os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks", "adaptive_matched_recall.json"))
    args = ap.parse_args()

    if args.quick:
        n_q, n_train, n_items = 16, 80, 1000
        budgets = (30, 60, 120, 240)
        fixed_anc, fixed_retvr = 200, 40
        seeds = (0,)
        ranks = (60,)
    else:
        n_q, n_train, n_items = 128, 500, 10000
        budgets = (60, 100, 150, 200, 300, 400, 600)
        fixed_anc, fixed_retvr = 500, 100
        seeds = (0, 1, 2)
        # effective rank regimes: well-approximable / realistic / hard
        ranks = (50, 150, 400)

    out = {
        "shape": {"n_q": n_q, "n_train": n_train, "n_items": n_items},
        "fixed": {"n_anchors": fixed_anc, "top_k_retvr": fixed_retvr},
        "scenarios": {},
    }
    for rank in ranks:
        full, train = make_matrix(7, n_q, n_train, n_items, rank, noise=0.05)
        res = matched_recall_budget(
            full,
            train,
            fixed_n_anchors=fixed_anc,
            fixed_top_k_retvr=fixed_retvr,
            top_k=10,
            n_rounds=3,
            seeds=seeds,
            budgets=budgets,
        )
        res["rank"] = rank
        res["effective_speedup_at_matched_recall"] = (
            None
            if res["matched_budget"] is None
            else round(res["fixed_cost"] / res["matched_budget"], 2)
        )
        out["scenarios"][f"rank{rank}"] = res
        print(json.dumps({f"rank{rank}": res}), flush=True)

    # headline scenario for bench.py: the middle (realistic) rank; fall
    # back to the hardest matched one if it did not match
    headline = None
    for key in (f"rank{ranks[len(ranks) // 2]}",) + tuple(f"rank{r}" for r in ranks):
        if out["scenarios"][key]["matched_budget"] is not None:
            headline = key
            break
    out["headline_scenario"] = headline
    if headline:
        out["headline_matched_budget"] = out["scenarios"][headline]["matched_budget"]

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
