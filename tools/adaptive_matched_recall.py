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

    if args.quick and "adaptive_matched_recall.json" in os.path.basename(args.out):
        # never let the CI smoke clobber the REAL evidence bench.py
        # reads for its matched-recall line
        args.out = args.out.replace(".json", "_quick.json")

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
        # bench.py refuses quick-mode artifacts (toy shapes carry no
        # matched-recall evidence at the real scale)
        "quick": bool(args.quick),
        "shape": {"n_q": n_q, "n_train": n_train, "n_items": n_items},
        "fixed": {"n_anchors": fixed_anc, "top_k_retvr": fixed_retvr},
        "scenarios": {},
    }
    for rank in ranks:
        full, train = make_matrix(7, n_q, n_train, n_items, rank, noise=0.05)
        # AXN rank: smallest r capturing 97% of the train spectral energy
        # (the operator does NOT get to peek at the true generative rank)
        s = np.linalg.svd(train - train.mean(axis=0), compute_uv=False)
        energy = np.cumsum(s**2) / np.sum(s**2)
        axn_rank = int(np.searchsorted(energy, 0.97) + 1)
        # round-count sweep for the CUR backend: rounds are nearly free
        # (each adds one batched solve + one small projection; total CE
        # work depends only on the budget), and MORE rounds concentrate
        # the budget better — measured on rank150: 3 rounds match at
        # 200, 5 rounds at 150. AXN (non-headline) is swept at 3 rounds.
        scen = {}
        for method, rounds_grid in (("cur", (3, 5, 8)), ("axn", (3,))):
            for n_rounds in rounds_grid:
                res = matched_recall_budget(
                    full,
                    train,
                    fixed_n_anchors=fixed_anc,
                    fixed_top_k_retvr=fixed_retvr,
                    top_k=10,
                    n_rounds=n_rounds,
                    seeds=seeds,
                    budgets=budgets,
                    method=method,
                    axn_rank=axn_rank if method == "axn" else None,
                )
                res["rank"] = rank
                res["effective_speedup_at_matched_recall"] = (
                    None
                    if res["matched_budget"] is None
                    else round(res["fixed_cost"] / res["matched_budget"], 2)
                )
                key = f"{method}_r{n_rounds}"
                scen[key] = res
                print(json.dumps({f"rank{rank}.{key}": res}), flush=True)
        out["scenarios"][f"rank{rank}"] = scen

    # headline for bench.py: at the middle (realistic) rank, the
    # (method, rounds) with the smallest matched budget (ties -> fewer
    # rounds, cur before axn); fall back across scenarios
    headline = None
    for key in (f"rank{ranks[len(ranks) // 2]}",) + tuple(f"rank{r}" for r in ranks):
        matched = {
            mk: r["matched_budget"]
            for mk, r in out["scenarios"][key].items()
            if r["matched_budget"] is not None
        }
        if matched:
            # stated policy: smallest budget, ties -> fewer rounds, cur
            # before axn (a lexical key would put 'axn' first and order
            # 'r10' before 'r3')
            def _order(mk):
                r = out["scenarios"][key][mk]
                return (
                    r["matched_budget"],
                    r["n_rounds"],
                    0 if mk.startswith("cur") else 1,
                )

            best = min(matched, key=_order)
            res = out["scenarios"][key][best]
            headline = key
            out["headline_scenario"] = key
            out["headline_method"] = best.split("_r")[0]
            out["headline_n_rounds"] = res["n_rounds"]
            out["headline_matched_budget"] = res["matched_budget"]
            out["headline_axn_rank"] = res.get("axn_rank")
            break
    if headline is None:
        out["headline_scenario"] = None

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
