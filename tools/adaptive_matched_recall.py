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

from anncur_tpu.core.adaptive_fused import (  # noqa: E402
    adaptive_recall_oracle_early_stop,
    fixed_anchor_recall,
    matched_recall_budget,
)


def make_matrix(seed, n_q, n_train, n_items, rank, noise):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n_q + n_train, rank)).astype(np.float32)
    b = rng.standard_normal((rank, n_items)).astype(np.float32)
    m = a @ b + noise * np.sqrt(rank) * rng.standard_normal(
        (n_q + n_train, n_items)
    ).astype(np.float32)
    return m[:n_q], m[n_q:]


def load_trained_ce(path):
    """(full, train, meta) from tools/make_trained_ce_matrix.py's npz —
    the round-4 evidence family: a score matrix from a CE that actually
    LEARNED (eval rows are queries the CE never trained on)."""
    d = np.load(path)
    scores = np.asarray(d["scores"], np.float32)
    n_train, n_q = int(d["n_train"]), int(d["n_q"])
    train = scores[:n_train]
    full = scores[n_train : n_train + n_q]
    meta = json.loads(str(d["meta"]))
    return full, train, meta


def early_stop_sweep(full, train, fixed_anc, fixed_retvr, seeds, configs):
    """recall/avg-budget of the early-stop engine per (base, ceiling)
    config, vs the fixed-anchor recall at cost fixed_anc+fixed_retvr.
    The engine's own convergence test decides who escalates — the
    budget adapts per query instead of being a global constant."""
    fixed = float(
        np.mean(
            [
                fixed_anchor_recall(full, train, fixed_anc, fixed_retvr, 10, s)
                for s in seeds
            ]
        )
    )
    out = {"fixed_recall": fixed, "fixed_cost": fixed_anc + fixed_retvr, "configs": {}}
    for base, base_rounds, ceiling, esc_rounds in configs:
        recs, avgs, fracs = [], [], []
        for s in seeds:
            rec, avg_b, frac = adaptive_recall_oracle_early_stop(
                full, train, base, base_rounds, ceiling, esc_rounds,
                top_k=10, seed=s,
            )
            recs.append(rec), avgs.append(avg_b), fracs.append(frac)
        key = f"b{base}r{base_rounds}_e{ceiling}r{esc_rounds}"
        out["configs"][key] = {
            "base_budget": base,
            "base_rounds": base_rounds,
            "escalate_budget": ceiling,
            "escalate_rounds": esc_rounds,
            "recall": float(np.mean(recs)),
            "avg_budget": float(np.mean(avgs)),
            "frac_escalated": float(np.mean(fracs)),
            "matches_fixed": bool(np.mean(recs) >= fixed),
        }
    return out


def compute_headline(out, max_round_width=64):
    """Fill the headline_* fields of an artifact dict in place.

    Headline for bench.py — WORST CASE across scenarios (round-4
    policy, VERDICT r3 weak #1): per scenario take the best (smallest)
    matched budget over its method/round variants; the headline quotes
    the scenario where that best is LARGEST, so the budget bench line 3
    runs is sufficient on every committed spectrum (including the
    trained-CE matrix when present).

    ``max_round_width`` excludes variants whose per-round candidate
    width (budget / n_rounds) exceeds the bound. History: wide-round
    adaptive programs crashed the remote TPU worker (round 4, q=512:
    budget-300 3-round = width-100 rounds killed it 2/2/3). ROUND 5
    root-caused it to the COMPOSITE program (every isolated stage runs
    fine, benchmarks/wide_round_probe.json) and the engine now TILES
    wide rounds into <=64-wide sub-picks internally
    (adaptive_fused.ROUND_WIDTH_CAP) — the same config runs to
    completion on chip, so the cap is no longer a crash guard. It stays
    as headline POLICY because at equal budget MORE rounds give
    equal-or-better recall anyway (e.g. rank400 @300: 0.37 (3r) vs
    0.47 (5r)); pass --max_round_width 10000 to lift it."""

    def _variants(scen):
        v = {}
        for mk, r in scen.items():
            if not (isinstance(r, dict) and r.get("matched_budget") is not None):
                continue
            if r["matched_budget"] / r["n_rounds"] > max_round_width:
                continue
            v[mk] = r
        return v

    per_scen_best = {}
    for key, scen in out["scenarios"].items():
        matched = _variants(scen)
        if not matched:
            continue

        # stated policy: smallest budget, ties -> fewer rounds (fewer
        # sequential solve/completion steps = higher q/s at equal CE
        # work), cur before axn (a lexical key would put 'axn' first
        # and order 'r10' before 'r3')
        def _order(mk):
            r = matched[mk]
            return (
                r["matched_budget"],
                r["n_rounds"],
                0 if mk.startswith("cur") else 1,
            )

        per_scen_best[key] = min(matched, key=_order)
    if per_scen_best:
        worst_key = max(
            per_scen_best,
            key=lambda k: out["scenarios"][k][per_scen_best[k]]["matched_budget"],
        )
        res = out["scenarios"][worst_key][per_scen_best[worst_key]]
        out["headline_scenario"] = worst_key
        out["headline_method"] = per_scen_best[worst_key].split("_r")[0]
        out["headline_n_rounds"] = res["n_rounds"]
        out["headline_matched_budget"] = res["matched_budget"]
        out["headline_axn_rank"] = res.get("axn_rank")
        out["headline_policy"] = (
            f"worst-case across scenarios; round width <= {max_round_width}"
        )
        out["per_scenario_best"] = {
            k: out["scenarios"][k][v]["matched_budget"]
            for k, v in per_scen_best.items()
        }
    else:
        out["headline_scenario"] = None

    # early-stop headline: the config that matches fixed recall on
    # EVERY scenario with the smallest worst-case average budget — one
    # engine config, per-query-adaptive cost (VERDICT r3 item 1b)
    es_ok = None
    es_scens = [s for s in out["scenarios"].values() if "early_stop" in s]
    common_cks = set.intersection(
        *(set(s["early_stop"]["configs"]) for s in es_scens)
    ) if es_scens else set()
    for ck in sorted(common_cks):
        rows = [s["early_stop"]["configs"][ck] for s in es_scens]
        r0 = rows[0]
        if (
            max(r0["base_budget"] / r0["base_rounds"],
                r0["escalate_budget"] / max(1, r0["escalate_rounds"]))
            > max_round_width
        ):
            continue
        if all(r["matches_fixed"] for r in rows):
            worst_avg = max(r["avg_budget"] for r in rows)
            if es_ok is None or worst_avg < es_ok["worst_avg_budget"]:
                es_ok = {
                    "config": ck,
                    "base_budget": r0["base_budget"],
                    "base_rounds": r0["base_rounds"],
                    "escalate_budget": r0["escalate_budget"],
                    "escalate_rounds": r0["escalate_rounds"],
                    "worst_avg_budget": worst_avg,
                    "per_scenario_avg_budget": {
                        k: s["early_stop"]["configs"][ck]["avg_budget"]
                        for k, s in out["scenarios"].items()
                        if "early_stop" in s
                    },
                }
    out["headline_early_stop"] = es_ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small shapes (CI smoke)")
    ap.add_argument(
        "--only", default="",
        help="comma-separated scenario names: re-sweep ONLY these, keep "
        "the rest from the existing artifact (incremental update)",
    )
    ap.add_argument(
        "--reheadline", action="store_true",
        help="recompute only the headline_* fields of an existing "
        "artifact (the sweeps are expensive; the headline policy is not)",
    )
    ap.add_argument(
        "--max-round-width", type=int, default=64,
        help="exclude variants whose per-round candidate width exceeds "
        "this (wide-round programs crash the remote TPU worker; see "
        "compute_headline docstring)",
    )
    ap.add_argument(
        "--es_only", action="store_true",
        help="re-run ONLY the early-stop sweep per scenario (reuses the "
        "existing artifact's budget sweeps; use after adding an "
        "es_config so every scenario carries it for the headline "
        "intersection)")
    ap.add_argument(
        "--budgets", type=int, nargs="+", default=None,
        help="override the budget grid (e.g. to refine the 200-250 gap "
        "for the worst-case scenario; keep it a superset of the "
        "standard grid so sweeps stay comparable)")
    ap.add_argument("--out", default=os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks", "adaptive_matched_recall.json"))
    args = ap.parse_args()

    if args.reheadline:
        with open(args.out) as f:
            out = json.load(f)
        compute_headline(out, args.max_round_width)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps({k: v for k, v in out.items() if k.startswith("headline")}))
        print(f"re-headlined {args.out}")
        return

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
        es_configs = ((30, 3, 120, 3),)
    else:
        n_q, n_train, n_items = 128, 500, 10000
        # 250 added round-4: the worst-case scenario (rank400) matches
        # somewhere in the 200-300 gap, and every grid point below 300
        # the headline can prove raises bench line 3's q/s ~budget-
        # proportionally
        budgets = (60, 100, 150, 200, 250, 300, 400, 600)
        fixed_anc, fixed_retvr = 500, 100
        seeds = (0, 1, 2)
        # effective rank regimes: well-approximable / realistic / hard
        ranks = (50, 150, 400)
        # early-stop grid: (base, base_rounds, ceiling, escalate_rounds)
        es_configs = (
            (60, 5, 300, 5),
            (100, 5, 210, 8),  # ceiling = the round-5 refined headline
            (100, 5, 250, 8),
            (100, 5, 300, 5),
            (100, 5, 450, 5),
            (150, 5, 450, 5),
        )
    if args.budgets:
        budgets = tuple(sorted(set(args.budgets)))

    out = {
        # bench.py refuses quick-mode artifacts (toy shapes carry no
        # matched-recall evidence at the real scale)
        "quick": bool(args.quick),
        "shape": {"n_q": n_q, "n_train": n_train, "n_items": n_items},
        "fixed": {"n_anchors": fixed_anc, "top_k_retvr": fixed_retvr},
        "scenarios": {},
    }
    # scenario family: three synthetic spectra + a TRAINED cross-
    # encoder's matrix per trained_ce_matrix*.npz artifact from
    # tools/make_trained_ce_matrix.py (round 4: the disjoint-title world,
    # 97%-energy rank 15; round 5 adds the shared-title hard world,
    # heavy-tailed — VERDICT r4 item 2). The headline below is the WORST
    # CASE across all of these, so bench line 3's budget is conservative
    # by construction.
    scenarios_in = [(f"rank{r}", r, None) for r in ranks]
    bench_dir = os.path.dirname(args.out)
    for fname, scen in (
        ("trained_ce_matrix.npz", "trained_ce"),
        ("trained_ce_matrix_hard.npz", "trained_ce_hard"),
    ):
        tce_path = os.path.join(bench_dir, fname)
        if args.quick:
            tce_path = tce_path.replace(".npz", "_quick.npz")
        if os.path.exists(tce_path):
            scenarios_in.append((scen, None, tce_path))
        else:
            print(f"# no {tce_path}; {scen} scenario skipped", file=sys.stderr)

    if args.only or args.es_only:
        # incremental: keep every other scenario from the existing
        # artifact, re-sweep only the named ones (sweeps are ~10 min per
        # scenario; adding one must not re-pay all of them)
        with open(args.out) as f:
            prev = json.load(f)
        out["scenarios"] = prev.get("scenarios", {})
        if args.only:
            want = set(args.only.split(","))
            missing = want - {s[0] for s in scenarios_in}
            if missing:
                raise SystemExit(f"--only names unknown scenarios: {sorted(missing)}")
            scenarios_in = [s for s in scenarios_in if s[0] in want]

    for scen_name, rank, tce_path in scenarios_in:
        if rank is not None:
            full, train = make_matrix(7, n_q, n_train, n_items, rank, noise=0.05)
            tce_meta = None
        else:
            full, train, tce_meta = load_trained_ce(tce_path)
        # AXN rank: 2x the smallest r capturing 97% of the train spectral
        # energy (capped at full rank; the operator does NOT peek at the
        # true generative rank). Round 4 fix for VERDICT r3 item 4: at
        # exactly the energy rank (135 on rank150) AXN needed ~2x CUR's
        # budget (b150 recall 0.24 vs 0.74); the discriminative structure
        # lives partly in the spectral TAIL, and doubling the fit rank
        # (270) recovers it — b150 0.742 vs CUR 0.737, b200 0.992 vs 1.0,
        # full rank 500 adds only +0.008. Together with lam_rel=1e-2
        # (core/adaptive_fused.py::axn_complete_batched) this closes the
        # gap to <=1.0x. Dim-capped PCR solves were the refuted
        # alternative (axn_complete_batched dim_cap_frac docstring).
        s = np.linalg.svd(train - train.mean(axis=0), compute_uv=False)
        energy = np.cumsum(s**2) / np.sum(s**2)
        energy_rank = int(np.searchsorted(energy, 0.97) + 1)
        axn_rank = int(min(2 * energy_rank, min(train.shape)))
        # round-count sweep for the CUR backend: rounds are nearly free
        # (each adds one batched solve + one small projection; total CE
        # work depends only on the budget), and MORE rounds concentrate
        # the budget better — measured on rank150: 3 rounds match at
        # 200, 5 rounds at 150. AXN swept at 3 and 5 rounds (its round-4
        # rank/lam fix was measured at 5 rounds).
        if args.es_only:
            scen = out["scenarios"][scen_name]
            scen["early_stop"] = early_stop_sweep(
                full, train, fixed_anc, fixed_retvr, seeds, es_configs
            )
            print(json.dumps({f"{scen_name}.early_stop": scen["early_stop"]}), flush=True)
            out["scenarios"][scen_name] = scen
            continue
        scen = {}
        for method, rounds_grid in (("cur", (3, 5, 8)), ("axn", (3, 5))):
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
                print(json.dumps({f"{scen_name}.{key}": res}), flush=True)
        if tce_meta is not None:
            scen["trained_ce_meta"] = tce_meta
        scen["early_stop"] = early_stop_sweep(
            full, train, fixed_anc, fixed_retvr, seeds, es_configs
        )
        print(json.dumps({f"{scen_name}.early_stop": scen["early_stop"]}), flush=True)
        out["scenarios"][scen_name] = scen

    compute_headline(out, args.max_round_width)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
