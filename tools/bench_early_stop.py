"""On-chip early-stop adaptive serving benchmark (VERDICT r4 item 1).

The early-stop engine (core/retriever.py::query_tokens_adaptive_fused
with escalate_budget) makes matched recall a property of the ENGINE:
every query pays the base budget, and only queries whose top-k id set
was still churning in the last base round resume and spend the
difference (reference cost axis it must beat:
run_retrieval_eval_wrt_exact_crossenc.py:480-481 — a single global CE
budget). Until this tool, the config's correctness was tested and its
recall CPU-calibrated (benchmarks/adaptive_matched_recall.json
headline_early_stop), but no q/s number existed on hardware.

What this measures, on the real chip, for the calibrated config
(default b100r5_e250r8) at q=512 over the 10k-item bert-base corpus:

1. End-to-end q/s through the PUBLIC serving API at the two regime
   extremes, forced via ``stability_overlap`` (the engine's convergence
   threshold — forcing is honest: the programs are byte-identical in
   cost, only the stable-flag comparison constant differs):
     - ``stable_all``   (overlap=0.0): no row escalates — the
       easy-spectrum floor (rank50-like, 2.9% calibrated escalation).
     - ``escalate_all`` (overlap=1.01): every row escalates — the
       hard-spectrum worst case (rank150/rank400: 98-99% calibrated).
   Plus ``natural`` (overlap=1.0): the random-token landscape, whatever
   the detector says (sanity row, not a scenario claim).
2. Phase-2 (escalation) wall time per power-of-two bucket — the same
   program object the public path dispatches (_get_fused_continue_fn),
   timed at every bucket up to q. Compile seconds recorded per bucket:
   the O(log q)-shape-variants claim, with numbers.
3. Per-scenario derived q/s: each committed spectrum's CPU-calibrated
   frac_escalated -> bucket at q=512 -> t_phase1 + t_phase2[bucket].

Writes benchmarks/early_stop_serving.json. bench.py line 4 quotes the
worst case (escalate_all e2e).

Usage (real TPU; serialize with other TPU work):
    python -u tools/bench_early_stop.py [--q 512] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default=os.path.join(REPO, "benchmarks", "early_stop_serving.json"))
    ap.add_argument("--q", type=int, default=512)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--skip_buckets", action="store_true",
                    help="only the three e2e rows (quick re-measure)")
    ap.add_argument("--cpu", action="store_true",
                    help="host-CPU smoke run (tiny q; no perf claims)")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from anncur_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()

    amr_path = os.path.join(REPO, "benchmarks", "adaptive_matched_recall.json")
    with open(amr_path) as f:
        amr = json.load(f)
    es = amr["headline_early_stop"]
    base, base_rounds = es["base_budget"], es["base_rounds"]
    ceiling, esc_rounds = es["escalate_budget"], es["escalate_rounds"]
    extra = ceiling - base

    # absorb any pending worker recovery before anything is timed
    t0 = time.time()
    float(jnp.sum(jnp.ones((8, 8)) @ jnp.ones((8, 8))))
    warm_s = time.time() - t0

    from tools.bench_serving_latency import build_retriever

    retriever, train_scores, spec, rng = build_retriever(
        tiny=args.cpu, n_items=1000 if args.cpu else 10000
    )
    train_dev = jnp.asarray(train_scores, jnp.float32)
    q = args.q
    qt = rng.integers(1, spec.vocab_size, size=(q, 128)).astype(np.int32)

    results = {
        "config": es["config"],
        "q": q,
        "n_items": int(retriever.item_tokens.shape[0]),
        "warm_op_s": round(warm_s, 1),
        "e2e": {},
    }

    def run_e2e(name, overlap):
        kw = dict(
            total_budget=base, n_rounds=base_rounds, top_k=10,
            train_scores=train_dev, method="cur",
            escalate_budget=ceiling, escalate_rounds=esc_rounds,
            stability_overlap=overlap, return_stats=True,
        )
        t0 = time.time()
        _, _, stats = retriever.query_tokens_adaptive_fused(qt, **kw)
        compile_s = time.time() - t0
        times = []
        for _ in range(args.reps):
            t0 = time.time()
            _, _, stats = retriever.query_tokens_adaptive_fused(qt, **kw)
            times.append(time.time() - t0)
        med = float(np.median(times))
        row = {
            "stability_overlap": overlap,
            "qps": round(q / med, 2),
            "med_s": round(med, 3),
            "compile_plus_first_s": round(compile_s, 1),
            "avg_budget": round(stats["avg_budget"], 1),
            "frac_escalated": round(stats["frac_escalated"], 4),
            "times_s": [round(t, 3) for t in times],
        }
        results["e2e"][name] = row
        print(json.dumps({name: row}), flush=True)
        return med, row

    # order matters: stable_all first gives the phase-1-only time used
    # as the per-scenario base below
    t_phase1, _ = run_e2e("stable_all", 0.0)
    run_e2e("natural", 1.0)
    t_full, _ = run_e2e("escalate_all", 1.01)

    if not args.skip_buckets:
        # ---- phase-2 cost per bucket: the exact program object the
        # public path dispatches, with synthetic resume state (cost is
        # shape-driven; ids must be valid distinct item indices so the
        # candidate-exclusion masking inside the rounds stays realistic)
        from anncur_tpu.core.adaptive_fused import _bucket_size

        n_items = retriever.item_tokens.shape[0]
        items, _, _, valid_mask = retriever._device_consts()
        pad = retriever._padded_n_items() - train_scores.shape[1]
        tr = np.asarray(train_scores, np.float32)
        if pad:
            tr = np.pad(tr, ((0, 0), (0, pad)))
        train_padded = jnp.asarray(tr)
        st_ids = np.stack([
            rng.choice(n_items, size=base, replace=False).astype(np.int32)
            for _ in range(q)
        ])
        st_vals = rng.standard_normal((q, base)).astype(np.float32)
        lm = qt.shape[1]
        buckets = []
        b = 8  # _bucket_size's floor
        while b < q:
            buckets.append(b)
            b *= 2
        buckets.append(q)
        results["phase2_buckets"] = {}
        for b_pad in buckets:
            fn2 = retriever._get_fused_continue_fn(
                b_pad, lm, base, extra, esc_rounds, 10, 1e-6, "cur", 1e-2,
            )
            fargs = (
                retriever.params, jnp.asarray(qt[:b_pad]), items, train_padded,
                jnp.asarray(st_ids[:b_pad]), jnp.asarray(st_vals[:b_pad]),
                valid_mask,
            )
            t0 = time.time()
            out = fn2(*fargs)
            # force completion through a tiny fetch (CLAUDE.md: on the
            # axon tunnel block_until_ready can return with work queued)
            float(np.asarray(out[0][:2, :2]).sum())
            compile_s = time.time() - t0
            times = []
            for _ in range(args.reps):
                t0 = time.time()
                out = fn2(*fargs)
                float(np.asarray(out[0][:2, :2]).sum())
                times.append(time.time() - t0)
            med = float(np.median(times))
            row = {"med_s": round(med, 3), "compile_plus_first_s": round(compile_s, 1)}
            results["phase2_buckets"][str(b_pad)] = row
            print(json.dumps({f"phase2_b{b_pad}": row}), flush=True)

        # ---- per-scenario on-chip q/s at the CPU-calibrated escalation
        # fractions (adaptive_matched_recall.json is the recall evidence;
        # this table is its on-chip cost counterpart)
        results["per_scenario"] = {}
        for scen, s in amr["scenarios"].items():
            cfg = s["early_stop"]["configs"][es["config"]]
            frac = cfg["frac_escalated"]
            n_esc = int(round(frac * q))
            bucket = _bucket_size(n_esc, q) if n_esc else 0
            t = t_phase1 + (
                results["phase2_buckets"][str(bucket)]["med_s"] if bucket else 0.0
            )
            row = {
                "calibrated_frac_escalated": round(frac, 4),
                "bucket_at_q": bucket,
                "derived_qps": round(q / t, 2),
                "avg_budget_at_q": round(base + extra * (bucket or 0) / q, 1),
                "recall_vs_fixed600": cfg["recall"],
            }
            results["per_scenario"][scen] = row
            print(json.dumps({scen: row}), flush=True)

    results["platform"] = jax.devices()[0].platform
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as fout:
        json.dump(results, fout, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
