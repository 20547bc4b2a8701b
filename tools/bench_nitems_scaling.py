"""Adaptive-engine n_items scaling profile (VERDICT r4 item 4).

Round 4 measured adaptive budget-150 serving at 2.4 q/s on the 104k
military corpus vs 14.2 q/s at 10k and blamed the per-round
(q, n_train) @ (n_train, n_items) completion + (q, n_items) top_k.
THE MEASUREMENT REFUTED THAT STORY (DESIGN §28): with the train matrix
kept device-resident (the round-5 fix, DESIGN §27 — the 2.4 q/s was
its per-call host round trip, which scales with n_items), the curve is
FLAT 10k -> 104k at every batch size and b=512 sits at the CE roofline.
This tool measures that curve and the shortlist mitigation (now needed
only as a small b=1 latency trim):

- n_items in {10k, 30k, ~104k}: adaptive q/s at b=512 (throughput),
  b=8 and b=1 p50 (latency serving), fixed b=8 as the control, plus a
  rounds-attribution probe (n_rounds=1 vs 5 at b=8: round-0 cost is
  m-independent CE work, so the DELTA is the per-round O(m) overhead).
- the same grid with ``--shortlist L``: rounds 2+ complete only against
  a shared shortlist of L items picked by the round-1 full completion
  (semantics checked on CPU oracle, tests/test_adaptive_fused.py).

Corpus scale motivation: /root/reference/utils/zeshel_utils.py:6-42
(military: 104,520 entities). Writes benchmarks/nitems_scaling.json.

Usage (real TPU; serialize with other TPU work):
    python -u tools/bench_nitems_scaling.py [--n_items 10000 30000 104520]
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
    ap.add_argument("--out", default=os.path.join(REPO, "benchmarks", "nitems_scaling.json"))
    ap.add_argument("--n_items", type=int, nargs="+", default=[10000, 30000, 104520])
    ap.add_argument("--budget", type=int, default=0,
                    help="0 = the artifact's headline matched budget")
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--shortlist", type=int, default=0,
                    help="rounds 2+ pick candidates from a shared "
                    "L-item shortlist instead of the full corpus "
                    "(applies to ALL adaptive rows)")
    ap.add_argument("--shortlist_also", type=int, default=2048,
                    help="additionally time the adaptive rows with this "
                    "shortlist at each scale (0 disables) — one run "
                    "yields both the baseline curve and the mitigation")
    ap.add_argument("--skip_b512", action="store_true")
    ap.add_argument("--cpu", action="store_true", help="tiny smoke run")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from anncur_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()

    budget = args.budget
    if not budget:
        amr_path = os.path.join(REPO, "benchmarks", "adaptive_matched_recall.json")
        with open(amr_path) as f:
            amr = json.load(f)
        budget = int(amr["headline_matched_budget"])

    t0 = time.time()
    float(jnp.sum(jnp.ones((8, 8)) @ jnp.ones((8, 8))))
    warm_s = time.time() - t0

    from tools.bench_serving_latency import build_retriever

    out = {
        "budget": budget,
        "rounds": args.rounds,
        "shortlist": args.shortlist,
        "warm_op_s": round(warm_s, 1),
        "scales": {},
    }

    for n_items in args.n_items:
        retriever, train_scores, spec, rng = build_retriever(
            tiny=args.cpu, n_items=n_items
        )
        train_dev = jnp.asarray(train_scores, jnp.float32)
        scale = {}

        def timed(name, fn, b):
            t0 = time.time()
            fn()
            compile_s = time.time() - t0
            times = []
            for _ in range(args.reps):
                t0 = time.time()
                fn()
                times.append(time.time() - t0)
            med = float(np.median(times))
            row = {
                "p50_ms": round(med * 1000.0, 1),
                "qps": round(b / med, 2),
                "compile_plus_first_s": round(compile_s, 1),
            }
            scale[name] = row
            print(json.dumps({f"n{n_items}.{name}": row}), flush=True)

        def ada(b, n_rounds, bud, shortlist=args.shortlist):
            qt = rng.integers(1, spec.vocab_size, size=(b, 128)).astype(np.int32)
            return lambda: retriever.query_tokens_adaptive_fused(
                qt, total_budget=bud, n_rounds=n_rounds, top_k=10,
                train_scores=train_dev, method="cur",
                shortlist=shortlist or None,
            )

        qt8 = rng.integers(1, spec.vocab_size, size=(8, 128)).astype(np.int32)
        timed("fixed_b8", lambda: retriever.query_tokens_batch(
            qt8, top_k=10, top_k_retvr=100), 8)
        timed("adaptive_b1", ada(1, args.rounds, budget), 1)
        timed("adaptive_b8", ada(8, args.rounds, budget), 8)
        # attribution: same total CE budget in ONE round — no completion
        # rounds at all, so the m-dependent per-round work vanishes and
        # the residual cost is the (m-independent) CE scoring
        timed("adaptive_b8_r1", ada(8, 1, budget), 8)
        if not args.skip_b512:
            timed("adaptive_b512", ada(512, args.rounds, budget), 512)
        # shortlist rows at the LATENCY batches only: pool-membership
        # correctness needs L >= first + q*per + headroom (the guard in
        # query_tokens_adaptive_fused silently disables otherwise), so a
        # b=512 x per-50 row would need L ~ 26k — not a mitigation, and
        # the throughput regime already recovers via batching
        # (military_scale.json: 13 q/s at 104k b=512)
        sl = args.shortlist_also
        if sl and not args.shortlist:
            from anncur_tpu.core.adaptive_fused import split_rounds

            first, per, nr = split_rounds(budget, args.rounds)
            for b in (1, 8):
                # mirror the retriever's silent-disable guard: a row
                # whose pool can't hold the batch's picks would time the
                # FULL engine under an sl label (mislabeled artifact)
                need = first + b * per + per * max(1, nr - 2)
                if sl < need or sl >= n_items:
                    print(f"# skip adaptive_b{b}_sl{sl}: guard "
                          f"(need {need}, n_items {n_items})", flush=True)
                    continue
                timed(f"adaptive_b{b}_sl{sl}", ada(b, args.rounds, budget, sl), b)
        out["scales"][str(n_items)] = scale
        del retriever, train_dev

    out["platform"] = jax.devices()[0].platform
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as fout:
        json.dump(out, fout, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
