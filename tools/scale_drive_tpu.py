"""Flagship end-to-end scale drive on the real TPU (VERDICT r3 item 4).

Runs BASELINE config shapes end-to-end and records per-stage wall-clock
plus recall-vs-budget curves into benchmarks/scale_drive_r3.json:

1. offline_build   — bert-base CE score matrix, n_ment x 10031 entities
                     (config #5 shape; mention count subsampled for
                     wall-clock, full-corpus entity axis).
2. transductive    — config #1: CUR + oracle on the full 3374 x 10031
                     synthetic matrix, anchor-grid sweep.
3. inductive       — config #3: fixed train/test split, unseen-query
                     projection, recall vs anchor budget.
4. adaptive_axn    — recall-vs-budget curves for the fused adaptive
                     engine, CUR and AXN backends, on the same matrix.
5. retrieve_rerank — config #4: bi-encoder top-64 + CE rerank e2e.

The score MATRIX is synthetic (low-rank + noise — the rank probe
confirms real CE matrices are effectively low-rank; ZeShEL data and
trained checkpoints are unobtainable offline, BASELINE.md). Encoders are
real bert-base forwards on the TPU; recall numbers come from the
matrix-oracle evals, wall-clock numbers from the real encoder stages.

Usage: python tools/scale_drive_tpu.py [--quick] [--out PATH]
  --quick shrinks every stage for a CPU smoke run (CI).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("ANNCUR_ALLOW_CPU", "1")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "benchmarks",
            "scale_drive_r3.json",
        ),
    )
    ap.add_argument(
        "--work-dir", default="/tmp/scale_drive_r3",
        help="stage outputs + build chunk files (resume lives here)",
    )
    ap.add_argument(
        "--stage4-only", action="store_true",
        help="internal: run only the adaptive/AXN oracle sweep on CPU and "
        "print its JSON (the oracle program family at q=128 can crash the "
        "remote TPU worker — it is pure matrix math, so it runs on host)",
    )
    args = ap.parse_args()

    import jax

    from anncur_tpu.utils.platform import enable_compilation_cache

    if args.quick or args.stage4_only:
        jax.config.update("jax_platforms", "cpu")
    enable_compilation_cache()  # no-op on cpu (platform.py)
    import jax.numpy as jnp

    from anncur_tpu.core.adaptive_fused import adaptive_recall_oracle, fixed_anchor_recall
    from anncur_tpu.evalx.inductive import run_inductive_eval
    from anncur_tpu.evalx.retrieve_rerank import run_retrieve_rerank_eval
    from anncur_tpu.evalx.transductive import run_transductive_eval
    from anncur_tpu.indexer import ScoreMatrixBuilder
    from anncur_tpu.models.bert import BertSpec
    from anncur_tpu.models.biencoder import BiEncoder
    from anncur_tpu.models.crossencoder import CrossEncoder
    from anncur_tpu.parallel import make_mesh

    out = {
        "platform": jax.devices()[0].platform,
        "n_devices": len(jax.devices()),
        "stages": {},
    }
    if args.quick:
        n_ments_full, n_ents, rank = 128, 512, 30
        build_ments, rr_ments = 8, 16
        anc_grid, ent_anc_grid = [20, 50], [20, 50]
        budgets = (30, 60)
        n_train_ind, n_test_ind, n_q_ada = 64, 32, 16
        spec = BertSpec.tiny(vocab_size=512)
        compute_dtype = jnp.float32
        top_k_retvr_tr = 50
    else:
        n_ments_full, n_ents, rank = 3374, 10031, 200
        build_ments = int(os.environ.get("DRIVE_BUILD_MENTS", "256"))
        rr_ments = 256
        anc_grid = [50, 100, 200, 500, 1000, 2000]
        ent_anc_grid = [50, 100, 200, 500, 1000, 2000]
        budgets = (60, 100, 150, 200, 300, 400, 600)
        n_train_ind, n_test_ind, n_q_ada = 500, 500, 128
        spec = BertSpec()  # bert-base
        compute_dtype = jnp.bfloat16
        top_k_retvr_tr = 500

    rng = np.random.default_rng(0)
    out_dir = args.work_dir
    os.makedirs(out_dir, exist_ok=True)

    # synthetic full matrix at exact yugioh scale (own rng stream so the
    # stage-4 subprocess reproduces it without replaying other draws)
    mrng = np.random.default_rng(42)
    a = mrng.standard_normal((n_ments_full, rank)).astype(np.float32)
    b = mrng.standard_normal((rank, n_ents)).astype(np.float32)
    mat = a @ b + 0.05 * np.sqrt(rank) * mrng.standard_normal(
        (n_ments_full, n_ents)
    ).astype(np.float32)
    train_scores = mat[:n_train_ind]

    def stage4():
        """Adaptive/AXN recall-vs-budget sweep. Pure matrix math — runs
        on CPU: the q=128 oracle program family has crashed the remote
        axon TPU worker ('kernel fault', nondeterministic) and a cold
        compile measured 21 min there vs seconds on host. The TPU
        evidence for the adaptive engine is bench.py line 3 (the real
        CE-scored path at serving shapes)."""
        full_q = mat[-n_q_ada:]
        t0 = time.time()
        fixed600 = fixed_anchor_recall(
            full_q, train_scores,
            50 if args.quick else 500,
            20 if args.quick else 100,
            10, seed=0,
        )
        sweep = {"cur": {}, "axn": {}}
        s = np.linalg.svd(train_scores - train_scores.mean(axis=0), compute_uv=False)
        energy = np.cumsum(s**2) / np.sum(s**2)
        axn_rank = int(np.searchsorted(energy, 0.97) + 1)
        for bgt in budgets:
            sweep["cur"][bgt] = round(
                adaptive_recall_oracle(full_q, train_scores, bgt, 3, 10, seed=0), 4
            )
            sweep["axn"][bgt] = round(
                adaptive_recall_oracle(
                    full_q, train_scores, bgt, 3, 10, seed=0, method="axn",
                    axn_rank=axn_rank,
                ),
                4,
            )
        return {
            "wall_s": round(time.time() - t0, 1),
            "fixed_anchor_recall@10_at_cost600": round(fixed600, 4),
            "axn_rank_97pct_energy": axn_rank,
            "recall_vs_budget": sweep,
            "backend": jax.devices()[0].platform,
        }

    if args.stage4_only:
        print("STAGE4_JSON " + json.dumps(stage4()), flush=True)
        return

    mesh = make_mesh((len(jax.devices()),), ("data",))

    # ---- 1. offline build: real CE forwards at corpus scale ----------- #
    lm = le = 16 if args.quick else 128
    ce = CrossEncoder(spec=spec, compute_dtype=compute_dtype)
    ce_params = ce.init(jax.random.PRNGKey(0))
    ment_toks = rng.integers(1, spec.vocab_size, size=(build_ments, lm)).astype(np.int32)
    ent_toks = rng.integers(1, spec.vocab_size, size=(n_ents, le)).astype(np.int32)
    builder = ScoreMatrixBuilder(
        ce, mesh, ment_block=4 if args.quick else 32,
        ent_block=8 if args.quick else 64,
        pair_pad_multiple=32 if args.quick else 128,
    )
    resumed = os.path.exists(os.path.join(out_dir, "build_chunks", "chunk_0.npz"))
    builder(ce_params, ment_toks[:4], ent_toks[:256] if args.quick else ent_toks)  # compile
    t0 = time.time()
    # chunk_dir: a rerun of the drive resumes the 14-minute build from
    # its chunk files instead of recomputing
    built = builder(
        ce_params, ment_toks, ent_toks,
        chunk_dir=os.path.join(out_dir, "build_chunks"), chunk_rows=64,
    )
    dt = time.time() - t0
    assert built.shape == (build_ments, n_ents) and np.all(np.isfinite(built))
    out["stages"]["offline_build"] = {
        "n_ments": build_ments,
        "n_ents": n_ents,
        "pairs": build_ments * n_ents,
        "wall_s": round(dt, 1),
        "pairs_per_s": round(build_ments * n_ents / dt, 1),
        "resumed_from_chunks": resumed,
        "note": "bert-base CE, full entity axis; mention count subsampled for "
        "wall-clock; pairs_per_s only meaningful when not resumed",
    }
    print(json.dumps({"offline_build": out["stages"]["offline_build"]}), flush=True)

    # ---- 2. transductive (config #1) ---------------------------------- #
    # cur over the full anchor grid (device-side f32 pinvs, fast);
    # cur_oracle only at two probe points — its U needs f64 HOST pinvs of
    # (n_ments x anc_e) AND (anc_m x n_ents), ~minutes PER POINT at this
    # scale (the reference pays the same; matrix_approx_zeshel.py:46-49)
    from anncur_tpu.evalx.transductive import run_approx_eval_w_seed

    t0 = time.time()
    res_tr = run_transductive_eval(
        mat,
        os.path.join(out_dir, "transductive"),
        methods=("cur",),
        n_seeds=1,
        n_ment_anchors_vals=anc_grid,
        n_ent_anchors_vals=ent_anc_grid,
        top_k_vals=[10],
        top_k_retvr_vals=[top_k_retvr_tr],
    )
    dt = time.time() - t0
    curve = {}
    node = res_tr["cur"]["top_k=10"][f"k_retvr={top_k_retvr_tr}"]
    for key, metrics in node.items():
        curve[key] = round(
            100.0
            * metrics["non_anchor"]["exact_vs_reranked_approx_retvr~common_frac_mean"],
            2,
        )
    t1 = time.time()
    probe = anc_grid[min(3, len(anc_grid) - 1)]
    oracle = run_approx_eval_w_seed("cur_oracle", mat, probe, probe, 10, top_k_retvr_tr, seed=0)
    plain = run_approx_eval_w_seed("cur", mat, probe, probe, 10, top_k_retvr_tr, seed=0)
    key = "exact_vs_reranked_approx_retvr~common_frac_mean"
    out["stages"]["transductive"] = {
        "wall_s": round(dt, 1),
        "grid_points": len(node),
        "non_anchor_recall@10_pct": curve,
        "oracle_probe": {
            "anchors": probe,
            "oracle_recall_pct": round(100 * oracle["all"][key], 2),
            "cur_recall_pct": round(100 * plain["all"][key], 2),
            "wall_s": round(time.time() - t1, 1),
        },
    }
    print(json.dumps({"transductive": out["stages"]["transductive"]}), flush=True)

    # ---- 3. inductive (config #3) ------------------------------------- #
    # both pinv policies: eps-default AND condition-aware 'auto' — the
    # near-square anchor point (n_anc == n_train) collapses under the
    # eps cutoff and 'auto' repairs it (ops/pinv.py::auto_rcond)
    test_scores = mat[-n_test_ind:]
    tk = "top_k=100" if not args.quick else "top_k=10"
    kr = "k_retvr=100" if not args.quick else "k_retvr=20"
    out["stages"]["inductive"] = {"n_train": n_train_ind, "n_test": n_test_ind}
    t0 = time.time()
    for rcond in (None, "auto"):
        res_ind = run_inductive_eval(
            test_scores,
            train_scores,
            os.path.join(out_dir, "inductive"),
            method="cur",
            seed=0,
            top_k_vals=[1, 10, 100] if not args.quick else [10],
            top_k_retvr_vals=[100] if not args.quick else [20],
            n_ent_anchors_vals=ent_anc_grid,
            rcond=rcond,
            misc="" if rcond is None else f"_rcond={rcond}",
        )
        ind_curve = {}
        for anc_key, metrics in res_ind[tk][kr].items():
            ind_curve[anc_key] = round(
                100.0 * metrics["exact_vs_reranked_approx_retvr~common_frac_mean"], 2
            )
        out["stages"]["inductive"][
            f"recall_vs_anchors_{tk}_{kr}_pct_rcond={rcond}"
        ] = ind_curve
    out["stages"]["inductive"]["wall_s"] = round(time.time() - t0, 1)
    print(json.dumps({"inductive": out["stages"]["inductive"]}), flush=True)

    # ---- 4. adaptive + AXN recall-vs-budget (CPU; see stage4 docstring)
    if jax.devices()[0].platform == "cpu":
        out["stages"]["adaptive_axn"] = stage4()
    else:
        import subprocess

        sub_args = [sys.executable, os.path.abspath(__file__), "--stage4-only"]
        if args.quick:
            sub_args.append("--quick")
        r = subprocess.run(sub_args, capture_output=True, text=True, timeout=3600)
        if r.returncode != 0:
            raise RuntimeError(f"stage4 subprocess failed:\n{r.stdout[-2000:]}{r.stderr[-2000:]}")
        line = next(l for l in r.stdout.splitlines() if l.startswith("STAGE4_JSON "))
        out["stages"]["adaptive_axn"] = json.loads(line[len("STAGE4_JSON "):])
    print(json.dumps({"adaptive_axn": out["stages"]["adaptive_axn"]}), flush=True)

    # ---- 5. retrieve-and-rerank e2e (config #4) ----------------------- #
    bienc = BiEncoder(
        spec=spec, pooling_type="cls_w_lin", embed_dim=spec.hidden_size,
        compute_dtype=compute_dtype,
    )
    bi_params = bienc.init(jax.random.PRNGKey(1))
    gt = rng.integers(0, n_ents, size=rr_ments).astype(np.int64)
    rr_toks = (
        ment_toks[:rr_ments]
        if build_ments >= rr_ments
        else rng.integers(1, spec.vocab_size, size=(rr_ments, lm)).astype(np.int32)
    )
    rr_kwargs = dict(top_k=64, batch_size=64, mesh=mesh)
    t0 = time.time()
    rr = run_retrieve_rerank_eval(
        bienc, bi_params, ce, ce_params, rr_toks, ent_toks, gt, **rr_kwargs
    )
    cold = time.time() - t0
    t0 = time.time()  # warm: programs compiled, corpus embeds recomputed
    rr = run_retrieve_rerank_eval(
        bienc, bi_params, ce, ce_params, rr_toks, ent_toks, gt, **rr_kwargs
    )
    dt = time.time() - t0
    out["stages"]["retrieve_rerank"] = {
        "wall_s": round(dt, 1),
        "cold_wall_s": round(cold, 1),
        "n_ments": rr_ments,
        "n_ents": n_ents,
        "ments_per_s_warm": round(rr_ments / dt, 2),
        "note": "random-init towers: wall-clock/flow at scale; quality via matrix evals above",
    }
    print(json.dumps({"retrieve_rerank": out["stages"]["retrieve_rerank"]}), flush=True)

    out["total_wall_s"] = round(
        sum(s["wall_s"] for s in out["stages"].values()), 1
    )
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
