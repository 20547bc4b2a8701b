"""BASELINE config #1 at full scale: transductive CUR eval on a
yugioh-sized (3374 x 10031) score matrix.

The matrix is synthetic (low-rank + noise, mimicking the empirically
low-rank CE score matrices the rank probe confirms) because ZeShEL data
and trained checkpoints are not shipped in this environment; the point
is the harness itself at the reference's exact scale and sweep grid —
the reference's per-mention python loops take minutes per grid point on
this matrix, the vectorized evaluator takes seconds for the whole sweep.

    python examples/yugioh_scale_eval.py [out_dir]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("ANNCUR_ALLOW_CPU", "1")

import numpy as np


def main():
    import jax

    from anncur_tpu.evalx.plots import heat_map_from_transductive
    from anncur_tpu.evalx.transductive import run_transductive_eval

    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/yugioh_scale_eval"
    n_ments, n_ents, rank = 3374, 10031, 200

    print(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    print(f"synthesizing {n_ments}x{n_ents} rank-{rank} score matrix...")
    mat = (
        rng.standard_normal((n_ments, rank)) @ rng.standard_normal((rank, n_ents))
    ).astype(np.float32)
    mat += 0.05 * rng.standard_normal(mat.shape).astype(np.float32)

    t0 = time.time()
    res = run_transductive_eval(
        mat,
        out_dir,
        methods=("cur",),
        n_seeds=1,
        n_ment_anchors_vals=[50, 100, 200, 500, 1000, 2000],
        n_ent_anchors_vals=[50, 100, 200, 500, 1000, 2000],
        top_k_vals=[10],
        top_k_retvr_vals=[500],
    )
    dt = time.time() - t0
    n_points = sum(
        1 for k in res["cur"] for r in res["cur"][k] for _ in res["cur"][k][r]
    )
    print(f"full cur sweep: {n_points} grid points x 1 seed in {dt:.1f}s "
          f"({dt / max(n_points, 1):.2f}s per evaluation)", flush=True)
    # oracle upper bound at one grid point (full-matrix f64 pinv is the
    # dominant cost; the reference pays the same, :85-88)
    from anncur_tpu.evalx.transductive import run_approx_eval_w_seed

    t0 = time.time()
    oracle = run_approx_eval_w_seed("cur_oracle", mat, 500, 500, 10, 500, seed=0)
    plain = run_approx_eval_w_seed("cur", mat, 500, 500, 10, 500, seed=0)
    print(f"oracle vs cur @ (500,500): "
          f"recall {100 * oracle['all']['exact_vs_reranked_approx_retvr~common_frac_mean']:.2f}% "
          f"vs {100 * plain['all']['exact_vs_reranked_approx_retvr~common_frac_mean']:.2f}% "
          f"({time.time() - t0:.1f}s)", flush=True)

    node = res["cur"]["top_k=10"]["k_retvr=500"]
    for key in ("anc_n_m=500~anc_n_e=500", "anc_n_m=2000~anc_n_e=2000"):
        if key in node:
            r = node[key]["non_anchor"]["exact_vs_reranked_approx_retvr~common_frac_mean"]
            e = node[key]["non_anchor"]["approx_error_relative"]
            print(f"  cur {key}: non-anchor recall@10={100 * r:.2f}%  rel.frob={e:.4f}")

    hm = heat_map_from_transductive(res, "cur", 10, 500, out_dir)
    print(f"heat map: {hm}")


if __name__ == "__main__":
    main()
