"""Eval harness tests.

The key oracle: the vectorized retrieve->rerank must equal a literal
numpy transcription of the reference's per-mention loop (mask-fill at
-1e14 then topk; run_retrieval_eval_wrt_exact_crossenc.py:97-117).
"""

import json
import os

import numpy as np
import pytest

from anncur_tpu.evalx.core import eval_approx_for_all_topk, retrieve_rerank
from anncur_tpu.evalx.inductive import cur_project_test_scores, run_inductive_eval
from anncur_tpu.evalx.transductive import (
    fixed_anc_ent_approx,
    run_approx_eval_w_seed,
    run_transductive_eval,
    sample_anchors,
)
from anncur_tpu.evalx.aggregate import (
    avg_results,
    best_recall_at_cost,
    combine_result_files,
    flatten_result_tree,
    recall_vs_cost_table,
)


def reference_loop_rerank(exact, approx, top_k, top_k_retvr):
    """Literal transcription of the reference per-mention loop."""
    n_m, n_e = exact.shape
    exact_idx, rr_idx = [], []
    for i in range(n_m):
        e_order = np.argsort(-exact[i], kind="stable")[:top_k]
        a_order = np.argsort(-approx[i], kind="stable")[:top_k_retvr]
        temp = np.full(n_e, -99999999999999.0)
        temp[a_order] = exact[i][a_order]
        r_order = np.argsort(-temp, kind="stable")[:top_k]
        exact_idx.append(e_order)
        rr_idx.append(r_order)
    return np.stack(exact_idx), np.stack(rr_idx)


def test_retrieve_rerank_matches_reference_loop(rng):
    exact = rng.standard_normal((20, 100)).astype(np.float32)
    approx = exact + 0.5 * rng.standard_normal((20, 100)).astype(np.float32)
    out = retrieve_rerank(exact, approx, top_k=10, top_k_retvr=30)
    want_exact, want_rr = reference_loop_rerank(exact, approx, 10, 30)
    got_exact = np.asarray(out["exact_indices"])
    got_rr = np.asarray(out["reranked_indices"])
    # same SETS (tie order may differ between stable sorts)
    for row in range(20):
        assert set(got_exact[row]) == set(want_exact[row])
        assert set(got_rr[row]) == set(want_rr[row])


def test_eval_all_topk_skips_large_k(rng):
    exact = rng.standard_normal((8, 50)).astype(np.float32)
    res = eval_approx_for_all_topk(exact, exact, [1, 10, 100], top_k_retvr=10)
    assert set(res.keys()) == {1, 10}
    # approx == exact -> perfect overlap
    for k in res:
        assert res[k]["exact_vs_reranked_approx_retvr~common_frac_mean"] == 1.0


def test_transductive_seed_eval_low_rank(low_rank_factory):
    mat = low_rank_factory(n=60, m=80, rank=5)
    res = run_approx_eval_w_seed(
        "cur", mat, n_ment_anchors=20, n_ent_anchors=16, top_k=5, top_k_retvr=20, seed=0
    )
    assert set(res.keys()) == {"anchor", "non_anchor", "all"}
    # rank-5 matrix with 16 anchors: recall should be perfect
    assert res["all"]["exact_vs_reranked_approx_retvr~common_frac_mean"] > 0.99
    assert res["all"]["approx_error_relative"] < 0.01
    # oracle at least as good
    res_o = run_approx_eval_w_seed(
        "cur_oracle", mat, 20, 16, top_k=5, top_k_retvr=20, seed=0
    )
    assert (
        res_o["all"]["approx_error_relative"]
        <= res["all"]["approx_error_relative"] + 1e-6
    )


def test_anchor_sampling_matches_reference():
    # identical to: sorted(np.random.default_rng(seed).choice(n, k, False))
    got = sample_anchors(np.random.default_rng(seed=7), 100, 10)
    want = np.asarray(sorted(np.random.default_rng(seed=7).choice(100, size=10, replace=False)))
    np.testing.assert_array_equal(got, want)


def test_transductive_full_sweep_json(tmp_path, low_rank_factory):
    mat = low_rank_factory(n=40, m=60, rank=4)
    res = run_transductive_eval(
        mat,
        str(tmp_path),
        methods=("cur", "cur_oracle"),
        n_seeds=2,
        n_ment_anchors_vals=[10, 20],
        n_ent_anchors_vals=[8, 16],
        top_k_vals=[5],
        top_k_retvr_vals=[16],
    )
    path = os.path.join(str(tmp_path), "retrieval_wrt_exact_crossenc.json")
    assert os.path.exists(path)
    with open(path) as fin:
        loaded = json.load(fin)
    node = loaded["cur"]["top_k=5"]["k_retvr=16"]["anc_n_m=10~anc_n_e=8"]
    assert "all" in node and "exact_vs_reranked_approx_retvr~common_frac_mean" in node["all"]


def test_inductive_cur_perfect_on_low_rank(tmp_path, low_rank_factory):
    mat = low_rank_factory(n=80, m=64, rank=4)
    train, test = mat[:50], mat[50:]
    res = run_inductive_eval(
        test,
        train,
        str(tmp_path),
        method="cur",
        top_k_vals=[1, 10],
        top_k_retvr_vals=[16],
        n_ent_anchors_vals=[8],
    )
    node = res["top_k=10"]["k_retvr=16"]["anc_n_e=8"]
    assert node["exact_vs_reranked_approx_retvr~common_frac_mean"] > 0.99
    assert os.path.exists(os.path.join(str(tmp_path), "method=cur_s=0", "res.json"))


def test_cur_project_test_scores(low_rank_factory):
    mat = low_rank_factory(n=60, m=40, rank=3)
    anchors = np.arange(0, 40, 5)
    approx = cur_project_test_scores(mat[:40], mat[40:, anchors], anchors)
    np.testing.assert_allclose(approx, mat[40:], atol=5e-2, rtol=1e-2)


def test_fixed_anc_ent_approx_shape(rng):
    exact = rng.standard_normal((10, 30)).astype(np.float32)
    e2e = rng.standard_normal((30, 5)).astype(np.float32)
    anchors = np.arange(5)
    approx = fixed_anc_ent_approx(exact, e2e, anchors)
    assert approx.shape == (10, 30)


def test_aggregate_and_cost_tables(tmp_path, low_rank_factory):
    mat = low_rank_factory(n=40, m=50, rank=4)
    res = run_inductive_eval(
        mat[20:], mat[:20], str(tmp_path), method="cur",
        top_k_vals=[10], top_k_retvr_vals=[10, 20], n_ent_anchors_vals=[8, 16],
    )
    rows = recall_vs_cost_table(res, "cur", top_k=10)
    assert rows and rows[0]["cost"] == 18  # 10 + 8
    best = best_recall_at_cost(rows, max_cost=30)
    assert best is not None and best["cost"] <= 30

    flat = flatten_result_tree(res)
    assert any("common_frac_mean" in k for k in flat)

    combined = combine_result_files(
        os.path.join(str(tmp_path), "method=*", "res.json"),
        str(tmp_path / "combined.json"),
    )
    assert combined

    avg = avg_results(
        {"d1": {"acc": "80.0", "mrr": "85.0"}, "d2": {"acc": "60.0", "mrr": "75.0"}},
        weights={"d1": 3, "d2": 1},
    )
    assert avg["macro"]["acc"] == 70.0
    assert avg["micro"]["acc"] == 75.0


def test_eval_approx_grid_matches_per_point_evaluator(rng):
    """The rank-based grid evaluator must produce the SAME stats as the
    jitted per-(k, kr) retrieve_rerank path for every grid point."""
    from anncur_tpu.evalx.core import eval_approx_for_all_topk, eval_approx_grid

    exact = rng.standard_normal((12, 80)).astype(np.float32)
    approx = (exact + 0.3 * rng.standard_normal(exact.shape)).astype(np.float32)
    top_k_vals = [1, 5, 10]
    kr_vals = [5, 10, 17, 40, 80]
    grid = eval_approx_grid(exact, approx, top_k_vals, kr_vals)
    for kr in kr_vals:
        want = eval_approx_for_all_topk(exact, approx, top_k_vals, kr)
        for k, metrics in want.items():
            got = grid[kr][k]
            for name, val in metrics.items():
                assert abs(got[name] - float(val)) < 1e-6, (kr, k, name, got[name], val)
