"""AXN factorized indexing: completion accuracy, adaptive query quality,
and comparison with CUR at equal budget."""

import numpy as np
import pytest

import jax.numpy as jnp

from anncur_tpu.core.axn import AxnIndex, axn_complete, axn_query, fit_item_embeddings
from anncur_tpu.core.metrics import topk_overlap_frac


def make(rng, n_q, n_train, n_items, rank, noise):
    a = rng.standard_normal((n_q + n_train, rank)).astype(np.float32)
    b = rng.standard_normal((rank, n_items)).astype(np.float32)
    m = a @ b + noise * rng.standard_normal((n_q + n_train, n_items)).astype(np.float32)
    return m[:n_q], m[n_q:]


def test_fit_and_complete_exact_on_low_rank(rng):
    full, train = make(rng, 6, 50, 120, rank=5, noise=0.0)
    index = fit_item_embeddings(train, rank=8)
    assert index.rank == 8
    ids = np.arange(0, 120, 10)  # 12 observed >= rank 5
    approx = np.asarray(axn_complete(index, jnp.asarray(ids), jnp.asarray(full[:, ids]), lam=1e-6))
    # queries live in the train row space for a shared low-rank model
    np.testing.assert_allclose(approx, full, atol=0.3, rtol=0.1)
    _, top = jnp.asarray(approx).max(axis=1), np.argmax(approx, axis=1)
    np.testing.assert_array_equal(top, np.argmax(full, axis=1))


def test_axn_query_budget_and_exactness(rng):
    full, train = make(rng, 5, 40, 150, rank=6, noise=0.05)
    index = fit_item_embeddings(train, rank=10)

    calls = []

    def score_items(ids):
        calls.append(len(ids))
        return full[:, ids]

    scores, ids = axn_query(index, score_items, 150, total_budget=40, n_rounds=2, top_k=5)
    assert scores.shape == (5, 5)
    for i in range(5):
        np.testing.assert_allclose(scores[i], full[i, ids[i]], rtol=1e-5)
    # per-query budget respected: round0 shared + unique(round1) <= q*per_round
    assert calls[0] == 20


def test_axn_vs_cur_equal_budget(rng):
    # high-rank regime: learned embeddings + MULTI-round adaptivity beat
    # fixed-anchor CUR clearly (measured: 1.00 vs 0.81 seed-mean at
    # budget 80 / 3 rounds; at 2 rounds the two are statistically tied
    # ~0.78 vs 0.81 — adaptivity needs rounds to concentrate)
    full, train = make(rng, 16, 100, 500, rank=50, noise=0.1)
    exact_top = np.argsort(-full, axis=1)[:, :10]
    index = fit_item_embeddings(train, rank=60)

    def score_items(ids):
        return full[:, ids]

    # both methods are stochastic (random round-0 anchors) and can be
    # within a point of each other at a single seed — compare seed means
    from anncur_tpu.core.adaptive import adaptive_recall_vs_fixed

    axn_recalls, fixed_recalls = [], []
    for seed in range(3):
        _, axn_ids = axn_query(
            index, score_items, 500, total_budget=80, n_rounds=3, top_k=10, seed=seed
        )
        axn_recalls.append(float(np.asarray(
            topk_overlap_frac(jnp.asarray(axn_ids), jnp.asarray(exact_top))).mean()))
        _, fixed = adaptive_recall_vs_fixed(full, train, 80, n_rounds=3, top_k=10, seed=seed)
        fixed_recalls.append(fixed)
    axn_recall = float(np.mean(axn_recalls))
    fixed_recall = float(np.mean(fixed_recalls))
    assert axn_recall >= fixed_recall + 0.05, (axn_recall, fixed_recall)
    assert axn_recall > 0.6, axn_recall


def test_adaptive_methods_via_inductive_eval(tmp_path, rng):
    from anncur_tpu.evalx.aggregate import recall_vs_cost_table
    from anncur_tpu.evalx.inductive import run_inductive_eval

    full, train = make(rng, 12, 60, 200, rank=20, noise=0.1)
    for method in ("adaptive_cur", "axn"):
        res = run_inductive_eval(
            full, train, str(tmp_path), method=method,
            top_k_vals=[10], n_ent_anchors_vals=[30, 60],
            top_k_retvr_vals=[1],
        )
        node = res["top_k=10"]["k_retvr=0"]
        assert "anc_n_e=30" in node and "anc_n_e=60" in node
        r30 = node["anc_n_e=30"]["exact_vs_reranked_approx_retvr~common_frac_mean"]
        r60 = node["anc_n_e=60"]["exact_vs_reranked_approx_retvr~common_frac_mean"]
        assert r60 >= r30 - 0.1  # more budget shouldn't hurt
        rows = recall_vs_cost_table(res, method, top_k=10)
        assert rows[0]["cost"] == 30  # cost = budget (k_retvr=0)


def test_axn_budget_below_topk_fills_with_minus_one(rng):
    full, train = make(rng, 3, 30, 80, rank=5, noise=0.0)
    index = fit_item_embeddings(train, rank=8)

    def score_items(ids):
        return full[:, ids]

    scores, ids = axn_query(index, score_items, 80, total_budget=4, n_rounds=1, top_k=8)
    assert np.all(ids[:, 4:] == -1) and np.all(np.isneginf(scores[:, 4:]))
    assert np.all(ids[:, :4] >= 0)
