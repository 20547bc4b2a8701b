"""Adaptive multi-round CUR: correctness + it should not lose to
fixed-anchor CUR at equal CE budget on hard (higher-rank) matrices."""

import numpy as np
import pytest

from anncur_tpu.core.adaptive import adaptive_cur_query, adaptive_recall_vs_fixed


def make_matrix(rng, n_q, n_train, n_items, rank, noise):
    a = rng.standard_normal((n_q + n_train, rank)).astype(np.float32)
    b = rng.standard_normal((rank, n_items)).astype(np.float32)
    m = a @ b + noise * rng.standard_normal((n_q + n_train, n_items)).astype(np.float32)
    return m[:n_q], m[n_q:]


def test_adaptive_query_basic(rng):
    full, train = make_matrix(rng, n_q=8, n_train=60, n_items=200, rank=8, noise=0.05)

    def score_items(ids):
        return full[:, ids]

    scores, ids, scored = adaptive_cur_query(
        train, score_items, n_items=200, total_budget=60, n_rounds=3, top_k=5, seed=0
    )
    assert scores.shape == (8, 5) and ids.shape == (8, 5)
    # returned scores are the exact ones at those ids
    for i in range(8):
        np.testing.assert_allclose(scores[i], full[i, ids[i]], rtol=1e-5)
    # budget respected
    assert scored.shape[1] == 60
    # on a low-rank matrix with decent budget, top-1 should be found
    exact_top1 = np.argmax(full, axis=1)
    hit = np.mean([exact_top1[i] in set(ids[i]) for i in range(8)])
    assert hit >= 0.75


def test_adaptive_not_worse_than_fixed(rng):
    # harder setting: rank above the anchor budget -> adaptivity pays
    full, train = make_matrix(rng, n_q=16, n_train=80, n_items=300, rank=40, noise=0.1)
    ada, fixed = adaptive_recall_vs_fixed(
        full, train, total_budget=60, n_rounds=3, top_k=10, seed=0
    )
    assert ada >= fixed - 0.05, (ada, fixed)


def test_single_round_equals_fixed_anchor_retrieval(rng):
    # n_rounds=1 degenerates to "score random anchors, return their best"
    full, train = make_matrix(rng, n_q=4, n_train=30, n_items=100, rank=5, noise=0.0)

    def score_items(ids):
        return full[:, ids]

    scores, ids, scored = adaptive_cur_query(
        train, score_items, 100, total_budget=20, n_rounds=1, top_k=5, seed=1
    )
    assert scored.shape[1] == 20
    assert np.all(np.isin(ids, scored[0]))  # round-0 anchors are shared


def test_budget_below_topk_fills_with_minus_one(rng):
    """Unfilled result slots must be id -1 / score -inf, never a
    genuine-looking item 0 (which inflated recall whenever item 0 was in
    the exact top-k)."""
    full, train = make_matrix(rng, n_q=4, n_train=30, n_items=100, rank=5, noise=0.0)

    def score_items(ids):
        return full[:, ids]

    scores, ids, _ = adaptive_cur_query(
        train, score_items, 100, total_budget=3, n_rounds=1, top_k=10, seed=0
    )
    assert ids.shape == (4, 10)
    assert np.all(ids[:, 3:] == -1)
    assert np.all(np.isneginf(scores[:, 3:]))
    assert np.all(ids[:, :3] >= 0)
