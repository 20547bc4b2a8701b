"""Metrics tests: vectorized metrics must match a pure-python model of the
reference implementations (eval/eval_utils.py)."""

import numpy as np

from anncur_tpu.core import (
    frobenius_error,
    overlap_metrics,
    reciprocal_ranks,
    score_topk_preds,
    topk_overlap_frac,
)


def python_reci_rank(gt, preds, scores):
    pairs = sorted(zip(preds, scores), key=lambda x: x[1], reverse=True)
    for i, (p, _) in enumerate(pairs):
        if p == gt:
            return 1.0 / (i + 1)
    return 0.0


def test_reciprocal_ranks_match_python(rng):
    q, k = 50, 16
    preds = np.stack([rng.permutation(100)[:k] for _ in range(q)])
    scores = rng.standard_normal((q, k)).astype(np.float32)
    gt = rng.integers(0, 100, size=q)
    got = np.asarray(reciprocal_ranks(gt, preds, scores))
    want = np.array([python_reci_rank(g, p, s) for g, p, s in zip(gt, preds, scores)])
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_score_topk_preds_keys(rng):
    preds = np.stack([rng.permutation(20)[:5] for _ in range(10)])
    scores = rng.standard_normal((10, 5)).astype(np.float32)
    gt = preds[:, 0]  # gold always present
    res = score_topk_preds(gt, preds, scores)
    for key in ("acc", "mrr", "recall", "recall_5", "recall_10", "recall_64", "norm_acc", "norm_mrr"):
        assert key in res and isinstance(res[key], str)
    assert res["recall"] == "100.00"


def test_overlap_exact_and_disjoint():
    a = np.array([[1, 2, 3, 4]])
    assert float(topk_overlap_frac(a, a)[0]) == 1.0
    b = np.array([[5, 6, 7, 8]])
    assert float(topk_overlap_frac(a, b)[0]) == 0.0
    c = np.array([[1, 2, 7, 8]])
    assert float(topk_overlap_frac(a, c)[0]) == 0.5


def test_overlap_metrics_format():
    a = np.array([[1, 2], [3, 4]])
    b = np.array([[1, 5], [3, 4]])
    res = overlap_metrics(a, b)
    assert res["common_frac"][0] == "mean 0.7500"
    # reference total = k (eval_utils.py:143-149; its len1+len2 var is dead)
    assert res["total"][0] == "mean 2.0000"
    empty = overlap_metrics(np.zeros((0, 2)), np.zeros((0, 2)))
    assert empty["common"] == ("mean 0.0", "std 0.0", "p50 0.0")


def test_frobenius(rng):
    exact = rng.standard_normal((10, 12)).astype(np.float32)
    res = frobenius_error(exact, exact)
    assert res["approx_error"] == 0.0
    res2 = frobenius_error(exact + 1.0, exact)
    assert res2["approx_error"] > 0 and 0 < res2["approx_error_relative"]
