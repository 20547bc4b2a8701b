"""Ranking metrics, vectorized for TPU.

Capability parity with the reference metrics (eval/eval_utils.py:19-56,
115-150) — reciprocal rank vs. gold label, acc/MRR/recall@{1,5,10,64},
pairwise top-k set overlap, Frobenius approximation error — but computed
with array ops (no per-example Python loops) so they jit and scale.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def reciprocal_ranks(
    gt_labels: jax.Array,  # (q,)
    pred_indices: jax.Array,  # (q, k)
    pred_scores: jax.Array,  # (q, k)
) -> jax.Array:
    """Reciprocal rank of each gold label in score-sorted predictions.

    0.0 if the gold label is absent from the predictions
    (reference semantics: eval/eval_utils.py:19-29, which sorts by score
    descending and returns 1/(position+1)).
    """
    gt = gt_labels[:, None]
    order = jnp.argsort(-pred_scores, axis=1, stable=True)
    sorted_idx = jnp.take_along_axis(pred_indices, order, axis=1)
    hits = sorted_idx == gt  # (q, k)
    pos = jnp.argmax(hits, axis=1)  # first True (0 if none)
    found = jnp.any(hits, axis=1)
    return jnp.where(found, 1.0 / (pos + 1.0), 0.0)


def score_topk_preds(
    gt_labels,
    pred_indices,
    pred_scores,
) -> Dict[str, str]:
    """acc / mrr / recall@{1,5,10,64} (+ normalized variants), formatted as
    the reference does ("%.2f" strings, eval/eval_utils.py:47-55) so result
    JSONs are drop-in comparable."""
    rr = np.asarray(
        reciprocal_ranks(
            jnp.asarray(gt_labels), jnp.asarray(pred_indices), jnp.asarray(pred_scores)
        )
    )
    found = rr > 0
    with np.errstate(invalid="ignore"):
        norm_acc = float(np.mean(rr[found] == 1)) if found.any() else float("nan")
        norm_mrr = float(np.mean(rr[found])) if found.any() else float("nan")
    return {
        "acc": "{:.2f}".format(100 * np.mean(rr == 1)),
        "mrr": "{:.2f}".format(100 * np.mean(rr)),
        "recall": "{:.2f}".format(100 * np.mean(rr > 0)),
        "recall_5": "{:.2f}".format(100 * np.mean(rr > 1 / 6)),
        "recall_10": "{:.2f}".format(100 * np.mean(rr > 1 / 11)),
        "recall_64": "{:.2f}".format(100 * np.mean(rr > 1 / 65)),
        "norm_acc": "{:.2f}".format(100 * norm_acc),
        "norm_mrr": "{:.2f}".format(100 * norm_mrr),
    }


def topk_overlap_frac(indices_a: jax.Array, indices_b: jax.Array) -> jax.Array:
    """Per-row |set(a) ∩ set(b)| / k for two (q, k) index arrays.

    Vectorized replacement for the reference's per-pair python-set loop
    (eval/eval_utils.py:141-150). Assumes each row of a / b has distinct
    entries (true for top-k outputs).
    """
    eq = indices_a[:, :, None] == indices_b[:, None, :]  # (q, k, k)
    inter = jnp.sum(eq, axis=(1, 2))
    return inter / indices_a.shape[1]


def overlap_metrics(indices_a, indices_b) -> Dict[str, tuple]:
    """Overlap stats dict in the reference's format
    (mean/std/p50 strings per metric; eval/eval_utils.py:115-138)."""
    indices_a = jnp.asarray(indices_a)
    indices_b = jnp.asarray(indices_b)
    metrics = ["common", "diff", "total", "common_frac", "diff_frac"]
    if indices_a.shape[0] == 0:
        return {m: ("mean 0.0", "std 0.0", "p50 0.0") for m in metrics}
    k = indices_a.shape[1]
    common_frac = np.asarray(topk_overlap_frac(indices_a, indices_b))
    vals = {
        "common": common_frac * k,
        "diff": (1 - common_frac) * k,
        # reference total = k, NOT len1+len2 (its n_total var is dead,
        # eval/eval_utils.py:143-149)
        "total": np.full_like(common_frac, k),
        "common_frac": common_frac,
        "diff_frac": 1 - common_frac,
    }
    out = {}
    for m in metrics:
        v = vals[m]
        out[m] = (
            "mean {:.4f}".format(float(np.mean(v))),
            "std {:.4f}".format(float(np.std(v))),
            "p50 {:.4f}".format(float(np.percentile(v, 50))),
        )
    return out


def frobenius_error(approx: jax.Array, exact: jax.Array) -> Dict[str, float]:
    """Absolute and relative Frobenius approximation error
    (reference: eval/run_retrieval_eval_wrt_exact_crossenc.py:146-147)."""
    approx = jnp.asarray(approx, jnp.float32)
    exact = jnp.asarray(exact, jnp.float32)
    err = jnp.linalg.norm(approx - exact)
    base = jnp.linalg.norm(exact)
    return {
        "approx_error": float(err),
        "approx_error_relative": float(err / jnp.maximum(base, 1e-30)),
    }
