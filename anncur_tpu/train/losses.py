"""Training losses — exact semantic parity with the reference.

Bi-encoder (models/biencoder.py:551-638): ce / hinge / hinge_sq with
explicit negatives, in-batch negatives, and soft-target distillation
(:513-549). Cross-encoder (models/crossencoder.py:517-606): ce / bce over
(pos, negs) score rows.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _softmax_xent_int_target(scores: jax.Array, target: jax.Array) -> jax.Array:
    """F.cross_entropy with integer targets, mean reduction."""
    logp = jax.nn.log_softmax(scores, axis=-1)
    picked = jnp.take_along_axis(logp, target[:, None], axis=1)[:, 0]
    return -jnp.mean(picked)


def scores_loss_w_negs(
    pos_scores: jax.Array,  # (b,)
    neg_scores: jax.Array,  # (b, n)
    loss_type: str = "ce",
    hinge_margin: float = 0.5,
) -> jax.Array:
    """Loss over explicit (pos, negs) scores
    (reference: compute_loss_w_negs, models/biencoder.py:570-599)."""
    if loss_type == "ce":
        final = jnp.concatenate([pos_scores[:, None], neg_scores], axis=1)
        return _softmax_xent_int_target(final, jnp.zeros(final.shape[0], jnp.int32))
    if loss_type in ("hinge", "hinge_sq"):
        # ignore positives above margin / negatives below -margin (:582-585)
        pos = jnp.where(pos_scores > hinge_margin, 0.0, pos_scores)[:, None]
        neg = jnp.where(neg_scores < -hinge_margin, 0.0, neg_scores)
        if loss_type == "hinge":
            return (-jnp.mean(pos) + jnp.mean(neg)) / 2
        return (jnp.mean((hinge_margin - pos) ** 2) + jnp.mean((hinge_margin + neg) ** 2)) / 2
    raise NotImplementedError(f"loss_type={loss_type!r}")


def bienc_loss_w_negs(
    input_embs: jax.Array,  # (b, d)
    pos_label_embs: jax.Array,  # (b, d)
    neg_label_embs: jax.Array,  # (b, n, d)
    loss_type: str = "ce",
    hinge_margin: float = 0.5,
) -> jax.Array:
    pos_scores = jnp.sum(input_embs * pos_label_embs, axis=1)
    neg_scores = jnp.sum(neg_label_embs * input_embs[:, None, :], axis=2)
    return scores_loss_w_negs(pos_scores, neg_scores, loss_type, hinge_margin)


def bienc_loss_in_batch_negs(
    input_embs: jax.Array,  # (b, d)
    pos_label_embs: jax.Array,  # (b, d)
    loss_type: str = "ce",
    hinge_margin: float = 0.5,
) -> jax.Array:
    """In-batch negatives (reference: compute_loss_w_in_batch_negs,
    models/biencoder.py:604-638)."""
    # score-path matmul: full f32 multiply precision (CLAUDE.md rule —
    # preferred_element_type fixes only the accumulator; the bf16 input
    # truncation still blurs near-duplicate entity scores in the softmax
    # and in the eval-mode dev_loss that drives checkpoint selection).
    # The (b, d) x (d, b) dot is tiny next to the encoder forward.
    scores = jnp.dot(
        input_embs, pos_label_embs.T,
        preferred_element_type=jnp.float32, precision="highest",
    )
    b = scores.shape[0]
    if loss_type == "ce":
        return _softmax_xent_int_target(scores, jnp.arange(b, dtype=jnp.int32))
    if loss_type in ("hinge", "hinge_sq"):
        y = 2.0 * jnp.eye(b) - 1.0
        loss = jnp.maximum(hinge_margin - y * scores, 0.0)
        return jnp.mean(loss) if loss_type == "hinge" else jnp.mean(loss * loss)
    raise NotImplementedError(f"loss_type={loss_type!r}")


def distill_loss(
    pred_label_scores: jax.Array,  # (b, L) student scores
    target_label_scores: jax.Array,  # (b, L) teacher (CE) scores
) -> jax.Array:
    """Soft cross-entropy against softmaxed teacher scores
    (reference: forward_w_ment_ent_distill, models/biencoder.py:542-547)."""
    target = jax.nn.softmax(target_label_scores, axis=-1)
    logp = jax.nn.log_softmax(pred_label_scores, axis=-1)
    return -jnp.mean(jnp.sum(target * logp, axis=-1))


def crossenc_loss(
    pos_scores: jax.Array,  # (b,)
    neg_scores: jax.Array,  # (b, n)
    loss_type: str = "ce",
) -> jax.Array:
    """Cross-encoder ce / bce (reference: crossencoder.py:517-606)."""
    if loss_type == "ce":
        final = jnp.concatenate([pos_scores[:, None], neg_scores], axis=1)
        return _softmax_xent_int_target(final, jnp.zeros(final.shape[0], jnp.int32))
    if loss_type == "bce":
        pos_loss = jnp.mean(_bce_with_logits(pos_scores, jnp.ones_like(pos_scores)))
        neg_loss = jnp.mean(_bce_with_logits(neg_scores, jnp.zeros_like(neg_scores)))
        return (pos_loss + neg_loss) / 2
    raise NotImplementedError(f"loss_type={loss_type!r}")


def _bce_with_logits(logits, targets):
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def mrr_from_scores(pos_scores: jax.Array, neg_scores: jax.Array) -> jax.Array:
    """Batch MRR of the positive among (pos, negs)
    (reference: compute_eval_metrics, crossencoder.py:541-566)."""
    rank = 1.0 + jnp.sum(neg_scores > pos_scores[:, None], axis=1)
    return jnp.mean(1.0 / rank)
