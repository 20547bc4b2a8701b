"""Loss parity vs literal torch transcriptions of the reference."""

import numpy as np
import pytest

import jax.numpy as jnp

from anncur_tpu.train.losses import (
    bienc_loss_in_batch_negs,
    bienc_loss_w_negs,
    crossenc_loss,
    distill_loss,
    mrr_from_scores,
    scores_loss_w_negs,
)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def torch_loss_w_negs(pos_scores, neg_scores, loss_type, margin=0.5):
    pos_scores = torch.tensor(pos_scores)[:, None].clone()
    neg_scores = torch.tensor(neg_scores).clone()
    if loss_type == "ce":
        final = torch.cat((pos_scores, neg_scores), dim=1)
        target = torch.zeros(final.shape[0], dtype=torch.long)
        return float(F.cross_entropy(final, target))
    pos_scores[pos_scores > margin] = 0
    neg_scores[neg_scores < -margin] = 0
    if loss_type == "hinge":
        return float((-torch.mean(pos_scores) + torch.mean(neg_scores)) / 2)
    p = margin - pos_scores
    n = margin + neg_scores
    return float((torch.mean(p * p) + torch.mean(n * n)) / 2)


@pytest.mark.parametrize("loss_type", ["ce", "hinge", "hinge_sq"])
def test_scores_loss_parity(rng, loss_type):
    pos = rng.standard_normal(8).astype(np.float32)
    neg = rng.standard_normal((8, 5)).astype(np.float32)
    got = float(scores_loss_w_negs(jnp.asarray(pos), jnp.asarray(neg), loss_type, 0.5))
    want = torch_loss_w_negs(pos, neg, loss_type, 0.5)
    assert abs(got - want) < 1e-5


@pytest.mark.parametrize("loss_type", ["ce", "hinge", "hinge_sq"])
def test_in_batch_negs_parity(rng, loss_type):
    inp = rng.standard_normal((6, 16)).astype(np.float32)
    pos = rng.standard_normal((6, 16)).astype(np.float32)
    got = float(bienc_loss_in_batch_negs(jnp.asarray(inp), jnp.asarray(pos), loss_type, 0.5))
    scores = torch.tensor(inp) @ torch.tensor(pos).t()
    b = scores.shape[0]
    if loss_type == "ce":
        want = float(F.cross_entropy(scores, torch.arange(b)))
    else:
        y = 2 * torch.eye(b) - 1
        loss = 0.5 - y * scores
        loss[loss < 0] = 0
        want = float(torch.mean(loss)) if loss_type == "hinge" else float(torch.mean(loss * loss))
    assert abs(got - want) < 1e-5


def test_bienc_loss_w_negs_matches_scores_loss(rng):
    inp = rng.standard_normal((4, 8)).astype(np.float32)
    pos = rng.standard_normal((4, 8)).astype(np.float32)
    neg = rng.standard_normal((4, 3, 8)).astype(np.float32)
    got = float(bienc_loss_w_negs(jnp.asarray(inp), jnp.asarray(pos), jnp.asarray(neg), "ce"))
    want = float(
        scores_loss_w_negs(
            jnp.asarray(np.sum(inp * pos, 1)), jnp.asarray(np.sum(neg * inp[:, None], 2)), "ce"
        )
    )
    assert abs(got - want) < 1e-6


def test_crossenc_bce_parity(rng):
    pos = rng.standard_normal(8).astype(np.float32)
    neg = rng.standard_normal((8, 5)).astype(np.float32)
    got = float(crossenc_loss(jnp.asarray(pos), jnp.asarray(neg), "bce"))
    pos_t, neg_t = torch.tensor(pos), torch.tensor(neg)
    want = float(
        (
            F.binary_cross_entropy_with_logits(pos_t, torch.ones_like(pos_t))
            + F.binary_cross_entropy_with_logits(neg_t, torch.zeros_like(neg_t))
        )
        / 2
    )
    assert abs(got - want) < 1e-6


def test_distill_loss_parity(rng):
    pred = rng.standard_normal((5, 7)).astype(np.float32)
    target = rng.standard_normal((5, 7)).astype(np.float32)
    got = float(distill_loss(jnp.asarray(pred), jnp.asarray(target)))
    want = float(
        F.cross_entropy(torch.tensor(pred), torch.softmax(torch.tensor(target), dim=-1))
    )
    assert abs(got - want) < 1e-5


def test_mrr_from_scores():
    pos = jnp.asarray([2.0, 0.0])
    neg = jnp.asarray([[1.0, 0.5], [1.0, 2.0]])
    # row 0: rank 1 -> 1.0; row 1: rank 3 -> 1/3
    assert abs(float(mrr_from_scores(pos, neg)) - (1.0 + 1 / 3) / 2) < 1e-6
