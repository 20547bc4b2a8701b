"""Negative-mining strategies.

Parity with reference utils/data_process.py:272-463: random negatives
(excluding the positive), random with blacklist, bi-encoder hard
negatives (ANN over current tower embeddings — FAISS replaced by exact
sharded MIPS), TF-IDF hard negatives, and precomputed negatives with
scores (for distillation datasets).
"""

from __future__ import annotations

import logging
from typing import Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from anncur_tpu.data.tfidf import TfidfVectorizer
from anncur_tpu.ops.mips import mips_topk

LOGGER = logging.getLogger(__name__)


def get_random_negs(
    gt_labels: np.ndarray,  # (b,)
    n_labels: int,
    num_negs: int,
    seed: int,
) -> np.ndarray:
    """(b, num_negs) uniform negatives excluding each row's positive
    (reference: get_random_negs, utils/data_process.py:272-294)."""
    rng = np.random.default_rng(seed)
    out = np.empty((len(gt_labels), num_negs), np.int64)
    for i, gt in enumerate(gt_labels):
        pool = np.concatenate([np.arange(gt), np.arange(gt + 1, n_labels)])
        out[i] = rng.choice(pool, size=num_negs, replace=num_negs > len(pool))
    return out


def get_random_negs_w_blacklist(
    gt_labels: np.ndarray,
    blacklists: Sequence[Sequence[int]],  # per-row excluded label ids
    n_labels: int,
    num_negs: int,
    seed: int,
) -> np.ndarray:
    """(reference: get_random_negs_w_blacklist, :297-317).

    Vectorized: a boolean mask per row instead of a python list
    comprehension over all labels — the comprehension was
    O(n_ments * n_labels) interpreter work per epoch (~4e8 set lookups
    at ZeShEL scale), stalling the accelerator between epochs. The
    reference zeroes a probability vector the same way (:304-309)."""
    rng = np.random.default_rng(seed)
    out = np.empty((len(gt_labels), num_negs), np.int64)
    all_labels = np.arange(n_labels)
    for i, gt in enumerate(gt_labels):
        mask = np.ones(n_labels, dtype=bool)
        mask[np.asarray(blacklists[i], dtype=np.int64)] = False
        mask[int(gt)] = False
        pool = all_labels[mask]
        out[i] = rng.choice(pool, size=num_negs, replace=num_negs > len(pool))
    return out


def get_hard_negs_from_embeds(
    input_embeds: np.ndarray,  # (b, d)
    label_embeds: np.ndarray,  # (n, d)
    gt_labels: np.ndarray,  # (b,)
    num_negs: int,
) -> np.ndarray:
    """Top-scoring non-gold labels under an embedding model — the
    bi-encoder hard-negative miner (reference: get_hard_negs_biencoder,
    utils/data_process.py:320-370; FAISS -> exact MIPS)."""
    k = min(num_negs + 1, label_embeds.shape[0])
    _, idx = mips_topk(jnp.asarray(input_embeds), jnp.asarray(label_embeds), k)
    idx = np.asarray(idx)
    out = np.empty((len(gt_labels), num_negs), np.int64)
    for i, gt in enumerate(gt_labels):
        row = [j for j in idx[i] if j != gt][:num_negs]
        while len(row) < num_negs:  # pad if gold occupied a slot and k small
            row.append(row[-1] if row else 0)
        out[i] = row
    return out


def get_hard_negs_from_embeds_w_blacklist(
    input_embeds: np.ndarray,  # (b, d)
    label_embeds: np.ndarray,  # (n, d)
    blacklists,  # per-row excluded label ids (e.g. top-CE positives)
    num_negs: int,
) -> np.ndarray:
    """Bi-encoder hard negatives with a per-row positive-set blacklist
    (reference: get_hard_negs_biencoder called with pos_label_idxs =
    top-CE labels, utils/data_process.py:822-831)."""
    n_labels = label_embeds.shape[0]
    k = min(num_negs + max(len(b) for b in blacklists), n_labels)
    _, idx = mips_topk(jnp.asarray(input_embeds), jnp.asarray(label_embeds), k)
    idx = np.asarray(idx)
    out = np.empty((len(blacklists), num_negs), np.int64)
    for i, banned in enumerate(blacklists):
        banned = set(int(b) for b in banned)
        row = [j for j in idx[i] if j not in banned][:num_negs]
        while len(row) < num_negs:
            row.append(row[-1] if row else 0)
        out[i] = row
    return out


def get_hard_negs_tfidf(
    mention_texts: Sequence[str],
    entities: Sequence[Tuple[str, str]],
    gt_labels: np.ndarray,
    num_negs: int,
) -> np.ndarray:
    """TF-IDF hard negatives (reference: get_hard_negs_tfidf, :373-407;
    utils/compute_tfidf_hard_negs.py)."""
    corpus = [f"{t} {d}" for t, d in entities]
    vec = TfidfVectorizer().fit(corpus)
    ment_embeds = vec.transform(mention_texts)
    ent_embeds = vec.transform(corpus)
    return get_hard_negs_from_embeds(ment_embeds, ent_embeds, gt_labels, num_negs)


def get_precomputed_ents_w_scores(
    score_matrix: np.ndarray,  # (b, n) teacher CE scores per mention
    top_n: int,
) -> Dict[str, np.ndarray]:
    """Top-N labels + scores per mention for distillation datasets
    (reference: get_precomputed_ents_w_scores, :426-463 and the
    'top_ce_match' neg strategy)."""
    order = np.argsort(-score_matrix, axis=1)[:, :top_n]
    scores = np.take_along_axis(score_matrix, order, axis=1)
    return {"indices": order, "scores": scores}
