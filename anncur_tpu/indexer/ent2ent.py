"""Entity-to-anchor-entity score matrices for the fixed-anchor-entity
baselines.

The reference consumes pickles named ``ent_to_ent_scores_n_e_{N}x{N}_
topk_{K}_embed_bienc_m2e_bienc_cluster.pkl`` holding {'ent_to_ent_scores':
(n_ents, K), 'topk_ents': (1, K)} (eval/run_retrieval_eval_wrt_exact_
crossenc.py:288-346) but never ships the producer. This module is that
producer, TPU-native: anchor entities are chosen as cluster
representatives of bi-encoder entity embeddings (k-means++ style seeding
— 'bienc_cluster' in the reference naming), and each entity is scored
against every anchor with the cross-encoder through the mesh-sharded
ScoreMatrixBuilder (entity ⧺ entity pairs).
"""

from __future__ import annotations

import logging
import pickle
from typing import Optional, Tuple

import numpy as np

from anncur_tpu.indexer.score_matrix import ScoreMatrixBuilder

LOGGER = logging.getLogger(__name__)


def kmeanspp_anchor_ids(
    embeds: np.ndarray, n_anchors: int, seed: int = 0
) -> np.ndarray:
    """k-means++ seeding: far-apart representatives of the embedding set.

    Degenerate inputs handled: n_anchors <= 0 returns an empty array;
    when every remaining point duplicates a chosen one (d2 all zero —
    fewer distinct embeddings than requested anchors) the remaining
    slots are filled with the lowest unchosen indices instead of
    crashing on a zero probability vector."""
    rng = np.random.default_rng(seed)
    n = embeds.shape[0]
    n_anchors = min(n_anchors, n)
    if n_anchors <= 0:
        return np.zeros((0,), np.int64)
    chosen = [int(rng.integers(n))]
    d2 = np.full(n, np.inf)
    for _ in range(n_anchors - 1):
        last = embeds[chosen[-1]]
        d2 = np.minimum(d2, np.sum((embeds - last) ** 2, axis=1))
        total = float(d2.sum())
        if total <= 0.0:
            break  # only duplicates remain
        chosen.append(int(rng.choice(n, p=d2 / total)))
    uniq = sorted(set(chosen))
    if len(uniq) < n_anchors:
        fill = (i for i in range(n) if i not in set(uniq))
        uniq += [next(fill) for _ in range(n_anchors - len(uniq))]
    return np.asarray(sorted(uniq), np.int64)


def build_ent_to_ent_scores(
    builder: ScoreMatrixBuilder,
    ce_params,
    ent_tokens: np.ndarray,  # (n_e, Le)
    anchor_ids: np.ndarray,  # (k,)
) -> np.ndarray:
    """(n_ents, k) cross-encoder scores of every entity (as 'query') vs
    each anchor entity (as 'item'): pair = entity ⧺ anchor[1:]."""
    return builder(ce_params, ent_tokens, ent_tokens[anchor_ids])


def save_ent_to_ent_pickle(
    path: str,
    ent_to_ent_scores: np.ndarray,
    anchor_ids: np.ndarray,
) -> None:
    """Reference-compatible pickle schema (scores + topk_ents with a
    leading broadcast dim, run_retrieval_eval_wrt_exact_crossenc.py:
    299-302)."""
    import os

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as fout:
        pickle.dump(
            {
                "ent_to_ent_scores": np.asarray(ent_to_ent_scores),
                "topk_ents": np.asarray(anchor_ids)[None, :],
            },
            fout,
        )


def load_ent_to_ent_pickle(path: str) -> Tuple[np.ndarray, np.ndarray]:
    with open(path, "rb") as fin:
        data = pickle.load(fin)
    scores = data["ent_to_ent_scores"]
    if hasattr(scores, "numpy"):
        scores = scores.numpy()
    anchors = np.asarray(data["topk_ents"])[0]
    return np.asarray(scores), anchors
