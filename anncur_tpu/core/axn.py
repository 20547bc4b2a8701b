"""AXN-style indexing: factorized item embeddings + online regression.

Second follow-up technique (after the same authors' arXiv 2405.03651,
"Adaptive Retrieval and Scalable Indexing for k-NN Search with
Cross-Encoders"), extending the CUR engine:

offline:  fit rank-r item embeddings E (n_items, r) from the train score
          matrix M ~= Q E^T via truncated SVD — unlike CUR, every train
          score (not just anchor columns) shapes the item space, and the
          rank is chosen independently of the anchor-column count.
online:   a new query scores a small item set S with the CE; its latent
          embedding solves the ridge problem
              q* = argmin_q ||s_S - q E_S^T||^2 + lam ||q||^2
          and approx scores for ALL items are q* @ E^T. Combine with
          adaptive rounds (core/adaptive.py pattern) or a single shot.

All device math is jit-able; the per-query solve is an (r x r) system.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("item_embeds", "mean"),
    meta_fields=(),
)
@dataclasses.dataclass(frozen=True)
class AxnIndex:
    item_embeds: jax.Array  # (n_items, r)
    mean: jax.Array  # (n_items,) per-item train-score mean

    @property
    def rank(self) -> int:
        return self.item_embeds.shape[1]


def fit_item_embeddings(
    train_scores: np.ndarray,  # (n_train, n_items)
    rank: int,
    center: bool = True,
) -> AxnIndex:
    """Truncated SVD of the (centered) train matrix: M - mu ~= U S V^T;
    item embeddings = V_r S_r (so queries live in left-singular space
    with unit covariance)."""
    m = np.asarray(train_scores, np.float64)
    mu = m.mean(axis=0) if center else np.zeros(m.shape[1])
    mc = m - mu[None, :]
    rank = min(rank, min(mc.shape))
    u, s, vt = np.linalg.svd(mc, full_matrices=False)
    item_embeds = (vt[:rank].T * s[:rank][None, :]).astype(np.float32)  # (n_items, r)
    return AxnIndex(item_embeds=jnp.asarray(item_embeds), mean=jnp.asarray(mu, jnp.float32))


_FIT_CACHE: dict = {}
_FIT_CACHE_MAX = 4


def fit_item_embeddings_cached(
    train_scores: np.ndarray, rank: int, center: bool = True
) -> AxnIndex:
    """`fit_item_embeddings` memoized by CONTENT (blake2b of the bytes),
    not by shape: same-shaped but different train matrices (a refreshed
    build, another train slice) must not return a stale fit, while
    sweeps that refit the identical matrix per (budget, seed) point skip
    the redundant f64 SVD (~seconds at (500, 10k))."""
    import hashlib

    arr = np.ascontiguousarray(np.asarray(train_scores, np.float32))
    key = (hashlib.blake2b(arr.tobytes(), digest_size=16).digest(), rank, center)
    if key not in _FIT_CACHE:
        if len(_FIT_CACHE) >= _FIT_CACHE_MAX:
            _FIT_CACHE.pop(next(iter(_FIT_CACHE)))
        _FIT_CACHE[key] = fit_item_embeddings(arr, rank, center)
    return _FIT_CACHE[key]


@functools.partial(jax.jit, static_argnames=())
def axn_complete(
    index: AxnIndex,
    scored_item_ids: jax.Array,  # (k,) int
    scored_values: jax.Array,  # (q, k) exact CE scores at those items
    lam: float = 1e-3,
) -> jax.Array:
    """(q, n_items) approximate scores via per-query ridge regression on
    the observed entries."""
    e_s = index.item_embeds[scored_item_ids]  # (k, r)
    mu_s = index.mean[scored_item_ids]  # (k,)
    y = scored_values - mu_s[None, :]  # (q, k)
    r = index.item_embeds.shape[1]
    gram = jnp.dot(e_s.T, e_s, preferred_element_type=jnp.float32, precision="highest")
    gram = gram + lam * jnp.eye(r, dtype=jnp.float32)
    rhs = jnp.dot(e_s.T, y.T, preferred_element_type=jnp.float32, precision="highest")
    q_emb = jnp.linalg.solve(gram, rhs).T  # (q, r)
    approx = (
        jnp.dot(
            q_emb, index.item_embeds.T, preferred_element_type=jnp.float32, precision="highest"
        )
        + index.mean[None, :]
    )
    return approx


def axn_query(
    index: AxnIndex,
    score_items_fn,
    n_items: int,
    total_budget: int,
    n_rounds: int = 2,
    top_k: int = 10,
    lam: float = 1e-3,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Adaptive AXN retrieval: the core/adaptive.py round loop (budget
    split, shared-round-1 fast path, union scoring, exhaustion handling)
    with completion through the learned embedding space — a batched
    ridge solve instead of a pinv through the train matrix, so rounds
    cost O(k r^2) not O(n_train^2). One loop implementation serves both
    methods (the two copies had drifted on edge-case fixes)."""
    from anncur_tpu.core.adaptive import adaptive_cur_query

    def complete(ids, vals):
        return np.asarray(
            axn_complete(
                index,
                jnp.asarray(np.asarray(ids)),
                jnp.asarray(np.asarray(vals, np.float32)),
                lam,
            )
        )

    out_scores, out_ids, _ = adaptive_cur_query(
        None,
        score_items_fn,
        n_items=n_items,
        total_budget=total_budget,
        n_rounds=n_rounds,
        top_k=top_k,
        seed=seed,
        complete_fn=complete,
    )
    return out_scores, out_ids
