"""Adaptive multi-round CUR retrieval (ADACUR-style).

Extension beyond the reference repo, after the same authors' follow-up
(arXiv 2305.02996, "Efficient k-NN Search with Cross-Encoders using
Adaptive Multi-Round CUR Decomposition"): instead of spending the whole
CE-call budget on a FIXED anchor-item set, spend it adaptively —

round r:  project the query's scores at all items scored so far through
          the train-matrix latent space -> approximate all-item scores
          -> pick the top unscored candidates -> pay CE calls for exactly
          those -> repeat with the grown scored set.

The anchor columns therefore concentrate around the query's own
neighborhood, which is exactly where approximation error hurts recall.
Final ranking: exact scores for everything scored, approx elsewhere.

Implementation notes (TPU):
- each round is one small host pinv (|scored| x |scored| via the train
  matrix) + one (k x m) device matmul + top-k; CE scoring reuses the
  batched pair scorer;
- same cost accounting as the reference: total CE calls per query =
  sum of round budgets (+ nothing else).
"""

from __future__ import annotations

import logging
from typing import Callable, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from anncur_tpu.ops.pinv import pinv_f64

LOGGER = logging.getLogger(__name__)


def adaptive_cur_query(
    train_scores: Optional[np.ndarray],  # (n_train, n_items) exact CE scores
    score_items_fn: Callable[[np.ndarray], np.ndarray],
    # score_items_fn(item_ids (k,)) -> (q, k) exact CE scores of the
    # query batch against those items
    n_items: int,
    total_budget: int,
    n_rounds: int = 3,
    top_k: int = 10,
    seed: int = 0,
    q: Optional[int] = None,
    complete_fn: Optional[Callable[[np.ndarray, np.ndarray], np.ndarray]] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (topk_scores (q, top_k), topk_ids (q, top_k),
    scored_ids (q, budget)) for a batch of queries.

    Queries are implicit in ``score_items_fn`` (closure over their
    tokens); all queries in the batch share round boundaries but pick
    their own per-query candidates after round 0.

    ``complete_fn(ids (k,), vals (q, k)) -> (q, n_items)`` swaps the
    score-completion model while keeping the round loop (budget split,
    shared-round-1 fast path, union scoring, exhaustion handling) in ONE
    place: default is CUR completion through the train latent space
    (pinv of the scored columns); core/axn.py passes ridge regression in
    a learned embedding space. ``train_scores`` may be None when
    ``complete_fn`` is given.
    """
    rng = np.random.default_rng(seed)
    if total_budget < n_rounds:
        LOGGER.warning(
            "total_budget=%d < n_rounds=%d: clamping to %d rounds",
            total_budget, n_rounds, total_budget,
        )
        n_rounds = max(1, total_budget)
    per_round = max(1, total_budget // n_rounds)
    first_round = total_budget - per_round * (n_rounds - 1)

    total_budget = min(total_budget, n_items)
    first_round = min(first_round, n_items)
    if complete_fn is None:
        if train_scores is None:
            raise ValueError("train_scores is required without a complete_fn")
        train = np.asarray(train_scores, np.float32)
        train64 = train.astype(np.float64)

        def complete_fn(ids, vals):
            # completion through the train latent space, anchored at the
            # scored set: approx = vals @ pinv(M[:, ids]) @ M
            u = pinv_f64(train[:, ids])  # (|S|, n_train)
            latent_cols = (u @ train64).astype(np.float32)
            return np.asarray(vals, np.float32) @ latent_cols

    # round 0: shared random anchors (no information about the query yet)
    anchors0 = np.asarray(sorted(rng.choice(n_items, size=first_round, replace=False)))
    scores0 = np.asarray(score_items_fn(anchors0))  # (q, first_round)
    n_q = scores0.shape[0]
    if q is not None and q != n_q:
        raise ValueError(f"score_items_fn returned {n_q} rows, expected {q}")

    # per-query scored sets (ids + exact scores)
    scored_ids = [list(anchors0) for _ in range(n_q)]
    scored_vals = [list(scores0[i]) for i in range(n_q)]

    for _ in range(n_rounds - 1):
        # which ids each query wants next (top approx, unscored).
        # NB round 1 is special: every query still shares the SAME scored
        # set (anchors0), so one completion + one batched matmul serves
        # all of them — per-query recomputation was ~n_q identical GEMMs.
        next_ids: list = [None] * n_q
        all_same = all(scored_ids[i] == scored_ids[0] for i in range(1, n_q))
        if all_same:
            ids = np.asarray(scored_ids[0])
            vals = np.asarray(scored_vals, np.float32)  # (q, |S|)
            approx = np.asarray(complete_fn(ids, vals))  # (q, n_items)
            seen = set(ids.tolist())
            for i in range(n_q):
                order = np.argsort(-approx[i])
                next_ids[i] = [j for j in order if j not in seen][:per_round]
        else:
            for i in range(n_q):
                ids = np.asarray(scored_ids[i])
                vals = np.asarray(scored_vals[i], np.float32)[None, :]
                # completion anchored at the query's OWN scored set
                approx = np.asarray(complete_fn(ids, vals))  # (1, n_items)
                order = np.argsort(-approx[0])
                seen = set(ids.tolist())
                next_ids[i] = [j for j in order if j not in seen][:per_round]
        if not any(next_ids):
            break  # every query has scored the whole corpus
        # batched exact CE scoring of the union, then scatter back each
        # query's OWN picks (one device batch per round keeps the MXU
        # busy; scores of other queries' picks are computed-and-dropped —
        # a deliberate trade of wasted pairs for a single big batch, and
        # they never enter the kept set, so the per-query CE-call budget
        # accounting stays honest)
        unique = np.unique(np.concatenate([np.asarray(p, np.int64) for p in next_ids if p]))
        uni_scores = np.asarray(score_items_fn(unique))  # (q, |unique|)
        pos = {int(j): c for c, j in enumerate(unique)}
        for i in range(n_q):
            for j in next_ids[i]:
                scored_ids[i].append(int(j))
                scored_vals[i].append(float(uni_scores[i, pos[int(j)]]))

    # final ranking: exact where scored, -inf elsewhere (retrieved set
    # only — same semantics as retrieve-then-rerank). Unfilled slots
    # (scored < top_k, e.g. budget < top_k) are id -1 / score -inf: a 0
    # fill would report item 0 as a genuine-looking hit and inflate
    # recall whenever item 0 is in the exact top-k
    out_scores = np.full((n_q, top_k), -np.inf, np.float32)
    out_ids = np.full((n_q, top_k), -1, np.int64)
    for i in range(n_q):
        ids = np.asarray(scored_ids[i])
        vals = np.asarray(scored_vals[i], np.float32)
        order = np.argsort(-vals)[:top_k]
        out_ids[i, : len(order)] = ids[order]
        out_scores[i, : len(order)] = vals[order]
    # queries can exhaust the corpus at different rounds -> ragged sets
    lens = {len(s) for s in scored_ids}
    scored_out = (
        np.asarray([np.asarray(s) for s in scored_ids])
        if len(lens) == 1
        else [np.asarray(s) for s in scored_ids]
    )
    return out_scores, out_ids, scored_out


def adaptive_recall_vs_fixed(
    full_scores: np.ndarray,  # (n_q, n_items) exact scores for eval
    train_scores: np.ndarray,
    total_budget: int,
    n_rounds: int,
    top_k: int,
    seed: int = 0,
) -> Tuple[float, float]:
    """Eval helper: recall@k of adaptive vs fixed-anchor CUR at the SAME
    CE-call budget, using a precomputed query score matrix as the oracle
    (no encoder needed)."""
    from anncur_tpu.core.metrics import topk_overlap_frac

    full = np.asarray(full_scores, np.float32)
    n_q, n_items = full.shape
    exact_top = np.argsort(-full, axis=1)[:, :top_k]

    def score_items_fn(ids):
        return full[:, ids]

    _, ada_ids, _ = adaptive_cur_query(
        train_scores, score_items_fn, n_items, total_budget, n_rounds, top_k, seed
    )
    ada_recall = float(
        np.asarray(topk_overlap_frac(jnp.asarray(ada_ids), jnp.asarray(exact_top))).mean()
    )

    # fixed: anchors + rerank with the same total budget, split like the
    # reference cost model (n_anchors + top_k_retvr = budget). ONE
    # implementation of the fixed baseline (adaptive_fused) serves both
    # eval paths — two copies had already started to drift on clamps.
    from anncur_tpu.core.adaptive_fused import fixed_anchor_recall

    n_anchors = total_budget // 2
    retvr = total_budget - n_anchors
    fixed_recall = fixed_anchor_recall(
        full, train_scores, n_anchors, retvr, top_k, seed=seed
    )
    return ada_recall, fixed_recall
