"""Shared retrieve-then-rerank evaluation primitives, fully vectorized.

The reference's evaluators loop per mention in Python, mask-fill a score
vector at -1e14, and topk it (run_retrieval_eval_wrt_exact_crossenc.py:
97-117). Here one batched gather + two ``lax.top_k`` calls produce the
identical rankings for all mentions at once (same semantics: only
retrieved entities can appear in the reranked list).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from anncur_tpu.core.metrics import frobenius_error, topk_overlap_frac


@partial(jax.jit, static_argnames=("top_k", "top_k_retvr"))
def retrieve_rerank(
    exact: jax.Array,  # (q, n) exact scores
    approx: jax.Array,  # (q, n) approximate scores
    top_k: int,
    top_k_retvr: int,
) -> Dict[str, jax.Array]:
    """Returns exact top-k, approx top-k_retvr, and the reranked top-k
    (approx retrieval reranked by exact scores)."""
    from anncur_tpu.core.adaptive_fused import take_per_row

    exact_scores, exact_idx = lax.top_k(exact, top_k)
    approx_scores, approx_idx = lax.top_k(approx, top_k_retvr)
    # flat 1-D take: take_along_axis at (q, large_n) x (q, small_k)
    # lowers pathologically on TPU (513 s compile measured, CLAUDE.md)
    gathered = take_per_row(exact, approx_idx)
    rr_scores, rr_pos = lax.top_k(gathered, top_k)
    rr_idx = jnp.take_along_axis(approx_idx, rr_pos, axis=1)
    return {
        "exact_indices": exact_idx,
        "exact_scores": exact_scores,
        "approx_indices": approx_idx,
        "approx_scores": approx_scores,
        "reranked_indices": rr_idx,
        "reranked_scores": rr_scores,
    }


def _overlap_stats(a: np.ndarray, b: np.ndarray, k: int) -> Dict[str, float]:
    """Flat metric dict in the reference's key format
    (exact_vs_reranked_approx_retvr~common_frac_mean etc.,
    run_retrieval_eval_wrt_exact_crossenc.py:124-144)."""
    frac = np.asarray(topk_overlap_frac(jnp.asarray(a[:, :k]), jnp.asarray(b[:, :k])))
    vals = {
        "common": frac * k,
        "diff": (1 - frac) * k,
        # reference total = k (its n_total = len1+len2 is dead code,
        # eval/eval_utils.py:143-149)
        "total": np.full_like(frac, k),
        "common_frac": frac,
        "diff_frac": 1 - frac,
    }
    out = {}
    for name, v in vals.items():
        if len(v) == 0:
            out[f"exact_vs_reranked_approx_retvr~{name}_mean"] = 0.0
            out[f"exact_vs_reranked_approx_retvr~{name}_std"] = 0.0
            out[f"exact_vs_reranked_approx_retvr~{name}_p50"] = 0.0
        else:
            out[f"exact_vs_reranked_approx_retvr~{name}_mean"] = float(np.mean(v))
            out[f"exact_vs_reranked_approx_retvr~{name}_std"] = float(np.std(v))
            out[f"exact_vs_reranked_approx_retvr~{name}_p50"] = float(np.percentile(v, 50))
    return out


def eval_approx_for_all_topk(
    exact: np.ndarray,
    approx: np.ndarray,
    top_k_vals: Sequence[int],
    top_k_retvr: int,
    with_error: bool = False,
) -> Dict[int, Dict[str, float]]:
    """One retrieval at ``top_k_retvr``, evaluated at every top_k <=
    top_k_retvr (reference: eval_approx_score_mat_for_all_topk,
    ..._w_fixed_train_test_splits.py:51-132)."""
    top_k_vals = [k for k in top_k_vals if k <= top_k_retvr]
    if not top_k_vals:
        return {}
    n = exact.shape[1]
    max_k = min(max(top_k_vals), n)
    kr = min(top_k_retvr, n)
    out_arrays = retrieve_rerank(jnp.asarray(exact), jnp.asarray(approx), max_k, kr)
    exact_idx = np.asarray(out_arrays["exact_indices"])
    rr_idx = np.asarray(out_arrays["reranked_indices"])
    res = {}
    for k in top_k_vals:
        res[k] = _overlap_stats(exact_idx, rr_idx, k)
        if with_error:
            res[k].update(frobenius_error(approx, exact))
    return res


@partial(jax.jit, static_argnames=("top_k", "top_k_retvr"))
def _split_eval_device(exact, approx, top_k: int, top_k_retvr: int):
    """Device-resident half of eval_split_overlap: rankings + per-row
    squared errors. Only (q, k) index arrays and (q,) error rows leave
    the device — on remote-TPU links shipping the full (q, n) matrices
    to host per grid point dominates the eval wall-clock."""
    out = retrieve_rerank(exact, approx, top_k, top_k_retvr)
    row_sq_err = jnp.sum((approx - exact) ** 2, axis=1)
    row_sq_base = jnp.sum(exact**2, axis=1)
    return out["exact_indices"], out["reranked_indices"], row_sq_err, row_sq_base


def eval_split_overlap(
    exact,
    approx,
    top_k: int,
    top_k_retvr: int,
    ment_splits: Dict[str, np.ndarray],
) -> Dict[str, Dict[str, float]]:
    """Per-mention-split (anchor / non_anchor / all) overlap + Frobenius
    error (reference: run_approx_eval_w_seed, :124-154). ``exact`` /
    ``approx`` may be device arrays; they stay on device."""
    n = exact.shape[1]
    k = min(top_k, n)
    exact_idx, rr_idx, row_sq_err, row_sq_base = _split_eval_device(
        jnp.asarray(exact), jnp.asarray(approx), k, min(top_k_retvr, n)
    )
    exact_idx = np.asarray(exact_idx)
    rr_idx = np.asarray(rr_idx)
    row_sq_err = np.asarray(row_sq_err, np.float64)
    row_sq_base = np.asarray(row_sq_base, np.float64)
    res = {}
    for name, idxs in ment_splits.items():
        stats = _overlap_stats(exact_idx[idxs], rr_idx[idxs], k)
        err = float(np.sqrt(row_sq_err[idxs].sum()))
        base = float(np.sqrt(row_sq_base[idxs].sum()))
        stats["approx_error"] = err
        stats["approx_error_relative"] = err / max(base, 1e-30)
        res[name] = stats
    return res


def eval_approx_grid(
    exact: np.ndarray,
    approx: np.ndarray,
    top_k_vals: Sequence[int],
    top_k_retvr_vals: Sequence[int],
    with_error: bool = False,
) -> Dict[int, Dict[int, Dict[str, float]]]:
    """{top_k_retvr: {top_k: stats}} for a WHOLE retrieval grid from two
    argsorts — no per-grid-point device programs.

    Key identity: reranking the approx top-kr by exact scores makes the
    reranked top-k equal to the k best-exact-ranked items of the
    retrieved set, so overlap@k with the exact top-k is simply the count
    of retrieved items whose exact rank is < k. One (q, n) rank gather
    serves every (k, kr) pair; the per-(kr) jit programs this replaces
    cost one remote-TPU compile EACH (~34 kr values in the reference
    budget grid = ~30+ minutes of pure compilation per method).
    Tie-breaking matches retrieve_rerank (stable by index)."""
    exact = np.asarray(exact)
    approx = np.asarray(approx)
    q, n = exact.shape
    top_k_retvr_vals = [kr for kr in top_k_retvr_vals if 1 <= kr <= n]
    if not top_k_retvr_vals:
        return {}
    # exact rank of every item, then those ranks in approx-retrieval order
    exact_order = np.argsort(-exact, axis=1, kind="stable")
    rank = np.empty((q, n), np.int64)
    np.put_along_axis(rank, exact_order, np.arange(n)[None, :], axis=1)
    approx_order = np.argsort(-approx, axis=1, kind="stable")
    retrieved_ranks = np.take_along_axis(rank, approx_order, axis=1)  # (q, n)

    err = frobenius_error(approx, exact) if with_error else None
    out: Dict[int, Dict[int, Dict[str, float]]] = {}
    for k in sorted(set(int(k) for k in top_k_vals)):
        if k > n:
            continue
        hits = np.cumsum(retrieved_ranks < k, axis=1)  # (q, n)
        for kr in top_k_retvr_vals:
            if k > kr:
                continue
            frac = hits[:, kr - 1] / float(k)
            vals = {
                "common": frac * k,
                "diff": (1 - frac) * k,
                "total": np.full_like(frac, float(k)),
                "common_frac": frac,
                "diff_frac": 1 - frac,
            }
            stats = {}
            for name, v in vals.items():
                stats[f"exact_vs_reranked_approx_retvr~{name}_mean"] = float(np.mean(v))
                stats[f"exact_vs_reranked_approx_retvr~{name}_std"] = float(np.std(v))
                stats[f"exact_vs_reranked_approx_retvr~{name}_p50"] = float(np.percentile(v, 50))
            if err is not None:
                stats.update(err)
            out.setdefault(kr, {})[k] = stats
    return out
