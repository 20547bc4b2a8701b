"""Fused (single-jit-program) adaptive multi-round CUR retrieval.

Device-side re-design of core/adaptive.py (ADACUR-style, arXiv
2305.02996): the host version round-trips through the batched CE scorer
per round and pays one f64 host pinv PER QUERY once scored sets diverge.
Here the whole query — round 0 anchor scoring, per-round latent
completion, candidate picking, per-query CE scoring, final top-k — is a
single jit program with the rounds unrolled (n_rounds is small and
static), so one dispatch per query batch.

The per-query pseudoinverse is replaced by a batched ridge solve using
the push-through identity

    vals @ pinv(C) @ train  ==  vals @ (CᵀC + λI)⁻¹ Cᵀ @ train   (λ→0)

with C = train[:, scored_ids] per query: one (q, S, S) Gram build +
batched Cholesky-free ``jnp.linalg.solve`` — all MXU work, no host
round trips, no f64. λ is relative to the Gram trace (ridge_rel) and
plays the role of the pinv rcond cutoff: it regularizes the near-null
directions that amplify matmul noise (see ops/pinv.py::noise_rcond for
the same issue in the fixed-anchor path).

Unlike the host version, candidates are scored PER QUERY (the rerank
scan gathers each query's own candidate tokens), so exactly
``total_budget`` CE calls are paid per query — the host version scored
the union of all queries' picks and dropped the rest.

Cost accounting matches the reference's axis (CE calls per query,
run_retrieval_eval_wrt_exact_crossenc.py:480-481).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# Widest candidate pick/score stage a single fused program may contain.
# Width-100 rounds (budget 300 @ 3 rounds, q=512 x 10k items) crash the
# remote TPU worker 3/3 with a bare "kernel fault" while every isolated
# width-100 stage runs fine (benchmarks/wide_round_probe.json) — the
# crash is emergent in the composite program. Rounds wider than this are
# TILED into sub-picks that share one completion (mathematically the
# same candidate set as a single top-`per` pick; structurally the
# known-good narrow program family). See DESIGN §25/§29.
ROUND_WIDTH_CAP = 64


def _split_width(per: int, cap: Optional[int] = None) -> Tuple[int, ...]:
    """Balanced sub-widths summing to ``per``, each <= cap
    (100 -> (50, 50); 130 -> (44, 43, 43); 64 -> (64,)). ``cap`` reads
    the module global at CALL time so tests can patch it."""
    if cap is None:
        cap = ROUND_WIDTH_CAP
    if per <= cap:
        return (per,)
    n_sub = -(-per // cap)
    base, rem = divmod(per, n_sub)
    return tuple(base + (1 if i < rem else 0) for i in range(n_sub))


def split_rounds(total_budget: int, n_rounds: int) -> Tuple[int, int, int]:
    """(first_round, per_round, n_rounds) with the same split as
    core/adaptive.py::adaptive_cur_query: later rounds get
    budget//n_rounds each, round 0 the remainder."""
    n_rounds = max(1, min(n_rounds, total_budget))
    per_round = max(1, total_budget // n_rounds)
    first_round = total_budget - per_round * (n_rounds - 1)
    return first_round, per_round, n_rounds


def take_per_row(mat: jax.Array, ids: jax.Array) -> jax.Array:
    """Per-row gather ``mat[q, ids[q]]`` via a flat 1-D take.

    Semantically ``jnp.take_along_axis(mat, ids, axis=1)`` — but that
    lowering is pathological on TPU at (q, large_m) sources with small
    per-row index sets: measured 513 s compile (vs 1.8 s for this form)
    at (128, 10031) x (128, 20) on v5e, long enough that the unrolled
    adaptive oracle program tripped the remote worker's RPC deadline
    and crashed it. Requires q*m < 2^31 (int32 flat indexing)."""
    q, m = mat.shape
    if q * m >= 2**31:
        # shapes are static, so this runs at trace time; without it the
        # int32 flat index overflows and TPU take CLAMPS the bad
        # indices — silently wrong gathers, not an error
        raise ValueError(
            f"take_per_row: q*m = {q}*{m} = {q * m} overflows int32 flat "
            "indexing; chunk the rows (q) before calling"
        )
    flat_idx = ids + jnp.arange(q, dtype=ids.dtype)[:, None] * m
    return jnp.take(mat.reshape(-1), flat_idx, axis=0)


def ridge_complete(
    train: jax.Array,  # (n_train, m) f32
    ids: jax.Array,  # (q, S) int32 per-query scored item ids
    vals: jax.Array,  # (q, S) f32 exact scores at those ids
    ridge_rel: float = 1e-6,
    cols: Optional[jax.Array] = None,  # (L,) int32: complete only these
) -> jax.Array:
    """(q, m) approximate all-item scores: each query's exact scores at
    its own scored set, completed through the train-matrix latent space.

    ``cols`` restricts the OUTPUT to the given global item columns
    ((q, L) result) — the shortlist path: the solve is unchanged (it
    only touches the scored columns), so restricted completion is
    exact on the columns it returns.

    All matmuls run at precision='highest' — the TPU bf16 default
    collapses CUR recall (CLAUDE.md, measured)."""
    q, s = ids.shape
    n_train = train.shape[0]
    # column gather as a row gather on train.T: 1-D-index take along
    # axis 0 compiles efficiently on TPU (the axis=1 2-D-index take did
    # not; see take_per_row)
    c = jnp.take(train.T, ids.reshape(-1), axis=0).reshape(q, s, n_train)
    c = jnp.swapaxes(c, 1, 2)  # (q, n_train, S)
    gram = jnp.einsum("qns,qnt->qst", c, c, precision="highest")
    lam = ridge_rel * (jnp.trace(gram, axis1=1, axis2=2) / s)
    gram = gram + lam[:, None, None] * jnp.eye(s, dtype=gram.dtype)
    z = jnp.linalg.solve(gram, vals[..., None])[..., 0]  # (q, S)
    w = jnp.einsum("qs,qns->qn", z, c, precision="highest")  # (q, n_train)
    out_train = train if cols is None else jnp.take(train.T, cols, axis=0).T
    return jnp.einsum("qn,nm->qm", w, out_train, precision="highest")


def axn_complete_batched(
    item_embeds: jax.Array,  # (m, r) factorized item embeddings (core/axn.py)
    mean: jax.Array,  # (m,) per-item train-score mean
    ids: jax.Array,  # (q, S) int32 PER-QUERY scored item ids
    vals: jax.Array,  # (q, S) exact scores at those ids
    lam_rel: float = 1e-2,
    dim_cap_frac: Optional[float] = None,
    cols: Optional[jax.Array] = None,  # (L,) int32: complete only these
) -> jax.Array:
    """(q, m) AXN completion with per-query observation sets: each
    query's latent embedding solves an (r x r) ridge system on ITS own
    scored items — the batched per-query form of core/axn.py::
    axn_complete (which assumes one shared id set). Cheaper than the
    CUR train-space ridge when r < S (gram is r x r, not S x S).

    ``lam_rel`` default 1e-2 (was 1e-4): measured round 4 on the rank-150
    calibration scenario (5 rounds, fit rank 270), budget-150 recall
    0.742 at 1e-2 vs 0.734 at 3e-2, and the smaller-budget rounds are
    strictly better regularized — this plus a fit rank ~2x the
    97%-energy rank closes VERDICT r3's AXN budget gap (see
    tools/adaptive_matched_recall.py axn_rank comment).

    ``cols`` restricts the output to the given global item columns
    ((q, L) result), like ridge_complete's.

    ``dim_cap_frac``: CLOSED probe (round 4, VERDICT r3 item 4): cap the
    solve at d = min(r, frac * S) singular dims (principal-component
    regression) on the theory that the underdetermined small-S rounds
    leak into unobserved directions. MEASURED WORSE on the rank-150
    calibration scenario: recall 0.053 (frac=1.0) / 0.108 (0.75) vs
    0.413 uncapped at budget 150 r3 — the spectral TAIL carries the
    discriminative structure, and the ridge already handles the
    underdetermination. Kept as an explicit knob so the probe is
    reproducible; default None = no cap."""
    r = item_embeds.shape[1]
    if dim_cap_frac is not None:
        d = min(r, max(1, int(ids.shape[1] * dim_cap_frac)))
        if d < r:
            item_embeds = item_embeds[:, :d]
            r = d
    e_s = jnp.take(item_embeds, ids, axis=0)  # (q, S, r)
    y = vals - jnp.take(mean, ids, axis=0)
    gram = jnp.einsum("qsr,qst->qrt", e_s, e_s, precision="highest")
    lam = lam_rel * (jnp.trace(gram, axis1=1, axis2=2) / r)
    gram = gram + lam[:, None, None] * jnp.eye(r, dtype=gram.dtype)
    rhs = jnp.einsum("qsr,qs->qr", e_s, y, precision="highest")
    q_emb = jnp.linalg.solve(gram, rhs[..., None])[..., 0]  # (q, r)
    out_embeds = item_embeds if cols is None else jnp.take(item_embeds, cols, axis=0)
    out_mean = mean if cols is None else jnp.take(mean, cols, axis=0)
    return (
        jnp.einsum("qr,mr->qm", q_emb, out_embeds, precision="highest")
        + out_mean[None, :]
    )


def _grow_rounds(
    score_fn: Callable[[jax.Array], jax.Array],
    completer: Callable[..., jax.Array],
    ids: jax.Array,  # (q, S) already-scored item ids
    vals: jax.Array,  # (q, S) exact scores at those ids
    n_new_rounds: int,
    per: int,
    valid_mask: Optional[jax.Array] = None,  # (m,) bool; False = padded col
    shortlist: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Extend per-query scored state by ``n_new_rounds`` rounds of
    ``per`` candidates each: complete -> pick unseen top-``per`` ->
    exact-score -> append. Shared by the from-scratch engine and the
    early-stop continuation (the state IS the resume point).

    ``valid_mask`` marks real item columns when the corpus is padded to
    a block multiple (retriever item_pad_multiple): padded columns are
    forced to -inf so they are never picked as candidates.

    ``shortlist`` (L) bounds the per-round O(n_items) work at large
    corpora (VERDICT r4 item 4): the FIRST round here completes against
    the full corpus as usual, then the batch's candidate pool is frozen
    to the top-L columns of the max-over-queries completion, and later
    rounds complete/pick only inside it ((q, L) instead of
    (q, n_items)). Max-pooling keeps the pool id-unique by construction
    (a per-query union could hold duplicate columns, and a duplicate
    could put the same item twice into one query's top-k). The pool
    must be generous vs the remaining picks: callers enforce
    L >= total scored + all remaining picks (retriever clamps)."""
    q = ids.shape[0]
    rows = jnp.arange(q)[:, None]
    use_shortlist = (
        shortlist is not None
        and n_new_rounds >= 2
        and shortlist < (valid_mask.shape[0] if valid_mask is not None else 10**9)
    )
    widths = _split_width(per)  # tile wide rounds (ROUND_WIDTH_CAP)

    def score_block(nid):
        nv = score_fn(nid)
        if valid_mask is not None:
            # a query that exhausts every VALID unseen item can only pick
            # padded columns (-inf ties); their CE scores are of zero
            # token rows — fake values that must never enter the ranking
            nv = jnp.where(jnp.take(valid_mask, nid), nv, -jnp.inf)
        return nv

    sl_ids = None
    for r in range(n_new_rounds):
        if sl_ids is None:
            approx = completer(ids, vals)  # (q, m)
            if valid_mask is not None:
                approx = jnp.where(valid_mask[None, :], approx, -jnp.inf)
            # never re-pick an already-scored item
            approx = approx.at[rows, ids].set(-jnp.inf)
            # sub-picks share this completion: top_k(w1) + exclude +
            # top_k(w2) == top_k(per) exactly (same tie-break, same
            # descending order), but each stage stays narrow
            for si, w in enumerate(widths):
                _, next_ids = jax.lax.top_k(approx, w)  # (q, w)
                next_ids = next_ids.astype(jnp.int32)
                if si + 1 < len(widths) or use_shortlist:
                    approx = approx.at[rows, next_ids].set(-jnp.inf)
                ids = jnp.concatenate([ids, next_ids], axis=1)
                vals = jnp.concatenate([vals, score_block(next_ids)], axis=1)
            if use_shortlist:
                m = approx.shape[1]
                # freeze the pool. EVERY id scored so far (incl. this
                # round's picks, already in ``ids``) must be a member, or
                # the local exclusion below cannot see it and a later
                # round could score the same item twice (duplicate top-k
                # entries) — hence the caller guard
                # q*(S_final) <= L (retriever clamps), and membership
                # forced via +inf before the top-L cut
                pooled = jnp.max(approx, axis=0)
                pooled = pooled.at[ids.reshape(-1)].set(jnp.inf)
                _, sl_ids = jax.lax.top_k(pooled, shortlist)
                sl_ids = sl_ids.astype(jnp.int32)
                # global id -> pool-local slot; non-members -> L (a junk
                # slot appended to the restricted completion below)
                loc = (
                    jnp.full((m,), shortlist, jnp.int32)
                    .at[sl_ids]
                    .set(jnp.arange(shortlist, dtype=jnp.int32))
                )
                sl_valid = (
                    jnp.take(valid_mask, sl_ids) if valid_mask is not None else None
                )
        else:
            approx = completer(ids, vals, cols=sl_ids)  # (q, L)
            if sl_valid is not None:
                approx = jnp.where(sl_valid[None, :], approx, -jnp.inf)
            approx = jnp.concatenate(
                [approx, jnp.full((q, 1), -jnp.inf, approx.dtype)], axis=1
            )
            approx = approx.at[rows, jnp.take(loc, ids)].set(-jnp.inf)[:, :-1]
            for si, w in enumerate(widths):
                _, next_local = jax.lax.top_k(approx, w)
                next_ids = jnp.take(sl_ids, next_local).astype(jnp.int32)
                if si + 1 < len(widths):
                    approx = approx.at[rows, next_local].set(-jnp.inf)
                ids = jnp.concatenate([ids, next_ids], axis=1)
                vals = jnp.concatenate([vals, score_block(next_ids)], axis=1)
    return ids, vals


def _topk_state(ids, vals, top_k):
    top_scores, order = jax.lax.top_k(vals, min(top_k, vals.shape[1]))
    return top_scores, jnp.take_along_axis(ids, order, axis=1)


def stable_topk_flag(
    ids: jax.Array, vals: jax.Array, per: int, top_k: int,
    overlap: float = 1.0,
) -> jax.Array:
    """(q,) bool: is each query's top-``top_k`` id set (nearly) unchanged
    by the LAST round? The early-stop convergence signal: a query whose
    final round contributed (almost) nothing to its top-k has
    stabilized — spending more budget on it is wasted.

    ``overlap``: required |pre ∩ post| / top_k. 1.0 = exact set equality
    (most conservative); lower values tolerate churn in the top-k tail —
    the calibration sweep (tools/adaptive_matched_recall.py) picks the
    threshold that still matches fixed-anchor recall on every committed
    spectrum."""
    k_pre = min(top_k, vals.shape[1] - per)
    if k_pre < top_k:
        return jnp.zeros((ids.shape[0],), bool)
    _, top_pre = _topk_state(ids[:, :-per], vals[:, :-per], k_pre)
    _, top_post = _topk_state(ids, vals, top_k)
    # set overlap, not positional equality: ranking WITHIN the top-k may
    # legitimately reorder on ties; the retrieval contract is the set
    hit = (top_post[:, :, None] == top_pre[:, None, :]).any(axis=2)
    return hit.mean(axis=1) >= overlap


def adaptive_rounds(
    score_fn: Callable[[jax.Array], jax.Array],
    # score_fn(ids (q, k) int32) -> (q, k) exact scores; jittable; called
    # once per round with static k
    train: jax.Array,  # (n_train, m)
    anchors0: jax.Array,  # (first_round,) int32 shared round-0 anchors
    q: int,
    total_budget: int,
    n_rounds: int,
    top_k: int,
    ridge_rel: float = 1e-6,
    completer: Optional[Callable[..., jax.Array]] = None,
    with_state: bool = False,
    stability_overlap: float = 1.0,
    valid_mask: Optional[jax.Array] = None,
    shortlist: Optional[int] = None,
):
    """Pure traced body (call under jit): returns
    (top_scores (q, top_k), top_ids (q, top_k), scored_ids (q, budget)),
    plus (vals (q, budget), stable (q,) bool) when ``with_state`` — the
    resume state and convergence flag for early-stop escalation
    (adaptive_continue / retriever.query_tokens_adaptive_fused's
    escalate_budget mode).

    ``completer(ids (q,S), vals (q,S)) -> (q, m)`` chooses the latent
    completion backend: default = CUR train-space ridge
    (ridge_complete); pass an AXN closure (axn_complete_batched over a
    fitted AxnIndex) for the factorized-embedding backend.

    Final ranking = exact scores over everything scored (same
    retrieve-then-rerank semantics as the host version)."""
    m = train.shape[1]
    total_budget = min(total_budget, m)
    first, per, n_rounds = split_rounds(total_budget, n_rounds)
    if completer is None:
        completer = lambda ids, vals, cols=None: ridge_complete(
            train, ids, vals, ridge_rel, cols
        )

    ids = jnp.broadcast_to(anchors0[None, :first], (q, first)).astype(jnp.int32)
    # round 0 scores `first` shared anchors — tile wide stages like the
    # growth rounds (ROUND_WIDTH_CAP): same CE calls, narrow programs
    lo, blocks = 0, []
    for w in _split_width(first):
        blocks.append(score_fn(ids[:, lo:lo + w]))
        lo += w
    vals = jnp.concatenate(blocks, axis=1) if len(blocks) > 1 else blocks[0]
    ids, vals = _grow_rounds(
        score_fn, completer, ids, vals, n_rounds - 1, per, valid_mask,
        shortlist=shortlist,
    )
    top_scores, top_ids = _topk_state(ids, vals, top_k)
    if not with_state:
        return top_scores, top_ids, ids
    stable = (
        stable_topk_flag(ids, vals, per, top_k, stability_overlap)
        if n_rounds > 1
        else jnp.zeros((q,), bool)
    )
    return top_scores, top_ids, ids, vals, stable


def adaptive_continue(
    score_fn: Callable[[jax.Array], jax.Array],
    train: jax.Array,
    ids: jax.Array,  # (q, S) resume state from adaptive_rounds(with_state)
    vals: jax.Array,  # (q, S)
    extra_budget: int,
    extra_rounds: int,
    top_k: int,
    ridge_rel: float = 1e-6,
    completer: Optional[Callable[..., jax.Array]] = None,
    stability_overlap: float = 1.0,
    valid_mask: Optional[jax.Array] = None,
    shortlist: Optional[int] = None,
):
    """Early-stop escalation phase: resume UNSTABLE queries from their
    already-scored state and spend ``extra_budget`` more CE calls over
    ``extra_rounds`` rounds. Total per-query cost = S + extra_budget —
    the base budget is reused, not re-paid. Returns
    (top_scores, top_ids, ids, vals, stable) like
    adaptive_rounds(with_state=True)."""
    if completer is None:
        completer = lambda i, v, cols=None: ridge_complete(train, i, v, ridge_rel, cols)
    extra_rounds = max(1, min(extra_rounds, extra_budget))
    per = max(1, extra_budget // extra_rounds)
    first = extra_budget - per * (extra_rounds - 1)
    # first extra round takes the remainder so the budget lands exactly
    # the escalation phase keeps full-corpus picks for its first round
    # (fresh evidence may move candidates far from the base shortlist),
    # then restricts like the base engine
    ids, vals = _grow_rounds(score_fn, completer, ids, vals, 1, first, valid_mask)
    ids, vals = _grow_rounds(
        score_fn, completer, ids, vals, extra_rounds - 1, per, valid_mask,
        shortlist=shortlist,
    )
    top_scores, top_ids = _topk_state(ids, vals, top_k)
    stable = stable_topk_flag(ids, vals, per, top_k, stability_overlap)
    return top_scores, top_ids, ids, vals, stable


@lru_cache(maxsize=64)
def _oracle_fn(
    budget: int, n_rounds: int, top_k: int, ridge_rel: float,
    method: str = "cur", axn_lam_rel: float = 1e-2,
    shortlist: "Optional[int]" = None,
):
    """jitted oracle-scorer engine (scores come from a precomputed full
    matrix — the eval setting, no encoder). ``method``: 'cur' (train-
    space ridge) or 'axn' (factorized-embedding completion; takes the
    fitted item embeddings + mean as extra traced args)."""

    if method == "cur":

        def fn(full, train, anchors0):
            score = lambda ids: take_per_row(full, ids)
            return adaptive_rounds(
                score, train, anchors0, full.shape[0], budget, n_rounds,
                top_k, ridge_rel, shortlist=shortlist,
            )

    else:

        def fn(full, train, anchors0, item_embeds, mean):
            score = lambda ids: take_per_row(full, ids)
            completer = lambda ids, vals, cols=None: axn_complete_batched(
                item_embeds, mean, ids, vals, axn_lam_rel, cols=cols
            )
            return adaptive_rounds(
                score, train, anchors0, full.shape[0], budget, n_rounds, top_k,
                ridge_rel, completer=completer, shortlist=shortlist,
            )

    return jax.jit(fn)


def adaptive_topk_oracle(
    full_scores: np.ndarray,  # (q, m) exact scores (the eval oracle)
    train_scores: np.ndarray,  # (n_train, m)
    total_budget: int,
    n_rounds: int = 3,
    top_k: int = 10,
    seed: int = 0,
    ridge_rel: float = 1e-6,
    method: str = "cur",
    axn_rank: Optional[int] = None,
    axn_lam_rel: float = 1e-2,
    shortlist: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Run the fused engine against a precomputed score matrix (for
    recall evaluation / budget search — mirrors
    core/adaptive.py::adaptive_cur_query's oracle use). ``method='axn'``
    completes through rank-``axn_rank`` factorized item embeddings
    fitted from the train matrix (core/axn.py) instead of the train-
    space ridge."""
    full = jnp.asarray(full_scores, jnp.float32)
    train = jnp.asarray(train_scores, jnp.float32)
    m = full.shape[1]
    first, _, _ = split_rounds(min(total_budget, m), n_rounds)
    rng = np.random.default_rng(seed)
    anchors0 = jnp.asarray(
        sorted(rng.choice(m, size=first, replace=False)), jnp.int32
    )
    fn = _oracle_fn(
        min(total_budget, m), n_rounds, top_k, ridge_rel, method, axn_lam_rel,
        shortlist,
    )
    if method == "axn":
        from anncur_tpu.core.axn import fit_item_embeddings_cached

        # content-cached: budget/seed sweeps refit the IDENTICAL train
        # matrix at every point otherwise (21 redundant f64 SVDs per
        # scenario in tools/adaptive_matched_recall.py)
        idx = fit_item_embeddings_cached(
            np.asarray(train_scores), axn_rank or min(train_scores.shape)
        )
        s, i, scored = fn(full, train, anchors0, idx.item_embeds, idx.mean)
    else:
        s, i, scored = fn(full, train, anchors0)
    return np.asarray(s), np.asarray(i), np.asarray(scored)


def _bucket_size(n: int, cap: int) -> int:
    """Next power of two >= n (min 8), capped at ``cap`` — bounds the
    set of compiled escalation-program shapes to O(log q) variants."""
    b = 8
    while b < n:
        b *= 2
    return min(b, cap)


@lru_cache(maxsize=64)
def _oracle_es_fns(
    base_budget: int, base_rounds: int, extra_budget: int, extra_rounds: int,
    top_k: int, ridge_rel: float, method: str, axn_lam_rel: float,
    stability_overlap: float = 1.0,
):
    """(phase1, phase2) jitted oracle engines for early-stop escalation.
    phase1 = adaptive_rounds with_state on the full batch; phase2 =
    adaptive_continue on the compacted unstable rows."""

    def make_completer(train, extra):
        if method == "cur":
            return lambda ids, vals, cols=None: ridge_complete(
            train, ids, vals, ridge_rel, cols
        )
        item_embeds, mean = extra
        return lambda ids, vals, cols=None: axn_complete_batched(
            item_embeds, mean, ids, vals, axn_lam_rel
        )

    def phase1(full, train, anchors0, *extra):
        score = lambda ids: take_per_row(full, ids)
        return adaptive_rounds(
            score, train, anchors0, full.shape[0], base_budget, base_rounds,
            top_k, ridge_rel, completer=make_completer(train, extra),
            with_state=True, stability_overlap=stability_overlap,
        )

    def phase2(full_sub, train, ids, vals, *extra):
        score = lambda i: take_per_row(full_sub, i)
        return adaptive_continue(
            score, train, ids, vals, extra_budget, extra_rounds, top_k,
            ridge_rel, completer=make_completer(train, extra),
        )

    return jax.jit(phase1), jax.jit(phase2)


def adaptive_topk_oracle_early_stop(
    full_scores: np.ndarray,  # (q, m)
    train_scores: np.ndarray,  # (n_train, m)
    base_budget: int,
    base_rounds: int,
    escalate_budget: int,
    escalate_rounds: int = 3,
    top_k: int = 10,
    seed: int = 0,
    ridge_rel: float = 1e-6,
    method: str = "cur",
    axn_rank: Optional[int] = None,
    axn_lam_rel: float = 1e-2,
    stability_overlap: float = 1.0,
) -> dict:
    """Per-query early stopping (VERDICT r3 item 1b): every query runs
    the base engine; queries whose top-k set was still CHANGING in the
    last base round escalate — they RESUME from their scored state and
    spend (escalate_budget - base_budget) more CE calls. Matched recall
    becomes a property of the engine: easy spectra stop at the base
    budget, hard ones pay more, and the average budget adapts.

    Cost accounting is serving-honest: escalated rows are padded to a
    power-of-two bucket (bounding compiled-shape variants) and the
    PADDED rows count — avg_budget = base + (padded/q) * extra.

    Returns {'top_ids', 'top_scores', 'avg_budget', 'frac_escalated',
    'stable_frac'}."""
    full = jnp.asarray(full_scores, jnp.float32)
    train = jnp.asarray(train_scores, jnp.float32)
    q, m = full.shape
    base_budget = min(base_budget, m)
    escalate_budget = min(escalate_budget, m)
    extra = max(0, escalate_budget - base_budget)
    first, _, _ = split_rounds(base_budget, base_rounds)
    rng = np.random.default_rng(seed)
    anchors0 = jnp.asarray(sorted(rng.choice(m, size=first, replace=False)), jnp.int32)
    p1, p2 = _oracle_es_fns(
        base_budget, base_rounds, extra, escalate_rounds, top_k,
        ridge_rel, method, axn_lam_rel, stability_overlap,
    )
    es_args = ()
    if method == "axn":
        from anncur_tpu.core.axn import fit_item_embeddings_cached

        idx = fit_item_embeddings_cached(
            np.asarray(train_scores), axn_rank or min(train_scores.shape)
        )
        es_args = (idx.item_embeds, idx.mean)
    s, i, ids, vals, stable = p1(full, train, anchors0, *es_args)
    stable_h = np.asarray(stable)
    out_s, out_i = np.array(s), np.array(i)  # np.asarray of a jax array is read-only
    unstable = np.flatnonzero(~stable_h)
    n_pad = 0
    if extra > 0 and unstable.size:
        n_pad = _bucket_size(int(unstable.size), q)
        # pad with repeats of the first unstable row; padded results are
        # dropped (they still cost CE calls in serving — counted below)
        sel = np.concatenate([unstable, np.full(n_pad - unstable.size, unstable[0])])
        sel_d = jnp.asarray(sel, jnp.int32)
        s2, i2, _, _, _ = p2(
            jnp.take(full, sel_d, axis=0), train,
            jnp.take(ids, sel_d, axis=0), jnp.take(vals, sel_d, axis=0),
            *es_args,
        )
        out_s[unstable] = np.asarray(s2)[: unstable.size]
        out_i[unstable] = np.asarray(i2)[: unstable.size]
    return {
        "top_scores": out_s,
        "top_ids": out_i,
        "avg_budget": base_budget + extra * n_pad / q,
        "frac_escalated": unstable.size / q,
        "stable_frac": float(stable_h.mean()),
    }


def adaptive_recall_oracle_early_stop(
    full_scores: np.ndarray,
    train_scores: np.ndarray,
    base_budget: int,
    base_rounds: int,
    escalate_budget: int,
    escalate_rounds: int = 3,
    top_k: int = 10,
    seed: int = 0,
    ridge_rel: float = 1e-6,
    method: str = "cur",
    axn_rank: Optional[int] = None,
    stability_overlap: float = 1.0,
) -> Tuple[float, float, float]:
    """(recall@top_k, avg_budget, frac_escalated) of the early-stop
    engine — the calibration quantity for
    tools/adaptive_matched_recall.py's early-stop configs."""
    from anncur_tpu.core.metrics import topk_overlap_frac

    full = np.asarray(full_scores, np.float32)
    exact_top = np.argsort(-full, axis=1)[:, :top_k]
    r = adaptive_topk_oracle_early_stop(
        full, train_scores, base_budget, base_rounds, escalate_budget,
        escalate_rounds, top_k, seed, ridge_rel, method, axn_rank,
        stability_overlap=stability_overlap,
    )
    rec = float(
        np.asarray(
            topk_overlap_frac(jnp.asarray(r["top_ids"]), jnp.asarray(exact_top))
        ).mean()
    )
    return rec, r["avg_budget"], r["frac_escalated"]


def fixed_anchor_recall(
    full_scores: np.ndarray,
    train_scores: np.ndarray,
    n_anchors: int,
    top_k_retvr: int,
    top_k: int,
    seed: int = 0,
) -> float:
    """recall@top_k of the fixed-anchor CUR path at cost
    n_anchors + top_k_retvr CE calls/query (the round-2 headline path)."""
    from anncur_tpu.core.cur import build_cur
    from anncur_tpu.core.metrics import topk_overlap_frac

    full = np.asarray(full_scores, np.float32)
    train = np.asarray(train_scores, np.float32)
    n_q, m = full.shape
    exact_top = np.argsort(-full, axis=1)[:, :top_k]
    rng = np.random.default_rng(seed)
    anchors = np.asarray(sorted(rng.choice(m, size=min(n_anchors, m), replace=False)))
    index = build_cur(
        rows=train,
        cols=train[:, anchors],
        row_idxs=np.arange(train.shape[0]),
        col_idxs=anchors,
        approx_preference="rows",
        validate=False,
    )
    approx = np.asarray(index.get_complete_row(jnp.asarray(full[:, anchors])))
    cand = np.argsort(-approx, axis=1)[:, :top_k_retvr]
    reranked = []
    for i in range(n_q):
        vals = full[i, cand[i]]
        reranked.append(cand[i][np.argsort(-vals)[:top_k]])
    return float(
        np.asarray(
            topk_overlap_frac(jnp.asarray(np.stack(reranked)), jnp.asarray(exact_top))
        ).mean()
    )


def adaptive_recall_oracle(
    full_scores: np.ndarray,
    train_scores: np.ndarray,
    total_budget: int,
    n_rounds: int = 3,
    top_k: int = 10,
    seed: int = 0,
    ridge_rel: float = 1e-6,
    method: str = "cur",
    axn_rank: Optional[int] = None,
    shortlist: Optional[int] = None,
) -> float:
    """recall@top_k of the fused adaptive engine at the given budget."""
    from anncur_tpu.core.metrics import topk_overlap_frac

    full = np.asarray(full_scores, np.float32)
    exact_top = np.argsort(-full, axis=1)[:, :top_k]
    _, ids, _ = adaptive_topk_oracle(
        full, train_scores, total_budget, n_rounds, top_k, seed, ridge_rel,
        method=method, axn_rank=axn_rank, shortlist=shortlist,
    )
    return float(
        np.asarray(topk_overlap_frac(jnp.asarray(ids), jnp.asarray(exact_top))).mean()
    )


def matched_recall_budget(
    full_scores: np.ndarray,
    train_scores: np.ndarray,
    fixed_n_anchors: int = 500,
    fixed_top_k_retvr: int = 100,
    top_k: int = 10,
    n_rounds: int = 3,
    seeds: Tuple[int, ...] = (0, 1, 2),
    budgets: Tuple[int, ...] = (40, 60, 80, 120, 160, 240, 320, 480, 600),
    ridge_rel: float = 1e-6,
    method: str = "cur",
    axn_rank: Optional[int] = None,
) -> dict:
    """Find the smallest adaptive budget whose mean recall@top_k matches
    (>=) the fixed-anchor path at cost = fixed_n_anchors +
    fixed_top_k_retvr. This is the honest route past a CE-calls/s
    roofline: equal recall at budget b* multiplies effective q/s by
    (fixed cost / b*). Returns the full sweep for the evidence artifact."""
    fixed = float(
        np.mean(
            [
                fixed_anchor_recall(
                    full_scores, train_scores, fixed_n_anchors, fixed_top_k_retvr, top_k, s
                )
                for s in seeds
            ]
        )
    )
    sweep = {}
    matched = None
    for b in sorted(budgets):
        r = float(
            np.mean(
                [
                    adaptive_recall_oracle(
                        full_scores, train_scores, b, n_rounds, top_k, s, ridge_rel,
                        method=method, axn_rank=axn_rank,
                    )
                    for s in seeds
                ]
            )
        )
        sweep[b] = r
        if matched is None and r >= fixed:
            matched = b
    return {
        "fixed_cost": fixed_n_anchors + fixed_top_k_retvr,
        "fixed_recall": fixed,
        "adaptive_sweep": sweep,
        "matched_budget": matched,
        "top_k": top_k,
        "n_rounds": n_rounds,
        "seeds": list(seeds),
        "method": method,
        "axn_rank": axn_rank,
    }
