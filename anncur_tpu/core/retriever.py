"""High-level index-and-query engine: the production serving API.

Ties the whole framework together (the reference has no single serving
class — this is the composed online path of SURVEY §3.4):

offline:  exact CE scores of train queries vs all items (mesh-sharded
          ScoreMatrixBuilder) -> CurIndex (latent item embeddings U@R)
online:   query text -> tokenize -> CE-score against the k_i anchor
          items only -> project through latent factors -> top-k_retvr
          candidates -> exact CE rerank -> top-k results.

Cost per query = n_anchor_items + top_k_retvr CE calls (the reference's
cost axis, run_retrieval_eval_wrt_exact_crossenc.py:480-481).

Everything device-side is jit-compiled once with static shapes; queries
are batched for MXU efficiency.
"""

from __future__ import annotations

import dataclasses
import logging
import os
import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from anncur_tpu.core.cur import CurIndex, build_cur
from anncur_tpu.data.tokenization import get_context_representation_ids
from anncur_tpu.indexer.score_matrix import ScoreMatrixBuilder
from anncur_tpu.models.crossencoder import CrossEncoder
from anncur_tpu.models.tokenizer import WordPieceTokenizer

LOGGER = logging.getLogger(__name__)


def _largest_divisor_leq(n: int, target: int) -> int:
    """Largest divisor of ``n`` that is <= target (>= 1): the chunk size
    that tiles ``n`` evenly while staying within a pair budget."""
    for d in range(min(max(target, 1), n), 0, -1):
        if n % d == 0:
            return d
    return 1


def _make_pair_scorer(ce: CrossEncoder, lm: int, le: int, pair_pad_multiple: int):
    """(c, width, Le) candidate tokens + (c, Lm) query block -> (c, width)
    CE scores, used by every fused serving program.

    NB: pair layout (broadcast-left / concat cand[:, :, 1:] / pad to
    pair_len) must stay in lockstep with the offline builder and
    evalx.retrieve_rerank._rerank_scan_fn — a layout change made in one
    place silently diverges the others."""
    raw_len = lm + le - 1
    pad = min(pair_pad_multiple, ce.spec.max_position_embeddings)
    pair_len = raw_len + ((-raw_len) % pad)

    def score_pairs(p, m_blk, cand_toks, c, width):
        left = jnp.broadcast_to(m_blk[:, None, :], (c, width, lm))
        pairs = jnp.concatenate([left, cand_toks[:, :, 1:]], axis=-1).reshape(
            c * width, raw_len
        )
        pairs = jnp.pad(pairs, ((0, 0), (0, pair_len - raw_len)))
        return ce.score(p, pairs, first_segment_end=lm).reshape(c, width)

    return score_pairs


@dataclasses.dataclass
class CurRetriever:
    """Serving-time CUR retriever over one item corpus."""

    encoder: CrossEncoder
    params: Dict
    tokenizer: WordPieceTokenizer
    item_tokens: np.ndarray  # (n_items, Le)
    index: CurIndex
    anchor_item_ids: np.ndarray  # (k_i,)
    max_query_len: int = 128
    # CE forwards are sized to ~target_pairs_per_step pairs regardless of
    # candidate-set width: mentions per step = target // k (memory-safe
    # AND MXU-efficient; fixed tiny batches halved throughput). 4096
    # measured best on v5e-16GB for the fused query program: 3.59 ->
    # 5.07 q/s at cost 600 vs 2048 (8192 regresses to 4.99 — bigger
    # scan bodies stop paying once the MXU is saturated).
    target_pairs_per_step: int = 4096
    pair_pad_multiple: int = 128
    # optional device mesh for multi-chip serving: the query batch is
    # sharded over the 'data' axis (items/index replicated, zero
    # collectives — queries are embarrassingly parallel)
    mesh: Optional[object] = None
    mesh_axis: str = "data"
    # the ITEM axis of every fused program is padded to a multiple of
    # this block (padded columns masked to -inf, padded token rows are
    # zeros). Compiled programs are therefore keyed on the PADDED item
    # count: add_items/remove_items within the same block reuse them —
    # without this, ANY corpus edit changed the item-axis shape and the
    # next query paid a full recompile (60-90 s per program on a remote
    # TPU link; VERDICT r3 item 3). The real item count rides along as a
    # traced scalar argument, never baked into the program.
    item_pad_multiple: int = 1024
    # dynamic-corpus support (populated by .build()): U = pinv(R[:, anc])
    # and the anchor-query tokens let add_items extend the index without
    # a rebuild — U depends only on the anchor intersection, which new
    # items never touch, so incremental == full rebuild exactly.
    train_query_tokens: Optional[np.ndarray] = None
    u: Optional[np.ndarray] = None  # (k_c, k_q)
    # position -> stable external item id (identity until remove_items)
    item_ids: Optional[np.ndarray] = None
    # monotonic id allocator: NEVER derived from max(item_ids) — if the
    # max-id item were removed, a later add would resurrect its id and
    # break the stable-id contract ("queries never return removed ids")
    next_item_id: Optional[int] = None

    @property
    def rerank_batch(self) -> int:  # back-compat alias used in tests
        return max(1, self.target_pairs_per_step // max(1, len(self.anchor_item_ids)))

    def _stage_batch(self, k: int) -> int:
        return max(1, self.target_pairs_per_step // max(1, k))

    # jitted fused query programs keyed by static shapes + device-resident
    # constants (item tokens, anchor ids, latent factors): populated lazily
    def __post_init__(self):
        if self.index.approx_preference != "rows":
            # the fused query program computes anchor_scores @ latent_cols,
            # which is U@R only under 'rows'; a 'cols' index would score
            # with R alone — plausible-looking but WRONG rankings (the
            # guard CurIndex.get_complete_row enforces, kept here too)
            raise ValueError(
                "CurRetriever serves indexes built with approx_preference="
                f"'rows'; got {self.index.approx_preference!r} — rebuild "
                "with rows-preference (the online-query factorization)"
            )
        self._fused_cache: Dict[tuple, object] = {}
        self._dev_consts = None
        self._train_mat = None
        self._axn_cache: Dict[int, object] = {}
        if self.item_ids is None:
            self.item_ids = np.arange(self.item_tokens.shape[0], dtype=np.int64)
        if self.next_item_id is None:
            self.next_item_id = int(self.item_ids.max()) + 1 if len(self.item_ids) else 0

    def _invalidate(self) -> None:
        """Refresh device constants after a corpus edit. Compiled fused
        programs are KEPT: every corpus-dependent value they touch
        (item tokens, latent columns, valid mask, train matrix) is a
        traced argument, so a same-padded-shape edit reuses them as-is
        and a block-boundary crossing just triggers jit's own
        shape-keyed recompile. Dropping them here was the round-3
        recompile cliff: one /add cost the next query a 60-90 s
        compile on a remote TPU link (VERDICT r3 item 3)."""
        self._dev_consts = None
        self._train_mat = None
        self._axn_cache = {}

    def _padded_n_items(self) -> int:
        n = self.item_tokens.shape[0]
        block = max(1, int(self.item_pad_multiple))
        return n + ((-n) % block)

    def _device_consts(self):
        """(item_tokens (n_pad, Le), anchor_ids (k_i,), latent_cols
        (k_c, n_pad), valid_mask (n_pad,)) — the item axis padded to
        item_pad_multiple (token rows zero, latent columns zero, mask
        False) so corpus edits within a block keep program shapes."""
        if self._dev_consts is None:
            n = self.item_tokens.shape[0]
            n_pad = self._padded_n_items()
            items = np.zeros((n_pad, self.item_tokens.shape[1]), np.int32)
            items[:n] = self.item_tokens
            latent = np.zeros(
                (self.index.latent_cols.shape[0], n_pad), np.float32
            )
            latent[:, :n] = np.asarray(self.index.latent_cols, np.float32)
            mask = np.zeros((n_pad,), bool)
            mask[:n] = True
            self._dev_consts = (
                jnp.asarray(items),
                jnp.asarray(self.anchor_item_ids, jnp.int32),
                jnp.asarray(latent),
                jnp.asarray(mask),
            )
        return self._dev_consts

    # ---------------- offline build ----------------------------------- #

    @classmethod
    def build(
        cls,
        encoder: CrossEncoder,
        params: Dict,
        tokenizer: WordPieceTokenizer,
        train_query_tokens: np.ndarray,  # (k_q, Lm) anchor queries
        item_tokens: np.ndarray,  # (n_items, Le)
        n_anchor_items: int,
        builder: ScoreMatrixBuilder,
        seed: int = 0,
        train_scores: Optional[np.ndarray] = None,
        max_query_len: int = 128,
        rcond: Optional[float] = None,
    ) -> "CurRetriever":
        """Offline indexing: score anchor queries against ALL items (the
        expensive mesh-sharded step), sample anchor items, build the CUR
        latent factors with all train rows as anchors
        (reference flow: ..._w_fixed_train_test_splits.py:286-303).

        ``rcond``: pinv cutoff for the anchor-intersection pseudoinverse
        (relative to the largest singular value). Default (None) cuts at
        f32 machine eps — correct when the score matrix's structure sits
        well above the compute noise floor (any trained CE). If the
        matrix's ranking signal is within ~1e-3 of its dominant singular
        value (e.g. near-constant scores), TPU bf16-level matmul noise
        differs between the offline builder program and the online fused
        query program and the near-null pinv directions amplify it: pass
        rcond~1e-3, or the string 'noise' for the Gavish-Donoho adaptive
        threshold (ops/pinv.py::noise_rcond), to cut at the noise floor
        instead (measured: recall@5 0.5 -> 0.9 on a degenerate
        rank-1-ish matrix)."""
        if train_scores is None:
            LOGGER.info(
                "offline scoring: %d anchor queries x %d items",
                train_query_tokens.shape[0],
                item_tokens.shape[0],
            )
            train_scores = builder(params, train_query_tokens, item_tokens)
        n_items = item_tokens.shape[0]
        rng = np.random.default_rng(seed)
        anchors = np.asarray(
            sorted(rng.choice(n_items, size=min(n_anchor_items, n_items), replace=False))
        )
        index, u = build_cur(
            rows=train_scores,
            cols=train_scores[:, anchors],
            row_idxs=np.arange(train_scores.shape[0]),
            col_idxs=anchors,
            approx_preference="rows",
            validate=False,
            rcond=rcond,
            return_u=True,
        )
        return cls(
            encoder=encoder,
            params=params,
            tokenizer=tokenizer,
            item_tokens=item_tokens,
            index=index,
            anchor_item_ids=anchors,
            max_query_len=max_query_len,
            train_query_tokens=np.asarray(train_query_tokens),
            u=np.asarray(u),
        )

    # ---------------- dynamic corpus ----------------------------------- #

    def add_items(self, new_item_tokens: np.ndarray, builder: ScoreMatrixBuilder) -> np.ndarray:
        """Add items WITHOUT rebuilding the index: each new item costs
        k_q CE calls (anchor queries vs the item) and one small matvec —
        its latent column is ``U @ r_new``, and U depends only on the
        anchor intersection, which new items never touch, so the result
        is exactly what a full rebuild with the same anchors gives.

        Returns the stable external ids assigned to the new items.
        Compiled query programs are REUSED as long as the padded item
        count (item_pad_multiple blocks) is unchanged — only device
        constants are refreshed; an add that crosses a block boundary
        recompiles once for the new padded shape (see _invalidate)."""
        if self.u is None or self.train_query_tokens is None:
            raise ValueError(
                "add_items requires a retriever created by CurRetriever.build "
                "(it stores U and the anchor-query tokens)"
            )
        new_item_tokens = np.asarray(new_item_tokens, np.int32)
        new_scores = builder(self.params, self.train_query_tokens, new_item_tokens)
        # f64 host matmul: U can be ill-conditioned (its large entries
        # cancel), so accumulate the new latent columns at f64 before
        # casting — deterministic and at least as accurate as the f32
        # device dot build_cur uses for the original columns.
        new_latent = jnp.asarray(
            (np.asarray(self.u, np.float64) @ np.asarray(new_scores, np.float64)).astype(
                np.float32
            )
        )  # (k_c, n_new)
        self.index = dataclasses.replace(
            self.index,
            latent_cols=jnp.concatenate([self.index.latent_cols, new_latent], axis=1),
        )
        self.item_tokens = np.concatenate([self.item_tokens, new_item_tokens], axis=0)
        new_ids = np.arange(
            self.next_item_id, self.next_item_id + new_item_tokens.shape[0], dtype=np.int64
        )
        self.next_item_id = int(new_ids[-1]) + 1 if len(new_ids) else self.next_item_id
        self.item_ids = np.concatenate([self.item_ids, new_ids])
        self._invalidate()
        return new_ids

    def remove_items(self, ids: np.ndarray) -> int:
        """Remove items by stable external id. Anchor items cannot be
        removed (their tokens feed the online anchor-scoring stage and
        their columns define U) — rebuild with fresh anchors instead.
        Queries never return removed ids afterwards; remaining items
        keep their external ids. Duplicate ids are collapsed (the
        anchor-position shift below counts each removed SLOT once; a
        duplicated position would double-shift every anchor past it).
        Returns the number of items actually removed."""
        ids = np.asarray(ids)
        pos_of = {int(e): p for p, e in enumerate(self.item_ids)}
        missing = [int(i) for i in ids if int(i) not in pos_of]
        if missing:
            raise KeyError(f"unknown item ids: {missing[:5]}")
        positions = np.unique(
            np.asarray([pos_of[int(i)] for i in ids], dtype=np.int64)
        )
        anchor_set = set(int(a) for a in np.asarray(self.anchor_item_ids))
        hit = [int(p) for p in positions if int(p) in anchor_set]
        if hit:
            raise ValueError(
                f"cannot remove anchor items (positions {hit[:5]}); "
                "rebuild the index with new anchors instead"
            )
        keep = np.setdiff1d(np.arange(self.item_tokens.shape[0]), positions)
        self.item_tokens = self.item_tokens[keep]
        self.item_ids = self.item_ids[keep]
        # anchor positions shift left past removed slots
        old_anchor_pos = np.asarray(self.anchor_item_ids)
        shift = np.searchsorted(positions, old_anchor_pos)
        self.anchor_item_ids = old_anchor_pos - shift
        self.index = dataclasses.replace(
            self.index,
            latent_cols=self.index.latent_cols[:, keep],
            col_idxs=jnp.asarray(self.anchor_item_ids, jnp.int32),
        )
        self._invalidate()
        return int(positions.size)

    # ---------------- persistence -------------------------------------- #

    def save(self, path: str) -> None:
        """Persist the full serving state (index, anchors, U, anchor-query
        tokens, item tokens, stable ids) so a restarted process can keep
        serving AND keep calling add_items/remove_items. Encoder params
        and the tokenizer are saved separately (train/checkpoint.py,
        vocab file) — they are model artifacts, not index state."""
        import pickle

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "wb") as fout:
            pickle.dump(
                {
                    "latent_rows": np.asarray(self.index.latent_rows),
                    "latent_cols": np.asarray(self.index.latent_cols),
                    "row_idxs": np.asarray(self.index.row_idxs),
                    "col_idxs": np.asarray(self.index.col_idxs),
                    "approx_preference": self.index.approx_preference,
                    "anchor_item_ids": np.asarray(self.anchor_item_ids),
                    "item_tokens": np.asarray(self.item_tokens),
                    "item_ids": np.asarray(self.item_ids),
                    "u": None if self.u is None else np.asarray(self.u),
                    "train_query_tokens": None
                    if self.train_query_tokens is None
                    else np.asarray(self.train_query_tokens),
                    "max_query_len": self.max_query_len,
                    "next_item_id": int(self.next_item_id),
                    "format_version": 1,
                },
                fout,
            )

    @classmethod
    def load(
        cls,
        path: str,
        encoder: CrossEncoder,
        params: Dict,
        tokenizer: WordPieceTokenizer,
        **kw,
    ) -> "CurRetriever":
        """Inverse of save(); pass the encoder/params/tokenizer the index
        was built with (extra kwargs override serving knobs, e.g. mesh)."""
        import pickle

        with open(path, "rb") as fin:
            d = pickle.load(fin)
        return cls.from_state_dict(d, encoder, params, tokenizer, **kw)

    @classmethod
    def from_state_dict(
        cls,
        d: Dict,
        encoder: CrossEncoder,
        params: Dict,
        tokenizer: WordPieceTokenizer,
        **kw,
    ) -> "CurRetriever":
        """Build from an already-unpickled save() dict (state files can
        carry hundreds of MB of item tokens — callers that had to sniff
        the format should not deserialize twice)."""
        index = CurIndex(
            latent_rows=jnp.asarray(d["latent_rows"]),
            latent_cols=jnp.asarray(d["latent_cols"]),
            row_idxs=jnp.asarray(d["row_idxs"]),
            col_idxs=jnp.asarray(d["col_idxs"]),
            approx_preference=d["approx_preference"],
        )
        _r = cls(
            encoder=encoder,
            params=params,
            tokenizer=tokenizer,
            item_tokens=np.asarray(d["item_tokens"]),
            index=index,
            anchor_item_ids=np.asarray(d["anchor_item_ids"]),
            max_query_len=int(d["max_query_len"]),
            train_query_tokens=d["train_query_tokens"],
            u=d["u"],
            item_ids=np.asarray(d["item_ids"]),
            next_item_id=d.get("next_item_id"),
            **kw,
        )
        if "next_item_id" not in d:
            # legacy state without the allocator: __post_init__ falls back
            # to max(item_ids)+1, which resurrects the max id if that item
            # had been removed before saving — surface it, don't be silent
            LOGGER.warning(
                "state dict has no next_item_id; id allocator re-derived as "
                "max(item_ids)+1 — if the max-id item was removed before "
                "saving, the next add_items will REUSE its external id"
            )
        return _r

    # ---------------- online query ------------------------------------ #

    def _anchor_scores(self, query_tokens) -> jnp.ndarray:
        """(q, k_i) exact CE scores of queries vs anchor items only.

        Chunked over mentions (rerank_batch) so activation memory stays
        bounded at rerank_batch * k_i pairs regardless of query count —
        one 32-query x 500-anchor batch through bert-base in a single
        forward OOMs a 16 GB chip."""
        from anncur_tpu.evalx.retrieve_rerank import crossenc_rerank_scores

        q = np.asarray(query_tokens).shape[0]
        cand = np.broadcast_to(
            np.asarray(self.anchor_item_ids)[None, :], (q, len(self.anchor_item_ids))
        )
        scores = crossenc_rerank_scores(
            self.encoder,
            self.params,
            np.asarray(query_tokens),
            self.item_tokens,
            cand,
            batch_ments=self._stage_batch(cand.shape[1]),
            pair_pad_multiple=self.pair_pad_multiple,
        )
        return jnp.asarray(scores)

    def _rerank(self, query_tokens: np.ndarray, cand_idx: np.ndarray) -> np.ndarray:
        from anncur_tpu.evalx.retrieve_rerank import crossenc_rerank_scores

        return crossenc_rerank_scores(
            self.encoder,
            self.params,
            np.asarray(query_tokens),
            self.item_tokens,
            cand_idx,
            batch_ments=self._stage_batch(cand_idx.shape[1]),
            pair_pad_multiple=self.pair_pad_multiple,
        )

    def _get_fused_query_fn(self, q_pad: int, chunk: int, lm: int, top_k: int, top_k_retvr: int, rerank: bool):
        """Build (or fetch) the single jit program for a query batch:
        anchor-scoring scan -> latent projection -> top-k_retvr retrieval
        [-> exact-rerank scan -> top-k]. ONE dispatch per batch — the
        previous per-stage programs paid a host round trip each, which
        dominated latency on remote-TPU links (measured ~0.3-0.5 s per
        dispatch vs ~2 s of compute for a 32-query x 600-CE-call batch)."""
        key = (q_pad, chunk, lm, top_k, top_k_retvr, rerank)
        if key in self._fused_cache:
            return self._fused_cache[key]

        ce = self.encoder
        k_i = len(self.anchor_item_ids)
        le = self.item_tokens.shape[1]
        n_chunks = q_pad // chunk
        # rerank stage handles only top_k_retvr (<= k_i) candidates per
        # query, so it can take bigger query chunks: largest divisor of
        # q_pad within the pair-budget (keeps its CE batches MXU-sized
        # instead of inheriting the anchor stage's narrow chunking)
        r_target = max(1, self._stage_batch(top_k_retvr))
        r_chunk = _largest_divisor_leq(q_pad, r_target)
        n_r_chunks = q_pad // r_chunk

        score_pairs = _make_pair_scorer(ce, lm, le, self.pair_pad_multiple)

        def fn(p, qtoks, items, anchor_ids, latent_cols, valid_mask):
            anchor_toks = jnp.take(items, anchor_ids, axis=0)  # (k_i, Le)

            def body_anchor(_, m_blk):
                cand_toks = jnp.broadcast_to(
                    anchor_toks[None, :, :], (chunk, k_i, le)
                )
                return None, score_pairs(p, m_blk, cand_toks, chunk, k_i)

            q_chunks = qtoks.reshape(n_chunks, chunk, lm)
            _, a = jax.lax.scan(body_anchor, None, q_chunks)
            anchor_scores = a.reshape(q_pad, k_i)
            # latent projection: f32 highest precision — bf16 default
            # collapses CUR recall (CLAUDE.md, measured)
            approx = jnp.dot(
                anchor_scores, latent_cols,
                preferred_element_type=jnp.float32, precision="highest",
            )
            # padded item columns can never be retrieved
            approx = jnp.where(valid_mask[None, :], approx, -jnp.inf)
            if not rerank:
                s, i = jax.lax.top_k(approx, top_k)
                return s, i
            _, cand = jax.lax.top_k(approx, top_k_retvr)  # (q_pad, kr)

            def body_rerank(_, inp):
                m_blk, c_blk = inp
                cand_toks = jnp.take(items, c_blk, axis=0)  # (r_chunk, kr, Le)
                return None, score_pairs(p, m_blk, cand_toks, r_chunk, top_k_retvr)

            _, ex = jax.lax.scan(
                body_rerank,
                None,
                (
                    qtoks.reshape(n_r_chunks, r_chunk, lm),
                    cand.reshape(n_r_chunks, r_chunk, top_k_retvr),
                ),
            )
            exact = ex.reshape(q_pad, top_k_retvr)
            s, order = jax.lax.top_k(exact, top_k)
            return s, jnp.take_along_axis(cand, order, axis=1)

        if self._mesh_size() > 1:
            # multi-chip: per-device fn over the query shard; qtoks arrive
            # sharded on the data axis, everything else replicated
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            fn = shard_map(
                fn,
                mesh=self.mesh,
                in_specs=(P(), P(self.mesh_axis), P(), P(), P(), P()),
                out_specs=(P(self.mesh_axis), P(self.mesh_axis)),
                check_vma=False,
            )
        self._fused_cache[key] = jax.jit(fn)
        return self._fused_cache[key]

    def _mesh_size(self) -> int:
        return int(self.mesh.devices.size) if self.mesh is not None else 1

    def query_tokens_batch(
        self,
        query_tokens: np.ndarray,  # (q, Lm)
        top_k: int = 10,
        top_k_retvr: int = 100,
        rerank: bool = True,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """(scores (q, top_k), item indices (q, top_k)) — one fused jit
        program per batch (reference online path modeled at
        ..._w_fixed_train_test_splits.py:286-303; cost per query =
        n_anchor_items + top_k_retvr CE calls)."""
        query_tokens = np.asarray(query_tokens, np.int32)
        q, lm = query_tokens.shape
        top_k_retvr = min(top_k_retvr, self.index.n_cols)
        top_k = min(top_k, top_k_retvr if rerank else self.index.n_cols)
        k_max = max(len(self.anchor_item_ids), top_k_retvr)
        n_dev = self._mesh_size()
        # chunk is a PER-DEVICE scan block: cap it at the shard size
        # ceil(q/n_dev), not the global q — otherwise a 16-query batch on
        # an 8-device mesh padded to 8 full-chunk shards of 16 = 128 rows
        # and every device burned 8x the CE compute on padding (measured
        # 31.4 -> 4.7 q/s going 1 -> 8 virtual devices before this fix;
        # benchmarks/multichip_scaling.json)
        chunk = max(1, min(self._stage_batch(k_max), -(-q // n_dev)))
        q_pad = q + ((-q) % (chunk * n_dev))
        qtoks = np.zeros((q_pad, lm), np.int32)
        qtoks[:q] = query_tokens
        items, anchor_ids, latent_cols, valid_mask = self._device_consts()
        # fused fn is built on PER-DEVICE shapes; shard_map slices the
        # global batch along the mesh data axis
        fn = self._get_fused_query_fn(q_pad // n_dev, chunk, lm, top_k, top_k_retvr, rerank)
        s, i = fn(
            self.params, jnp.asarray(qtoks), items, anchor_ids, latent_cols, valid_mask
        )
        # positions -> stable external ids (identity unless items were
        # removed; see remove_items)
        return np.asarray(s)[:q], self.item_ids[np.asarray(i)[:q]]

    def tokenize_query(
        self, mention: str, context_left: str = "", context_right: str = ""
    ) -> List[int]:
        """The query-tokenization contract (lowercasing + quota-balanced
        context representation at max_query_len) — the single source for
        both the query() API and the serve CLI."""
        return get_context_representation_ids(
            {
                "mention": mention.lower(),
                "context_left": context_left.lower(),
                "context_right": context_right.lower(),
            },
            self.tokenizer,
            self.max_query_len,
        )

    def query(
        self,
        mention: str,
        context_left: str = "",
        context_right: str = "",
        top_k: int = 10,
        top_k_retvr: int = 100,
    ) -> List[Tuple[int, float]]:
        """Single text query -> [(item_id, score)]."""
        ids = self.tokenize_query(mention, context_left, context_right)
        scores, idx = self.query_tokens_batch(
            np.asarray([ids], np.int32), top_k=top_k, top_k_retvr=top_k_retvr
        )
        return list(zip(idx[0].tolist(), scores[0].tolist()))

    def query_tokens_adaptive(
        self,
        query_tokens: np.ndarray,  # (q, Lm)
        total_budget: int = 200,
        n_rounds: int = 3,
        top_k: int = 10,
        train_scores: Optional[np.ndarray] = None,
        seed: int = 0,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """ADACUR-style adaptive retrieval (core/adaptive.py): the CE-call
        budget is spent in rounds that concentrate around each query's own
        neighborhood. At equal budget this dominates the fixed-anchor path
        in the hard regime (measured: recall@10 0.97 vs 0.56 at budget 80
        on rank-60 matrices). ``train_scores``: the (n_train, n_items)
        matrix the index was built from; defaults to the latent
        reconstruction of the anchor rows if not provided."""
        from anncur_tpu.core.adaptive import adaptive_cur_query
        from anncur_tpu.evalx.retrieve_rerank import crossenc_rerank_scores

        if train_scores is None:
            # latent_rows @ latent_cols restores the training rows the
            # index was built from (anchor-row reconstruction is exact)
            train_scores = np.asarray(self.index.reconstruct())
        query_tokens = np.asarray(query_tokens)

        def score_items_fn(item_ids):
            cand = np.broadcast_to(
                np.asarray(item_ids)[None, :], (query_tokens.shape[0], len(item_ids))
            )
            return crossenc_rerank_scores(
                self.encoder, self.params, query_tokens, self.item_tokens, cand,
                batch_ments=self._stage_batch(len(item_ids)),
                pair_pad_multiple=self.pair_pad_multiple,
            )

        scores, ids, _ = adaptive_cur_query(
            train_scores,
            score_items_fn,
            n_items=self.item_tokens.shape[0],
            total_budget=total_budget,
            n_rounds=n_rounds,
            top_k=top_k,
            seed=seed,
        )
        # unfilled slots come back as -1 (score -inf); keep them -1 in
        # external-id space instead of wrapping to item_ids[-1]
        ids = np.asarray(ids)
        return scores, np.where(ids >= 0, self.item_ids[np.clip(ids, 0, None)], -1)

    # ------------- fused adaptive query (first-class serving mode) ----- #

    def _train_matrix(self) -> jnp.ndarray:
        """(n_train, n_pad_items) train matrix on device: latent_rows @
        latent_cols restores the training rows the index was built from
        (anchor-row reconstruction is exact), zero-padded on the item
        axis to the same block multiple as the fused programs. Cached;
        invalidated on corpus edits."""
        if self._train_mat is None:
            mat = np.asarray(self.index.reconstruct(), np.float32)
            pad = self._padded_n_items() - mat.shape[1]
            if pad:
                mat = np.pad(mat, ((0, 0), (0, pad)))
            self._train_mat = jnp.asarray(mat)
        return self._train_mat

    def _get_fused_adaptive_fn(
        self,
        q_pad: int,
        lm: int,
        budget: int,
        n_rounds: int,
        top_k: int,
        ridge_rel: float,
        method: str = "cur",
        axn_lam_rel: float = 1e-2,
        with_state: bool = False,
        stability_overlap: float = 1.0,
        shortlist: Optional[int] = None,
    ):
        """ONE jit program for the whole adaptive query batch: round-0
        anchor scoring -> per-round latent completion / candidate pick /
        per-query CE scoring (rounds unrolled) -> final top-k over exact
        scores. Replaces the host path's per-round dispatches and
        per-query f64 pinvs (core/adaptive_fused.py docstring).
        ``method``: 'cur' (train-space ridge) or 'axn' (factorized
        item-embedding completion, core/axn.py — r x r solves).
        ``with_state``: also return (vals, stable) — the resume state +
        convergence flag the early-stop escalation phase consumes.

        ``q_pad`` is the PER-DEVICE query count: on a multi-chip mesh the
        program is shard_mapped over the data axis (queries sharded,
        corpus/index/train replicated — every round's solves and CE
        gathers are per-query independent, so no collectives are needed
        inside the program)."""
        key = (
            "adaptive", q_pad, lm, budget, n_rounds, top_k, ridge_rel, method,
            axn_lam_rel, with_state, stability_overlap, shortlist,
        )
        if key in self._fused_cache:
            return self._fused_cache[key]
        from anncur_tpu.core.adaptive_fused import adaptive_rounds, axn_complete_batched

        ce = self.encoder
        le = self.item_tokens.shape[1]
        score_pairs = _make_pair_scorer(ce, lm, le, self.pair_pad_multiple)

        def make_score_fn(p, qtoks, items):
            def score_fn(ids):
                width = ids.shape[1]
                target = max(1, self._stage_batch(width))
                chunk = _largest_divisor_leq(q_pad, target)
                nc = q_pad // chunk

                def body(_, inp):
                    m_blk, c_blk = inp
                    cand_toks = jnp.take(items, c_blk, axis=0)  # (chunk, width, Le)
                    return None, score_pairs(p, m_blk, cand_toks, chunk, width)

                _, out = jax.lax.scan(
                    body,
                    None,
                    (qtoks.reshape(nc, chunk, lm), ids.reshape(nc, chunk, width)),
                )
                return out.reshape(q_pad, width)

            return score_fn

        if method == "axn":

            def fn(p, qtoks, items, train, anchors0, valid_mask, item_embeds, mean):
                completer = lambda ids, vals, cols=None: axn_complete_batched(
                    item_embeds, mean, ids, vals, axn_lam_rel, cols=cols
                )
                return adaptive_rounds(
                    make_score_fn(p, qtoks, items), train, anchors0, q_pad, budget,
                    n_rounds, top_k, ridge_rel, completer=completer,
                    valid_mask=valid_mask, with_state=with_state,
                    stability_overlap=stability_overlap, shortlist=shortlist,
                )

        else:

            def fn(p, qtoks, items, train, anchors0, valid_mask):
                return adaptive_rounds(
                    make_score_fn(p, qtoks, items), train, anchors0, q_pad, budget,
                    n_rounds, top_k, ridge_rel, valid_mask=valid_mask,
                    with_state=with_state, stability_overlap=stability_overlap,
                    shortlist=shortlist,
                )

        if self._mesh_size() > 1:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            ax = self.mesh_axis
            n_in = 8 if method == "axn" else 6
            n_out = 5 if with_state else 3  # adaptive_rounds arity
            in_specs = tuple(
                P(ax) if j == 1 else P() for j in range(n_in)  # qtoks sharded
            )
            fn = shard_map(
                fn,
                mesh=self.mesh,
                in_specs=in_specs,
                out_specs=tuple(P(ax) for _ in range(n_out)),
                check_vma=False,
            )
        self._fused_cache[key] = jax.jit(fn)
        return self._fused_cache[key]

    def _get_fused_continue_fn(
        self,
        b_pad: int,
        lm: int,
        state_width: int,
        extra_budget: int,
        extra_rounds: int,
        top_k: int,
        ridge_rel: float,
        method: str = "cur",
        axn_lam_rel: float = 1e-2,
    ):
        """Phase-2 (escalation) program for early-stop adaptive serving:
        resume the compacted UNSTABLE queries from their (ids, vals)
        scored state and spend ``extra_budget`` more CE calls. Same
        fused structure as phase 1 — the already-paid base budget rides
        in as state, not re-scored."""
        key = (
            "adaptive-cont", b_pad, lm, state_width, extra_budget, extra_rounds,
            top_k, ridge_rel, method, axn_lam_rel,
        )
        if key in self._fused_cache:
            return self._fused_cache[key]
        from anncur_tpu.core.adaptive_fused import (
            adaptive_continue,
            axn_complete_batched,
        )

        ce = self.encoder
        le = self.item_tokens.shape[1]
        score_pairs = _make_pair_scorer(ce, lm, le, self.pair_pad_multiple)

        def make_score_fn(p, qtoks, items):
            def score_fn(ids):
                width = ids.shape[1]
                target = max(1, self._stage_batch(width))
                chunk = _largest_divisor_leq(b_pad, target)
                nc = b_pad // chunk

                def body(_, inp):
                    m_blk, c_blk = inp
                    cand_toks = jnp.take(items, c_blk, axis=0)
                    return None, score_pairs(p, m_blk, cand_toks, chunk, width)

                _, out = jax.lax.scan(
                    body,
                    None,
                    (qtoks.reshape(nc, chunk, lm), ids.reshape(nc, chunk, width)),
                )
                return out.reshape(b_pad, width)

            return score_fn

        if method == "axn":

            def fn(p, qtoks, items, train, ids, vals, valid_mask, item_embeds, mean):
                completer = lambda i, v, cols=None: axn_complete_batched(
                    item_embeds, mean, i, v, axn_lam_rel, cols=cols
                )
                return adaptive_continue(
                    make_score_fn(p, qtoks, items), train, ids, vals,
                    extra_budget, extra_rounds, top_k, ridge_rel,
                    completer=completer, valid_mask=valid_mask,
                )

        else:

            def fn(p, qtoks, items, train, ids, vals, valid_mask):
                return adaptive_continue(
                    make_score_fn(p, qtoks, items), train, ids, vals,
                    extra_budget, extra_rounds, top_k, ridge_rel,
                    valid_mask=valid_mask,
                )

        self._fused_cache[key] = jax.jit(fn)
        return self._fused_cache[key]

    def query_tokens_adaptive_fused(
        self,
        query_tokens: np.ndarray,  # (q, Lm)
        total_budget: int = 200,
        n_rounds: int = 3,
        top_k: int = 10,
        train_scores: Optional[np.ndarray] = None,
        seed: int = 0,
        ridge_rel: float = 1e-6,
        method: str = "cur",
        axn_rank: Optional[int] = None,
        axn_lam_rel: float = 1e-2,
        escalate_budget: Optional[int] = None,
        escalate_rounds: int = 3,
        stability_overlap: float = 1.0,
        return_stats: bool = False,
        shortlist: Optional[int] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Adaptive multi-round retrieval as ONE fused jit program per
        batch — the production adaptive serving mode. Spends exactly
        ``total_budget`` CE calls per query (candidates are gathered per
        query inside the program; the host version scored a cross-query
        union and dropped the waste). At matched recall this multiplies
        effective q/s over the fixed-anchor path by
        (fixed cost / matched budget) — see
        core/adaptive_fused.py::matched_recall_budget and bench.py line 3.

        ``method='axn'`` completes through rank-``axn_rank`` factorized
        item embeddings (SVD of the train matrix, core/axn.py; fitted
        once and cached) instead of the train-space ridge: cheaper
        rounds (r x r solves) and the rank is independent of the budget.

        ``ridge_rel`` plays the pinv-rcond role of the fixed path: raise
        it toward ~1e-3 for matrices whose ranking signal sits near the
        device matmul noise floor (see CurRetriever.build docstring).

        Rounds wider than 64 candidates are TILED inside the fused
        program (adaptive_fused.ROUND_WIDTH_CAP): width-100 composite
        programs crashed the axon worker 3/3 while every isolated
        stage ran fine (benchmarks/wide_round_probe.json), so wide
        picks are split into sub-picks sharing one completion —
        bit-identical results, and the previously-crashing budget-300
        3-round config now runs on chip. Note at equal budget more
        rounds give equal-or-better recall anyway
        (benchmarks/adaptive_matched_recall.json).

        ``escalate_budget`` (> total_budget) turns on PER-QUERY EARLY
        STOPPING (VERDICT r3 item 1b): after the base rounds, queries
        whose top-k id set was still changing in the last round resume
        from their scored state and spend the difference in extra CE
        calls (``escalate_rounds`` more rounds). Escalated rows are
        compacted and padded to a power-of-two bucket so the phase-2
        program compiles O(log q) shape variants at most. Average cost
        per query = total_budget + frac_escalated_padded * extra —
        matched recall becomes a property of the ENGINE (easy queries
        stop early) instead of a global calibration constant.
        ``return_stats`` additionally returns {'avg_budget',
        'frac_escalated', 'stable_frac'}."""
        from anncur_tpu.core.adaptive_fused import split_rounds

        query_tokens = np.asarray(query_tokens, np.int32)
        q, lm = query_tokens.shape
        n_items = self.item_tokens.shape[0]
        total_budget = min(total_budget, n_items)
        first, per, n_rounds = split_rounds(total_budget, n_rounds)
        # pad queries so every round's scan chunks evenly at the widest
        # stage (round 0: `first` candidates per query). Balanced
        # chunking: round the PER-CHUNK size down to ceil(q/n_chunks)
        # instead of padding q up to a chunk0 multiple — the latter
        # padded q=128 to 180 rows (40% wasted CE compute) when chunk0
        # landed just under q (measured: the budget-200 3-round config
        # dipped to 7.6 q/s at q=64 from exactly this).
        # multi-chip: queries are sharded over the mesh data axis, so all
        # chunking is computed on the PER-DEVICE shard (ceil(q/n_dev));
        # the program itself is built on per-device shapes and
        # shard_mapped (see _get_fused_adaptive_fn)
        n_dev = self._mesh_size()
        q_loc = -(-q // n_dev)
        chunk0 = max(1, min(self._stage_batch(max(first, per)), q_loc))
        n_chunks = -(-q_loc // chunk0)
        chunk0 = -(-q_loc // n_chunks)
        q_pad_loc = chunk0 * n_chunks
        q_pad = q_pad_loc * n_dev
        qtoks = np.zeros((q_pad, lm), np.int32)
        qtoks[:q] = query_tokens
        if train_scores is not None and train_scores.shape[1] != n_items:
            # candidate ids come from train columns; a mismatched train
            # matrix would make the CE stage gather CLAMPED (wrong)
            # item tokens with no error on TPU
            raise ValueError(
                f"train_scores has {train_scores.shape[1]} item columns but "
                f"the corpus has {n_items} items — pass a train matrix over "
                "the SAME item set"
            )
        if train_scores is not None:
            # pad the caller's train matrix to the fused programs' padded
            # item axis (zero columns, never retrievable via valid_mask).
            # Stay ON DEVICE: a host round trip here (np.asarray + re-
            # upload) costs ~40 MB through the tunnel PER CALL for a
            # device-resident 500 x 10k matrix — measured +0.5 s on every
            # b=1 adaptive query (636 ms vs 124 ms) before this was
            # device-side. jnp.pad on a committed array is one tiny
            # cached device program.
            train = jnp.asarray(train_scores, jnp.float32)
            pad = self._padded_n_items() - train.shape[1]
            if pad:
                train = jnp.pad(train, ((0, 0), (0, pad)))
        else:
            train = self._train_matrix()
        rng = np.random.default_rng(seed)
        anchors0 = jnp.asarray(
            sorted(rng.choice(n_items, size=first, replace=False)), jnp.int32
        )
        items, _, _, valid_mask = self._device_consts()
        extra = 0
        if escalate_budget is not None:
            extra = max(0, min(escalate_budget, n_items) - total_budget)
        with_state = extra > 0
        if shortlist:
            # large-corpus mitigation (VERDICT r4 item 4): rounds 2+
            # complete/pick against a frozen batch-shared top-L pool
            # instead of all n_items. Correctness needs every scored id
            # to be a pool member (else the in-pool exclusion can score
            # an item twice): at pool build that is the shared round-0
            # anchors plus this batch's per-query round-1 picks, and the
            # pool also needs genuine headroom for the remaining picks —
            # silently disable when L can't satisfy both (small corpora,
            # big batches; those regimes don't need the mitigation).
            first, per, _nr = split_rounds(total_budget, n_rounds)
            # pool membership is per-device (the program is shard_mapped
            # over the data axis), so the guard uses the PER-DEVICE q
            need = first + q_pad_loc * per + per * max(1, _nr - 2)
            if shortlist < need or shortlist >= n_items:
                shortlist = None
        fn = self._get_fused_adaptive_fn(
            q_pad_loc, lm, total_budget, n_rounds, top_k, ridge_rel, method,
            axn_lam_rel, with_state=with_state,
            stability_overlap=stability_overlap, shortlist=shortlist,
        )
        es_args = ()
        if method == "axn":
            if train_scores is not None:
                # explicit train matrices are cached by CONTENT — a
                # same-shaped but different matrix must not reuse a
                # stale fit (the internal matrix is shape-keyed because
                # _invalidate clears the cache on corpus edits)
                from anncur_tpu.core.axn import fit_item_embeddings_cached

                # fit on the PADDED matrix so the completion's item axis
                # matches the fused programs (padded items embed to zero
                # and are masked out); rank defaults to the UNPADDED
                # content rank — zero columns add no spectral energy.
                # Pad on HOST from the caller's array (free for numpy
                # callers; device callers pay one unpadded D2H for the
                # content hash — never fetch the padded device matrix,
                # that is the DESIGN §27 regression again)
                tr_host = np.asarray(train_scores, np.float32)
                pad_h = self._padded_n_items() - tr_host.shape[1]
                if pad_h:
                    tr_host = np.pad(tr_host, ((0, 0), (0, pad_h)))
                idx = fit_item_embeddings_cached(
                    tr_host, axn_rank or min(train_scores.shape)
                )
            else:
                idx = self._axn_index(train, axn_rank)
            es_args = (idx.item_embeds, idx.mean)
        out = fn(
            self.params, jnp.asarray(qtoks), items, train, anchors0, valid_mask,
            *es_args,
        )
        stats = {
            "avg_budget": float(total_budget),
            "frac_escalated": 0.0,
            "stable_frac": 1.0,
        }
        if not with_state:
            s, i = out[0], out[1]
        else:
            from anncur_tpu.core.adaptive_fused import _bucket_size

            s, i, st_ids, st_vals, stable = out
            # only REAL rows escalate: padded query rows carry zero
            # tokens and would otherwise inflate the escalation bucket
            stable_h = np.asarray(stable)[:q]
            unstable = np.flatnonzero(~stable_h)
            stats["stable_frac"] = float(stable_h.mean())
            out_s = np.array(np.asarray(s)[:q])
            out_i = np.array(np.asarray(i)[:q])
            if unstable.size:
                b_pad = _bucket_size(int(unstable.size), q_pad)
                sel = np.concatenate(
                    [unstable, np.full(b_pad - unstable.size, unstable[0])]
                )
                sel_d = jnp.asarray(sel, jnp.int32)
                fn2 = self._get_fused_continue_fn(
                    b_pad, lm, int(st_ids.shape[1]), extra, escalate_rounds,
                    top_k, ridge_rel, method, axn_lam_rel,
                )
                s2, i2, _, _, _ = fn2(
                    self.params,
                    jnp.take(jnp.asarray(qtoks), sel_d, axis=0),
                    items, train,
                    jnp.take(st_ids, sel_d, axis=0),
                    jnp.take(st_vals, sel_d, axis=0),
                    valid_mask, *es_args,
                )
                out_s[unstable] = np.asarray(s2)[: unstable.size]
                out_i[unstable] = np.asarray(i2)[: unstable.size]
                # serving-honest accounting: padded escalation rows pay
                # real CE calls, so they count
                stats["avg_budget"] = total_budget + extra * b_pad / q
                stats["frac_escalated"] = unstable.size / q
            s, i = out_s, out_i
        scores_out = np.asarray(s)[:q]
        ids_out = self.item_ids[np.asarray(i)[:q]]
        if return_stats:
            return scores_out, ids_out, stats
        return scores_out, ids_out

    def _axn_index(self, train: jnp.ndarray, rank: Optional[int]):
        """Fit (and cache) the AXN factorized item embeddings from the
        retriever's OWN train matrix. Cache is keyed by (rank, shape)
        and cleared on corpus edits (_invalidate) — valid only because
        the internal matrix can't change otherwise; caller-provided
        train_scores go through the content-keyed
        axn.fit_item_embeddings_cached instead."""
        from anncur_tpu.core.axn import fit_item_embeddings

        rank = rank or min(train.shape)
        key = (rank, tuple(train.shape))
        if key not in self._axn_cache:
            self._axn_cache[key] = fit_item_embeddings(np.asarray(train), rank)
        return self._axn_cache[key]

    @property
    def cost_per_query(self) -> int:
        """CE calls per query at default retrieval depth."""
        return len(self.anchor_item_ids)

    def throughput(self, query_tokens: np.ndarray, top_k=10, top_k_retvr=100, iters=3) -> float:
        """queries/sec including rerank (bench helper)."""
        self.query_tokens_batch(query_tokens, top_k, top_k_retvr)  # warmup
        t0 = time.time()
        for _ in range(iters):
            self.query_tokens_batch(query_tokens, top_k, top_k_retvr)
        return iters * query_tokens.shape[0] / (time.time() - t0)
