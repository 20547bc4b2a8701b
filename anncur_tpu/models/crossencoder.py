"""Cross-encoder: joint (mention ⧺ entity) sequence -> scalar score.

Two heads, parity with the reference (models/crossencoder.py):
- 'default':  pooled representation -> dropout -> Linear(h, 1)
  (CrossBertWrapper, crossencoder.py:194-215),
- 'w_embeds': contextualized embeddings at [unused0/1] (mention, averaged)
  and [unused2] (entity title); score = dot product
  (CrossBertWEmbedsWrapper, crossencoder.py:51-191). This variant doubles
  as an embedding generator for the fixed-anchor-entity baselines.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from anncur_tpu.models.bert import BertSpec, bert_encode, init_bert_params
from anncur_tpu.models.pooling import pool_sequence
from anncur_tpu.models.special_tokens import NULL_IDX


def to_cross_bert_input(
    token_ids: jax.Array, first_segment_end: int, null_idx: int = NULL_IDX
):
    """(token_ids, segment_ids, mask) for a concatenated pair sequence:
    segment 1 starts at ``first_segment_end`` and is flagged only where
    tokens are non-null (reference: models/crossencoder.py:29-48)."""
    mask = token_ids != null_idx
    if first_segment_end > 0:
        pos = jax.lax.broadcasted_iota(jnp.int32, token_ids.shape, 1)
        # same null test as the mask: `> 0` would disagree with a
        # nonzero null_idx (a legitimate id-0 token in segment 1 got
        # segment 0 while being attended) — to_bert_input is consistent
        segment_ids = jnp.where(
            (pos >= first_segment_end) & mask, 1, 0
        ).astype(token_ids.dtype)
    else:
        segment_ids = jnp.zeros_like(token_ids)
    token_ids = token_ids * mask.astype(token_ids.dtype)
    return token_ids, segment_ids, mask


@dataclasses.dataclass(frozen=True)
class CrossEncoder:
    """Static config; params are an explicit pytree."""

    spec: BertSpec = dataclasses.field(default_factory=BertSpec)
    cross_enc_type: str = "default"  # default | w_embeds
    pooling_type: str = "cls_w_lin"
    compute_dtype: Any = jnp.bfloat16
    # rematerialize during backprop: True = full per-layer remat
    # (memory for FLOPs; measured LOSS at CE bench shapes), 'attn' =
    # selective remat of only the O(seq^2) attention tensors (recompute
    # beats the HBM-bound backward streaming; see models/bert.py)
    remat: Any = False

    def init(self, key: jax.Array) -> Dict[str, Any]:
        k_bert, k_lin = jax.random.split(key)
        params: Dict[str, Any] = {"bert": init_bert_params(k_bert, self.spec)}
        if self.cross_enc_type == "default":
            h = self.spec.hidden_size
            params["score_linear"] = {
                "kernel": jax.random.normal(k_lin, (h, 1), jnp.float32)
                * self.spec.initializer_range,
                "bias": jnp.zeros((1,), jnp.float32),
            }
        elif self.cross_enc_type != "w_embeds":
            raise ValueError(f"cross_enc_type={self.cross_enc_type!r}")
        return params

    # ------------------------------------------------------------------ #

    def _bert(
        self, params, token_ids, first_segment_end, train=False, rng=None,
        cls_only=False, out_positions=None,
    ):
        token_ids, segment_ids, mask = to_cross_bert_input(token_ids, first_segment_end)
        return bert_encode(
            params["bert"],
            token_ids,
            segment_ids,
            mask,
            self.spec,
            compute_dtype=self.compute_dtype,
            dropout_rng=rng,
            dropout=train,
            remat=self.remat,
            cls_only=cls_only,
            out_positions=out_positions,
        ), token_ids

    @staticmethod
    def _tag_positions(token_ids: jax.Array) -> jax.Array:
        """(b, 3) first positions of [unused0], [unused1], [unused2] —
        the only positions the w_embeds head consumes."""
        from anncur_tpu.models.pooling import _first_position
        from anncur_tpu.models.special_tokens import (
            ENT_END_ID,
            ENT_START_ID,
            ENT_TITLE_ID,
        )

        return jnp.stack(
            [
                _first_position(token_ids, ENT_START_ID),
                _first_position(token_ids, ENT_END_ID),
                _first_position(token_ids, ENT_TITLE_ID),
            ],
            axis=1,
        )

    def score(
        self,
        params,
        pair_token_ids: jax.Array,  # (b, 2L) concatenated mention⧺entity
        first_segment_end: int,
        train: bool = False,
        rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Scalar score per pair, shape (b,)
        (reference: score_candidate -> forward, crossencoder.py:450-468)."""
        # CLS-consuming head: final encoder layer runs for the CLS
        # position only (exact; ~6% faster at seq 256 — applies to the
        # backward pass too, since non-CLS last-layer outputs never
        # reach the loss)
        cls_only = self.cross_enc_type == "default" and self.pooling_type in (
            "cls",
            "cls_w_lin",
        )
        if self.cross_enc_type == "default":
            (seq_out, pooled), tok = self._bert(
                params, pair_token_ids, first_segment_end, train, rng, cls_only=cls_only
            )
            emb = pool_sequence(seq_out, pooled, self.pooling_type)
            if train and rng is not None:
                keep = jax.random.bernoulli(jax.random.fold_in(rng, 11), 0.9, emb.shape)
                emb = jnp.where(keep, emb / 0.9, 0.0)
            lin = params["score_linear"]
            return (
                jnp.dot(emb, lin["kernel"], preferred_element_type=jnp.float32)
                + lin["bias"]
            )[:, 0]
        # w_embeds: dot of mention and entity special-token embeddings;
        # the final layer runs only at the three tag positions (exact)
        pos = self._tag_positions(pair_token_ids)
        (seq_out, _), _ = self._bert(
            params, pair_token_ids, first_segment_end, train, rng, out_positions=pos
        )
        m_emb = (seq_out[:, 0, :] + seq_out[:, 1, :]) / 2.0
        e_emb = seq_out[:, 2, :]
        return jnp.sum(m_emb * e_emb, axis=-1)

    def embed_paired(
        self,
        params,
        pair_token_ids: jax.Array,
        first_segment_end: int,
    ) -> Tuple[jax.Array, jax.Array]:
        """(mention_embed, entity_embed) from one joint forward
        (reference: embed_paired_input_and_labels, crossencoder.py:471-484)."""
        if self.cross_enc_type != "w_embeds":
            raise ValueError("embed_paired requires cross_enc_type='w_embeds'")
        pos = self._tag_positions(pair_token_ids)
        (seq_out, _), _ = self._bert(
            params, pair_token_ids, first_segment_end, out_positions=pos
        )
        return (seq_out[:, 0, :] + seq_out[:, 1, :]) / 2.0, seq_out[:, 2, :]

    def embed_input(self, params, token_ids: jax.Array) -> jax.Array:
        """Mention-only embedding (reference: forward_for_input_embeds,
        crossencoder.py:127-158 / BertWrapper fallback)."""
        if self.cross_enc_type == "w_embeds":
            from anncur_tpu.models.pooling import _first_position
            from anncur_tpu.models.special_tokens import ENT_END_ID, ENT_START_ID

            pos = jnp.stack(
                [_first_position(token_ids, ENT_START_ID),
                 _first_position(token_ids, ENT_END_ID)],
                axis=1,
            )
            (seq_out, _), _ = self._bert(params, token_ids, 0, out_positions=pos)
            return (seq_out[:, 0, :] + seq_out[:, 1, :]) / 2.0
        cls_only = self.pooling_type in ("cls", "cls_w_lin")
        (seq_out, pooled), tok = self._bert(params, token_ids, 0, cls_only=cls_only)
        return pool_sequence(seq_out, pooled, self.pooling_type)

    def embed_label(self, params, token_ids: jax.Array) -> jax.Array:
        """Entity-only embedding (reference: forward_for_label_embeds,
        crossencoder.py:161-191)."""
        if self.cross_enc_type == "w_embeds":
            from anncur_tpu.models.pooling import _first_position
            from anncur_tpu.models.special_tokens import ENT_TITLE_ID

            pos = _first_position(token_ids, ENT_TITLE_ID)[:, None]
            (seq_out, _), _ = self._bert(params, token_ids, 0, out_positions=pos)
            return seq_out[:, 0, :]
        cls_only = self.pooling_type in ("cls", "cls_w_lin")
        (seq_out, pooled), tok = self._bert(params, token_ids, 0, cls_only=cls_only)
        return pool_sequence(seq_out, pooled, self.pooling_type)
