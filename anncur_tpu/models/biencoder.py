"""Bi-encoder: separate or shared query/item BERT towers.

Capability parity with the reference BiEncoderModule/BiEncoderWrapper
(models/biencoder.py:149-280, 283-740) redesigned functionally: the
encoder object holds only static architecture config; parameters are an
explicit pytree threaded through pure methods, so the same code path
jit-compiles for inference and differentiates for training.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from anncur_tpu.models.bert import BertSpec, bert_encode, init_bert_params
from anncur_tpu.models.pooling import pool_sequence
from anncur_tpu.models.special_tokens import NULL_IDX


def to_bert_input(token_ids: jax.Array, null_idx: int = NULL_IDX):
    """(token_ids, segment_ids, mask) for single-segment input
    (reference: models/biencoder.py:26-39)."""
    mask = token_ids != null_idx
    segment_ids = jnp.zeros_like(token_ids)
    token_ids = token_ids * mask.astype(token_ids.dtype)
    return token_ids, segment_ids, mask


@dataclasses.dataclass(frozen=True)
class BiEncoder:
    """Static config; params live in an explicit pytree.

    bi_enc_type: 'separate' (two towers) | 'shared' (one tower)
    pooling_type: cls_w_lin | cls | mean | max | lse | spl_tkns
    add_linear_layer: extra Linear(hidden -> embed_dim) after pooling
    (reference: models/biencoder.py:153-214).
    """

    spec: BertSpec = dataclasses.field(default_factory=BertSpec)
    pooling_type: str = "cls_w_lin"
    bi_enc_type: str = "separate"
    embed_dim: int = 768
    add_linear_layer: bool = False
    compute_dtype: Any = jnp.bfloat16
    # rematerialize during backprop: True = full per-layer remat
    # (memory for FLOPs; measured LOSS at CE bench shapes), 'attn' =
    # selective remat of only the O(seq^2) attention tensors (recompute
    # beats the HBM-bound backward streaming; see models/bert.py)
    remat: Any = False

    def __post_init__(self):
        if not self.add_linear_layer and self.embed_dim != self.spec.hidden_size:
            raise ValueError(
                "embed_dim must equal hidden_size unless add_linear_layer=True "
                f"({self.embed_dim} != {self.spec.hidden_size})"
            )

    # ---------------- params ----------------------------------------- #

    def init(self, key: jax.Array) -> Dict[str, Any]:
        k_in, k_lb, k_lin1, k_lin2 = jax.random.split(key, 4)
        params: Dict[str, Any] = {}
        if self.bi_enc_type == "separate":
            params["input_bert"] = init_bert_params(k_in, self.spec)
            params["label_bert"] = init_bert_params(k_lb, self.spec)
        elif self.bi_enc_type == "shared":
            params["bert"] = init_bert_params(k_in, self.spec)
        else:
            raise ValueError(f"bi_enc_type={self.bi_enc_type!r}")
        if self.add_linear_layer:
            h = self.spec.hidden_size
            std = self.spec.initializer_range
            if self.bi_enc_type == "shared":
                # ONE projection head, like the shared tower itself: the
                # reference's shared encoder has a single
                # additional_linear (models/biencoder.py:72-87); two
                # pytree leaves would get separate gradients and diverge
                # from its semantics after the first optimizer step
                params["linear"] = {
                    "kernel": jax.random.normal(k_lin1, (h, self.embed_dim), jnp.float32) * std,
                    "bias": jnp.zeros((self.embed_dim,), jnp.float32),
                }
            else:
                params["input_linear"] = {
                    "kernel": jax.random.normal(k_lin1, (h, self.embed_dim), jnp.float32) * std,
                    "bias": jnp.zeros((self.embed_dim,), jnp.float32),
                }
                params["label_linear"] = {
                    "kernel": jax.random.normal(k_lin2, (h, self.embed_dim), jnp.float32) * std,
                    "bias": jnp.zeros((self.embed_dim,), jnp.float32),
                }
        return params

    def _tower(self, params, which: str):
        if self.bi_enc_type == "shared":
            return params["bert"]
        return params["input_bert" if which == "input" else "label_bert"]

    # ---------------- encode ------------------------------------------ #

    def _encode(
        self,
        params,
        token_ids: jax.Array,
        which: str,
        train: bool = False,
        rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        token_ids, segment_ids, mask = to_bert_input(token_ids)
        # position-selective final layer: CLS-family pooling consumes only
        # CLS; spl_tkns consumes only the tag positions. Either way the
        # last layer runs just those rows (exact, fwd + bwd; see
        # bert._encoder_layer_select_only).
        cls_only = self.pooling_type in ("cls", "cls_w_lin")
        out_positions = None
        if self.pooling_type == "spl_tkns":
            from anncur_tpu.models.pooling import _first_position
            from anncur_tpu.models.special_tokens import (
                ENT_END_ID,
                ENT_START_ID,
                ENT_TITLE_ID,
            )

            if which == "input":
                out_positions = jnp.stack(
                    [_first_position(token_ids, ENT_START_ID),
                     _first_position(token_ids, ENT_END_ID)],
                    axis=1,
                )
            else:
                out_positions = _first_position(token_ids, ENT_TITLE_ID)[:, None]
        seq_out, pooled = bert_encode(
            self._tower(params, which),
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
        )
        if self.pooling_type == "spl_tkns":
            # special-token towers (reference: models/biencoder.py:165-173)
            if which == "input":
                emb = (seq_out[:, 0, :] + seq_out[:, 1, :]) / 2.0
            else:
                emb = seq_out[:, 0, :]
        else:
            emb = pool_sequence(seq_out, pooled, self.pooling_type)
        if self.add_linear_layer:
            if self.bi_enc_type == "shared":
                lin = params["linear"]
            else:
                lin = params["input_linear" if which == "input" else "label_linear"]
            if train and rng is not None:
                drop = jax.random.bernoulli(jax.random.fold_in(rng, 7), 0.9, emb.shape)
                emb = jnp.where(drop, emb / 0.9, 0.0)
            emb = jnp.dot(emb, lin["kernel"], preferred_element_type=jnp.float32) + lin["bias"]
        return emb

    def encode_input(self, params, token_ids, train=False, rng=None) -> jax.Array:
        """Embed queries/mentions. (reference: encode_input, biencoder.py:412-421)"""
        return self._encode(params, token_ids, "input", train, rng)

    def encode_label(self, params, token_ids, train=False, rng=None) -> jax.Array:
        """Embed items/entities."""
        return self._encode(params, token_ids, "label", train, rng)

    # ---------------- scoring ----------------------------------------- #

    @staticmethod
    def score_labels(input_embeds: jax.Array, label_embeds: jax.Array) -> jax.Array:
        """All-pairs inner-product scores (q, n)
        (reference: score_labels, models/biencoder.py:436-463)."""
        return jnp.dot(
            input_embeds,
            label_embeds.T,
            preferred_element_type=jnp.float32,
            precision="highest",
        )

    @staticmethod
    def score_paired(input_embeds: jax.Array, label_embeds: jax.Array) -> jax.Array:
        """Row-wise scores for aligned (q_i, item_i) pairs."""
        return jnp.sum(input_embeds * label_embeds, axis=-1)
