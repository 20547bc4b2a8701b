"""Pooling strategies over BERT sequence output.

Parity with the reference pooling modes (models/biencoder.py:108-124):
cls_w_lin / cls / mean / max / lse, plus the special-token pooling used
by the 'w_embeds' cross-encoder (models/crossencoder.py:84-124). The
reference's mean/max/lse pool over ALL positions including padding; we
replicate that (scores are what they are trained to be), vectorized.

Special-token positions are found with argmax-of-equality instead of the
reference's per-row ``nonzero`` python loop — fully batched, jit-safe.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from anncur_tpu.models.special_tokens import ENT_END_ID, ENT_START_ID, ENT_TITLE_ID


def pool_sequence(
    seq_out: jax.Array,  # (b, s, h)
    pooled_out: jax.Array,  # (b, h) tanh-linear of CLS (BERT pooler)
    pooling_type: str,
) -> jax.Array:
    if pooling_type == "cls_w_lin":
        return pooled_out
    if pooling_type == "cls":
        return seq_out[:, 0, :]
    if pooling_type == "mean":
        return jnp.mean(seq_out, axis=1)
    if pooling_type == "max":
        return jnp.max(seq_out, axis=1)
    if pooling_type == "lse":
        return jax.nn.logsumexp(seq_out, axis=1)
    raise NotImplementedError(f"pooling_type={pooling_type!r} not supported")


def _first_position(token_ids: jax.Array, tag_id: int) -> jax.Array:
    """Index of the first occurrence of tag_id per row.

    A row WITHOUT the tag resolves to position 0 (CLS): argmax of an
    all-zero mask. That substitutes the CLS embedding silently — a
    data-dependent raise is impossible under jit, and the tokenization
    builders always emit the tags within budget
    (get_context_representation / get_candidate_representation), so an
    absent tag means corrupt input; callers that cannot guarantee tags
    should validate host-side first."""
    return jnp.argmax((token_ids == tag_id).astype(jnp.int32), axis=1)


def gather_token_embedding(seq_out: jax.Array, positions: jax.Array) -> jax.Array:
    """seq_out[i, positions[i], :] for each row i."""
    return jnp.take_along_axis(seq_out, positions[:, None, None], axis=1)[:, 0, :]


def special_token_embeds(
    seq_out: jax.Array,  # (b, s, h)
    token_ids: jax.Array,  # (b, s)
    start_id: int = ENT_START_ID,
    end_id: int = ENT_END_ID,
    title_id: int = ENT_TITLE_ID,
) -> Tuple[jax.Array, jax.Array]:
    """(mention_embed, entity_embed) per the w_embeds cross-encoder:
    mention = mean of [unused0]/[unused1] positions, entity = [unused2]
    position (reference: models/crossencoder.py:100-124)."""
    start = gather_token_embedding(seq_out, _first_position(token_ids, start_id))
    end = gather_token_embedding(seq_out, _first_position(token_ids, end_id))
    title = gather_token_embedding(seq_out, _first_position(token_ids, title_id))
    return (start + end) / 2.0, title


def mention_embed(seq_out, token_ids, start_id=ENT_START_ID, end_id=ENT_END_ID):
    start = gather_token_embedding(seq_out, _first_position(token_ids, start_id))
    end = gather_token_embedding(seq_out, _first_position(token_ids, end_id))
    return (start + end) / 2.0


def entity_embed(seq_out, token_ids, title_id=ENT_TITLE_ID):
    return gather_token_embedding(seq_out, _first_position(token_ids, title_id))
