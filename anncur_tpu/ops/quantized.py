"""Int8-quantized MIPS for large item corpora.

Halves (vs bf16) or quarters (vs f32) the HBM traffic of the retrieval
scan — the bandwidth-bound part of dense search at 100k+ items — by
storing item embeddings as int8 with per-item scales. Queries stay
full precision; items are dequantized to f32 at contraction time (the
v5e int8 MXU path measured only ~1.16x through XLA once the dequant
epilogue is included — CLAUDE.md "int8 CLOSED" — so the win here is
pure HBM bandwidth, 4x less item traffic, not MXU throughput). ~0.4%
score error before exact reranking (retrieve-then-rerank makes it
essentially free: rerank restores exact order).

No reference equivalent (FAISS IVF was its speed lever); this is the
TPU-native lever for the same knob.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("values", "scales"),
    meta_fields=(),
)
@dataclasses.dataclass(frozen=True)
class QuantizedItems:
    values: jax.Array  # (n, d) int8
    scales: jax.Array  # (n, 1) f32: row_abs_max / 127

    @property
    def shape(self):
        return self.values.shape


def quantize_items(items: jax.Array) -> QuantizedItems:
    """Per-item symmetric int8 quantization."""
    items = jnp.asarray(items, jnp.float32)
    abs_max = jnp.max(jnp.abs(items), axis=1, keepdims=True)
    scale = jnp.where(abs_max == 0, 1.0, abs_max / 127.0)
    q = jnp.clip(jnp.round(items / scale), -127, 127).astype(jnp.int8)
    return QuantizedItems(values=q, scales=scale)


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def mips_topk_int8(
    queries: jax.Array,  # (q, d) f32/bf16
    items: QuantizedItems,
    k: int,
    chunk: int = 8192,
) -> Tuple[jax.Array, jax.Array]:
    """Streaming exact-int8 MIPS: top-k over dequantized scores."""
    queries = jnp.asarray(queries, jnp.float32)
    n, d = items.values.shape
    chunk = min(chunk, n)
    n_pad = n + ((-n) % chunk)
    vals = items.values
    scl = items.scales
    if n_pad != n:
        vals = jnp.concatenate([vals, jnp.zeros((n_pad - n, d), jnp.int8)], axis=0)
        scl = jnp.concatenate([scl, jnp.ones((n_pad - n, 1), jnp.float32)], axis=0)
    n_chunks = n_pad // chunk
    vals = vals.reshape(n_chunks, chunk, d)
    scl = scl.reshape(n_chunks, chunk)

    neg_inf = jnp.float32(-3.0e38)
    init = (jnp.full((queries.shape[0], k), neg_inf), jnp.zeros((queries.shape[0], k), jnp.int32))

    def body(carry, inp):
        run_s, run_i = carry
        tile, tile_scl, c = inp
        # int8 values dequantized to f32 then contracted at TRUE f32:
        # without precision='highest' the TPU-default matmul rounds both
        # operands to bf16 — the very query-side error keeping queries
        # f32 is meant to avoid (score-path rule, CLAUDE.md).
        scores = jnp.dot(
            queries, tile.T.astype(jnp.float32),
            preferred_element_type=jnp.float32, precision="highest",
        )
        scores = scores * tile_scl[None, :]
        col = c * chunk + lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col < n, scores, neg_inf)
        comb_s = jnp.concatenate([run_s, scores], axis=1)
        comb_i = jnp.concatenate([run_i, col], axis=1)
        new_s, pos = lax.top_k(comb_s, k)
        return (new_s, jnp.take_along_axis(comb_i, pos, axis=1)), None

    (scores, idx), _ = lax.scan(body, init, (vals, scl, jnp.arange(n_chunks)))
    return scores, idx
