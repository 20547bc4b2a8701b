"""From-scratch JAX BERT encoder.

Replaces the reference's ``pytorch_transformers.BertModel`` dependency
(models/biencoder.py:10-11, models/crossencoder.py:10-11) with a pure
pytree-parameter implementation designed for TPU:

- static shapes, bf16 compute dtype with f32 params and f32 layernorm,
- attention as einsum contractions that map straight onto the MXU,
- no Python control flow in the forward -> single XLA fusion region,
- optional ``jax.checkpoint`` over layers for training memory,
- weights importable from HF ``bert-base-uncased`` checkpoints
  (models/hf_loader.py).

Output contract matches the reference wrapper's expectation of
``(sequence_output, pooled_output)`` (models/biencoder.py:100-106).
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BertParams = Dict[str, Any]  # nested dict pytree


@dataclasses.dataclass(frozen=True)
class BertSpec:
    """Architecture hyperparameters (bert-base-uncased defaults)."""

    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    initializer_range: float = 0.02
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    # 'xla' (einsum softmax, any backend) or 'flash' (Pallas fused
    # flash-attention kernel, TPU only, inference / no-attn-dropout):
    # flash never materializes the (b, h, s, s) probs in HBM.
    attention_impl: str = "xla"
    # gelu flavor: True = tanh approximation (~20% faster CE forward on
    # v5e), False = exact erf (BERT/HF definition), None = auto (tanh
    # under bfloat16 compute, erf otherwise). Auto is justified by
    # measurement: under bf16 the tanh approximation's pointwise error
    # (<=1e-3 relative) is below bf16's own resolution — end-to-end
    # bert-base CE scores deviate from an f32-erf reference by
    # max 0.0081 (tanh) vs 0.0077 (erf), i.e. the approximation adds
    # nothing beyond the bf16 noise floor already accepted.
    gelu_approximate: Optional[bool] = None

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @classmethod
    def tiny(cls, **kw) -> "BertSpec":
        """Small spec for tests (fast CPU compile)."""
        defaults = dict(
            vocab_size=512,
            hidden_size=64,
            num_layers=2,
            num_heads=4,
            intermediate_size=128,
            max_position_embeddings=128,
        )
        defaults.update(kw)
        return cls(**defaults)


# --------------------------------------------------------------------- #
# init
# --------------------------------------------------------------------- #


def _dense_init(key, shape, stddev):
    return jax.random.normal(key, shape, jnp.float32) * stddev


def init_bert_params(key: jax.Array, spec: BertSpec) -> BertParams:
    keys = iter(jax.random.split(key, 16 + 16 * spec.num_layers))
    std = spec.initializer_range
    h, i = spec.hidden_size, spec.intermediate_size

    params: BertParams = {
        "embeddings": {
            "word": _dense_init(next(keys), (spec.vocab_size, h), std),
            "position": _dense_init(next(keys), (spec.max_position_embeddings, h), std),
            "token_type": _dense_init(next(keys), (spec.type_vocab_size, h), std),
            "ln_scale": jnp.ones((h,), jnp.float32),
            "ln_bias": jnp.zeros((h,), jnp.float32),
        },
        "layers": [],
        "pooler": {
            "kernel": _dense_init(next(keys), (h, h), std),
            "bias": jnp.zeros((h,), jnp.float32),
        },
    }
    for _ in range(spec.num_layers):
        layer = {
            "attn": {
                "q_kernel": _dense_init(next(keys), (h, h), std),
                "q_bias": jnp.zeros((h,), jnp.float32),
                "k_kernel": _dense_init(next(keys), (h, h), std),
                "k_bias": jnp.zeros((h,), jnp.float32),
                "v_kernel": _dense_init(next(keys), (h, h), std),
                "v_bias": jnp.zeros((h,), jnp.float32),
                "out_kernel": _dense_init(next(keys), (h, h), std),
                "out_bias": jnp.zeros((h,), jnp.float32),
                "ln_scale": jnp.ones((h,), jnp.float32),
                "ln_bias": jnp.zeros((h,), jnp.float32),
            },
            "mlp": {
                "in_kernel": _dense_init(next(keys), (h, i), std),
                "in_bias": jnp.zeros((i,), jnp.float32),
                "out_kernel": _dense_init(next(keys), (i, h), std),
                "out_bias": jnp.zeros((h,), jnp.float32),
                "ln_scale": jnp.ones((h,), jnp.float32),
                "ln_bias": jnp.zeros((h,), jnp.float32),
            },
        }
        params["layers"].append(layer)
    return params


# --------------------------------------------------------------------- #
# forward
# --------------------------------------------------------------------- #


def _layer_norm(x, scale, bias, eps):
    # layernorm in f32 regardless of compute dtype (TPU numerics rule)
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


def _dense(x, kernel, bias, dtype):
    return jnp.dot(x, kernel.astype(dtype), preferred_element_type=dtype) + bias.astype(dtype)


def _gelu(x, approximate=None):
    # BERT defines the erf ("exact") gelu; None = auto: tanh under bf16
    # (error below bf16 resolution, measured — see BertSpec), erf else.
    if approximate is None:
        approximate = x.dtype == jnp.bfloat16
    return jax.nn.gelu(x, approximate=approximate)


# Attention einsum spelling. Probe knob (tools/probe_attn_layouts.py):
# the hlo_stats trace shows ~34 layout copies ({2,1,0}->{1,2,0} on the
# QKV projection outputs, 2.46 ms each = 13.6% of the build step) from
# XLA's layout assignment around the batched score/context dots;
# alternative spellings steer that assignment. Measured (v5e, b=2048
# s=256 bf16, 10 reps): 'bqnk' (scores laid out (b, s, nh, s), softmax
# still over the key axis) 3142 pairs/s vs 'bnqk' 3099 (+1.4%,
# bit-identical outputs — same dots, different XLA layout assignment);
# 'bnsd_proj' (project straight into (b, heads, s, d)) LOSES 20% — the
# 3-d weight einsum defeats the plain-matmul tiling. Default: bqnk.
_ATTN_SPELLING = "bqnk"


def _ss_tag(t):
    """Name an O(seq^2) attention intermediate (scores/probs/dropout
    mask). Informational only: useful for jax.ad_checkpoint debugging
    and user-supplied checkpoint policies. NOTE: name-based policies
    cannot implement selective remat here — with
    ``save_anything_except_these_names`` partial eval simply saves the
    un-named producer of the name eqn (same tensor, one op earlier), so
    remat='attn' instead checkpoints ``_attn_core`` structurally (its
    q/k/v INPUTS are saved; everything inside is recomputed)."""
    from jax.ad_checkpoint import checkpoint_name

    return checkpoint_name(t, "attn_ss")


def _dropout(x, rng, rate):
    """Inverted dropout; identity when rng is None or rate is 0. The
    O(seq^2) attention-prob sites keep their own _ss_tag'd copies."""
    if rng is None or not rate:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def _attn_core(q, k, v, mask_bias, dropout_rng, dtype, dropout_rate, spelling):
    """scores -> softmax -> dropout -> context, for the plain-matmul
    spellings. Kept as a standalone function so remat='attn' can
    jax.checkpoint exactly this region: the (b, s, nh, s) score/prob/
    mask tensors are then recomputed in backward from the saved q/k/v
    (cheap MXU work) instead of being stored across fwd->bwd."""

    def drop(probs):
        if dropout_rng is not None and dropout_rate > 0.0:
            keep = _ss_tag(
                jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
            )
            probs = _ss_tag(jnp.where(keep, probs / (1.0 - dropout_rate), 0.0))
        return probs

    hd = q.shape[-1]
    if spelling == "bqnk":
        scores = jnp.einsum("bqnd,bknd->bqnk", q, k, preferred_element_type=jnp.float32)
        scores = _ss_tag(scores / math.sqrt(hd) + mask_bias)  # (b, s, nh, s); (b,1,1,s) bcasts over q,n
        probs = drop(_ss_tag(jax.nn.softmax(scores, axis=-1).astype(dtype)))
        ctx = jnp.einsum("bqnk,bknd->bqnd", probs, v, preferred_element_type=dtype)
    else:
        scores = jnp.einsum("bqnd,bknd->bnqk", q, k, preferred_element_type=jnp.float32)
        scores = _ss_tag(scores / math.sqrt(hd) + mask_bias)  # (b, nh, s, s)
        probs = drop(_ss_tag(jax.nn.softmax(scores, axis=-1).astype(dtype)))
        ctx = jnp.einsum("bnqk,bknd->bqnd", probs, v, preferred_element_type=dtype)
    return ctx


_attn_core_remat = jax.checkpoint(_attn_core, static_argnums=(5, 6, 7))


def _attention(
    x, mask_bias, p, spec: BertSpec, dtype, dropout_rng, dropout_rate, attn_remat=False
):
    b, s, h = x.shape
    nh, hd = spec.num_heads, spec.head_dim
    spelling = _ATTN_SPELLING

    if spelling == "bnsd_proj":
        def drop(probs):
            # probe-only branch; the default spellings run dropout inside
            # _attn_core (single source of truth for the mask semantics)
            if dropout_rng is not None and dropout_rate > 0.0:
                keep = _ss_tag(
                    jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
                )
                probs = _ss_tag(jnp.where(keep, probs / (1.0 - dropout_rate), 0.0))
            return probs

        def proj(kern, bias):
            w = kern.astype(dtype).reshape(h, nh, hd)
            y = jnp.einsum("bsh,hnd->bnsd", x.astype(dtype), w)
            return y + bias.astype(dtype).reshape(1, nh, 1, hd)

        q, k, v = proj(p["q_kernel"], p["q_bias"]), proj(p["k_kernel"], p["k_bias"]), proj(p["v_kernel"], p["v_bias"])
        scores = jnp.einsum("bnqd,bnkd->bnqk", q, k, preferred_element_type=jnp.float32)
        scores = _ss_tag(scores / math.sqrt(hd) + mask_bias)  # (b, nh, s, s)
        probs = drop(_ss_tag(jax.nn.softmax(scores, axis=-1).astype(dtype)))
        ctx = jnp.einsum("bnqk,bnkd->bnqd", probs, v, preferred_element_type=dtype)
        wo = p["out_kernel"].astype(dtype).reshape(nh, hd, h)
        out = jnp.einsum("bnqd,ndh->bqh", ctx.astype(dtype), wo)
        return out + p["out_bias"].astype(dtype)

    q = _dense(x, p["q_kernel"], p["q_bias"], dtype).reshape(b, s, nh, hd)
    k = _dense(x, p["k_kernel"], p["k_bias"], dtype).reshape(b, s, nh, hd)
    v = _dense(x, p["v_kernel"], p["v_bias"], dtype).reshape(b, s, nh, hd)

    use_flash = (
        spec.attention_impl == "flash"
        and (dropout_rng is None or dropout_rate == 0.0)
    )
    if use_flash:
        ctx = _flash_attention(q, k, v, mask_bias, hd)
    else:
        core = _attn_core_remat if attn_remat else _attn_core
        ctx = core(q, k, v, mask_bias, dropout_rng, dtype, dropout_rate, spelling)
    ctx = ctx.astype(dtype).reshape(b, s, h)
    return _dense(ctx, p["out_kernel"], p["out_bias"], dtype)


def _flash_attention(q, k, v, mask_bias, hd):
    """Pallas fused flash attention (jax.experimental.pallas.ops.tpu);
    padding mask passed as segment ids (pad=0, real=1; cross-segment
    pairs are masked inside the kernel, probs never reach HBM)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds,
        flash_attention,
    )

    # mask_bias: (b, 1, 1, s) additive bias; recover the boolean mask
    valid = (mask_bias[:, 0, 0, :] >= 0.0).astype(jnp.int32) + 1  # pad=1, real=2
    seg = SegmentIds(q=valid, kv=valid)
    qh = jnp.swapaxes(q, 1, 2)  # (b, nh, s, hd)
    kh = jnp.swapaxes(k, 1, 2)
    vh = jnp.swapaxes(v, 1, 2)
    out = flash_attention(
        qh, kh, vh, segment_ids=seg, causal=False, sm_scale=1.0 / math.sqrt(hd)
    )
    return jnp.swapaxes(out, 1, 2)  # (b, s, nh, hd)


def _encoder_layer_select_only(
    x, mask_bias, layer_params, spec, dtype, positions=None, rngs=None, dropout_rate=0.0
):
    """Final encoder layer restricted to the consumed positions: when
    downstream pooling reads only CLS (the 'default' cross-encoder head,
    cls/cls_w_lin bi-encoder pooling) or only the [unused0/1/2] tag
    positions (the 'w_embeds' head, spl_tkns towers), the last layer's
    attention needs just those query rows and its MLP is position-wise —
    computing the other positions is pure waste (measured ~6% of the CE
    forward at seq 256). Exact, not an approximation; under training the
    dropout masks are simply the selected rows of the full-layer masks
    (same distribution, different rng stream).

    ``positions``: (b, g) int32 row indices to keep, or None for the
    static CLS slice. Returns (b, g, h) (g=1 for CLS)."""
    attn_rng, hid_rng1, hid_rng2 = rngs if rngs is not None else (None, None, None)
    p = layer_params["attn"]
    b, s, h = x.shape
    nh, hd = spec.num_heads, spec.head_dim
    if positions is None:
        x_sel = x[:, :1, :]
    else:
        x_sel = jnp.take_along_axis(x, positions[:, :, None], axis=1)  # (b, g, h)
    g = x_sel.shape[1]
    q = _dense(x_sel, p["q_kernel"], p["q_bias"], dtype).reshape(b, g, nh, hd)
    k = _dense(x, p["k_kernel"], p["k_bias"], dtype).reshape(b, s, nh, hd)
    v = _dense(x, p["v_kernel"], p["v_bias"], dtype).reshape(b, s, nh, hd)
    scores = jnp.einsum("bqnd,bknd->bnqk", q, k, preferred_element_type=jnp.float32)
    scores = scores / math.sqrt(hd) + mask_bias  # (b, nh, g, s)
    probs = jax.nn.softmax(scores, axis=-1).astype(dtype)
    probs = _dropout(probs, attn_rng, spec.attention_dropout)
    ctx = jnp.einsum("bnqk,bknd->bqnd", probs, v, preferred_element_type=dtype)
    a = _dense(ctx.astype(dtype).reshape(b, g, h), p["out_kernel"], p["out_bias"], dtype)
    a = _dropout(a, hid_rng1, dropout_rate)
    x0 = _layer_norm(x_sel + a, p["ln_scale"], p["ln_bias"], spec.layer_norm_eps)
    mp = layer_params["mlp"]
    m = _dense(x0, mp["in_kernel"], mp["in_bias"], dtype)
    m = _gelu(m, spec.gelu_approximate)
    m = _dense(m, mp["out_kernel"], mp["out_bias"], dtype)
    m = _dropout(m, hid_rng2, dropout_rate)
    return _layer_norm(x0 + m, mp["ln_scale"], mp["ln_bias"], spec.layer_norm_eps)


def _encoder_layer(x, mask_bias, layer_params, spec, dtype, rngs, dropout_rate, attn_remat=False):
    attn_rng, hid_rng1, hid_rng2 = rngs if rngs is not None else (None, None, None)
    # attention dropout is its own rate: gate on the rng (train mode),
    # not on the hidden rate
    a = _attention(x, mask_bias, layer_params["attn"], spec, dtype, attn_rng, spec.attention_dropout if rngs is not None else 0.0, attn_remat=attn_remat)
    a = _dropout(a, hid_rng1, dropout_rate)
    x = _layer_norm(x + a, layer_params["attn"]["ln_scale"], layer_params["attn"]["ln_bias"], spec.layer_norm_eps)

    m = _dense(x, layer_params["mlp"]["in_kernel"], layer_params["mlp"]["in_bias"], dtype)
    m = _gelu(m, spec.gelu_approximate)
    m = _dense(m, layer_params["mlp"]["out_kernel"], layer_params["mlp"]["out_bias"], dtype)
    m = _dropout(m, hid_rng2, dropout_rate)
    x = _layer_norm(x + m, layer_params["mlp"]["ln_scale"], layer_params["mlp"]["ln_bias"], spec.layer_norm_eps)
    return x


def bert_encode(
    params: BertParams,
    token_ids: jax.Array,  # (b, s) int32
    segment_ids: jax.Array,  # (b, s) int32
    attention_mask: jax.Array,  # (b, s) {0,1}
    spec: BertSpec,
    compute_dtype: jnp.dtype = jnp.bfloat16,
    dropout_rng: Optional[jax.Array] = None,
    dropout: bool = False,
    remat=False,  # False | True (full per-layer) | 'attn' (selective)
    cls_only: bool = False,
    out_positions: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (sequence_output (b, s, h) f32, pooled_output (b, h) f32).

    pooled_output = tanh(W @ seq[:, 0]) — the HF/reference 'cls_w_lin'
    pooling source (models/biencoder.py:108-109).

    ``cls_only``: compute the FINAL layer for the CLS position only
    (exact — see _encoder_layer_select_only); sequence_output is then
    (b, 1, h). Only valid when downstream consumes CLS/pooled alone.

    ``out_positions``: (b, g) int32 — compute the FINAL layer for these
    positions only (exact, same rationale); sequence_output is then
    (b, g, h) with row j holding position out_positions[:, j]. Only
    valid when downstream consumes exactly those positions (e.g. the
    w_embeds special-token head). pooled_output is then meaningless
    unless position 0 (CLS) is included first.
    """
    b, s = token_ids.shape
    emb = params["embeddings"]
    x = (
        jnp.take(emb["word"], token_ids, axis=0)
        + emb["position"][None, :s, :]
        + jnp.take(emb["token_type"], segment_ids, axis=0)
    )
    x = _layer_norm(x.astype(compute_dtype), emb["ln_scale"], emb["ln_bias"], spec.layer_norm_eps)

    want_dropout = dropout and dropout_rng is not None
    rate = spec.hidden_dropout if want_dropout else 0.0
    if rate:
        drop_key, dropout_rng = jax.random.split(dropout_rng)
        x = _dropout(x, drop_key, rate)

    # additive attention bias: 0 where attend, large negative where masked
    mask_bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, -1e9).astype(jnp.float32)

    layer_fn = _encoder_layer
    if remat == "attn":
        # selective: save all layer intermediates EXCEPT the O(seq^2)
        # attention tensors (scores/probs/dropout mask) — the attention
        # core is structurally checkpointed (_attn_core_remat: q/k/v
        # saved, (s,s) tensors recomputed from them in backward, cheap
        # MXU work). Structural, not name-policy-based: with
        # save_anything_except_these_names, partial eval just saves the
        # un-named producer of the name eqn and nothing is recomputed
        # (verified via saved_residuals; see _ss_tag). Unlike full remat
        # (a measured LOSS, CLAUDE.md), nothing else is recomputed.
        layer_fn = functools.partial(_encoder_layer, attn_remat=True)
    elif remat:
        layer_fn = jax.checkpoint(_encoder_layer, static_argnums=(3, 4, 6))

    # rng plumbing keys on EITHER rate being nonzero: gating on
    # hidden_dropout alone silently disabled attention dropout for
    # hidden_dropout=0 specs (the layers decide per-rate below)
    if want_dropout and (spec.hidden_dropout or spec.attention_dropout):
        layer_rngs = [tuple(jax.random.split(k, 3)) for k in jax.random.split(dropout_rng, spec.num_layers)]
    else:
        layer_rngs = [None] * spec.num_layers

    n_layers = len(params["layers"])
    select_last = cls_only or out_positions is not None
    for li, layer_params in enumerate(params["layers"]):
        if select_last and li == n_layers - 1:
            x = _encoder_layer_select_only(
                x, mask_bias, layer_params, spec, compute_dtype,
                None if cls_only else out_positions, layer_rngs[li], rate,
            )
        else:
            x = layer_fn(x, mask_bias, layer_params, spec, compute_dtype, layer_rngs[li], rate)

    seq_out = x.astype(jnp.float32)
    pooled = jnp.tanh(
        jnp.dot(seq_out[:, 0, :], params["pooler"]["kernel"], preferred_element_type=jnp.float32)
        + params["pooler"]["bias"]
    )
    return seq_out, pooled


def count_params(params: BertParams) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
