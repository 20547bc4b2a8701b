"""Tensor-parallel param shardings for the BERT towers (GSPMD).

The reference has no TP (SURVEY §2.8 — BERT-base fits per chip), but at
larger tower sizes a second mesh axis pays off. Idiomatic TPU approach:
annotate parameter shardings and let GSPMD insert the collectives — no
manual psum/all-gather anywhere.

Megatron-style layout per encoder layer:
- attention q/k/v kernels (h, h): column-parallel -> P(None, model)
  (shards the head dim; biases (h,) shard the same axis),
- attention output kernel (h, h): row-parallel -> P(model, None)
  (GSPMD emits the psum after the contraction; bias replicated),
- MLP in kernel (h, i): column-parallel; out kernel (i, h): row-parallel,
- embeddings / layernorms / pooler: replicated (small).

Used by the Trainer (params placed with these shardings; batch sharded
on 'data') and by __graft_entry__.dryrun_multichip to validate dp x tp.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _bert_leaf_pspec(path: str, model_axis: str) -> P:
    last = path.strip("/").rsplit("/", 1)[-1]
    if "/attn/" in path:
        if last in ("q_kernel", "k_kernel", "v_kernel"):
            return P(None, model_axis)
        if last in ("q_bias", "k_bias", "v_bias"):
            return P(model_axis)
        if last == "out_kernel":
            return P(model_axis, None)
        return P()  # out_bias, layernorm
    if "/mlp/" in path:
        if last == "in_kernel":
            return P(None, model_axis)
        if last == "in_bias":
            return P(model_axis)
        if last == "out_kernel":
            return P(model_axis, None)
        return P()
    return P()  # embeddings, pooler, heads


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
    return "/".join(parts)


def param_pspecs(params: Any, model_axis: str = "model") -> Any:
    """PartitionSpec pytree for any params tree containing BERT towers."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: _bert_leaf_pspec("/" + _path_str(path) + "/", model_axis),
        params,
    )


def shard_params(params: Any, mesh: Mesh, model_axis: str = "model") -> Any:
    """Place params on the mesh with TP shardings (replicated over every
    other axis)."""
    specs = param_pspecs(params, model_axis)
    shardings = jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), specs)
    return jax.device_put(params, shardings)
