"""Optimizer: AdamW/SGD with decay/no-decay groups + warmup-linear LR.

Parity with reference utils/optimizer.py:17-90 rebuilt on optax:
- trainable-subset patterns ('additional_layers', 'top_layer',
  'top4_layers', 'all_encoder_layers', 'all', 'embeddings') select which
  params receive updates (others frozen via optax.masked zero-updates),
- no weight decay for biases / layernorm scales (reference no_decay =
  ['bias','gamma','beta']),
- WarmupLinearSchedule == optax warmup_linear: linear 0->lr over warmup
  steps then linear decay to 0 at total steps.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import optax

# pytree key-path patterns (our param naming) per reference pattern set
# (utils/optimizer.py:17-30). 'additional' = heads outside the towers.
_LAYER_TOP = ["layers/11/"]
_LAYER_TOP4 = ["layers/11/", "layers/10/", "layers/9/", "layers/8/"]

PATTERNS_OPTIMIZER: Dict[str, Optional[List[str]]] = {
    "additional_layers": ["linear", "pooler"],
    "top_layer": ["linear", "pooler"] + _LAYER_TOP,
    "top4_layers": ["linear", "pooler"] + _LAYER_TOP4,
    "all_encoder_layers": ["linear", "pooler", "layers/"],
    "all": None,  # everything trainable
    "": None,
    "embeddings": ["embeddings/"],
}

NO_DECAY_SUBSTRINGS = ("bias", "ln_scale", "ln_bias")


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def _mask_from_predicate(params, pred: Callable[[str], bool]):
    return jax.tree_util.tree_map_with_path(lambda path, _: pred(_path_str(path)), params)


def warmup_linear_schedule(lr: float, total_steps: int, warmup_proportion: float):
    """Linear 0->lr over warmup steps, then linear lr->0 at total steps
    (pytorch_transformers WarmupLinearSchedule semantics)."""
    warmup = max(1, int(total_steps * warmup_proportion))
    return optax.join_schedules(
        [
            # start at lr/warmup (not 0) so step 0 makes progress
            optax.linear_schedule(lr / warmup, lr, warmup),
            optax.linear_schedule(lr, 0.0, max(1, total_steps - warmup)),
        ],
        boundaries=[warmup],
    )


def make_optimizer(
    params,
    learning_rate: float = 1e-5,
    weight_decay: float = 0.01,
    total_steps: int = 10000,
    warmup_proportion: float = 0.01,
    max_grad_norm: float = 1.0,
    type_optimization: str = "all",
    optimizer_type: str = "AdamW",
) -> optax.GradientTransformation:
    schedule = warmup_linear_schedule(learning_rate, total_steps, warmup_proportion)

    decay_mask = _mask_from_predicate(
        params, lambda p: not any(s in p.rsplit("/", 1)[-1] for s in NO_DECAY_SUBSTRINGS)
    )
    if optimizer_type == "AdamW":
        base = optax.adamw(
            learning_rate=schedule,
            weight_decay=weight_decay,
            mask=decay_mask,
            b1=0.9,
            b2=0.999,
            eps=1e-6,
        )
    elif optimizer_type == "SGD":
        base = optax.sgd(learning_rate=schedule)
    else:
        raise NotImplementedError(f"optimizer_type={optimizer_type!r}")

    tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), base)

    patterns = PATTERNS_OPTIMIZER.get(type_optimization, None)
    if patterns is not None:
        trainable = _mask_from_predicate(params, lambda p: any(t in p for t in patterns))
        tx = optax.chain(
            tx,
            optax.masked(
                optax.set_to_zero(),
                jax.tree_util.tree_map(lambda t: not t, trainable),
            ),
        )
    return tx
