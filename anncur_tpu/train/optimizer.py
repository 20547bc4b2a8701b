"""Optimizer: AdamW/SGD with decay/no-decay groups + warmup-linear LR.

Parity with reference utils/optimizer.py:17-90 rebuilt on optax:
- trainable-subset patterns ('additional_layers', 'top_layer',
  'top4_layers', 'all_encoder_layers', 'all', 'embeddings') select which
  params receive updates (others frozen via optax.masked zero-updates),
- AdamW without bias correction (the reference constructs
  ``AdamW(..., correct_bias=False)``, utils/optimizer.py:68-72 — optax's
  adamw always bias-corrects, so the Adam core is built explicitly),
- no weight decay for biases / layernorm params. NB deliberate
  divergence: the reference's no_decay list ['bias','gamma','beta']
  matches NOTHING in pytorch_transformers BERT (whose LayerNorm params
  are named weight/bias), so the reference actually DOES decay LN
  scales; we exempt ln_scale/ln_bias as intended — documented rather
  than replicated bug-for-bug since optimizer grouping does not affect
  checkpoint compatibility, only training dynamics.
- WarmupLinearSchedule == optax warmup_linear: linear 0->lr over warmup
  steps then linear decay to 0 at total steps.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
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


def _scale_by_adam_no_bias_correction(b1: float, b2: float, eps: float):
    """Adam moments WITHOUT bias correction — parity with the
    reference's ``AdamW(..., correct_bias=False)`` (pytorch_transformers
    BERT convention; optax.scale_by_adam always corrects)."""

    def init(params):
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(jnp.zeros_like, params),
            nu=jax.tree_util.tree_map(jnp.zeros_like, params),
        )

    def update(updates, state, params=None):
        mu = jax.tree_util.tree_map(lambda g, m: b1 * m + (1 - b1) * g, updates, state.mu)
        nu = jax.tree_util.tree_map(
            lambda g, v: b2 * v + (1 - b2) * (g * g), updates, state.nu
        )
        out = jax.tree_util.tree_map(
            lambda m, v: m / (jnp.sqrt(v) + eps), mu, nu
        )
        return out, optax.ScaleByAdamState(count=state.count + 1, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


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
        base = optax.chain(
            _scale_by_adam_no_bias_correction(b1=0.9, b2=0.999, eps=1e-6),
            optax.add_decayed_weights(weight_decay, mask=decay_mask),
            optax.scale_by_learning_rate(schedule),
        )
    elif optimizer_type == "SGD":
        base = optax.sgd(learning_rate=schedule)
    else:
        raise NotImplementedError(f"optimizer_type={optimizer_type!r}")

    if type_optimization not in PATTERNS_OPTIMIZER:
        # the reference raises on unknown types (utils/optimizer.py:28-30);
        # a silent fall-through to 'train everything' hid typos
        raise ValueError(
            f"type_optimization={type_optimization!r} not in "
            f"{sorted(PATTERNS_OPTIMIZER)}"
        )
    patterns = PATTERNS_OPTIMIZER[type_optimization]

    chain = []
    frozen = None
    if patterns is not None:
        # zero frozen grads BEFORE global-norm clipping: the reference's
        # optimizer only ever sees trainable params, so its clip norm is
        # the trainable-subset norm — masking after the clip let frozen
        # tower grads inflate the norm and over-clip the head updates
        trainable = _mask_from_predicate(params, lambda p: any(t in p for t in patterns))
        frozen = jax.tree_util.tree_map(lambda t: not t, trainable)
        chain.append(optax.masked(optax.set_to_zero(), frozen))
    chain.append(optax.clip_by_global_norm(max_grad_norm))
    chain.append(base)
    if frozen is not None:
        # and zero the FINAL update too: weight decay inside the AdamW
        # chain adds -lr*wd*param even where the grad was zeroed
        chain.append(optax.masked(optax.set_to_zero(), frozen))
    return optax.chain(*chain)
