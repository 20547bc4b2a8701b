"""Import HuggingFace BERT checkpoints into our pytree format.

The reference loads pretrained `bert-base-uncased` towers and the HF-hub
checkpoints named in its README (README.md:54-58). This loader maps a
``transformers`` BertModel state_dict (torch tensors or a saved
``pytorch_model.bin``) onto :mod:`anncur_tpu.models.bert` params. Torch
``nn.Linear`` stores (out, in) weights; ours are (in, out) — transposed
here once at load time.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax.numpy as jnp
import numpy as np

from anncur_tpu.models.bert import BertParams, BertSpec


def _to_np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def bert_params_from_state_dict(
    state_dict: Mapping[str, Any],
    spec: BertSpec,
    prefix: str = "",
) -> BertParams:
    """Convert an HF BertModel state_dict to our params pytree.

    ``prefix``: key prefix to strip (e.g. 'bert.' for BertForX heads, or
    'model.input_encoder.bert_model.' for reference Lightning ckpts —
    see reference state-dict prefix handling, models/biencoder.py:386-409).
    """
    sd = {k[len(prefix):]: v for k, v in state_dict.items() if k.startswith(prefix)}

    def get(name: str, transpose: bool = False) -> jnp.ndarray:
        arr = _to_np(sd[name])
        if transpose:
            arr = arr.T
        return jnp.asarray(arr)

    params: BertParams = {
        "embeddings": {
            "word": get("embeddings.word_embeddings.weight"),
            "position": get("embeddings.position_embeddings.weight"),
            "token_type": get("embeddings.token_type_embeddings.weight"),
            "ln_scale": get("embeddings.LayerNorm.weight"),
            "ln_bias": get("embeddings.LayerNorm.bias"),
        },
        "layers": [],
        "pooler": {
            "kernel": get("pooler.dense.weight", transpose=True),
            "bias": get("pooler.dense.bias"),
        },
    }
    for li in range(spec.num_layers):
        p = f"encoder.layer.{li}."
        params["layers"].append(
            {
                "attn": {
                    "q_kernel": get(p + "attention.self.query.weight", True),
                    "q_bias": get(p + "attention.self.query.bias"),
                    "k_kernel": get(p + "attention.self.key.weight", True),
                    "k_bias": get(p + "attention.self.key.bias"),
                    "v_kernel": get(p + "attention.self.value.weight", True),
                    "v_bias": get(p + "attention.self.value.bias"),
                    "out_kernel": get(p + "attention.output.dense.weight", True),
                    "out_bias": get(p + "attention.output.dense.bias"),
                    "ln_scale": get(p + "attention.output.LayerNorm.weight"),
                    "ln_bias": get(p + "attention.output.LayerNorm.bias"),
                },
                "mlp": {
                    "in_kernel": get(p + "intermediate.dense.weight", True),
                    "in_bias": get(p + "intermediate.dense.bias"),
                    "out_kernel": get(p + "output.dense.weight", True),
                    "out_bias": get(p + "output.dense.bias"),
                    "ln_scale": get(p + "output.LayerNorm.weight"),
                    "ln_bias": get(p + "output.LayerNorm.bias"),
                },
            }
        )
    return params


def spec_from_hf_config(config) -> BertSpec:
    """BertSpec from a transformers BertConfig (or a plain config dict —
    the single mapping site for HF field names; keep it that way)."""
    get = (lambda k, d=None: config.get(k, d)) if isinstance(config, dict) else (
        lambda k, d=None: getattr(config, k, d)
    )
    required = ("vocab_size", "hidden_size", "num_hidden_layers",
                "num_attention_heads", "intermediate_size")
    missing = [k for k in required if get(k) is None]
    if missing:
        # a None would silently produce a malformed BertSpec
        raise ValueError(f"HF config is missing required fields: {missing}")
    return BertSpec(
        vocab_size=get("vocab_size"),
        hidden_size=get("hidden_size"),
        num_layers=get("num_hidden_layers"),
        num_heads=get("num_attention_heads"),
        intermediate_size=get("intermediate_size"),
        max_position_embeddings=get("max_position_embeddings", 512),
        type_vocab_size=get("type_vocab_size", 2),
        layer_norm_eps=get("layer_norm_eps", 1e-12),
        initializer_range=get("initializer_range", 0.02),
        # fine-tuning an imported checkpoint must honor ITS dropout
        # config, not this framework's 0.1/0.1 defaults
        hidden_dropout=get("hidden_dropout_prob", 0.1),
        attention_dropout=get("attention_probs_dropout_prob", 0.1),
    )


def _linear_params(sd: Mapping[str, Any], prefix: str) -> Dict[str, jnp.ndarray]:
    return {
        "kernel": jnp.asarray(_to_np(sd[prefix + "weight"]).T),
        "bias": jnp.asarray(_to_np(sd[prefix + "bias"])),
    }


def biencoder_params_from_lightning(
    state_dict: Mapping[str, Any],
    spec: BertSpec,
    bi_enc_type: str = "separate",
    add_linear_layer: bool = False,
) -> Dict[str, Any]:
    """Import a reference BiEncoderWrapper Lightning checkpoint
    (state-dict layout per models/biencoder.py:149-214, prefix handling
    :386-409; pass ckpt['state_dict']). Returns our BiEncoder params."""
    params: Dict[str, Any] = {}
    if bi_enc_type == "separate":
        params["input_bert"] = bert_params_from_state_dict(
            state_dict, spec, prefix="model.input_encoder.bert_model."
        )
        params["label_bert"] = bert_params_from_state_dict(
            state_dict, spec, prefix="model.label_encoder.bert_model."
        )
        if add_linear_layer:
            params["input_linear"] = _linear_params(
                state_dict, "model.input_encoder.additional_linear."
            )
            params["label_linear"] = _linear_params(
                state_dict, "model.label_encoder.additional_linear."
            )
    elif bi_enc_type == "shared":
        params["bert"] = bert_params_from_state_dict(
            state_dict, spec, prefix="model.encoder.bert_model."
        )
        if add_linear_layer:
            # single shared head (matches BiEncoder.init's 'linear' slot;
            # aliasing one array into two leaves let gradients diverge)
            params["linear"] = _linear_params(state_dict, "model.encoder.additional_linear.")
    else:
        raise ValueError(f"bi_enc_type={bi_enc_type!r}")
    return params


def crossencoder_params_from_lightning(
    state_dict: Mapping[str, Any],
    spec: BertSpec,
    cross_enc_type: str = "default",
) -> Dict[str, Any]:
    """Import a reference CrossEncoderWrapper Lightning checkpoint
    (models/crossencoder.py:218-242, prefix handling :397-420)."""
    params: Dict[str, Any] = {
        "bert": bert_params_from_state_dict(
            state_dict, spec, prefix="model.encoder.bert_model."
        )
    }
    if cross_enc_type == "default":
        params["score_linear"] = _linear_params(state_dict, "model.encoder.additional_linear.")
    return params


def load_lightning_checkpoint(path: str) -> Mapping[str, Any]:
    """Load a PL .ckpt and return its state_dict (torch file)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    return ckpt.get("state_dict", ckpt)


def load_bert_from_pretrained_dir(model_dir: str):
    """(spec, params, vocab_path) from a local HF-format directory
    containing config.json + pytorch_model.bin + vocab.txt."""
    import json
    import os

    import torch

    with open(os.path.join(model_dir, "config.json")) as fin:
        cfg = json.load(fin)
    spec = spec_from_hf_config(cfg)
    for name in ("pytorch_model.bin", "model.pt", "model.torch"):
        path = os.path.join(model_dir, name)
        if os.path.exists(path):
            sd = torch.load(path, map_location="cpu", weights_only=True)
            break
    else:
        raise FileNotFoundError(f"no torch checkpoint in {model_dir}")
    prefix = "bert." if any(k.startswith("bert.") for k in sd) else ""
    params = bert_params_from_state_dict(sd, spec, prefix=prefix)
    vocab_path = os.path.join(model_dir, "vocab.txt")
    return spec, params, (vocab_path if os.path.exists(vocab_path) else None)
