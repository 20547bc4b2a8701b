"""Reference Lightning-checkpoint import: build a reference-shaped
state_dict from transformers BertModels and verify our encoders produce
the same embeddings/scores as the torch modules would."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
from transformers import BertConfig, BertModel  # noqa: E402

from anncur_tpu.models.biencoder import BiEncoder  # noqa: E402
from anncur_tpu.models.crossencoder import CrossEncoder  # noqa: E402
from anncur_tpu.models.hf_loader import (  # noqa: E402
    biencoder_params_from_lightning,
    crossencoder_params_from_lightning,
    spec_from_hf_config,
)


@pytest.fixture(scope="module")
def towers():
    cfg = BertConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64, max_position_embeddings=64,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(1)
    input_bert = BertModel(cfg).eval()
    label_bert = BertModel(cfg).eval()
    lin = torch.nn.Linear(32, 1)
    return cfg, input_bert, label_bert, lin


def reference_state_dict(input_bert, label_bert, lin):
    sd = {}
    for prefix, module in (
        ("model.input_encoder.bert_model.", input_bert),
        ("model.label_encoder.bert_model.", label_bert),
        ("model.encoder.bert_model.", input_bert),
    ):
        for k, v in module.state_dict().items():
            sd[prefix + k] = v
    for k, v in lin.state_dict().items():
        sd["model.encoder.additional_linear." + k] = v
    return sd


def test_biencoder_import_forward_parity(towers, rng):
    cfg, input_bert, label_bert, lin = towers
    spec = spec_from_hf_config(cfg)
    sd = reference_state_dict(input_bert, label_bert, lin)
    params = biencoder_params_from_lightning(sd, spec, bi_enc_type="separate")

    enc = BiEncoder(spec=spec, pooling_type="cls", embed_dim=32, compute_dtype=jnp.float32)
    toks = rng.integers(5, 128, (3, 12)).astype(np.int64)
    got = np.asarray(enc.encode_input(params, jnp.asarray(toks, jnp.int32)))

    with torch.no_grad():
        t = torch.tensor(toks)
        mask = (t != 0).long()
        out = input_bert(input_ids=t * mask, token_type_ids=torch.zeros_like(t), attention_mask=mask)
    want = out.last_hidden_state[:, 0, :].numpy()  # cls pooling
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=1e-3)

    # label tower uses the *other* bert
    got_l = np.asarray(enc.encode_label(params, jnp.asarray(toks, jnp.int32)))
    with torch.no_grad():
        out_l = label_bert(input_ids=t * mask, token_type_ids=torch.zeros_like(t), attention_mask=mask)
    np.testing.assert_allclose(got_l, out_l.last_hidden_state[:, 0, :].numpy(), atol=3e-4, rtol=1e-3)


def test_crossencoder_import_scores(towers, rng):
    cfg, input_bert, _, lin = towers
    spec = spec_from_hf_config(cfg)
    sd = reference_state_dict(input_bert, input_bert, lin)
    params = crossencoder_params_from_lightning(sd, spec, cross_enc_type="default")

    ce = CrossEncoder(spec=spec, cross_enc_type="default", pooling_type="cls_w_lin", compute_dtype=jnp.float32)
    pairs = rng.integers(5, 128, (2, 24)).astype(np.int64)
    got = np.asarray(ce.score(params, jnp.asarray(pairs, jnp.int32), first_segment_end=12))

    with torch.no_grad():
        t = torch.tensor(pairs)
        mask = (t != 0).long()
        seg = torch.zeros_like(t)
        seg[:, 12:] = (t[:, 12:] > 0).long()
        out = input_bert(input_ids=t * mask, token_type_ids=seg, attention_mask=mask)
        want = lin(out.pooler_output)[:, 0].numpy()
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=1e-3)


def test_w_embeds_import(towers, rng):
    cfg, input_bert, _, lin = towers
    spec = spec_from_hf_config(cfg)
    sd = reference_state_dict(input_bert, input_bert, lin)
    params = crossencoder_params_from_lightning(sd, spec, cross_enc_type="w_embeds")
    assert "score_linear" not in params
    ce = CrossEncoder(spec=spec, cross_enc_type="w_embeds", compute_dtype=jnp.float32)
    pairs = np.full((2, 24), 7, np.int32)
    pairs[:, 2], pairs[:, 5], pairs[:, 15] = 1, 2, 3  # special tokens
    scores = ce.score(params, jnp.asarray(pairs), first_segment_end=12)
    assert np.all(np.isfinite(np.asarray(scores)))
