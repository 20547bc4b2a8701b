"""BERT architecture parity: our JAX forward vs transformers.BertModel
with identical (randomly initialized) weights — no network needed."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from anncur_tpu.models.bert import BertSpec, bert_encode, init_bert_params, count_params
from anncur_tpu.models.hf_loader import bert_params_from_state_dict, spec_from_hf_config


@pytest.fixture(scope="module")
def hf_pair():
    torch = pytest.importorskip("torch")
    from transformers import BertConfig, BertModel

    cfg = BertConfig(
        vocab_size=128,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=64,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    model = BertModel(cfg).eval()
    spec = spec_from_hf_config(cfg)
    params = bert_params_from_state_dict(model.state_dict(), spec)
    return model, spec, params


def test_forward_matches_transformers(hf_pair, rng):
    torch = pytest.importorskip("torch")
    model, spec, params = hf_pair

    b, s = 3, 16
    tok = rng.integers(1, 128, size=(b, s)).astype(np.int64)
    seg = np.zeros((b, s), np.int64)
    seg[:, 8:] = 1
    mask = np.ones((b, s), np.int64)
    mask[0, 12:] = 0

    with torch.no_grad():
        out = model(
            input_ids=torch.tensor(tok),
            token_type_ids=torch.tensor(seg),
            attention_mask=torch.tensor(mask),
        )
    want_seq = out.last_hidden_state.numpy()
    want_pooled = out.pooler_output.numpy()

    got_seq, got_pooled = bert_encode(
        params,
        jnp.asarray(tok, jnp.int32),
        jnp.asarray(seg, jnp.int32),
        jnp.asarray(mask, jnp.int32),
        spec,
        compute_dtype=jnp.float32,
    )
    # positions attended to must match closely; padded positions may differ
    m = mask.astype(bool)
    np.testing.assert_allclose(np.asarray(got_seq)[m], want_seq[m], atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_pooled), want_pooled, atol=2e-4, rtol=1e-3)


def test_bf16_close_to_f32(hf_pair, rng):
    _, spec, params = hf_pair
    tok = jnp.asarray(rng.integers(1, 128, size=(2, 12)), jnp.int32)
    seg = jnp.zeros_like(tok)
    mask = jnp.ones_like(tok)
    f32_seq, _ = bert_encode(params, tok, seg, mask, spec, compute_dtype=jnp.float32)
    bf16_seq, _ = bert_encode(params, tok, seg, mask, spec, compute_dtype=jnp.bfloat16)
    # bf16 compute tolerance: relative error at the 1e-2 scale
    err = np.abs(np.asarray(f32_seq) - np.asarray(bf16_seq)).max()
    scale = np.abs(np.asarray(f32_seq)).max()
    assert err / scale < 0.05


def test_init_shapes_and_count():
    spec = BertSpec.tiny()
    params = init_bert_params(jax.random.PRNGKey(0), spec)
    assert len(params["layers"]) == spec.num_layers
    assert params["embeddings"]["word"].shape == (spec.vocab_size, spec.hidden_size)
    n = count_params(params)
    assert n > 0


def test_jit_and_grad():
    spec = BertSpec.tiny()
    params = init_bert_params(jax.random.PRNGKey(0), spec)
    tok = jnp.ones((2, 8), jnp.int32)
    seg = jnp.zeros_like(tok)
    mask = jnp.ones_like(tok)

    @jax.jit
    def loss_fn(p):
        seq, pooled = bert_encode(p, tok, seg, mask, spec, compute_dtype=jnp.float32)
        return jnp.sum(pooled**2)

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)


def test_gelu_auto_flavor():
    """gelu auto: erf under f32 (HF parity), tanh under bf16 (error below
    bf16 resolution, measured on v5e — see BertSpec docstring)."""
    import jax.numpy as jnp
    import numpy as np

    from anncur_tpu.models.bert import _gelu

    x32 = jnp.asarray(np.linspace(-4, 4, 1001), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(_gelu(x32)), np.asarray(jax.nn.gelu(x32, approximate=False)), rtol=0
    )
    xb = x32.astype(jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(_gelu(xb)), np.asarray(jax.nn.gelu(xb, approximate=True)), rtol=0
    )
    # explicit override still wins
    assert np.allclose(
        np.asarray(_gelu(xb, approximate=False)),
        np.asarray(jax.nn.gelu(xb, approximate=False)),
    )


def test_remat_modes_grad_identical():
    """Selective attention remat ('attn': recompute only the O(s^2)
    score/prob tensors in backward) and full per-layer remat must both
    produce bit-identical gradients to the no-remat forward — remat is
    a scheduling choice, never a numerics one. Covers the dropout path
    too (mask regenerated from the same rng during recompute)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from anncur_tpu.models.bert import BertSpec
    from anncur_tpu.models.crossencoder import CrossEncoder

    spec = BertSpec.tiny(vocab_size=256, max_position_embeddings=64)
    pairs = jnp.asarray(
        np.random.default_rng(0).integers(1, 250, size=(4, 48)).astype(np.int32)
    )
    rng = jax.random.PRNGKey(7)

    grads = {}
    for mode in (False, "attn", True):
        ce = CrossEncoder(spec=spec, compute_dtype=jnp.float32, remat=mode)
        params = ce.init(jax.random.PRNGKey(1))

        def loss(p):
            s = ce.score(p, pairs, first_segment_end=24, train=True, rng=rng)
            return jnp.sum(s**2)

        grads[mode] = jax.jit(jax.grad(loss))(params)

    ref = jax.tree_util.tree_leaves(grads[False])
    for mode in ("attn", True):
        for a, b in zip(jax.tree_util.tree_leaves(grads[mode]), ref):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_remat_attn_saves_everything_but_ss():
    """remat='attn' must be SELECTIVE, not full remat: the O(s^2)
    attention tensors are dropped from the saved residuals while the
    other layer intermediates stay saved (strictly more residuals than
    full remat, strictly fewer than no-remat, zero (s,s)-shaped).
    Regression: a name-policy version (save_any_names_but_these /
    save_anything_except_these_names) silently degenerates to full
    remat / no remat respectively — only the structural checkpoint of
    _attn_core gives the documented behavior."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax._src.ad_checkpoint import saved_residuals

    from anncur_tpu.models.bert import BertSpec
    from anncur_tpu.models.crossencoder import CrossEncoder

    spec = BertSpec.tiny(vocab_size=256, max_position_embeddings=64)
    pairs = jnp.asarray(
        np.random.default_rng(0).integers(1, 250, size=(4, 48)).astype(np.int32)
    )
    rng = jax.random.PRNGKey(7)

    counts, ss_counts = {}, {}
    for mode in (False, "attn", True):
        ce = CrossEncoder(spec=spec, compute_dtype=jnp.float32, remat=mode)
        params = ce.init(jax.random.PRNGKey(1))

        def loss(p):
            s = ce.score(p, pairs, first_segment_end=24, train=True, rng=rng)
            return jnp.sum(s**2)

        res = saved_residuals(loss, params)
        counts[mode] = len(res)
        # (s,s) attention tensors: 4-d with BOTH the q and k axes = seq
        # (the final selective layer's (g=1, s) tensors don't count)
        ss_counts[mode] = sum(
            1 for aval, _ in res
            if len(aval.shape) == 4 and sum(d == 48 for d in aval.shape[1:]) >= 2
        )

    assert ss_counts[False] > 0  # no-remat stores probs/mask across fwd->bwd
    assert ss_counts["attn"] == 0  # selective: (s,s) recomputed from q/k/v
    assert counts[True] < counts["attn"] < counts[False]
