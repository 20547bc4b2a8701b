"""Bi-encoder / cross-encoder head tests on tiny specs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from anncur_tpu.models.bert import BertSpec
from anncur_tpu.models.biencoder import BiEncoder, to_bert_input
from anncur_tpu.models.crossencoder import CrossEncoder, to_cross_bert_input


SPEC = BertSpec.tiny()


def toks(rng, b, s, low=10):
    t = rng.integers(low, SPEC.vocab_size, size=(b, s)).astype(np.int32)
    t[:, -2:] = 0  # padding tail
    return jnp.asarray(t)


def test_to_bert_input():
    t = jnp.asarray([[5, 6, 0, 0]])
    tok, seg, mask = to_bert_input(t)
    np.testing.assert_array_equal(np.asarray(mask), [[1, 1, 0, 0]])
    np.testing.assert_array_equal(np.asarray(seg), [[0, 0, 0, 0]])


def test_to_cross_bert_input_segments():
    t = jnp.asarray([[5, 6, 7, 8, 9, 0, 0, 0]])
    tok, seg, mask = to_cross_bert_input(t, first_segment_end=3)
    # segment 1 only where pos >= 3 AND token > 0 (crossencoder.py:40-42)
    np.testing.assert_array_equal(np.asarray(seg), [[0, 0, 0, 1, 1, 0, 0, 0]])
    np.testing.assert_array_equal(np.asarray(mask), [[1, 1, 1, 1, 1, 0, 0, 0]])


@pytest.mark.parametrize("bi_enc_type", ["separate", "shared"])
def test_biencoder_encode_and_score(rng, bi_enc_type):
    enc = BiEncoder(
        spec=SPEC, pooling_type="cls", bi_enc_type=bi_enc_type,
        embed_dim=SPEC.hidden_size, compute_dtype=jnp.float32,
    )
    params = enc.init(jax.random.PRNGKey(0))
    q = enc.encode_input(params, toks(rng, 3, 16))
    l = enc.encode_label(params, toks(rng, 5, 16))
    assert q.shape == (3, SPEC.hidden_size) and l.shape == (5, SPEC.hidden_size)
    scores = enc.score_labels(q, l)
    assert scores.shape == (3, 5)
    paired = enc.score_paired(q, l[:3])
    np.testing.assert_allclose(np.asarray(paired), np.asarray(scores[:, :3]).diagonal(), rtol=1e-5)


def test_biencoder_linear_layer(rng):
    enc = BiEncoder(
        spec=SPEC, pooling_type="cls", embed_dim=32, add_linear_layer=True,
        compute_dtype=jnp.float32,
    )
    params = enc.init(jax.random.PRNGKey(0))
    q = enc.encode_input(params, toks(rng, 2, 16))
    assert q.shape == (2, 32)


def test_biencoder_embed_dim_guard():
    with pytest.raises(ValueError):
        BiEncoder(spec=SPEC, embed_dim=32, add_linear_layer=False)


def test_crossencoder_default_scores(rng):
    ce = CrossEncoder(spec=SPEC, cross_enc_type="default", pooling_type="cls_w_lin", compute_dtype=jnp.float32)
    params = ce.init(jax.random.PRNGKey(1))
    pairs = toks(rng, 4, 32)
    scores = ce.score(params, pairs, first_segment_end=16)
    assert scores.shape == (4,)
    assert np.all(np.isfinite(np.asarray(scores)))


def test_crossencoder_w_embeds(rng):
    ce = CrossEncoder(spec=SPEC, cross_enc_type="w_embeds", compute_dtype=jnp.float32)
    params = ce.init(jax.random.PRNGKey(2))
    t = np.array(toks(rng, 4, 32))
    # plant special tokens: [unused0]=1, [unused1]=2 in mention part; [unused2]=3 in entity part
    t[:, 2] = 1
    t[:, 6] = 2
    t[:, 20] = 3
    t = jnp.asarray(t)
    scores = ce.score(params, t, first_segment_end=16)
    m, e = ce.embed_paired(params, t, first_segment_end=16)
    # score must equal dot(mention_embed, entity_embed)
    np.testing.assert_allclose(
        np.asarray(scores), np.asarray(jnp.sum(m * e, axis=-1)), rtol=2e-3, atol=2e-3
    )
    # embed_input / embed_label single-sided paths
    mi = ce.embed_input(params, t[:, :16])
    le = ce.embed_label(params, t[:, 16:])
    assert mi.shape == (4, SPEC.hidden_size) and le.shape == (4, SPEC.hidden_size)


def test_crossencoder_jit_grad(rng):
    ce = CrossEncoder(spec=SPEC, compute_dtype=jnp.float32)
    params = ce.init(jax.random.PRNGKey(3))
    pairs = toks(rng, 2, 32)

    @jax.jit
    def loss(p):
        return jnp.sum(ce.score(p, pairs, 16) ** 2)

    g = jax.grad(loss)(params)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in jax.tree_util.tree_leaves(g))


@pytest.mark.parametrize("pooling", ["cls_w_lin", "cls", "mean", "max", "lse"])
def test_all_pooling_modes(rng, pooling):
    enc = BiEncoder(spec=SPEC, pooling_type=pooling, embed_dim=SPEC.hidden_size,
                    compute_dtype=jnp.float32)
    params = enc.init(jax.random.PRNGKey(0))
    q = enc.encode_input(params, toks(rng, 2, 16))
    assert q.shape == (2, SPEC.hidden_size)
    assert np.all(np.isfinite(np.asarray(q)))


@pytest.mark.parametrize("bi_enc_type", ["separate", "shared"])
def test_spl_tkns_towers(rng, bi_enc_type):
    """Special-token pooled bi-encoder towers (reference:
    models/biencoder.py:165-173, 190-199)."""
    enc = BiEncoder(spec=SPEC, pooling_type="spl_tkns", bi_enc_type=bi_enc_type,
                    embed_dim=SPEC.hidden_size, compute_dtype=jnp.float32)
    params = enc.init(jax.random.PRNGKey(1))
    t = np.array(toks(rng, 3, 16))
    t[:, 2], t[:, 5] = 1, 2   # [unused0], [unused1] for mention pooling
    t[:, 3] = 3               # [unused2] for entity pooling
    q = enc.encode_input(params, jnp.asarray(t))
    l = enc.encode_label(params, jnp.asarray(t))
    assert q.shape == (3, SPEC.hidden_size) and l.shape == (3, SPEC.hidden_size)
    # input pooling uses [unused0/1]; label pooling uses [unused2]:
    # embeddings must differ
    assert not np.allclose(np.asarray(q), np.asarray(l))


def test_max_pooling_returns_values_not_tuple(rng):
    """The reference's 'max' pooling is buggy (torch.max returns a
    namedtuple, models/biencoder.py:117); ours returns the values."""
    from anncur_tpu.models.pooling import pool_sequence

    seq = jnp.asarray(rng.standard_normal((2, 4, 8)), jnp.float32)
    pooled = pool_sequence(seq, seq[:, 0], "max")
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(seq).max(axis=1), rtol=1e-6)


def test_cls_only_last_layer_exact():
    """cls_only last layer must be EXACT vs the full forward (it only
    skips positions whose outputs are never consumed)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from anncur_tpu.models.bert import BertSpec, bert_encode, init_bert_params

    spec = BertSpec.tiny()
    params = init_bert_params(jax.random.PRNGKey(0), spec)
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(1, spec.vocab_size, (4, 32)), jnp.int32)
    seg = jnp.zeros((4, 32), jnp.int32)
    mask = jnp.asarray(rng.integers(0, 2, (4, 32)) | np.eye(1, 32, dtype=int)[0], jnp.int32)

    seq_full, pooled_full = bert_encode(params, toks, seg, mask, spec, compute_dtype=jnp.float32)
    seq_cls, pooled_cls = bert_encode(
        params, toks, seg, mask, spec, compute_dtype=jnp.float32, cls_only=True
    )
    assert seq_cls.shape == (4, 1, spec.hidden_size)
    np.testing.assert_allclose(np.asarray(seq_cls[:, 0]), np.asarray(seq_full[:, 0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(pooled_cls), np.asarray(pooled_full), atol=1e-5)


def test_crossencoder_score_cls_only_matches_train_path():
    """score() at inference (cls_only) == score() computed via the full
    forward (train=False but full path through pooling)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from anncur_tpu.models.bert import BertSpec
    from anncur_tpu.models.crossencoder import CrossEncoder

    spec = BertSpec.tiny()
    ce = CrossEncoder(spec=spec, cross_enc_type="default", compute_dtype=jnp.float32)
    params = ce.init(jax.random.PRNGKey(1))
    rng = np.random.default_rng(1)
    pairs = jnp.asarray(rng.integers(1, spec.vocab_size, (6, 64)), jnp.int32)

    s_infer = ce.score(params, pairs, first_segment_end=32)
    # force the full path by going through _bert directly
    from anncur_tpu.models.pooling import pool_sequence

    (seq, pooled), _ = ce._bert(params, pairs, 32, cls_only=False)
    emb = pool_sequence(seq, pooled, ce.pooling_type)
    lin = params["score_linear"]
    s_full = (jnp.dot(emb, lin["kernel"]) + lin["bias"])[:, 0]
    np.testing.assert_allclose(np.asarray(s_infer), np.asarray(s_full), atol=1e-5)


def test_cls_only_training_grads_match_full_path():
    """Training with cls_only (dropout off) must produce EXACTLY the
    same loss and gradients as the full last layer: the non-CLS
    last-layer outputs never reach the loss, so skipping them cannot
    change the backward pass."""
    from anncur_tpu.models.pooling import pool_sequence

    spec = BertSpec.tiny(hidden_dropout=0.0, attention_dropout=0.0)
    ce = CrossEncoder(spec=spec, cross_enc_type="default", compute_dtype=jnp.float32)
    params = ce.init(jax.random.PRNGKey(2))
    rng = np.random.default_rng(2)
    pairs = jnp.asarray(rng.integers(1, spec.vocab_size, (4, 64)), jnp.int32)

    def loss_cls_only(p):
        s = ce.score(p, pairs, first_segment_end=32)  # cls_only hardwired
        return jnp.sum(s**2)

    def loss_full(p):
        (seq, pooled), _ = ce._bert(p, pairs, 32, cls_only=False)
        emb = pool_sequence(seq, pooled, ce.pooling_type)
        lin = p["score_linear"]
        s = (jnp.dot(emb, lin["kernel"]) + lin["bias"])[:, 0]
        return jnp.sum(s**2)

    l1, g1 = jax.value_and_grad(loss_cls_only)(params)
    l2, g2 = jax.value_and_grad(loss_full)(params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_cls_only_training_with_dropout_runs_and_is_deterministic():
    """With dropout active, the cls_only last layer draws its own rng
    stream; the step must be reproducible under the same key and the
    grads finite and nonzero in every layer."""
    spec = BertSpec.tiny()  # dropout 0.1
    ce = CrossEncoder(spec=spec, cross_enc_type="default", compute_dtype=jnp.float32)
    params = ce.init(jax.random.PRNGKey(3))
    rng = np.random.default_rng(3)
    pairs = jnp.asarray(rng.integers(1, spec.vocab_size, (4, 64)), jnp.int32)
    key = jax.random.PRNGKey(7)

    def loss(p):
        s = ce.score(p, pairs, first_segment_end=32, train=True, rng=key)
        return jnp.sum(s**2)

    l1, g1 = jax.value_and_grad(loss)(params)
    l2, g2 = jax.value_and_grad(loss)(params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=0)
    leaves1 = jax.tree_util.tree_leaves(g1)
    leaves2 = jax.tree_util.tree_leaves(g2)
    assert all(np.array_equal(np.asarray(a), np.asarray(b)) for a, b in zip(leaves1, leaves2))
    assert all(np.all(np.isfinite(np.asarray(a))) for a in leaves1)
    # every encoder layer (incl. the cls_only last one) must receive grads
    for li, layer in enumerate(g1["bert"]["layers"]):
        norm = float(sum(jnp.sum(jnp.abs(v)) for v in jax.tree_util.tree_leaves(layer)))
        assert norm > 0.0, f"layer {li} got zero gradient"


def test_biencoder_cls_pooling_uses_cls_only_and_matches_full():
    """Bi-encoder cls/cls_w_lin pooling runs the final layer CLS-only;
    embeddings must match the full forward exactly."""
    from anncur_tpu.models.bert import bert_encode
    from anncur_tpu.models.pooling import pool_sequence

    for pooling in ("cls", "cls_w_lin"):
        enc = BiEncoder(
            spec=SPEC, pooling_type=pooling, embed_dim=SPEC.hidden_size,
            compute_dtype=jnp.float32,
        )
        params = enc.init(jax.random.PRNGKey(4))
        rng = np.random.default_rng(4)
        toks = jnp.asarray(rng.integers(1, SPEC.vocab_size, (3, 24)), jnp.int32)
        emb = enc.encode_input(params, toks)
        tok2, seg, mask = to_bert_input(toks)
        seq, pooled = bert_encode(
            params["input_bert"], tok2, seg, mask, SPEC, compute_dtype=jnp.float32
        )
        ref = pool_sequence(seq, pooled, pooling)
        np.testing.assert_allclose(np.asarray(emb), np.asarray(ref), atol=1e-5)


def test_w_embeds_tag_only_last_layer_matches_full():
    """The w_embeds head consumes only the three tag positions; running
    the final layer at just those rows must be EXACT vs the full forward
    (score, embed_paired, embed_input, embed_label)."""
    from anncur_tpu.models.bert import bert_encode
    from anncur_tpu.models.pooling import special_token_embeds

    ce = CrossEncoder(spec=SPEC, cross_enc_type="w_embeds", compute_dtype=jnp.float32)
    params = ce.init(jax.random.PRNGKey(5))
    rng = np.random.default_rng(5)
    pairs = np.asarray(rng.integers(4, SPEC.vocab_size, (5, 48)), np.int32)
    pairs[:, 2], pairs[:, 7] = 1, 2   # [unused0], [unused1]
    pairs[:, 27] = 3                  # [unused2] in the label half
    pairs = jnp.asarray(pairs)

    s_fast = ce.score(params, pairs, first_segment_end=24)
    (seq, _), tok = ce._bert(params, pairs, 24)  # full path: no out_positions
    # _bert always selects now; recompute truly-full via bert_encode
    tok_ids, seg, mask = to_cross_bert_input(pairs, 24)
    seq_full, _ = bert_encode(params["bert"], tok_ids, seg, mask, SPEC, compute_dtype=jnp.float32)
    m_ref, e_ref = special_token_embeds(seq_full, tok_ids)
    s_ref = jnp.sum(m_ref * e_ref, axis=-1)
    np.testing.assert_allclose(np.asarray(s_fast), np.asarray(s_ref), atol=1e-5)

    m_fast, e_fast = ce.embed_paired(params, pairs, 24)
    np.testing.assert_allclose(np.asarray(m_fast), np.asarray(m_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(e_fast), np.asarray(e_ref), atol=1e-5)

    # single-side embeds
    singles = np.asarray(rng.integers(4, SPEC.vocab_size, (5, 24)), np.int32)
    singles[:, 1], singles[:, 4] = 1, 2
    singles[:, 6] = 3
    singles = jnp.asarray(singles)
    from anncur_tpu.models.biencoder import to_bert_input as _tbi
    from anncur_tpu.models.pooling import entity_embed, mention_embed

    t2, sg2, mk2 = _tbi(singles)
    sq, _ = bert_encode(params["bert"], t2, sg2, mk2, SPEC, compute_dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(ce.embed_input(params, singles)),
        np.asarray(mention_embed(sq, t2)), atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(ce.embed_label(params, singles)),
        np.asarray(entity_embed(sq, t2)), atol=1e-5,
    )


def test_spl_tkns_biencoder_tag_only_matches_full():
    """spl_tkns bi-encoder towers with the tag-only final layer must be
    EXACT vs pooling over the full forward."""
    from anncur_tpu.models.bert import bert_encode
    from anncur_tpu.models.pooling import entity_embed, mention_embed

    enc = BiEncoder(
        spec=SPEC, pooling_type="spl_tkns", embed_dim=SPEC.hidden_size,
        compute_dtype=jnp.float32,
    )
    params = enc.init(jax.random.PRNGKey(6))
    rng = np.random.default_rng(6)
    toks = np.asarray(rng.integers(4, SPEC.vocab_size, (4, 24)), np.int32)
    toks[:, 2], toks[:, 5] = 1, 2
    toks[:, 3] = 3
    toks = jnp.asarray(toks)

    q = enc.encode_input(params, toks)
    l = enc.encode_label(params, toks)

    t2, seg, mask = to_bert_input(toks)
    sq_in, _ = bert_encode(params["input_bert"], t2, seg, mask, SPEC, compute_dtype=jnp.float32)
    sq_lb, _ = bert_encode(params["label_bert"], t2, seg, mask, SPEC, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(q), np.asarray(mention_embed(sq_in, t2)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(l), np.asarray(entity_embed(sq_lb, t2)), atol=1e-5)


def test_attention_dropout_active_when_hidden_dropout_zero(rng):
    """Attention dropout must not be gated on hidden_dropout (rng
    plumbing used to key off hidden_dropout alone, silently disabling
    attention dropout for hidden_dropout=0 specs)."""
    from anncur_tpu.models.bert import bert_encode, init_bert_params

    spec = BertSpec.tiny(hidden_dropout=0.0, attention_dropout=0.5)
    params = init_bert_params(jax.random.PRNGKey(0), spec)
    t = toks(rng, 2, 8)
    seg = jnp.zeros_like(t)
    mask = (t != 0).astype(jnp.int32)
    kw = dict(spec=spec, compute_dtype=jnp.float32)
    out_eval, _ = bert_encode(params, t, seg, mask, **kw)
    out_train, _ = bert_encode(
        params, t, seg, mask, dropout_rng=jax.random.PRNGKey(1), dropout=True, **kw
    )
    assert not np.allclose(np.asarray(out_eval), np.asarray(out_train)), (
        "attention_dropout=0.5 had no effect in train mode"
    )
    # and eval mode is unaffected by the rng
    out_eval2, _ = bert_encode(params, t, seg, mask, **kw)
    np.testing.assert_array_equal(np.asarray(out_eval), np.asarray(out_eval2))


def test_shared_biencoder_single_linear_head(rng):
    """bi_enc_type='shared' must have ONE projection head (reference
    shared encoder has a single additional_linear; two leaves would get
    separate gradients and diverge)."""
    enc = BiEncoder(spec=SPEC, bi_enc_type="shared", add_linear_layer=True,
                    embed_dim=16, compute_dtype=jnp.float32)
    params = enc.init(jax.random.PRNGKey(0))
    assert "linear" in params and "input_linear" not in params
    t = toks(rng, 3, 8)
    a = enc.encode_input(params, t)
    b = enc.encode_label(params, t)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_to_cross_bert_input_nonzero_null_idx():
    """segment ids must use the same null test as the mask: with a
    nonzero null_idx, a legitimate id-0 token in segment 1 used to get
    segment 0 while still being attended."""
    t = jnp.asarray([[5, 6, 0, 7, 9, 9]])  # null_idx=9 -> trailing pad
    tok, seg, mask = to_cross_bert_input(t, first_segment_end=2, null_idx=9)
    np.testing.assert_array_equal(np.asarray(mask), [[1, 1, 1, 1, 0, 0]])
    np.testing.assert_array_equal(np.asarray(seg), [[0, 0, 1, 1, 0, 0]])


def test_spec_from_hf_config_dropout_and_required():
    from anncur_tpu.models.hf_loader import spec_from_hf_config

    cfg = dict(vocab_size=100, hidden_size=32, num_hidden_layers=2,
               num_attention_heads=2, intermediate_size=64,
               hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.2)
    spec = spec_from_hf_config(cfg)
    assert spec.hidden_dropout == 0.0 and spec.attention_dropout == 0.2
    with pytest.raises(ValueError, match="missing"):
        spec_from_hf_config({"vocab_size": 100})
