"""CurRetriever end-to-end: build from synthetic corpus, query, verify
recall vs brute-force CE ranking."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from anncur_tpu.core.retriever import CurRetriever
from anncur_tpu.core.metrics import topk_overlap_frac
from anncur_tpu.data.synthetic import make_tokenized_world
from anncur_tpu.indexer.score_matrix import ScoreMatrixBuilder
from anncur_tpu.models.bert import BertSpec
from anncur_tpu.models.crossencoder import CrossEncoder


@pytest.fixture(scope="module")
def retriever_setup(mesh8):
    ment, ent, gt, tok = make_tokenized_world(
        seed=9, n_ents=40, n_ments=24, max_ment_len=16, max_ent_len=16
    )
    spec = BertSpec.tiny(vocab_size=tok.vocab_size, max_position_embeddings=64)
    ce = CrossEncoder(spec=spec, compute_dtype=jnp.float32)
    params = ce.init(jax.random.PRNGKey(0))
    builder = ScoreMatrixBuilder(ce, mesh8, ment_block=4, ent_block=8, pair_pad_multiple=32)
    # train queries = first 16 mentions; test = last 8
    retriever = CurRetriever.build(
        ce, params, tok, ment[:16], ent, n_anchor_items=12, builder=builder,
        max_query_len=16,
    )
    full_scores = builder(params, ment, ent)  # oracle for recall checks
    return retriever, ment, full_scores, builder


def test_query_batch_recall(retriever_setup):
    retriever, ment, full_scores, _ = retriever_setup
    test_toks = ment[16:]
    scores, idx = retriever.query_tokens_batch(test_toks, top_k=5, top_k_retvr=20)
    assert idx.shape == (8, 5)
    exact_top = np.argsort(-full_scores[16:], axis=1)[:, :5]
    overlap = float(np.asarray(topk_overlap_frac(jnp.asarray(idx), jnp.asarray(exact_top))).mean())
    # reranked results are exact CE scores over 20 retrieved of 40 items:
    # overlap must be high even with a random (non-low-rank) scorer
    assert overlap >= 0.5, overlap
    # reranked scores must equal the true CE scores at those items
    got = scores[0]
    want = full_scores[16 + 0][idx[0]]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_query_text_path(retriever_setup):
    retriever, *_ = retriever_setup
    res = retriever.query("alpha beta", context_left="gamma", top_k=3, top_k_retvr=10)
    assert len(res) == 3
    assert all(isinstance(i, int) and 0 <= i < 40 for i, _ in res)
    # scores descending
    assert res[0][1] >= res[1][1] >= res[2][1]


def test_no_rerank_path(retriever_setup):
    retriever, ment, _, _ = retriever_setup
    s, i = retriever.query_tokens_batch(ment[16:20], top_k=5, top_k_retvr=10, rerank=False)
    assert s.shape == (4, 5) and i.shape == (4, 5)


def test_build_with_precomputed_scores(retriever_setup, mesh8):
    retriever, ment, full_scores, builder = retriever_setup
    r2 = CurRetriever.build(
        retriever.encoder, retriever.params, retriever.tokenizer,
        ment[:16], retriever.item_tokens, n_anchor_items=12, builder=builder,
        train_scores=full_scores[:16], max_query_len=16,
    )
    np.testing.assert_array_equal(r2.anchor_item_ids, retriever.anchor_item_ids)
    assert r2.cost_per_query == 12


def test_query_adaptive(retriever_setup):
    retriever, ment, full_scores, builder = retriever_setup
    test_toks = ment[16:20]
    scores, ids = retriever.query_tokens_adaptive(
        test_toks, total_budget=24, n_rounds=3, top_k=5,
        train_scores=full_scores[:16],
    )
    assert scores.shape == (4, 5) and ids.shape == (4, 5)
    # returned scores are exact CE scores at those items
    for i in range(4):
        np.testing.assert_allclose(scores[i], full_scores[16 + i, ids[i]], rtol=1e-4, atol=1e-4)


def test_query_batch_mesh_sharded_matches_single(retriever_setup, mesh8):
    """Multi-chip serving: query batch sharded over the mesh data axis
    must return exactly the single-device results."""
    retriever, ment, _, _ = retriever_setup
    test_toks = ment[16:]
    s1, i1 = retriever.query_tokens_batch(test_toks, top_k=5, top_k_retvr=20)

    import dataclasses

    sharded = dataclasses.replace(retriever, mesh=mesh8)
    s2, i2 = sharded.query_tokens_batch(test_toks, top_k=5, top_k_retvr=20)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, atol=1e-5)
    # no-rerank path too
    s3, i3 = retriever.query_tokens_batch(test_toks, top_k=5, top_k_retvr=20, rerank=False)
    s4, i4 = sharded.query_tokens_batch(test_toks, top_k=5, top_k_retvr=20, rerank=False)
    np.testing.assert_array_equal(i3, i4)
    np.testing.assert_allclose(s3, s4, atol=1e-5)
