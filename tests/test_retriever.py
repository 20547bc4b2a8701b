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


def test_builder_default_mesh_add_items(mesh8):
    """ScoreMatrixBuilder(mesh=None) defaults to an all-devices mesh —
    the serving-side add_items path constructs builders without carrying
    a mesh (round-5 regression: tools/bench_serving_latency.py passed
    None and the first on-chip add_then_query run crashed)."""
    ment, ent, gt, tok = make_tokenized_world(
        seed=12, n_ents=32, n_ments=8, max_ment_len=16, max_ent_len=16
    )
    spec = BertSpec.tiny(vocab_size=tok.vocab_size, max_position_embeddings=64)
    ce = CrossEncoder(spec=spec, compute_dtype=jnp.float32)
    params = ce.init(jax.random.PRNGKey(1))
    builder = ScoreMatrixBuilder(ce, None, ment_block=4, ent_block=8,
                                 pair_pad_multiple=32)
    assert builder.mesh is not None
    retr = CurRetriever.build(
        ce, params, tok, ment[:6], ent[:24], n_anchor_items=8,
        builder=builder, max_query_len=16, seed=3,
    )
    new_ids = retr.add_items(ent[24:], builder)
    assert list(new_ids) == list(range(24, 32))
    s, i = retr.query_tokens_batch(ment[:2], top_k=3, top_k_retvr=8)
    assert s.shape == (2, 3) and np.all(np.isfinite(s))


def test_add_items_equals_full_rebuild(mesh8):
    """Incremental add_items must give EXACTLY the index a full rebuild
    with the same anchors produces: U depends only on the anchor
    intersection, which new items never touch."""
    ment, ent, gt, tok = make_tokenized_world(
        seed=11, n_ents=48, n_ments=20, max_ment_len=16, max_ent_len=16
    )
    spec = BertSpec.tiny(vocab_size=tok.vocab_size, max_position_embeddings=64)
    ce = CrossEncoder(spec=spec, compute_dtype=jnp.float32)
    params = ce.init(jax.random.PRNGKey(1))
    builder = ScoreMatrixBuilder(ce, mesh8, ment_block=4, ent_block=8, pair_pad_multiple=32)

    n0 = 32  # initial corpus; 16 items arrive later
    retr = CurRetriever.build(
        ce, params, tok, ment[:12], ent[:n0], n_anchor_items=10,
        builder=builder, max_query_len=16, seed=3,
    )
    anchors = np.asarray(retr.anchor_item_ids)  # all < n0
    latent_before = np.asarray(retr.index.latent_cols).copy()
    u_before = np.asarray(retr.u, np.float64)
    new_ids = retr.add_items(ent[n0:], builder)
    assert list(new_ids) == list(range(n0, 48))
    assert retr.item_tokens.shape[0] == 48

    got_latent = np.asarray(retr.index.latent_cols)
    # original columns are untouched bit-for-bit
    np.testing.assert_array_equal(got_latent[:, :n0], latent_before)
    # new columns equal the f64 math U @ r_new exactly (same computation)
    full_scores = np.asarray(builder(params, ment[:12], ent))
    want_new = (u_before @ full_scores[:, n0:].astype(np.float64)).astype(np.float32)
    np.testing.assert_array_equal(got_latent[:, n0:], want_new)

    # and a full rebuild with the SAME anchors agrees up to the f32
    # cancellation bound of the (ill-conditioned, random-init-CE) U —
    # identical inputs, different f32 accumulation order (the f64
    # incremental path is the MORE accurate of the two)
    from anncur_tpu.core.cur import build_cur

    want = build_cur(
        rows=full_scores, cols=full_scores[:, anchors],
        row_idxs=np.arange(12), col_idxs=anchors,
        approx_preference="rows", validate=False,
    )
    np.testing.assert_allclose(
        got_latent, np.asarray(want.latent_cols), atol=2e-2,
    )

    # queries hit the new items when they are the true top scorers
    s, i = retr.query_tokens_batch(ment[12:], top_k=5, top_k_retvr=20)
    exact = full_scores_test = np.asarray(builder(params, ment[12:], ent))
    got = np.take_along_axis(exact, i, axis=1)
    np.testing.assert_allclose(s, got, rtol=1e-4, atol=1e-4)


def test_remove_items_preserves_ids_and_excludes_removed(mesh8):
    ment, ent, gt, tok = make_tokenized_world(
        seed=12, n_ents=40, n_ments=16, max_ment_len=16, max_ent_len=16
    )
    spec = BertSpec.tiny(vocab_size=tok.vocab_size, max_position_embeddings=64)
    ce = CrossEncoder(spec=spec, compute_dtype=jnp.float32)
    params = ce.init(jax.random.PRNGKey(2))
    builder = ScoreMatrixBuilder(ce, mesh8, ment_block=4, ent_block=8, pair_pad_multiple=32)
    retr = CurRetriever.build(
        ce, params, tok, ment[:10], ent, n_anchor_items=8,
        builder=builder, max_query_len=16, seed=5,
    )
    anchors_before = np.asarray(retr.anchor_item_ids).copy()
    anchor_toks_before = retr.item_tokens[anchors_before].copy()
    latent_before = np.asarray(retr.index.latent_cols).copy()
    ids_before = retr.item_ids.copy()

    # pick 6 non-anchor ids to remove
    non_anchor = [int(i) for i in ids_before if int(i) not in set(int(a) for a in anchors_before)]
    removed = non_anchor[:6]
    retr.remove_items(removed)

    assert retr.item_tokens.shape[0] == 34
    # anchor tokens still reachable at the REMAPPED positions
    np.testing.assert_array_equal(retr.item_tokens[retr.anchor_item_ids], anchor_toks_before)
    # latent columns of surviving items are untouched (just compacted)
    keep_pos = [p for p, e in enumerate(ids_before) if int(e) not in set(removed)]
    np.testing.assert_array_equal(np.asarray(retr.index.latent_cols), latent_before[:, keep_pos])

    s, i = retr.query_tokens_batch(ment[10:], top_k=5, top_k_retvr=15)
    assert not (set(np.asarray(i).ravel().tolist()) & set(removed)), "removed ids returned"
    # returned ids are stable external ids; their scores are the true CE
    # scores for those ORIGINAL items
    exact_all = np.asarray(builder(params, ment[10:], ent))  # original corpus
    got = np.take_along_axis(exact_all, i, axis=1)  # index by external id
    np.testing.assert_allclose(s, got, rtol=1e-4, atol=1e-4)

    # guards
    with pytest.raises(ValueError, match="anchor"):
        retr.remove_items([int(retr.item_ids[retr.anchor_item_ids[0]])])
    with pytest.raises(KeyError):
        retr.remove_items([removed[0]])  # already gone

    # duplicate ids collapse to ONE removed slot: the searchsorted-based
    # anchor shift counts positions, so a duplicated position used to
    # subtract 2 from every anchor past it (anchors then pointed at the
    # wrong items with no error)
    dup = non_anchor[6]
    n_removed = retr.remove_items([dup, dup, dup])
    assert n_removed == 1
    assert retr.item_tokens.shape[0] == 33
    np.testing.assert_array_equal(
        retr.item_tokens[retr.anchor_item_ids], anchor_toks_before
    )


def test_save_load_roundtrip_preserves_dynamic_state(tmp_path, mesh8):
    """A restarted process must serve identical results AND still be
    able to add/remove items (U + anchor-query tokens survive)."""
    ment, ent, gt, tok = make_tokenized_world(
        seed=13, n_ents=40, n_ments=16, max_ment_len=16, max_ent_len=16
    )
    spec = BertSpec.tiny(vocab_size=tok.vocab_size, max_position_embeddings=64)
    ce = CrossEncoder(spec=spec, compute_dtype=jnp.float32)
    params = ce.init(jax.random.PRNGKey(3))
    builder = ScoreMatrixBuilder(ce, mesh8, ment_block=4, ent_block=8, pair_pad_multiple=32)
    retr = CurRetriever.build(
        ce, params, tok, ment[:10], ent[:32], n_anchor_items=8,
        builder=builder, max_query_len=16, seed=7,
    )
    s0, i0 = retr.query_tokens_batch(ment[10:], top_k=5, top_k_retvr=15)

    path = str(tmp_path / "retr.pkl")
    retr.save(path)
    retr2 = CurRetriever.load(path, ce, params, tok)
    s1, i1 = retr2.query_tokens_batch(ment[10:], top_k=5, top_k_retvr=15)
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(s0, s1, rtol=1e-6)

    # dynamic ops still work after reload
    new_ids = retr2.add_items(ent[32:], builder)
    assert len(new_ids) == 8
    non_anchor = [int(i) for i in retr2.item_ids
                  if int(i) not in set(int(a) for a in retr2.anchor_item_ids)][:2]
    retr2.remove_items(non_anchor)
    s2, i2 = retr2.query_tokens_batch(ment[10:], top_k=5, top_k_retvr=15)
    assert not (set(np.asarray(i2).ravel().tolist()) & set(non_anchor))


def test_removed_max_id_is_never_reused(mesh8):
    """Removing the max-id item then adding a new one must NOT resurrect
    the removed id (stable-id contract); the counter also survives
    save/load."""
    ment, ent, gt, tok = make_tokenized_world(
        seed=15, n_ents=24, n_ments=12, max_ment_len=16, max_ent_len=16
    )
    spec = BertSpec.tiny(vocab_size=tok.vocab_size, max_position_embeddings=64)
    ce = CrossEncoder(spec=spec, compute_dtype=jnp.float32)
    params = ce.init(jax.random.PRNGKey(5))
    builder = ScoreMatrixBuilder(ce, mesh8, ment_block=4, ent_block=8, pair_pad_multiple=32)
    retr = CurRetriever.build(
        ce, params, tok, ment[:8], ent[:20], n_anchor_items=6,
        builder=builder, max_query_len=16, seed=9,
    )
    max_id = int(retr.item_ids.max())
    if max_id in set(int(a) for a in retr.anchor_item_ids):
        pytest.skip("max-id item happens to be an anchor with this seed")
    retr.remove_items([max_id])
    new_ids = retr.add_items(ent[20:22], builder)
    assert max_id not in set(new_ids.tolist())
    assert new_ids.min() > max_id


def test_retriever_rejects_cols_preference_index():
    """The fused query program computes anchor_scores @ latent_cols,
    which is U@R only under approx_preference='rows'; a 'cols' index
    must be rejected at construction, not silently mis-scored."""
    from anncur_tpu.core.cur import build_cur_from_matrix
    from anncur_tpu.models.tokenizer import WordPieceTokenizer, make_test_vocab

    rng = np.random.default_rng(0)
    mat = (rng.standard_normal((12, 6)) @ rng.standard_normal((6, 30))).astype(np.float32)
    idx = build_cur_from_matrix(
        mat, np.arange(8), np.arange(8), approx_preference="cols"
    )
    with pytest.raises(ValueError, match="approx_preference"):
        CurRetriever(
            encoder=None,
            params=None,
            tokenizer=WordPieceTokenizer(make_test_vocab()),
            item_tokens=np.zeros((30, 8), np.int32),
            index=idx,
            anchor_item_ids=np.arange(8),
        )


def test_dynamic_corpus_random_walk_matches_rebuild(mesh8):
    """Stateful fuzz of the dynamic-corpus path: a random interleaving
    of add_items / remove_items (duplicates included) must leave the
    retriever equivalent to a retriever built directly over the
    surviving corpus with the same anchors — queries return the same
    external ids with the true CE scores at every step."""
    ment, ent, gt, tok = make_tokenized_world(
        seed=21, n_ents=56, n_ments=14, max_ment_len=16, max_ent_len=16
    )
    spec = BertSpec.tiny(vocab_size=tok.vocab_size, max_position_embeddings=64)
    ce = CrossEncoder(spec=spec, compute_dtype=jnp.float32)
    params = ce.init(jax.random.PRNGKey(7))
    builder = ScoreMatrixBuilder(ce, mesh8, ment_block=4, ent_block=8, pair_pad_multiple=32)

    n0 = 32  # ids n0.. arrive dynamically
    retr = CurRetriever.build(
        ce, params, tok, ment[:8], ent[:n0], n_anchor_items=8,
        builder=builder, max_query_len=16, seed=11,
    )
    anchors_ext = set(int(retr.item_ids[p]) for p in retr.anchor_item_ids)
    # model state: external id -> row of `ent` (ids n0+ map in arrival order)
    live = {i: i for i in range(n0)}
    next_row = n0

    rng = np.random.default_rng(5)
    full_scores = np.asarray(builder(params, ment[8:], ent))  # oracle (all 56)
    for step in range(6):
        removable = [e for e in live if e not in anchors_ext]
        if step % 2 == 0 and next_row < ent.shape[0]:
            k = int(rng.integers(1, min(4, ent.shape[0] - next_row) + 1))
            new_ids = retr.add_items(ent[next_row : next_row + k], builder)
            for j, ext in enumerate(new_ids):
                live[int(ext)] = next_row + j
            next_row += k
        else:
            k = int(rng.integers(1, 4))
            picks = list(rng.choice(removable, size=min(k, len(removable)), replace=False))
            picks = picks + picks[:1]  # exercise duplicate collapse
            removed = retr.remove_items(np.asarray(picks, np.int64))
            assert removed == len(set(picks))
            for e in set(picks):
                live.pop(int(e))

        # invariant: corpus size and id mapping
        assert retr.item_tokens.shape[0] == len(live)
        assert set(int(i) for i in retr.item_ids) == set(live)
        # anchors still address their original tokens
        for p, ext in zip(retr.anchor_item_ids, (int(retr.item_ids[p]) for p in retr.anchor_item_ids)):
            np.testing.assert_array_equal(retr.item_tokens[p], ent[live[ext]])

        # queries: scores must be the TRUE CE scores of the returned items
        s, ids = retr.query_tokens_batch(ment[8:12], top_k=3, top_k_retvr=12)
        for qi in range(4):
            for rank in range(3):
                ext = int(ids[qi, rank])
                assert ext in live, f"returned dead id {ext}"
                np.testing.assert_allclose(
                    s[qi, rank], full_scores[qi, live[ext]], rtol=1e-4, atol=1e-4
                )
