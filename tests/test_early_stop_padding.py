"""Per-query early stopping (adaptive engine) and item-axis padding
(corpus-edit recompile elimination) — VERDICT r3 items 1b and 3.

Early stop: queries whose top-k stabilized pay the base budget only;
unstable ones resume from their scored state and escalate. Padding:
every fused serving program pads the item axis to item_pad_multiple so
add/remove within a block reuses compiled programs (the round-3 cliff
was one /add -> full recompile of every program)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from anncur_tpu.core.adaptive_fused import (
    adaptive_recall_oracle,
    adaptive_recall_oracle_early_stop,
    adaptive_topk_oracle_early_stop,
    stable_topk_flag,
)
from anncur_tpu.core.metrics import topk_overlap_frac
from anncur_tpu.core.retriever import CurRetriever
from anncur_tpu.data.synthetic import make_tokenized_world
from anncur_tpu.indexer.score_matrix import ScoreMatrixBuilder
from anncur_tpu.models.bert import BertSpec
from anncur_tpu.models.crossencoder import CrossEncoder


def make_matrix(rng, n_q, n_train, n_items, rank, noise):
    a = rng.standard_normal((n_q + n_train, rank)).astype(np.float32)
    b = rng.standard_normal((rank, n_items)).astype(np.float32)
    m = a @ b + noise * rng.standard_normal((n_q + n_train, n_items)).astype(np.float32)
    return m[:n_q], m[n_q:]


# --------------------- early stop: oracle engine ---------------------- #


def test_stable_topk_flag_semantics():
    """Query 0's last round changed nothing in its top-2 set; query 1's
    last round introduced a new top-2 member."""
    # state after 2 rounds of 2: columns 0-1 = round 1, 2-3 = round 2
    ids = jnp.asarray([[0, 1, 2, 3], [10, 11, 12, 13]], jnp.int32)
    vals = jnp.asarray(
        [
            [9.0, 8.0, 1.0, 0.5],  # top-2 {0,1} before AND after round 2
            [2.0, 1.0, 9.0, 0.5],  # round 2 added id 12 -> top-2 changed
        ]
    )
    flag = np.asarray(stable_topk_flag(ids, vals, per=2, top_k=2))
    assert flag.tolist() == [True, False]
    # with only one round of history there is nothing to compare
    flag1 = np.asarray(stable_topk_flag(ids[:, :2], vals[:, :2], per=2, top_k=2))
    assert flag1.tolist() == [False, False]


def test_oracle_early_stop_budget_accounting_and_exactness(rng):
    full, train = make_matrix(rng, 16, 80, 300, rank=40, noise=0.1)
    r = adaptive_topk_oracle_early_stop(
        full, train, base_budget=40, base_rounds=3,
        escalate_budget=120, escalate_rounds=3, top_k=10, seed=0,
    )
    assert r["top_ids"].shape == (16, 10)
    # scores are EXACT full-matrix values at the returned ids
    for i in range(16):
        np.testing.assert_allclose(r["top_scores"][i], full[i, r["top_ids"][i]], rtol=1e-5)
    # avg budget between base and base+bucket-padded extra
    assert 40.0 <= r["avg_budget"] <= 120.0 + 80.0  # bucket padding can overshoot q
    assert 0.0 <= r["frac_escalated"] <= 1.0
    assert abs((1.0 - r["frac_escalated"]) - r["stable_frac"]) < 1e-9


def test_oracle_early_stop_beats_base_in_hard_regime(rng):
    """Escalation must add recall where the base budget is insufficient
    (the whole point of per-query early stopping)."""
    full, train = make_matrix(rng, 32, 100, 400, rank=60, noise=0.05)
    base = adaptive_recall_oracle(full, train, 40, n_rounds=3, top_k=10, seed=0)
    rec, avg_b, frac = adaptive_recall_oracle_early_stop(
        full, train, base_budget=40, base_rounds=3,
        escalate_budget=160, escalate_rounds=3, top_k=10, seed=0,
    )
    assert rec > base + 0.05, (rec, base)
    # and it must actually have escalated somebody to get there
    assert frac > 0.0
    assert avg_b > 40.0


def test_oracle_early_stop_saves_budget_in_easy_regime(rng):
    """On an easy (low-rank, low-noise) matrix most queries stabilize at
    the base budget: average cost stays well under the escalation
    ceiling while recall matches the always-escalate engine."""
    full, train = make_matrix(rng, 32, 80, 300, rank=8, noise=0.02)
    always = adaptive_recall_oracle(full, train, 160, n_rounds=3, top_k=10, seed=0)
    rec, avg_b, frac = adaptive_recall_oracle_early_stop(
        full, train, base_budget=60, base_rounds=3,
        escalate_budget=160, escalate_rounds=3, top_k=10, seed=0,
    )
    assert rec >= always - 0.02, (rec, always)
    assert avg_b < 160.0, avg_b  # did not pay the ceiling for everyone
    assert frac < 1.0


def test_oracle_early_stop_no_extra_is_plain_engine(rng):
    """escalate_budget <= base_budget degenerates to the plain engine."""
    full, train = make_matrix(rng, 8, 60, 200, rank=8, noise=0.05)
    r = adaptive_topk_oracle_early_stop(
        full, train, base_budget=60, base_rounds=3,
        escalate_budget=60, escalate_rounds=3, top_k=5, seed=0,
    )
    assert r["avg_budget"] == 60.0
    assert r["frac_escalated"] >= 0.0  # flag may fire but nobody escalates
    from anncur_tpu.core.adaptive_fused import adaptive_topk_oracle

    s, i, _ = adaptive_topk_oracle(full, train, 60, 3, 5, seed=0)
    np.testing.assert_array_equal(r["top_ids"], i)


# --------------------- item-axis padding ------------------------------ #


@pytest.fixture(scope="module")
def padded_setup(mesh8):
    ment, ent, gt, tok = make_tokenized_world(
        seed=11, n_ents=40, n_ments=24, max_ment_len=16, max_ent_len=16
    )
    spec = BertSpec.tiny(vocab_size=tok.vocab_size, max_position_embeddings=64)
    ce = CrossEncoder(spec=spec, compute_dtype=jnp.float32)
    params = ce.init(jax.random.PRNGKey(0))
    builder = ScoreMatrixBuilder(ce, mesh8, ment_block=4, ent_block=8, pair_pad_multiple=32)
    retriever = CurRetriever.build(
        ce, params, tok, ment[:16], ent, n_anchor_items=12, builder=builder,
        max_query_len=16,
    )
    retriever.item_pad_multiple = 16  # 40 items -> padded to 48
    full_scores = np.asarray(builder(params, ment, ent))
    return retriever, ment, ent, full_scores, builder


def test_padded_fixed_path_is_exact(padded_setup):
    """With top_k_retvr = all items the fixed path is exact retrieval;
    padding must not change a single id or score, and padded positions
    must never appear."""
    retriever, ment, ent, full_scores, _ = padded_setup
    assert retriever._padded_n_items() == 48
    s, i = retriever.query_tokens_batch(ment[16:20], top_k=5, top_k_retvr=40)
    exact_top = np.argsort(-full_scores[16:20], axis=1)[:, :5]
    assert np.all(i < 40)
    ov = float(np.asarray(topk_overlap_frac(jnp.asarray(i), jnp.asarray(exact_top))).mean())
    assert ov == 1.0
    for k in range(4):
        np.testing.assert_allclose(s[k], full_scores[16 + k, i[k]], rtol=1e-4, atol=1e-4)


def test_padded_no_rerank_never_returns_padding(padded_setup):
    retriever, ment, *_ = padded_setup
    s, i = retriever.query_tokens_batch(ment[16:20], top_k=10, top_k_retvr=20, rerank=False)
    assert np.all(i < 40)
    assert np.all(np.isfinite(s))


def test_add_items_within_block_reuses_programs(padded_setup):
    """THE round-3 cliff: an /add used to invalidate every compiled
    program. Within a pad block the same jitted callables (and their
    underlying compiled executables) must survive and stay correct."""
    retriever, ment, ent, full_scores, builder = padded_setup
    retriever.query_tokens_batch(ment[16:20], top_k=5, top_k_retvr=40)
    progs_before = dict(retriever._fused_cache)
    assert progs_before

    new_ids = retriever.add_items(ent[:4], builder)  # 40 -> 44 <= 48
    assert retriever._padded_n_items() == 48
    # compiled callables kept (same objects, same keys)
    assert retriever._fused_cache == progs_before
    # and the traced item shapes did not change -> no new executable
    s, i = retriever.query_tokens_batch(ment[16:20], top_k=5, top_k_retvr=44)
    # duplicated items (copies of ent[0..4]) must surface as ties: the
    # new external ids are retrievable
    all_ids = set(int(x) for x in i.ravel())
    assert all(int(x) >= 40 for x in new_ids)
    # exactness vs an oracle over the EXTENDED corpus
    ext = np.concatenate([ent, ent[:4]], axis=0)
    full_ext = np.asarray(builder(retriever.params, ment[16:20], ext))
    pos_of = {int(e): p for p, e in enumerate(retriever.item_ids)}
    for k in range(4):
        got_pos = [pos_of[int(e)] for e in i[k]]
        np.testing.assert_allclose(s[k], full_ext[k, got_pos], rtol=1e-4, atol=1e-4)
    assert all_ids  # silence lint; tie membership asserted via exactness


def test_remove_items_within_block_reuses_programs(padded_setup):
    retriever, ment, ent, full_scores, builder = padded_setup
    retriever.query_tokens_batch(ment[20:24], top_k=5, top_k_retvr=40)
    progs_before = dict(retriever._fused_cache)
    # remove one non-anchor item (added in the previous test or original)
    anchor = set(int(a) for a in retriever.anchor_item_ids)
    removable = [
        int(e)
        for p, e in enumerate(retriever.item_ids)
        if p not in anchor
    ]
    n_before = retriever.item_tokens.shape[0]
    assert retriever.remove_items([removable[0]]) == 1
    assert retriever.item_tokens.shape[0] == n_before - 1
    assert retriever._fused_cache == progs_before
    s, i = retriever.query_tokens_batch(ment[20:24], top_k=5, top_k_retvr=20)
    assert removable[0] not in set(int(x) for x in i.ravel())
    assert np.all(np.isfinite(s))


def test_add_items_across_block_boundary_recompiles_correctly(padded_setup):
    """Crossing the pad block changes traced shapes: jit recompiles on
    its own and results stay exact."""
    retriever, ment, ent, full_scores, builder = padded_setup
    n0 = retriever.item_tokens.shape[0]
    need = retriever._padded_n_items() - n0 + 1  # cross the boundary
    retriever.add_items(ent[4 : 4 + need], builder)
    assert retriever._padded_n_items() > 48
    s, i = retriever.query_tokens_batch(ment[16:18], top_k=5, top_k_retvr=30)
    ext_tokens = retriever.item_tokens
    full_ext = np.asarray(builder(retriever.params, ment[16:18], ext_tokens))
    pos_of = {int(e): p for p, e in enumerate(retriever.item_ids)}
    for k in range(2):
        got_pos = [pos_of[int(e)] for e in i[k]]
        np.testing.assert_allclose(s[k], full_ext[k, got_pos], rtol=1e-4, atol=1e-4)


@pytest.fixture(scope="module")
def padded_adaptive_setup(mesh8):
    """Separate fixture: the padding tests above mutate the corpus."""
    ment, ent, gt, tok = make_tokenized_world(
        seed=13, n_ents=40, n_ments=24, max_ment_len=16, max_ent_len=16
    )
    spec = BertSpec.tiny(vocab_size=tok.vocab_size, max_position_embeddings=64)
    ce = CrossEncoder(spec=spec, compute_dtype=jnp.float32)
    params = ce.init(jax.random.PRNGKey(0))
    builder = ScoreMatrixBuilder(ce, mesh8, ment_block=4, ent_block=8, pair_pad_multiple=32)
    retriever = CurRetriever.build(
        ce, params, tok, ment[:16], ent, n_anchor_items=12, builder=builder,
        max_query_len=16,
    )
    retriever.item_pad_multiple = 16
    full_scores = np.asarray(builder(params, ment, ent))
    return retriever, ment, full_scores


def test_padded_adaptive_exact_scores(padded_adaptive_setup):
    retriever, ment, full_scores = padded_adaptive_setup
    s, i = retriever.query_tokens_adaptive_fused(
        ment[16:20], total_budget=24, n_rounds=3, top_k=5,
        train_scores=full_scores[:16],
    )
    assert np.all(np.asarray([list(map(int, row)) for row in i]) < 40)
    for k in range(4):
        np.testing.assert_allclose(s[k], full_scores[16 + k, i[k]], rtol=1e-4, atol=1e-4)


def test_padded_adaptive_axn_exact_scores(padded_adaptive_setup):
    retriever, ment, full_scores = padded_adaptive_setup
    s, i = retriever.query_tokens_adaptive_fused(
        ment[16:20], total_budget=24, n_rounds=3, top_k=5,
        train_scores=full_scores[:16], method="axn", axn_rank=8,
    )
    for k in range(4):
        np.testing.assert_allclose(s[k], full_scores[16 + k, i[k]], rtol=1e-4, atol=1e-4)


# --------------------- early stop: serving mode ----------------------- #


def test_retriever_early_stop_exact_and_stats(padded_adaptive_setup):
    retriever, ment, full_scores = padded_adaptive_setup
    s, i, stats = retriever.query_tokens_adaptive_fused(
        ment[16:24], total_budget=12, n_rounds=3, top_k=5,
        train_scores=full_scores[:16],
        escalate_budget=28, escalate_rounds=2, return_stats=True,
    )
    assert s.shape == (8, 5)
    for k in range(8):
        np.testing.assert_allclose(s[k], full_scores[16 + k, i[k]], rtol=1e-4, atol=1e-4)
    assert 12.0 <= stats["avg_budget"] <= 12.0 + 16.0 * 2  # bucket-padded
    assert 0.0 <= stats["frac_escalated"] <= 1.0
    # recall with escalation >= base-only recall (same seed)
    s0, i0 = retriever.query_tokens_adaptive_fused(
        ment[16:24], total_budget=12, n_rounds=3, top_k=5,
        train_scores=full_scores[:16],
    )
    exact_top = np.argsort(-full_scores[16:24], axis=1)[:, :5]
    rec_es = float(np.asarray(topk_overlap_frac(jnp.asarray(i), jnp.asarray(exact_top))).mean())
    rec_base = float(np.asarray(topk_overlap_frac(jnp.asarray(i0), jnp.asarray(exact_top))).mean())
    assert rec_es >= rec_base - 1e-9, (rec_es, rec_base)


def test_retriever_early_stop_none_escalated_matches_plain(padded_adaptive_setup):
    """A generous base budget stabilizes everyone: results must equal
    the plain engine's bit for bit and avg_budget stays at base."""
    retriever, ment, full_scores = padded_adaptive_setup
    kw = dict(
        total_budget=32, n_rounds=4, top_k=5, train_scores=full_scores[:16]
    )
    s_es, i_es, stats = retriever.query_tokens_adaptive_fused(
        ment[16:20], escalate_budget=36, return_stats=True, **kw
    )
    s0, i0 = retriever.query_tokens_adaptive_fused(ment[16:20], **kw)
    if stats["frac_escalated"] == 0.0:
        np.testing.assert_array_equal(i_es, i0)
        assert stats["avg_budget"] == 32.0
    else:
        # escalation may still fire on tiny corpora; exactness holds
        for k in range(4):
            np.testing.assert_allclose(
                s_es[k], full_scores[16 + k, i_es[k]], rtol=1e-4, atol=1e-4
            )
