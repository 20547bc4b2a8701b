"""Sharded score-matrix builder: must equal the naive pair-by-pair CE
scoring (chunked-vs-monolithic oracle, SURVEY §4d), with checkpoint
chunks that recombine exactly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from anncur_tpu.data.synthetic import make_tokenized_world
from anncur_tpu.indexer import (
    ScoreMatrixBuilder,
    combine_chunks,
    load_score_matrix,
    save_score_matrix,
)
from anncur_tpu.indexer.combine import combine_pickles
from anncur_tpu.indexer.score_matrix import build_pairs
from anncur_tpu.models.bert import BertSpec
from anncur_tpu.models.crossencoder import CrossEncoder


@pytest.fixture(scope="module")
def world():
    return make_tokenized_world(seed=1, n_ents=50, n_ments=12, max_ment_len=16, max_ent_len=16)


@pytest.fixture(scope="module")
def ce_and_params(world):
    _, _, _, tokenizer = world
    spec = BertSpec.tiny(vocab_size=tokenizer.vocab_size, max_position_embeddings=64)
    ce = CrossEncoder(spec=spec, cross_enc_type="default", compute_dtype=jnp.float32)
    params = ce.init(jax.random.PRNGKey(0))
    return ce, params


def naive_scores(ce, params, ment_toks, ent_toks):
    """Reference-style: score each (mention, entity) pair one batch per
    mention row."""
    n_m, lm = ment_toks.shape
    out = []
    for i in range(n_m):
        pairs = build_pairs(jnp.asarray(ment_toks[i : i + 1]), jnp.asarray(ent_toks), lm + ent_toks.shape[1] - 1)
        out.append(np.asarray(ce.score(params, pairs, first_segment_end=lm)))
    return np.stack(out)


def test_build_pairs_semantics():
    m = jnp.asarray([[101, 5, 6, 0]])
    e = jnp.asarray([[101, 7, 8, 102], [101, 9, 0, 0]])
    pairs = build_pairs(m, e, 8)
    np.testing.assert_array_equal(
        np.asarray(pairs),
        [[101, 5, 6, 0, 7, 8, 102, 0], [101, 5, 6, 0, 9, 0, 0, 0]],
    )


def test_sharded_matches_naive(mesh8, world, ce_and_params):
    ment_toks, ent_toks, _, _ = world
    ce, params = ce_and_params
    builder = ScoreMatrixBuilder(ce, mesh8, ment_block=4, ent_block=8, pair_pad_multiple=32)
    got = builder(params, ment_toks, ent_toks)
    want = naive_scores(ce, params, ment_toks, ent_toks)
    assert got.shape == want.shape == (12, 50)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_chunk_checkpoint_resume(mesh8, world, ce_and_params, tmp_path):
    ment_toks, ent_toks, _, _ = world
    ce, params = ce_and_params
    builder = ScoreMatrixBuilder(ce, mesh8, ment_block=4, ent_block=8, pair_pad_multiple=32)
    d = str(tmp_path / "chunks")
    full = builder(params, ment_toks, ent_toks, chunk_dir=d, chunk_rows=4)
    combined = combine_chunks(d, n_ments=ment_toks.shape[0])
    np.testing.assert_allclose(combined, full, atol=1e-6)
    # resume: rerun with same chunk dir loads (smoke: results identical)
    again = builder(params, ment_toks, ent_toks, chunk_dir=d, chunk_rows=4)
    np.testing.assert_allclose(again, full, atol=1e-6)


def test_pickle_roundtrip_and_combine(tmp_path, world):
    ment_toks, ent_toks, _, _ = world
    scores = np.arange(12 * 50, dtype=np.float32).reshape(12, 50)
    p1 = str(tmp_path / "a.pkl")
    p2 = str(tmp_path / "b.pkl")
    save_score_matrix(p1, scores[:7], ment_toks[:7], np.arange(50), ent_toks)
    save_score_matrix(p2, scores[7:], ment_toks[7:], np.arange(50), ent_toks)
    out = str(tmp_path / "full.pkl")
    combine_pickles([p1, p2], out)
    data = load_score_matrix(out)
    np.testing.assert_allclose(data["ment_to_ent_scores"], scores)
    np.testing.assert_array_equal(data["mention_tokens_list"], ment_toks)
    # mismatched entity lists must fail
    p3 = str(tmp_path / "c.pkl")
    save_score_matrix(p3, scores[7:], ment_toks[7:], np.arange(1, 51), ent_toks)
    with pytest.raises(ValueError):
        combine_pickles([p1, p3], str(tmp_path / "bad.pkl"), overwrite=True)


def test_paired_embeds_mode(mesh8, world, ce_and_params):
    ment_toks, ent_toks, _, tokenizer = world
    spec = BertSpec.tiny(vocab_size=tokenizer.vocab_size, max_position_embeddings=64)
    ce = CrossEncoder(spec=spec, cross_enc_type="w_embeds", compute_dtype=jnp.float32)
    params = ce.init(jax.random.PRNGKey(1))
    builder = ScoreMatrixBuilder(ce, mesh8, pair_pad_multiple=32)
    m_emb, e_emb = builder.paired_embeds(params, ment_toks[:3], ent_toks[:5])
    assert m_emb.shape == (3, 5, spec.hidden_size)
    assert e_emb.shape == (3, 5, spec.hidden_size)
    # dot of embeds == w_embeds scores
    full_builder = ScoreMatrixBuilder(ce, mesh8, ment_block=3, ent_block=8, pair_pad_multiple=32)
    scores = full_builder(params, ment_toks[:3], ent_toks[:5])
    np.testing.assert_allclose(np.sum(m_emb * e_emb, -1), scores, atol=2e-3, rtol=1e-3)


def test_chunk_dir_lock(tmp_path):
    import os

    from anncur_tpu.indexer.score_matrix import ChunkDirLock

    d = str(tmp_path / "chunks")
    lock = ChunkDirLock(d)
    # a second live writer fails loudly
    with pytest.raises(RuntimeError, match="live pid"):
        ChunkDirLock(d)
    lock.release()
    # stale lock (dead pid) is stolen
    with open(os.path.join(d, ".lock"), "w") as fout:
        fout.write("999999999")
    lock2 = ChunkDirLock(d)
    lock2.release()

    # steal serialization: while another stealer holds the steal mutex,
    # _steal_stale must NOT remove the lock (TOCTOU guard — a slow
    # second stealer used to delete the fast one's freshly-taken LIVE
    # lock and both writers "owned" the dir)
    lockfile = os.path.join(d, ".lock")
    with open(lockfile, "w") as fout:
        fout.write("999999999")
    mutex = lockfile + ".steal"
    with open(mutex, "w") as fout:
        fout.write("1")  # a concurrent stealer mid-steal
    holder = ChunkDirLock.__new__(ChunkDirLock)
    holder.path = lockfile
    holder._steal_stale(999999999)
    assert os.path.exists(lockfile), "stole through a held steal mutex"
    os.remove(mutex)
    # and a lock that changed hands to a LIVE owner since the dead read
    # is left alone even once the mutex is free
    with open(lockfile, "w") as fout:
        fout.write(str(os.getpid()))
    holder._steal_stale(999999999)
    assert os.path.exists(lockfile), "removed a live lock after re-check"
    os.remove(lockfile)


def test_load_reference_style_pickle_with_torch_tensors(tmp_path):
    """The reference pickles torch tensors (run_cross_encoder_for_ment_
    ent_matrix_zeshel.py:230-240); load_score_matrix must read them."""
    torch = pytest.importorskip("torch")
    import pickle

    path = str(tmp_path / "ref.pkl")
    with open(path, "wb") as fout:
        pickle.dump(
            {
                "ment_to_ent_scores": torch.arange(12, dtype=torch.float32).reshape(3, 4),
                "test_data": [{"mention": "x"}],
                "mention_tokens_list": torch.ones(3, 8, dtype=torch.long),
                "entity_id_list": torch.arange(4),
                "entity_tokens_list": None,
                "arg_dict": {},
            },
            fout,
        )
    data = load_score_matrix(path)
    assert data["ment_to_ent_scores"].shape == (3, 4)
    np.testing.assert_allclose(np.asarray(data["ment_to_ent_scores"]).ravel(), np.arange(12))
    assert np.asarray(data["mention_tokens_list"]).shape == (3, 8)


def test_preemption_mid_build_resume(mesh8, world, ce_and_params, tmp_path):
    """Fault injection: crash mid-build (simulated preemption), verify
    the lock releases, chunks survive, and a resume completes with
    identical results (the reference has no such test - SURVEY §5.3)."""
    import os

    ment_toks, ent_toks, _, _ = world
    ce, params = ce_and_params
    builder = ScoreMatrixBuilder(ce, mesh8, ment_block=4, ent_block=8, pair_pad_multiple=32)
    d = str(tmp_path / "chunks")

    class Boom(Exception):
        pass

    calls = []

    def crash_after_first_chunk(frac):
        calls.append(frac)
        if len(calls) == 2:
            raise Boom()

    with pytest.raises(Boom):
        builder(params, ment_toks, ent_toks, chunk_dir=d, chunk_rows=4,
                progress_cb=crash_after_first_chunk)
    assert not os.path.exists(os.path.join(d, ".lock")), "lock leaked after crash"
    assert any(f.startswith("chunk_") for f in os.listdir(d)), "no chunk survived"

    # resume completes and equals a fresh full build
    resumed = builder(params, ment_toks, ent_toks, chunk_dir=d, chunk_rows=4)
    fresh = builder(params, ment_toks, ent_toks)
    np.testing.assert_allclose(resumed, fresh, atol=1e-6)


def test_resume_accepts_block_aligned_chunks(tmp_path, mesh8):
    """Flush boundaries are ment_block-aligned (first bm multiple >=
    chunk_rows); resume must load ALL such chunks, not only those at
    chunk_rows multiples — the old `i % chunk_rows == 0` check silently
    recomputed everything after the first chunk when bm did not divide
    chunk_rows."""
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    from anncur_tpu.data.synthetic import make_tokenized_world
    from anncur_tpu.indexer import ScoreMatrixBuilder
    from anncur_tpu.models.bert import BertSpec
    from anncur_tpu.models.crossencoder import CrossEncoder

    ment, ent, gt, tok = make_tokenized_world(seed=21, n_ents=16, n_ments=14,
                                              max_ment_len=12, max_ent_len=12)
    spec = BertSpec.tiny(vocab_size=tok.vocab_size, max_position_embeddings=64)
    ce = CrossEncoder(spec=spec, compute_dtype=jnp.float32)
    params = ce.init(jax.random.PRNGKey(0))
    # bm=3 does NOT divide chunk_rows=4: boundaries land at 6, 12, 14
    builder = ScoreMatrixBuilder(ce, mesh8, ment_block=3, ent_block=8, pair_pad_multiple=32)
    cd = str(tmp_path / "chunks")
    first = builder(params, ment, ent, chunk_dir=cd, chunk_rows=4)
    files = sorted(f for f in os.listdir(cd) if f.startswith("chunk_"))
    assert len(files) >= 2, files
    mtimes = {f: os.path.getmtime(os.path.join(cd, f)) for f in files}

    second = builder(params, ment, ent, chunk_dir=cd, chunk_rows=4)
    np.testing.assert_allclose(np.asarray(first), np.asarray(second), rtol=1e-6)
    files2 = sorted(f for f in os.listdir(cd) if f.startswith("chunk_"))
    assert files2 == files, "resume rewrote/created chunk files instead of loading them"
    for f in files:
        assert os.path.getmtime(os.path.join(cd, f)) == mtimes[f], f"{f} was rewritten"
