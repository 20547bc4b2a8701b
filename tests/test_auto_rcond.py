"""Condition-aware pinv cutoff (rcond='auto'): the Gavish-Donoho noise
threshold must engage ONLY for genuinely ill-conditioned anchor
intersections (near-square: n_anchors ~ n_train), where the eps default
collapses recall — and must NOT truncate all-signal spectra, where
Gavish-Donoho's median noise estimate lands mid-signal."""

import numpy as np
import pytest

from anncur_tpu.core.metrics import topk_overlap_frac
from anncur_tpu.evalx.inductive import cur_project_test_scores
from anncur_tpu.ops.pinv import auto_rcond, noise_rcond


def make_world(rng, n_train, n_test, n_items, rank, noise):
    a = rng.standard_normal((n_train + n_test, rank)).astype(np.float32)
    b = rng.standard_normal((rank, n_items)).astype(np.float32)
    m = a @ b + noise * np.sqrt(rank) * rng.standard_normal(
        (n_train + n_test, n_items)
    ).astype(np.float32)
    return m[:n_train], m[n_train:]


def test_auto_rcond_regime_detection(rng):
    # all-signal spectrum (tall, rank == cols): moderate kappa -> None
    sig = rng.standard_normal((200, 40)).astype(np.float32)
    assert auto_rcond(sig) is None
    # noise-reaching spectrum (square low-rank + tiny noise): huge kappa
    # -> Gavish-Donoho threshold
    low = (
        rng.standard_normal((100, 10)) @ rng.standard_normal((10, 100))
        + 1e-4 * rng.standard_normal((100, 100))
    ).astype(np.float32)
    rc = auto_rcond(low)
    assert rc is not None and rc > 0
    assert rc == pytest.approx(noise_rcond(low))


def _recall(train, test, n_anc, rcond, rng, top_k=10):
    n_items = train.shape[1]
    anchors = np.asarray(sorted(rng.choice(n_items, n_anc, replace=False)))
    approx = np.asarray(
        cur_project_test_scores(train, test[:, anchors], anchors, rcond=rcond)
    )
    import jax.numpy as jnp

    # retrieve-then-rerank at depth 2*top_k, exact rerank
    cand = np.argsort(-approx, axis=1)[:, : 2 * top_k]
    rer = []
    for i in range(test.shape[0]):
        vals = test[i, cand[i]]
        rer.append(cand[i][np.argsort(-vals)[:top_k]])
    exact_top = np.argsort(-test, axis=1)[:, :top_k]
    return float(
        np.asarray(
            topk_overlap_frac(jnp.asarray(np.stack(rer)), jnp.asarray(exact_top))
        ).mean()
    )


def test_auto_fixes_square_intersection_without_hurting_all_signal():
    rng = np.random.default_rng(5)
    train, test = make_world(rng, n_train=100, n_test=32, n_items=600, rank=40, noise=0.05)

    # square case (n_anc == n_train): eps cutoff keeps noise-blown
    # directions; auto must repair it
    r_none_sq = _recall(train, test, 100, None, np.random.default_rng(0))
    r_auto_sq = _recall(train, test, 100, "auto", np.random.default_rng(0))
    assert r_auto_sq >= r_none_sq + 0.1, (r_none_sq, r_auto_sq)

    # all-signal case (n_anc < rank-ish): auto must not truncate
    r_none_sig = _recall(train, test, 30, None, np.random.default_rng(0))
    r_auto_sig = _recall(train, test, 30, "auto", np.random.default_rng(0))
    assert r_auto_sig >= r_none_sig - 0.02, (r_none_sig, r_auto_sig)


def test_eval_retrieval_cli_accepts_rcond_auto(tmp_path):
    """`--rcond auto` must parse and thread through to the transductive
    eval (not fall into the float() branch)."""
    import json
    import os

    from anncur_tpu.cli import eval_retrieval
    from anncur_tpu.indexer import save_score_matrix

    rng = np.random.default_rng(0)
    scores = (
        rng.standard_normal((24, 40)) @ np.eye(40)
    ).astype(np.float32)
    pkl = str(tmp_path / "sm.pkl")
    save_score_matrix(
        pkl,
        scores,
        mention_tokens_list=np.zeros((24, 4), np.int32),
        entity_id_list=np.arange(40),
    )
    res_dir = str(tmp_path / "res")
    eval_retrieval.main(
        ["--mode", "transductive", "--score_matrix", pkl, "--res_dir", res_dir,
         "--methods", "cur", "--n_seeds", "1",
         "--top_k_vals", "5", "--top_k_retvr_vals", "10",
         "--n_ment_anchors_vals", "8", "--n_ent_anchors_vals", "8",
         "--rcond", "auto"]
    )
    with open(os.path.join(res_dir, "retrieval_wrt_exact_crossenc.json")) as fin:
        assert "cur" in json.load(fin)
