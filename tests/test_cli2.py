"""CLI round 2: retrieve-rerank e2e, compile_results, config files."""

import json
import os

import numpy as np
import pytest

from anncur_tpu.data.synthetic import make_tokenizer, make_world, write_world_files


@pytest.fixture(scope="module")
def world_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("z2")
    rng = np.random.default_rng(8)
    mentions, entities = make_world(rng, n_ents=30, n_ments=16)
    files = write_world_files(str(root), mentions, entities)
    tok = make_tokenizer()
    vocab_path = str(root / "vocab.txt")
    tok.save_vocab(vocab_path)
    return {"root": str(root), "vocab": vocab_path, **files}


TINY = ["--hidden_size", "32", "--num_layers", "1", "--num_heads", "2",
        "--intermediate_size", "64", "--max_ment_len", "16", "--max_ent_len", "16"]


def test_retrieve_rerank_cli(world_dir, tmp_path):
    from anncur_tpu.cli import eval_retrieve_rerank

    res_dir = str(tmp_path / "rr")
    eval_retrieve_rerank.main(
        ["--ment_file", world_dir["ment_file"], "--ent_file", world_dir["ent_file"],
         "--vocab_file", world_dir["vocab"], "--res_dir", res_dir,
         "--top_k", "8", "--batch_size", "8"] + TINY
    )
    with open(os.path.join(res_dir, "res.json")) as fin:
        res = json.load(fin)
    assert "bienc" in res and "crossenc" in res
    assert "acc" in res["bienc"] and "mrr" in res["crossenc"]


def test_bienc_only_cli(world_dir, tmp_path):
    from anncur_tpu.cli import eval_retrieve_rerank

    res_dir = str(tmp_path / "bi")
    eval_retrieve_rerank.main(
        ["--ment_file", world_dir["ment_file"], "--ent_file", world_dir["ent_file"],
         "--vocab_file", world_dir["vocab"], "--res_dir", res_dir,
         "--bienc_only", "--top_k", "8"] + TINY
    )
    with open(os.path.join(res_dir, "res.json")) as fin:
        res = json.load(fin)
    assert "recall" in res


def test_compile_results_cli(tmp_path, low_rank_factory):
    from anncur_tpu.cli import compile_results
    from anncur_tpu.evalx.inductive import run_inductive_eval

    mat = low_rank_factory(n=60, m=50, rank=4)
    res_dir = str(tmp_path / "res")
    for method, kwargs in (
        ("cur", dict(train_scores=mat[:40])),
        ("bienc", dict(train_scores=None, bienc_scores=mat[40:] + 0.5)),
    ):
        run_inductive_eval(
            mat[40:], kwargs.pop("train_scores"), res_dir, method=method,
            top_k_vals=[10], top_k_retvr_vals=[10, 20], n_ent_anchors_vals=[8], **kwargs,
        )
    out_dir = str(tmp_path / "compiled")
    compile_results.main(["--res_dir", res_dir, "--out_dir", out_dir, "--top_k_vals", "10"])
    assert os.path.exists(os.path.join(out_dir, "combined.json"))
    assert os.path.exists(os.path.join(out_dir, "recall_vs_cost_k10.pdf"))
    assert os.path.exists(os.path.join(out_dir, "recall_vs_cost_cur_k10.csv"))


def test_shipped_configs_load():
    from anncur_tpu.config import Config

    for name in (
        "configs/el_zeshel_bi_enc.json",
        "configs/el_zeshel_cross_enc.json",
        "configs/ce_distill/zeshel_bi_enc_distill.json",
    ):
        cfg = Config.from_json(name)
        assert cfg.model_type in ("bi_enc", "cross_enc")
        assert cfg.max_input_len == 128
        assert "american_football" in cfg.trn_files or cfg.train_domains


def test_distill_train_cli(world_dir, tmp_path):
    """ent_link_ce distillation training from a teacher score pickle."""
    import numpy as np

    from anncur_tpu.cli import train as train_cli
    from anncur_tpu.indexer import save_score_matrix

    rng = np.random.default_rng(0)
    n_m, n_e, L = 20, 30, 16
    ment_toks = rng.integers(1, 90, (n_m, L)).astype(np.int32)
    ent_toks = rng.integers(1, 90, (n_e, L)).astype(np.int32)
    scores = rng.standard_normal((n_m, n_e)).astype(np.float32)
    pkl = str(tmp_path / "yugioh_train.pkl")
    save_score_matrix(pkl, scores, ment_toks, np.arange(n_e), ent_toks)
    npy = str(tmp_path / "yugioh_ents.npy")
    np.save(npy, ent_toks)

    cfg = {
        "model_type": "bi_enc", "data_type": "ent_link_ce",
        "loss_type": "ce", "pooling_type": "cls", "embed_dim": 64,
        "neg_strategy": "top_ce_match", "distill_n_labels": 4,
        "num_epochs": 1, "train_batch_size": 8, "grad_acc_steps": 1,
        "max_input_len": L, "max_label_len": L,
        "train_domains": ["yugioh"], "dev_domains": [],
        "ent_w_score_file_template": str(tmp_path / "{}_train.pkl"),
        "entity_token_file_template": str(tmp_path / "{}_ents.npy"),
        "base_res_dir": str(tmp_path / "res"),
        "bert_args": {"vocab_file": world_dir["vocab"]},
        "fast_dev_run": 2, "save_code": False, "use_bf16": False,
    }
    cfg_path = str(tmp_path / "distill.json")
    with open(cfg_path, "w") as fout:
        json.dump(cfg, fout)

    import anncur_tpu.cli.train as tmod
    from anncur_tpu.models.bert import BertSpec

    orig = tmod.build_model

    def tiny_build(cfg_obj, vocab_size):
        import jax.numpy as jnp

        from anncur_tpu.models.biencoder import BiEncoder

        return BiEncoder(
            spec=BertSpec.tiny(vocab_size=vocab_size, hidden_size=64, num_layers=1),
            pooling_type="cls", embed_dim=64, compute_dtype=jnp.float32,
        )

    tmod.build_model = tiny_build
    try:
        train_cli.main(["--config", cfg_path])
    finally:
        tmod.build_model = orig
    # metrics JSONL written by the tracker
    import glob

    metrics = glob.glob(str(tmp_path / "res" / "**" / "metrics.jsonl"), recursive=True)
    assert metrics, "tracker metrics not written"
    assert any("train_loss" in l for l in open(metrics[0]))


def test_reference_config_files_load_unchanged():
    """The reference repo's own JSON configs load into our Config (field
    names intentionally mirror utils/config.py:82-170)."""
    import os

    from anncur_tpu.config import Config

    ref = "/root/reference/config"
    if not os.path.isdir(ref):
        pytest.skip("reference not mounted")
    for name in ("el_zeshel_bi_enc.json", "el_zeshel_cross_enc.json",
                 "ce_distill/zeshel_bi_enc_distill.json"):
        cfg = Config.from_json(os.path.join(ref, name))
        assert cfg.model_type in ("bi_enc", "cross_enc")
        assert cfg.bert_model == "bert-base-uncased"
        assert cfg.num_epochs >= 1
        # list-form trn_files are handled by the train CLI
        if cfg.trn_files:
            v = next(iter(cfg.trn_files.values()))
            assert isinstance(v, (list, dict))


def test_chunked_topk_preds_combine_equals_monolithic(world_dir, tmp_path):
    """Run retrieve+rerank as two mention-range chunks, combine the
    topk-pred JSONs (reference combine_bi_plus_cross_eval_results,
    combine_chunked_computations.py:20-122), and compare against a
    monolithic run."""
    from anncur_tpu.cli import combine_chunks, eval_retrieve_rerank

    common = [
        "--ment_file", world_dir["ment_file"], "--ent_file", world_dir["ent_file"],
        "--vocab_file", world_dir["vocab"], "--top_k", "8", "--batch_size", "8",
    ] + TINY

    mono = str(tmp_path / "mono")
    eval_retrieve_rerank.main(common + ["--res_dir", mono])

    c0, c1 = str(tmp_path / "c0"), str(tmp_path / "c1")
    eval_retrieve_rerank.main(common + ["--res_dir", c0, "--ment_start", "0", "--n_ment", "9"])
    eval_retrieve_rerank.main(common + ["--res_dir", c1, "--ment_start", "9"])

    for fname in ["crossenc_topk_preds_w_bienc_retrvr.txt", "bienc_topk_preds.txt"]:
        out = str(tmp_path / ("combined_" + fname))
        combine_chunks.main(
            ["--mode", "topk_preds", "--out", out, "--expected_rows", "16",
             "--chunks", os.path.join(c0, fname), os.path.join(c1, fname)]
        )
        with open(out) as fin:
            combined = json.load(fin)
        with open(os.path.join(mono, fname)) as fin:
            monolithic = json.load(fin)
        assert combined["indices"] == monolithic["indices"]
        np.testing.assert_allclose(
            np.asarray(combined["scores"]), np.asarray(monolithic["scores"]), atol=1e-4
        )
    # existing output refuses to be clobbered without --overwrite
    with pytest.raises(FileExistsError):
        combine_chunks.main(
            ["--mode", "topk_preds", "--out", out,
             "--chunks", os.path.join(c0, fname), os.path.join(c1, fname)]
        )


def test_from_precomputed_preds_matches_live_eval(world_dir, tmp_path):
    """Re-scoring saved topk-pred JSONs (reference run_w_precomp_results,
    run_cross_encoder_w_binenc_retriever_zeshel.py:224-272) reproduces the
    live run's metrics without any model."""
    from anncur_tpu.cli import eval_retrieve_rerank

    res_dir = str(tmp_path / "rr")
    eval_retrieve_rerank.main(
        ["--ment_file", world_dir["ment_file"], "--ent_file", world_dir["ent_file"],
         "--vocab_file", world_dir["vocab"], "--res_dir", res_dir,
         "--top_k", "8", "--batch_size", "8"] + TINY
    )
    with open(os.path.join(res_dir, "res.json")) as fin:
        live = json.load(fin)
    os.remove(os.path.join(res_dir, "res.json"))
    eval_retrieve_rerank.main(["--res_dir", res_dir, "--from_precomputed"])
    with open(os.path.join(res_dir, "res.json")) as fin:
        rescored = json.load(fin)
    for method in ("bienc", "crossenc"):
        for metric, val in live[method].items():
            assert abs(float(rescored[method][metric]) - float(val)) < 1e-6, (method, metric)


def test_embed_fn_is_cached_across_calls():
    """jax.jit(bound method) builds a fresh wrapper per call (bound
    methods are new objects) — the jitted encode fn must be cached per
    (encoder, which) or every embed_tokenized call retraces the tower
    (measured 654 vs 3789 seqs/s on v5e)."""
    import jax.numpy as jnp

    from anncur_tpu.evalx.retrieve_rerank import _embed_fn
    from anncur_tpu.models.bert import BertSpec
    from anncur_tpu.models.biencoder import BiEncoder

    enc = BiEncoder(spec=BertSpec.tiny(), pooling_type="cls",
                    embed_dim=BertSpec.tiny().hidden_size, compute_dtype=jnp.float32)
    assert _embed_fn(enc, "label") is _embed_fn(enc, "label")
    assert _embed_fn(enc, "label") is not _embed_fn(enc, "input")
