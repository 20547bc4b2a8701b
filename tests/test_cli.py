"""End-to-end CLI pipeline on a synthetic world: tokenize -> score-matrix
build -> split -> transductive + inductive eval -> aggregate. Exercises
every entry point through its argparse main (the reference's L6-L9 flow,
SURVEY §1)."""

import json
import os
import pickle

import numpy as np
import pytest

from anncur_tpu.data.synthetic import make_tokenizer, make_world, write_world_files


@pytest.fixture(scope="module")
def world_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("zeshel")
    rng = np.random.default_rng(5)
    mentions, entities = make_world(rng, n_ents=40, n_ments=24)
    files = write_world_files(str(root), mentions, entities)
    tok = make_tokenizer()
    vocab_path = str(root / "vocab.txt")
    tok.save_vocab(vocab_path)
    return {"root": str(root), "vocab": vocab_path, **files}


def test_full_cli_pipeline(world_dir, tmp_path):
    from anncur_tpu.cli import (
        avg_results,
        build_score_matrix,
        eval_retrieval,
        split_matrix,
        tokenize_entities,
    )

    res = str(tmp_path)

    # 1. tokenize entities
    ent_npy = os.path.join(res, "ents.npy")
    tokenize_entities.main(
        ["--ent_file", world_dir["ent_file"], "--vocab_file", world_dir["vocab"],
         "--out_file", ent_npy, "--max_len", "16"]
    )
    assert np.load(ent_npy).shape == (40, 16)

    # 2. build score matrix (random CE weights; chunked: 2 shards)
    sm_dir = os.path.join(res, "scores")
    for start, count in ((0, 12), (12, 12)):
        build_score_matrix.main(
            ["--ment_file", world_dir["ment_file"], "--ent_file", world_dir["ent_file"],
             "--ent_tokens_file", ent_npy, "--vocab_file", world_dir["vocab"],
             "--res_dir", os.path.join(sm_dir, f"part{start}"),
             "--n_ment_start", str(start), "--n_ment", str(count),
             "--max_ment_len", "16", "--max_ent_len", "16",
             "--ment_block", "4", "--ent_block", "8",
             "--hidden_size", "32", "--num_layers", "1", "--num_heads", "2", "--intermediate_size", "64"]
        )
    # chunk jobs embed their start offset in the filename (equal-size
    # chunks sharing one --res_dir used to overwrite each other)
    p1 = os.path.join(sm_dir, "part0", "ment_to_ent_scores_n_m_12_n_e_40_all_layers_False.pkl")
    p2 = os.path.join(sm_dir, "part12", "ment_to_ent_scores_n_m_12_n_e_40_all_layers_False_start_12.pkl")
    assert os.path.exists(p1) and os.path.exists(p2)

    # 3. combine chunks
    from anncur_tpu.cli import combine_chunks

    full_pkl = os.path.join(sm_dir, "full.pkl")
    combine_chunks.main(["--chunks", p1, p2, "--out", full_pkl])
    with open(full_pkl, "rb") as fin:
        assert pickle.load(fin)["ment_to_ent_scores"].shape == (24, 40)

    # chunked == monolithic (the reference's chunk-vs-monolithic oracle)
    build_score_matrix.main(
        ["--ment_file", world_dir["ment_file"], "--ent_file", world_dir["ent_file"],
         "--ent_tokens_file", ent_npy, "--vocab_file", world_dir["vocab"],
         "--res_dir", os.path.join(sm_dir, "mono"),
         "--max_ment_len", "16", "--max_ent_len", "16",
         "--ment_block", "4", "--ent_block", "8",
             "--hidden_size", "32", "--num_layers", "1", "--num_heads", "2", "--intermediate_size", "64"]
    )
    mono = os.path.join(sm_dir, "mono", "ment_to_ent_scores_n_m_24_n_e_40_all_layers_False.pkl")
    with open(mono, "rb") as f1, open(full_pkl, "rb") as f2:
        np.testing.assert_allclose(
            pickle.load(f1)["ment_to_ent_scores"], pickle.load(f2)["ment_to_ent_scores"],
            atol=1e-5,
        )

    # 4. split into train/test
    splits_dir = os.path.join(res, "splits")
    split_matrix.main(
        ["--score_matrix", mono, "--out_dir", splits_dir, "--nm_train_vals", "16"]
    )
    split_d = os.path.join(splits_dir, "nm_train=16_split=0")
    assert os.path.exists(os.path.join(split_d, "train.pkl"))

    # 5a. transductive eval
    trans_dir = os.path.join(res, "trans")
    eval_retrieval.main(
        ["--mode", "transductive", "--score_matrix", mono, "--res_dir", trans_dir,
         "--methods", "cur", "cur_oracle", "--n_seeds", "1",
         "--top_k_vals", "5", "--top_k_retvr_vals", "10",
         "--n_ment_anchors_vals", "8", "--n_ent_anchors_vals", "8"]
    )
    with open(os.path.join(trans_dir, "retrieval_wrt_exact_crossenc.json")) as fin:
        tres = json.load(fin)
    assert "cur" in tres and "cur_oracle" in tres

    # 5b. inductive eval on the split
    ind_dir = os.path.join(res, "ind")
    eval_retrieval.main(
        ["--mode", "inductive",
         "--score_matrix", os.path.join(split_d, "test.pkl"),
         "--train_score_matrix", os.path.join(split_d, "train.pkl"),
         "--res_dir", ind_dir, "--methods", "cur",
         "--top_k_vals", "1", "10", "--top_k_retvr_vals", "10",
         "--n_ent_anchors_vals", "8"]
    )
    res_json = os.path.join(ind_dir, "method=cur_s=0", "res.json")
    assert os.path.exists(res_json)

    # 6. aggregate (reuse the single world as two pseudo-domains)
    import shutil

    dom_dir = os.path.join(res, "domains")
    for d in ("yugioh", "lego"):
        os.makedirs(os.path.join(dom_dir, d), exist_ok=True)
        shutil.copy(res_json, os.path.join(dom_dir, d, "res.json"))
    avg_out = os.path.join(res, "avg.json")
    avg_results.main(
        ["--res_glob", os.path.join(dom_dir, "*", "res.json"), "--out", avg_out,
         "--metric_key", "top_k=10.k_retvr=10.anc_n_e=8"]
    )
    with open(avg_out) as fin:
        avg = json.load(fin)
    assert "macro" in avg["avg"] and "micro" in avg["avg"]


def test_train_cli_smoke(world_dir, tmp_path):
    from anncur_tpu.cli import train as train_cli

    cfg = {
        "model_type": "bi_enc",
        "loss_type": "ce",
        "pooling_type": "cls",
        "embed_dim": 64,
        "num_epochs": 1,
        "train_batch_size": 8,
        "grad_acc_steps": 1,
        "num_negs": 2,
        "neg_strategy": "random",
        "max_input_len": 16,
        "max_label_len": 16,
        "base_res_dir": str(tmp_path),
        "bert_args": {"vocab_file": world_dir["vocab"]},
        "trn_files": {"synthville": {"ment_file": world_dir["ment_file"], "ent_file": world_dir["ent_file"]}},
        "dev_files": {},
        "fast_dev_run": 2,
        "save_code": False,
        "use_bf16": False,
    }
    cfg_path = str(tmp_path / "cfg.json")
    with open(cfg_path, "w") as fout:
        json.dump(cfg, fout)

    # tiny spec override happens via monkeypatching BertSpec default? No:
    # train CLI builds full bert-base by default — too slow for tests.
    # Use env-free path: patch build_model's spec via config embed_dim is
    # not enough, so exercise arg parsing + data loading + 2 fast steps
    # with a tiny spec by patching BertSpec.
    import anncur_tpu.cli.train as tmod
    from anncur_tpu.models.bert import BertSpec

    orig = tmod.build_model

    def tiny_build(cfg_obj, vocab_size):
        import jax.numpy as jnp

        from anncur_tpu.models.biencoder import BiEncoder

        return BiEncoder(
            spec=BertSpec.tiny(vocab_size=vocab_size, hidden_size=64, num_layers=1),
            pooling_type="cls",
            embed_dim=64,
            compute_dtype=jnp.float32,
        )

    tmod.build_model = tiny_build
    try:
        train_cli.main(["--config", cfg_path])
    finally:
        tmod.build_model = orig
    out_dirs = os.listdir(str(tmp_path))
    assert any(d.startswith("d=") for d in out_dirs)
