"""Training entry point.

Parity with reference models/train.py:22-68:
``python -m anncur_tpu.cli.train --config cfg.json [--any_config_field v]``
— creates result dir, snapshots config + command line, dispatches to the
Trainer for bi-/cross-encoder training.
"""

from __future__ import annotations

import json
import logging
import os
import shutil
import sys
import time

import jax.numpy as jnp

from anncur_tpu.config import Config
from anncur_tpu.data import load_entities, load_mentions, tokenize_entities, tokenize_mentions
from anncur_tpu.models.bert import BertSpec
from anncur_tpu.models.biencoder import BiEncoder
from anncur_tpu.models.crossencoder import CrossEncoder
from anncur_tpu.models.tokenizer import WordPieceTokenizer
from anncur_tpu.parallel import default_mesh
from anncur_tpu.train.data import EntLinkDataset
from anncur_tpu.train.trainer import Trainer

LOGGER = logging.getLogger("anncur_tpu.train")


def save_code_snapshot(result_dir: str) -> None:
    """Snapshot the package source into result_dir/code
    (reference: utils/basic_utils.py:8-16)."""
    src = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dst = os.path.join(result_dir, "code", "anncur_tpu")
    if os.path.exists(dst):
        shutil.rmtree(dst)
    shutil.copytree(src, dst, ignore=shutil.ignore_patterns("__pycache__"))
    with open(os.path.join(result_dir, "command.txt"), "w") as fout:
        fout.write(" ".join(sys.argv) + "\n")


def load_world_dataset(cfg: Config, files, tokenizer: WordPieceTokenizer) -> EntLinkDataset:
    if isinstance(files, (list, tuple)):
        # reference config format: [ment_file, ent_file, ent_tokens_file]
        # (config/el_zeshel_bi_enc.json)
        files = dict(zip(("ment_file", "ent_file", "ent_tokens_file"), files))
    kb2local, entities = load_entities(files["ent_file"])
    mentions = load_mentions(files["ment_file"], kb2local)
    if cfg.debug_w_small_data:
        mentions = mentions[:100]
    ment_toks = tokenize_mentions(mentions, tokenizer, cfg.max_input_len)
    import numpy as np

    if files.get("ent_tokens_file") and os.path.exists(files["ent_tokens_file"]):
        ent_toks = np.load(files["ent_tokens_file"]).astype(np.int32)
    else:
        ent_toks = tokenize_entities(entities, tokenizer, cfg.max_label_len)
    return EntLinkDataset(
        mention_tokens=ment_toks,
        entity_tokens=ent_toks,
        gt_labels=np.asarray([m["label_id"] for m in mentions], np.int32),
        mention_texts=[m["mention"] for m in mentions],
        entities=entities,
    )


def load_distill_dataset(cfg: Config, domain: str, score_template: str) -> EntLinkDataset:
    """Dataset from a precomputed teacher score-matrix pickle: mention
    tokens + teacher scores come from the pickle; entity tokens from the
    token-file template."""
    import numpy as np

    from anncur_tpu.indexer import load_score_matrix

    data = load_score_matrix(score_template.format(domain))
    ent_toks = np.load(cfg.entity_token_file_template.format(domain)).astype(np.int32)
    scores = np.asarray(data["ment_to_ent_scores"], np.float32)
    return EntLinkDataset(
        mention_tokens=np.asarray(data["mention_tokens_list"], np.int32),
        entity_tokens=ent_toks,
        gt_labels=np.argmax(scores, axis=1).astype(np.int64),
        score_matrix=scores,
    )


def build_model(cfg: Config, vocab_size: int):
    spec = BertSpec(vocab_size=vocab_size)
    dtype = jnp.bfloat16 if cfg.use_bf16 else jnp.float32
    if cfg.model_type == "bi_enc":
        return BiEncoder(
            spec=spec,
            pooling_type=cfg.pooling_type or "cls_w_lin",
            bi_enc_type=cfg.bi_enc_type,
            embed_dim=cfg.embed_dim,
            add_linear_layer=cfg.add_linear_layer,
            compute_dtype=dtype,
            remat=cfg.use_remat,
        )
    if cfg.model_type == "cross_enc":
        return CrossEncoder(
            spec=spec,
            cross_enc_type=cfg.cross_enc_type,
            pooling_type=cfg.pooling_type or "cls_w_lin",
            compute_dtype=dtype,
            remat=cfg.use_remat,
        )
    raise ValueError(f"model_type={cfg.model_type!r}")


def main(arg_list=None):
    arg_list = list(sys.argv[1:] if arg_list is None else arg_list)
    logging.basicConfig(level=logging.INFO)
    config_file = None
    if "--config" in arg_list:
        i = arg_list.index("--config")
        config_file = arg_list[i + 1]
        del arg_list[i : i + 2]
    cfg = Config.from_json(config_file) if config_file else Config()
    cfg.update_config_from_arg_list(arg_list)
    cfg.seed_host_rngs()

    os.makedirs(cfg.result_dir, exist_ok=True)
    cfg.save_config(cfg.result_dir, "orig_config.json")
    if cfg.save_code:
        save_code_snapshot(cfg.result_dir)

    vocab_path = cfg.bert_args.get("vocab_file") if cfg.bert_args else None
    if not vocab_path or not os.path.exists(vocab_path):
        raise FileNotFoundError(
            "config.bert_args.vocab_file must point to a WordPiece vocab.txt"
        )
    tokenizer = WordPieceTokenizer.from_vocab_file(vocab_path, do_lower_case=cfg.lowercase)

    from anncur_tpu.train.data import merge_worlds

    if cfg.data_type == "ent_link_ce":
        # distillation datasets from precomputed CE score-matrix pickles
        # (reference: get_ent_link_ce_dataset, utils/data_process.py:706-868;
        # config/ce_distill/zeshel_bi_enc_distill.json)
        train_sets = [
            load_distill_dataset(cfg, d, cfg.train_ent_w_score_file_template or cfg.ent_w_score_file_template)
            for d in cfg.train_domains
        ]
        dev_sets = [
            load_distill_dataset(cfg, d, cfg.dev_ent_w_score_file_template or cfg.ent_w_score_file_template)
            for d in cfg.dev_domains
        ]
    else:
        train_sets = [
            load_world_dataset(cfg, files, tokenizer) for files in cfg.trn_files.values()
        ]
        dev_sets = [
            load_world_dataset(cfg, files, tokenizer) for files in cfg.dev_files.values()
        ]
    train_data = merge_worlds(train_sets)
    dev_data = merge_worlds(dev_sets) if dev_sets else None

    steps_per_epoch = max(1, train_data.n_ments // max(1, cfg.train_batch_size))
    model = build_model(cfg, tokenizer.vocab_size)
    from anncur_tpu.utils import ExperimentTracker

    tracker = ExperimentTracker(cfg.result_dir, config=cfg.to_dict())
    trainer = Trainer(
        cfg,
        model,
        mesh=default_mesh(),
        total_steps=steps_per_epoch * cfg.num_epochs,
        tracker=tracker,
    )

    t0 = time.time()
    trainer.train(train_data, dev_data=dev_data, resume=bool(cfg.ckpt_path))
    tracker.finish()
    LOGGER.info("training done in %.1fs; results in %s", time.time() - t0, cfg.result_dir)


if __name__ == "__main__":
    main()
