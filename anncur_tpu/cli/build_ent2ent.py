"""Build the entity-to-anchor-entity CE score pickle for the
fixed-anchor-entity baselines (producer for the e2e files the reference
consumes, see indexer/ent2ent.py)."""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np

from anncur_tpu.indexer.ent2ent import (
    build_ent_to_ent_scores,
    kmeanspp_anchor_ids,
    save_ent_to_ent_pickle,
)
from anncur_tpu.indexer.score_matrix import ScoreMatrixBuilder
from anncur_tpu.models.bert import BertSpec
from anncur_tpu.models.crossencoder import CrossEncoder
from anncur_tpu.models.tokenizer import WordPieceTokenizer
from anncur_tpu.parallel import default_mesh
from anncur_tpu.train.checkpoint import load_pytree

LOGGER = logging.getLogger("anncur_tpu.build_ent2ent")


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ent_tokens_file", required=True)
    p.add_argument("--vocab_file", required=True)
    p.add_argument("--crossenc_ckpt", default="")
    p.add_argument("--ent_embeds_file", default="",
                   help="npy of bienc entity embeddings for anchor selection; "
                        "random selection if absent")
    p.add_argument("--n_anchors", type=int, default=100)
    p.add_argument("--out_file", required=True)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ment_block", type=int, default=8)
    p.add_argument("--ent_block", type=int, default=64)
    p.add_argument("--hidden_size", type=int, default=768)
    p.add_argument("--num_layers", type=int, default=12)
    p.add_argument("--num_heads", type=int, default=12)
    p.add_argument("--intermediate_size", type=int, default=3072)
    args = p.parse_args(argv)

    import jax

    ent_toks = np.load(args.ent_tokens_file).astype(np.int32)
    tokenizer = WordPieceTokenizer.from_vocab_file(args.vocab_file)
    if args.ent_embeds_file and os.path.exists(args.ent_embeds_file):
        embeds = np.load(args.ent_embeds_file).astype(np.float32)
        anchors = kmeanspp_anchor_ids(embeds, args.n_anchors, args.seed)
    else:
        rng = np.random.default_rng(args.seed)
        anchors = np.asarray(
            sorted(rng.choice(ent_toks.shape[0], size=args.n_anchors, replace=False))
        )

    spec = BertSpec(
        vocab_size=tokenizer.vocab_size,
        hidden_size=args.hidden_size,
        num_layers=args.num_layers,
        num_heads=args.num_heads,
        intermediate_size=args.intermediate_size,
    )
    ce = CrossEncoder(spec=spec)
    if args.crossenc_ckpt:
        tree, _ = load_pytree(args.crossenc_ckpt)
        params = tree.get("params", tree)
    else:
        LOGGER.warning("no --crossenc_ckpt: random cross-encoder")
        params = ce.init(jax.random.PRNGKey(args.seed))

    builder = ScoreMatrixBuilder(
        ce, default_mesh(), ment_block=args.ment_block, ent_block=args.ent_block
    )
    scores = build_ent_to_ent_scores(builder, params, ent_toks, anchors)
    save_ent_to_ent_pickle(args.out_file, scores, anchors)
    LOGGER.info("wrote %s %s", args.out_file, scores.shape)


if __name__ == "__main__":
    main()
