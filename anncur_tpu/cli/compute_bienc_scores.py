"""Compute the dense bi-encoder score matrix for eval baselines.

Produces the {'scores': (n_m, n_e)} pickle consumed by eval_retrieval's
'bienc' method (the reference computes this inline per eval run,
run_retrieval_eval_wrt_exact_crossenc.py:270-283; a separate artifact
keeps eval runs cheap and reproducible).
"""

from __future__ import annotations

import argparse
import logging
import os
import pickle

import numpy as np

from anncur_tpu.evalx.rank_probe import bienc_score_matrix
from anncur_tpu.indexer import load_score_matrix
from anncur_tpu.models.bert import BertSpec
from anncur_tpu.models.biencoder import BiEncoder
from anncur_tpu.models.tokenizer import WordPieceTokenizer
from anncur_tpu.train.checkpoint import load_pytree

LOGGER = logging.getLogger("anncur_tpu.compute_bienc_scores")


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--score_matrix", required=True,
                   help="CE score-matrix pickle: provides mention tokens + entity ids")
    p.add_argument("--ent_tokens_file", required=True)
    p.add_argument("--vocab_file", required=True)
    p.add_argument("--bienc_ckpt", default="")
    p.add_argument("--pooling_type", default="cls_w_lin")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--out_file", required=True)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--hidden_size", type=int, default=768)
    p.add_argument("--num_layers", type=int, default=12)
    p.add_argument("--num_heads", type=int, default=12)
    p.add_argument("--intermediate_size", type=int, default=3072)
    args = p.parse_args(argv)

    import jax

    data = load_score_matrix(args.score_matrix)
    ment_toks = np.asarray(data["mention_tokens_list"], np.int32)
    ent_toks = np.load(args.ent_tokens_file).astype(np.int32)

    tokenizer = WordPieceTokenizer.from_vocab_file(args.vocab_file)
    spec = BertSpec(
        vocab_size=tokenizer.vocab_size,
        hidden_size=args.hidden_size,
        num_layers=args.num_layers,
        num_heads=args.num_heads,
        intermediate_size=args.intermediate_size,
    )
    bienc = BiEncoder(spec=spec, pooling_type=args.pooling_type, embed_dim=spec.hidden_size)
    if args.bienc_ckpt:
        tree, _ = load_pytree(args.bienc_ckpt)
        params = tree.get("params", tree)
    else:
        LOGGER.warning("no --bienc_ckpt: random bi-encoder")
        params = bienc.init(jax.random.PRNGKey(args.seed))

    from anncur_tpu.evalx.retrieve_rerank import embed_tokenized

    ment_embeds = embed_tokenized(bienc, params, ment_toks, args.batch_size, "input")
    ent_embeds = embed_tokenized(bienc, params, ent_toks, args.batch_size, "label")
    scores = bienc_score_matrix(ment_embeds, ent_embeds)

    os.makedirs(os.path.dirname(args.out_file) or ".", exist_ok=True)
    with open(args.out_file, "wb") as fout:
        pickle.dump({"scores": scores}, fout)
    LOGGER.info("wrote %s %s", args.out_file, scores.shape)


if __name__ == "__main__":
    main()
