"""Offline index build CLI: exact CE score matrix for one world.

Parity with eval/run_cross_encoder_for_ment_ent_matrix_zeshel.py:284-400
including mention-range chunking (--n_ment_start/--n_ment) for multi-job
sharding and the pickled output schema; computation is the mesh-sharded
ScoreMatrixBuilder instead of a host-side pair loop.
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np

from anncur_tpu.data import load_entities, load_mentions, tokenize_entities, tokenize_mentions
from anncur_tpu.indexer import ScoreMatrixBuilder, save_score_matrix
from anncur_tpu.models.bert import BertSpec
from anncur_tpu.models.crossencoder import CrossEncoder
from anncur_tpu.models.tokenizer import WordPieceTokenizer
from anncur_tpu.parallel import default_mesh
from anncur_tpu.train.checkpoint import load_pytree

LOGGER = logging.getLogger("anncur_tpu.build_score_matrix")


def _chunk_suffix(args) -> str:
    """Disambiguate equal-size chunk jobs sharing one --res_dir: without
    the start offset in the name, job (start=0, n=1000) and job
    (start=1000, n=1000) wrote the SAME pickle and the slower one
    silently destroyed the faster one's scores (the reference's {misc}
    suffix plays this role; we add it automatically for chunk jobs)."""
    suffix = args.misc
    if args.n_ment_start > 0 and "start" not in suffix:
        suffix += f"_start_{args.n_ment_start}"
    return suffix


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ment_file", required=True)
    p.add_argument("--ent_file", required=True)
    p.add_argument("--ent_tokens_file", default="")
    p.add_argument("--vocab_file", required=True)
    p.add_argument("--ckpt_path", default="", help="trained cross-encoder checkpoint")
    p.add_argument("--cross_enc_type", default="default", choices=["default", "w_embeds"])
    p.add_argument("--res_dir", required=True)
    p.add_argument("--n_ment_start", type=int, default=0)
    p.add_argument("--n_ment", type=int, default=-1, help="-1 = all")
    p.add_argument("--max_ment_len", type=int, default=128)
    p.add_argument("--max_ent_len", type=int, default=128)
    p.add_argument("--ment_block", type=int, default=8)
    p.add_argument("--ent_block", type=int, default=64)
    p.add_argument("--mode", default="scores", choices=["scores", "embeds"])
    p.add_argument("--misc", default="", help="output filename suffix (reference {misc})")
    p.add_argument("--seed", type=int, default=0)
    # architecture overrides (default: bert-base); small values for smoke runs
    p.add_argument("--hidden_size", type=int, default=768)
    p.add_argument("--num_layers", type=int, default=12)
    p.add_argument("--num_heads", type=int, default=12)
    p.add_argument("--intermediate_size", type=int, default=3072)
    args = p.parse_args(argv)

    tokenizer = WordPieceTokenizer.from_vocab_file(args.vocab_file)
    kb2local, entities = load_entities(args.ent_file)
    mentions = load_mentions(args.ment_file, kb2local)

    end = len(mentions) if args.n_ment < 0 else min(args.n_ment_start + args.n_ment, len(mentions))
    mentions = mentions[args.n_ment_start : end]
    LOGGER.info("scoring mentions [%d, %d) x %d entities", args.n_ment_start, end, len(entities))

    ment_toks = tokenize_mentions(mentions, tokenizer, args.max_ment_len)
    if args.ent_tokens_file and os.path.exists(args.ent_tokens_file):
        ent_toks = np.load(args.ent_tokens_file).astype(np.int32)
    else:
        ent_toks = tokenize_entities(entities, tokenizer, args.max_ent_len)

    import jax

    from anncur_tpu.parallel.mesh import require_accelerator

    require_accelerator()

    spec = BertSpec(
        vocab_size=tokenizer.vocab_size,
        hidden_size=args.hidden_size,
        num_layers=args.num_layers,
        num_heads=args.num_heads,
        intermediate_size=args.intermediate_size,
    )
    ce = CrossEncoder(spec=spec, cross_enc_type=args.cross_enc_type)
    if args.ckpt_path:
        tree, _ = load_pytree(args.ckpt_path)
        params = tree["params"] if "params" in tree else tree
    else:
        LOGGER.warning("no --ckpt_path: using randomly initialized cross-encoder")
        params = ce.init(jax.random.PRNGKey(args.seed))

    mesh = default_mesh()
    builder = ScoreMatrixBuilder(ce, mesh, ment_block=args.ment_block, ent_block=args.ent_block)

    os.makedirs(args.res_dir, exist_ok=True)
    if args.mode == "embeds":
        m_emb, e_emb = builder.paired_embeds(params, ment_toks, ent_toks)
        out = os.path.join(
            args.res_dir,
            f"ment_and_ent_embeds_n_m_{len(mentions)}_n_e_{len(entities)}"
            f"_all_layers_False{_chunk_suffix(args)}.pkl",
        )
        import pickle

        with open(out, "wb") as fout:
            pickle.dump({"ment_embeds": m_emb, "ent_embeds": e_emb}, fout)
        LOGGER.info("wrote %s", out)
        return

    chunk_dir = os.path.join(args.res_dir, f"chunks_start_{args.n_ment_start}")
    scores = builder(
        params,
        ment_toks,
        ent_toks,
        chunk_dir=chunk_dir,
        progress_cb=lambda f: LOGGER.info("progress %.2f", f),
    )
    out = os.path.join(
        args.res_dir,
        f"ment_to_ent_scores_n_m_{len(mentions)}_n_e_{len(entities)}"
        f"_all_layers_False{_chunk_suffix(args)}.pkl",
    )
    save_score_matrix(
        out,
        ment_to_ent_scores=scores,
        mention_tokens_list=ment_toks,
        entity_id_list=np.arange(len(entities)),
        entity_tokens_list=ent_toks,
        test_data=mentions,
        arg_dict=vars(args),
    )
    LOGGER.info("wrote %s", out)


if __name__ == "__main__":
    main()
