"""Precompute TF-IDF hard negatives per world -> JSON {indices, scores}
(parity with utils/compute_tfidf_hard_negs.py:24-92)."""

from __future__ import annotations

import argparse
import json
import logging
import os

import numpy as np

from anncur_tpu.data import load_entities, load_mentions
from anncur_tpu.data.tfidf import TfidfVectorizer

LOGGER = logging.getLogger("anncur_tpu.compute_tfidf_hard_negs")


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ment_file", required=True)
    p.add_argument("--ent_file", required=True)
    p.add_argument("--out_file", required=True)
    p.add_argument("--num_negs", type=int, default=100)
    args = p.parse_args(argv)

    kb2local, entities = load_entities(args.ent_file)
    mentions = load_mentions(args.ment_file, kb2local)
    corpus = [f"{t} {d}" for t, d in entities]
    vec = TfidfVectorizer().fit(corpus)
    ent_embeds = vec.transform(corpus)
    # reference embeds the FULL context string, not the bare surface form
    # (get_hard_negs_tfidf, utils/data_process.py:373-381): short surface
    # strings give near-degenerate tf-idf vectors and weak negatives
    ment_embeds = vec.transform(
        [" ".join([m["context_left"], m["mention"], m["context_right"]]) for m in mentions]
    )

    import jax.numpy as jnp

    from anncur_tpu.ops.mips import mips_topk

    k = min(args.num_negs + 1, len(entities))
    scores, idx = mips_topk(jnp.asarray(ment_embeds), jnp.asarray(ent_embeds), k)
    scores, idx = np.asarray(scores), np.asarray(idx)

    out = {"indices": [], "scores": []}
    for i, m in enumerate(mentions):
        keep = [(int(j), float(s)) for j, s in zip(idx[i], scores[i]) if j != m["label_id"]]
        keep = keep[: args.num_negs]
        out["indices"].append([j for j, _ in keep])
        out["scores"].append([s for _, s in keep])
    os.makedirs(os.path.dirname(args.out_file) or ".", exist_ok=True)
    with open(args.out_file, "w") as fout:
        json.dump(out, fout)
    LOGGER.info("wrote %s (%d mentions x %d negs)", args.out_file, len(mentions), args.num_negs)


if __name__ == "__main__":
    main()
