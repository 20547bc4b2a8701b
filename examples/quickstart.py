"""End-to-end quickstart on synthetic data — every stage of the engine
in one script (runs on CPU or TPU; small model so it finishes fast).

    python examples/quickstart.py

Stages: synthesize a world -> train a bi-encoder (in-batch negs) ->
train a cross-encoder -> offline exact CE score matrix (mesh-sharded)
-> CUR index -> online queries with rerank -> recall vs brute force.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("ANNCUR_ALLOW_CPU", "1")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from anncur_tpu.config import Config
    from anncur_tpu.core.metrics import topk_overlap_frac
    from anncur_tpu.core.retriever import CurRetriever
    from anncur_tpu.data.synthetic import make_tokenized_world
    from anncur_tpu.indexer import ScoreMatrixBuilder
    from anncur_tpu.models.bert import BertSpec
    from anncur_tpu.models.biencoder import BiEncoder
    from anncur_tpu.models.crossencoder import CrossEncoder
    from anncur_tpu.parallel import default_mesh
    from anncur_tpu.train.data import EntLinkDataset
    from anncur_tpu.train.trainer import Trainer

    print(f"devices: {jax.devices()}")
    mesh = default_mesh()

    # 1. data
    ment_toks, ent_toks, gt, tokenizer = make_tokenized_world(
        seed=0, n_ents=64, n_ments=48, max_ment_len=32, max_ent_len=32
    )
    data = EntLinkDataset(ment_toks, ent_toks, gt)
    spec = BertSpec.tiny(vocab_size=tokenizer.vocab_size, max_position_embeddings=128)
    print(f"world: {data.n_ments} mentions x {data.n_ents} entities")

    # 2. train a bi-encoder with in-batch negatives
    cfg = Config(
        model_type="bi_enc", loss_type="ce", neg_strategy="in_batch",
        num_epochs=2, train_batch_size=16, grad_acc_steps=1,
        learning_rate=5e-4, base_res_dir="/tmp/anncur_quickstart",
    )
    bienc = BiEncoder(spec=spec, pooling_type="cls", embed_dim=spec.hidden_size, compute_dtype=jnp.float32)
    trainer = Trainer(cfg, bienc, mesh=mesh, total_steps=12)
    t0 = time.time()
    trainer.train(data, dev_data=None)
    print(f"bi-encoder trained in {time.time() - t0:.1f}s")

    # 3. train the cross-encoder (the expensive scorer worth indexing).
    # NB a random-init CE would yield a rank-1-ish score matrix whose
    # ranking structure sits at the device matmul noise floor — recall
    # against it measures rounding, not the engine (see
    # CurRetriever.build's rcond docs for that regime).
    ce = CrossEncoder(spec=spec, compute_dtype=jnp.float32)
    ce_cfg = Config(
        model_type="cross_enc", loss_type="ce", neg_strategy="random",
        num_negs=4, num_epochs=40, train_batch_size=16, grad_acc_steps=1,
        learning_rate=1e-3, base_res_dir="/tmp/anncur_quickstart_ce",
    )
    ce_trainer = Trainer(ce_cfg, ce, mesh=mesh, total_steps=120)
    t0 = time.time()
    ce_state = ce_trainer.train(data, dev_data=None)
    ce_params = ce_state.params
    print(f"cross-encoder trained in {time.time() - t0:.1f}s")

    # 4. offline index: exact CE scores of train queries vs all items
    builder = ScoreMatrixBuilder(ce, mesh, ment_block=8, ent_block=8, pair_pad_multiple=64)
    retriever = CurRetriever.build(
        ce, ce_params, tokenizer,
        train_query_tokens=ment_toks[:32], item_tokens=ent_toks,
        n_anchor_items=16, builder=builder, max_query_len=32,
    )
    print(f"CUR index built: {len(retriever.anchor_item_ids)} anchor items, "
          f"latent {retriever.index.latent_cols.shape}")

    # 5. online queries (unseen mentions) + recall vs brute force
    test = ment_toks[32:]
    scores, idx = retriever.query_tokens_batch(test, top_k=5, top_k_retvr=24)
    exact = builder(ce_params, test, ent_toks)
    exact_top = np.argsort(-exact, axis=1)[:, :5]
    recall = float(np.asarray(topk_overlap_frac(jnp.asarray(idx), jnp.asarray(exact_top))).mean())
    print(f"top-5 recall vs exact CE ranking: {recall:.3f} "
          f"(cost {retriever.cost_per_query}+24 CE calls/query vs {data.n_ents} brute force)")

    # 6. single text query
    res = retriever.query("alpha beta", context_left="gamma", top_k=3)
    print(f"text query -> {res}")


if __name__ == "__main__":
    main()
