"""Training-step throughput micro-benchmark (real TPU).

Measures the SPMD train step (fwd+bwd+AdamW) for the two model types at
the reference's training shapes (SURVEY §3.1: bi-enc 128-tok seqs,
cross-enc 256-tok pairs with 1 pos + num_negs negatives per mention;
models/pairwise_trainer.py hot loop). Prints one JSON line per config.

Usage:  python -u tools/bench_training.py [bi|cross|both] [--negs N]
        [--batch B] [--remat false|true|attn]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_cross(batch_ments: int, num_negs: int, remat: bool, steps: int = 8):
    import jax
    import jax.numpy as jnp

    from anncur_tpu.config import Config
    from anncur_tpu.models.bert import BertSpec
    from anncur_tpu.models.crossencoder import CrossEncoder
    from anncur_tpu.parallel import make_mesh
    from anncur_tpu.train.trainer import Trainer

    mesh = make_mesh((len(jax.devices()),), ("data",))
    spec = BertSpec()
    ce = CrossEncoder(spec=spec, cross_enc_type="default", compute_dtype=jnp.bfloat16, remat=remat)
    cfg = Config(
        model_type="cross_enc",
        loss_type="ce",
        num_negs=num_negs,
        train_batch_size=batch_ments,
        grad_acc_steps=1,
        base_res_dir="/tmp/anncur_bench_train",
    )
    trainer = Trainer(cfg, ce, mesh=mesh, total_steps=100)
    state = trainer.init_state()
    step = trainer.make_train_step()

    rng = np.random.default_rng(0)
    lm = le = 128
    n_pairs_per_ment = 1 + num_negs
    batch = {
        "pos_pairs": rng.integers(1, spec.vocab_size, size=(batch_ments, lm + le - 1)).astype(np.int32),
        "neg_pairs": rng.integers(1, spec.vocab_size, size=(batch_ments, num_negs, lm + le - 1)).astype(np.int32),
        "first_segment_end": lm,
    }
    sharded = trainer._shard_batch(batch)
    state, _ = step(state, sharded)  # compile
    jax.block_until_ready(state.params)
    t0 = time.time()
    for _ in range(steps):
        sharded = trainer._shard_batch(batch)
        state, m = step(state, sharded)
    jax.block_until_ready(state.params)
    dt = (time.time() - t0) / steps
    pairs = batch_ments * n_pairs_per_ment
    print(json.dumps({
        "metric": "crossenc_train_throughput",
        "pairs_per_step": pairs,
        "batch_ments": batch_ments,
        "num_negs": num_negs,
        "remat": remat,
        "step_ms": round(dt * 1e3, 1),
        "pairs_per_s": round(pairs / dt, 1),
    }), flush=True)


def bench_bi(batch: int, num_negs: int, remat: bool, steps: int = 8, in_batch: bool = False):
    import jax
    import jax.numpy as jnp

    from anncur_tpu.config import Config
    from anncur_tpu.models.bert import BertSpec
    from anncur_tpu.models.biencoder import BiEncoder
    from anncur_tpu.parallel import make_mesh
    from anncur_tpu.train.trainer import Trainer

    mesh = make_mesh((len(jax.devices()),), ("data",))
    spec = BertSpec()
    enc = BiEncoder(
        spec=spec, pooling_type="cls", embed_dim=spec.hidden_size,
        compute_dtype=jnp.bfloat16, remat=remat,
    )
    cfg = Config(
        model_type="bi_enc",
        loss_type="ce",
        num_negs=num_negs,
        train_batch_size=batch,
        grad_acc_steps=1,
        base_res_dir="/tmp/anncur_bench_train",
    )
    trainer = Trainer(cfg, enc, mesh=mesh, total_steps=100)
    state = trainer.init_state()
    step = trainer.make_train_step()

    rng = np.random.default_rng(0)
    L = 128
    b = {
        "input": rng.integers(1, spec.vocab_size, size=(batch, L)).astype(np.int32),
        "pos": rng.integers(1, spec.vocab_size, size=(batch, L)).astype(np.int32),
    }
    if not in_batch:
        b["negs"] = rng.integers(1, spec.vocab_size, size=(batch, num_negs, L)).astype(np.int32)
    sharded = trainer._shard_batch(b)
    state, _ = step(state, sharded)
    jax.block_until_ready(state.params)
    t0 = time.time()
    for _ in range(steps):
        sharded = trainer._shard_batch(b)
        state, m = step(state, sharded)
    jax.block_until_ready(state.params)
    dt = (time.time() - t0) / steps
    n_seqs = batch * (2 if in_batch else 2 + num_negs)
    print(json.dumps({
        "metric": "bienc_train_throughput",
        "batch_ments": batch,
        "num_negs": 0 if in_batch else num_negs,
        "in_batch": in_batch,
        "remat": remat,
        "step_ms": round(dt * 1e3, 1),
        "mentions_per_s": round(batch / dt, 1),
        "seqs_per_s": round(n_seqs / dt, 1),
    }), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("which", nargs="?", default="both", choices=["bi", "cross", "both"])
    ap.add_argument("--negs", type=int, default=63)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--bi_negs", type=int, default=8)
    ap.add_argument("--bi_batch", type=int, default=64)
    ap.add_argument("--remat", default="false", choices=["false", "true", "attn"],
                help="false | true (full per-layer) | attn (selective: only O(s^2) tensors recomputed)")
    ap.add_argument("--in_batch", action="store_true")
    args = ap.parse_args()
    remat = {"false": False, "true": True, "attn": "attn"}[args.remat]
    if args.which in ("cross", "both"):
        bench_cross(args.batch, args.negs, remat)
    if args.which in ("bi", "both"):
        bench_bi(args.bi_batch, args.bi_negs, remat, in_batch=args.in_batch)
