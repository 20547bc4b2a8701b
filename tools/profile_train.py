"""Profile the CE TRAINING step (fwd+bwd+Adam) and attribute its time.

Motivation (round 3): the train step costs 6.6x the builder forward per
pair (2.14 ms vs 0.32 ms at bench shapes) where ~3x is the fwd+bwd FLOP
ratio — ~2x is unexplained. Capture a real-device hlo_stats trace of
one `Trainer.make_train_step()` step at the record config (bert-base,
255-tok pairs, batch 2x64) and roll up per-category / top-op self time.

Usage: python tools/profile_train.py [--trace-dir DIR] [--batch-ments N]
       [--negs N]

Reference counterpart of the workload: the PL training loop at
/root/reference/models/crossencoder.py + pairwise_trainer.py (forward,
loss, backward, AdamW); this tool is measurement-only.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("ANNCUR_ALLOW_CPU", "1")
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import numpy as np

from profile_build import _force, parse_trace_hlo_stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", default="/tmp/anncur_profile_train")
    ap.add_argument("--batch-ments", type=int, default=2)
    ap.add_argument("--negs", type=int, default=63)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--no-trace", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from anncur_tpu.config import Config
    from anncur_tpu.models.bert import BertSpec
    from anncur_tpu.models.crossencoder import CrossEncoder
    from anncur_tpu.parallel import make_mesh
    from anncur_tpu.train.trainer import Trainer

    mesh = make_mesh((len(jax.devices()),), ("data",))
    spec = BertSpec()
    ce = CrossEncoder(spec=spec, compute_dtype=jnp.bfloat16)
    cfg = Config(
        model_type="cross_enc",
        loss_type="ce",
        num_negs=args.negs,
        train_batch_size=args.batch_ments,
        grad_acc_steps=1,
        base_res_dir="/tmp/anncur_profile_train_res",
    )
    trainer = Trainer(cfg, ce, mesh=mesh, total_steps=100)
    state = trainer.init_state()
    step = trainer.make_train_step()

    rng = np.random.default_rng(0)
    lm = le = 128
    batch = {
        "pos_pairs": rng.integers(
            1, spec.vocab_size, size=(args.batch_ments, lm + le - 1)
        ).astype(np.int32),
        "neg_pairs": rng.integers(
            1, spec.vocab_size, size=(args.batch_ments, args.negs, lm + le - 1)
        ).astype(np.int32),
        "first_segment_end": lm,
    }
    sharded = trainer._shard_batch(batch)
    print(json.dumps({"stage": "init_done", "devices": str(jax.devices())}), flush=True)
    t0 = time.time()
    state, _ = step(state, sharded)
    _force(state.params)
    print(json.dumps({"stage": "compiled", "s": round(time.time() - t0, 1)}), flush=True)

    t0 = time.time()
    for _ in range(args.steps):
        state, m = step(state, sharded)
    _force(state.params)
    dt = (time.time() - t0) / args.steps
    pairs = args.batch_ments * (1 + args.negs)
    res = {
        "step_ms": round(dt * 1e3, 1),
        "pairs_per_s": round(pairs / dt, 1),
        "pairs_per_step": pairs,
    }
    print(json.dumps(res), flush=True)

    if not args.no_trace:
        print(json.dumps({"stage": "trace_start"}), flush=True)
        with jax.profiler.trace(args.trace_dir):
            state, m = step(state, sharded)
            _force(state.params)
        res["hlo_stats"] = parse_trace_hlo_stats(args.trace_dir, top_n=25)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
