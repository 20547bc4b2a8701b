"""Sequence-packing/bucketing measurement (VERDICT r3 item 5).

CLAUDE.md deferred packing on the ASSUMPTION that ZeShEL reps are mostly
full-length. This tool measures it: synthesize entity corpora under
three length regimes (full-length, mixed, short — title+short-desc
entities exist in several ZeShEL worlds), report

1. the padding ratio (fraction of PAD tokens in the entity axis), and
2. the REAL pairs/s of the score-matrix builder (a) padded to le=128 vs
   (b) length-bucketed: entities grouped into le in {32, 64, 96, 128}
   buckets, one builder program per bucket (the step cache already keys
   on (lm, le, shard)), scores scattered back. Bucketing is exact —
   dropped positions are all PAD, which attention masks anyway.

Decision rule (VERDICT): implement bucketing as a first-class builder
mode if the measured win exceeds 10% on a realistic regime.

Usage: python tools/measure_packing.py [--quick] [--out PATH]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("ANNCUR_ALLOW_CPU", "1")

import numpy as np


def synth_lengths(regime: str, n: int, le: int, rng) -> np.ndarray:
    """True entity token lengths (incl. CLS/SEP) under a regime."""
    if regime == "full":
        return np.full(n, le, np.int32)
    if regime == "mixed":  # half full docs, half truncated short descs
        short = rng.integers(8, le, size=n)
        full = np.full(n, le)
        return np.where(rng.random(n) < 0.5, short, full).astype(np.int32)
    if regime == "short":  # title + one-sentence desc dominates
        short = rng.integers(8, le // 2, size=n)
        full = np.full(n, le)
        return np.where(rng.random(n) < 0.8, short, full).astype(np.int32)
    raise ValueError(regime)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "benchmarks", "packing_measurement.json",
        ),
    )
    args = ap.parse_args()

    import jax

    if args.quick:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from anncur_tpu.indexer import ScoreMatrixBuilder
    from anncur_tpu.models.bert import BertSpec
    from anncur_tpu.models.crossencoder import CrossEncoder
    from anncur_tpu.parallel import make_mesh

    if args.quick:
        spec = BertSpec.tiny(vocab_size=512)
        lm = le = 32
        n_ments, n_ents = 8, 256
        buckets = (8, 16, 24, 32)
        dtype = jnp.float32
        bk, pm = dict(ment_block=4, ent_block=8, pair_pad_multiple=16), 16
    else:
        spec = BertSpec()
        lm = le = 128
        n_ments, n_ents = 32, 2048
        buckets = (32, 64, 96, 128)
        dtype = jnp.bfloat16
        bk, pm = dict(ment_block=32, ent_block=64, pair_pad_multiple=32), 32

    rng = np.random.default_rng(0)
    mesh = make_mesh((len(jax.devices()),), ("data",))
    ce = CrossEncoder(spec=spec, compute_dtype=dtype)
    params = ce.init(jax.random.PRNGKey(0))
    ment_toks = rng.integers(1, spec.vocab_size, size=(n_ments, lm)).astype(np.int32)
    builder = ScoreMatrixBuilder(ce, mesh, **bk)

    out = {"regimes": {}, "buckets": list(buckets), "shape": {"n_ments": n_ments, "n_ents": n_ents, "le": le}}
    for regime in ("full", "mixed", "short"):
        lengths = synth_lengths(regime, n_ents, le, rng)
        ent_toks = np.zeros((n_ents, le), np.int32)
        for i, ln in enumerate(lengths):
            ent_toks[i, :ln] = rng.integers(1, spec.vocab_size, size=ln)
        pad_ratio = float(1.0 - lengths.sum() / (n_ents * le))

        # (a) baseline: everything padded to le
        builder(params, ment_toks[: bk["ment_block"]], ent_toks)  # compile
        t0 = time.time()
        base_scores = builder(params, ment_toks, ent_toks)
        base_dt = time.time() - t0

        # (b) bucketed: one program per le bucket, scatter columns back
        order = {}
        for i, ln in enumerate(lengths):
            b = min(bb for bb in buckets if bb >= ln)
            order.setdefault(b, []).append(i)
        # compile each bucket program first (bucketing must not be
        # charged for one-time compiles the padded path also pays once)
        for b, idxs in sorted(order.items()):
            builder(params, ment_toks[: bk["ment_block"]], ent_toks[idxs][:, :b])
        t0 = time.time()
        buck_scores = np.zeros((n_ments, n_ents), np.float32)
        for b, idxs in sorted(order.items()):
            sc = builder(params, ment_toks, ent_toks[idxs][:, :b])
            buck_scores[:, idxs] = sc
        buck_dt = time.time() - t0

        # exactness: dropped positions are PAD; the encoder masks them
        err = float(np.abs(base_scores - buck_scores).max())
        scale = float(np.abs(base_scores).std() + 1e-9)
        out["regimes"][regime] = {
            "padding_ratio": round(pad_ratio, 4),
            "bucket_sizes": {str(b): len(i) for b, i in sorted(order.items())},
            "padded_pairs_per_s": round(n_ments * n_ents / base_dt, 1),
            "bucketed_pairs_per_s": round(n_ments * n_ents / buck_dt, 1),
            "bucketed_speedup": round(base_dt / buck_dt, 3),
            "max_abs_err_over_std": round(err / scale, 5),
        }
        print(json.dumps({regime: out["regimes"][regime]}), flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
