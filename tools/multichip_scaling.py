"""Multi-chip serving scaling on the virtual device mesh (VERDICT r3
item 5).

The shard_map fused query path (core/retriever.py) is correctness-tested
on the 8-virtual-device CPU mesh but had no scaling data. Real multi-chip
hardware is unavailable (one v5e behind the axon tunnel), so this tool
measures what a single-host virtual mesh CAN honestly measure:

THIS HOST HAS ONE CPU CORE (nproc=1). Per-device compute on a virtual
mesh timeslices that core, so total throughput CANNOT increase with
device count — ideal behavior is a FLAT total-q/s curve, and any drop
below flat is genuine sharding overhead (per-shard dispatch, replication
of items/index to every virtual device, shard_map partitioning). That
overhead ratio is exactly what transfers to real multi-chip ICI meshes;
the per-chip compute does not (each real chip has its own MXU).

Writes benchmarks/multichip_scaling.json:
  for n_dev in 1,2,4,8: fixed-path q/s (total batch held constant) and
  fused-adaptive q/s, plus overhead_vs_1dev ratios.

VIRTUAL-MESH MEMORY ARTIFACT (diagnosed round 4): at the production
target_pairs_per_step=4096 the fixed path collapses 5x going 1->8
virtual devices (1.23 -> 0.24 q/s) because the 8 per-device anchor+rerank
scans execute CONCURRENTLY in one host process — maxrss measured 18.9 GB
at 8 dev vs 2.7 GB at 1 dev — and the single core thrashes the allocator
and caches. Capping target_pairs_per_step=512 shrinks each device's live
buffers 8x (maxrss 3.0 GB) and restores flat scaling (1.44 -> 1.33 q/s =
92% efficiency). On real multi-chip meshes each device has its OWN HBM,
so concurrent full-size per-device buffers are exactly the intended
behavior and the collapse does not transfer; the --fixed-tpps sweep
exists to show the sharding machinery itself is ~8% overhead, not 80%.

Runs in SUBPROCESSES (one per device count): the virtual device count is
fixed at backend init and cannot change within a process.

Usage: python tools/multichip_scaling.py [--quick]
       python tools/multichip_scaling.py --fixed-tpps 512   # merge a
           memory-capped fixed-path sweep into the existing artifact
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def worker(n_dev: int, quick: bool, fixed_tpps: int = 0):
    from anncur_tpu.utils.platform import force_cpu_devices

    force_cpu_devices(n_dev)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from anncur_tpu.core.cur import build_cur
    from anncur_tpu.core.retriever import CurRetriever
    from anncur_tpu.models.bert import BertSpec
    from anncur_tpu.models.crossencoder import CrossEncoder
    from anncur_tpu.models.tokenizer import WordPieceTokenizer, make_test_vocab
    from anncur_tpu.parallel import make_mesh

    assert len(jax.devices()) == n_dev
    rng = np.random.default_rng(0)
    if quick:
        n_items, n_train, k_i, k_retvr, rank = 512, 40, 24, 16, 8
        n_q, lm, le = 16, 16, 16
        budget, n_rounds, iters = 24, 3, 2
        spec = BertSpec.tiny(vocab_size=512, max_position_embeddings=64)
    else:
        # yugioh-scale index, tiny encoder: on one core a bert-base CE
        # forward would swamp any sharding overhead we're trying to see
        n_items, n_train, k_i, k_retvr, rank = 10000, 500, 500, 100, 50
        n_q, lm, le = 64, 32, 32
        budget, n_rounds, iters = 150, 5, 3
        spec = BertSpec.tiny(vocab_size=512)
    ce = CrossEncoder(spec=spec, compute_dtype=jnp.float32)
    params = ce.init(jax.random.PRNGKey(0))
    mesh = make_mesh((n_dev,), ("data",))
    item_toks = rng.integers(1, spec.vocab_size, size=(n_items, le)).astype(np.int32)
    train_scores = (
        rng.standard_normal((n_train, rank)) @ rng.standard_normal((rank, n_items))
    ).astype(np.float32)
    anchors = np.asarray(sorted(rng.choice(n_items, k_i, replace=False)))
    index = build_cur(
        rows=jnp.asarray(train_scores),
        cols=jnp.asarray(train_scores[:, anchors]),
        row_idxs=jnp.arange(n_train),
        col_idxs=jnp.asarray(anchors),
        approx_preference="rows",
        validate=False,
    )
    rkw = {}
    if fixed_tpps:
        rkw["target_pairs_per_step"] = fixed_tpps
    retriever = CurRetriever(
        encoder=ce,
        params=params,
        tokenizer=WordPieceTokenizer(make_test_vocab()),
        item_tokens=item_toks,
        index=index,
        anchor_item_ids=anchors,
        mesh=mesh if n_dev > 1 else None,
        **rkw,
    )
    qtoks = rng.integers(1, spec.vocab_size, size=(n_q, lm)).astype(np.int32)

    out = {"n_dev": n_dev, "n_q": n_q}
    retriever.query_tokens_batch(qtoks, top_k=10, top_k_retvr=k_retvr)  # compile
    t0 = time.time()
    for _ in range(iters):
        retriever.query_tokens_batch(qtoks, top_k=10, top_k_retvr=k_retvr)
    out["fixed_q_per_s_total"] = round(iters * n_q / (time.time() - t0), 3)
    if fixed_tpps:
        # memory-capped fixed-path sweep only (see module docstring)
        print("WORKER_JSON " + json.dumps(out), flush=True)
        return

    # adaptive path: shard_mapped over the data axis since round 4 (the
    # retriever carries the mesh, so this measures the SHARDED engine's
    # overhead curve, same semantics as the fixed row)
    tr = jnp.asarray(train_scores)
    kw = dict(total_budget=budget, n_rounds=n_rounds, top_k=10, train_scores=tr)
    retriever.query_tokens_adaptive_fused(qtoks, **kw)
    t0 = time.time()
    for _ in range(iters):
        retriever.query_tokens_adaptive_fused(qtoks, **kw)
    out["adaptive_q_per_s_total"] = round(iters * n_q / (time.time() - t0), 3)
    print("WORKER_JSON " + json.dumps(out), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--n-dev", type=int, default=0, help="internal: worker mode")
    ap.add_argument(
        "--fixed-tpps",
        type=int,
        default=0,
        help="measure ONLY the fixed path with target_pairs_per_step capped "
        "to this (memory-capped virtual-mesh mode, see docstring) and merge "
        "the rows into the existing artifact",
    )
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "benchmarks",
            "multichip_scaling.json",
        ),
    )
    args = ap.parse_args()
    if args.n_dev:
        worker(args.n_dev, args.quick, args.fixed_tpps)
        return
    if args.quick and "multichip_scaling.json" in os.path.basename(args.out):
        args.out = args.out.replace(".json", "_quick.json")

    rows = {}
    for n_dev in (1, 2, 4, 8):
        cmd = [sys.executable, os.path.abspath(__file__), "--n-dev", str(n_dev)]
        if args.quick:
            cmd.append("--quick")
        if args.fixed_tpps:
            cmd += ["--fixed-tpps", str(args.fixed_tpps)]
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
        if r.returncode != 0:
            raise RuntimeError(f"worker n_dev={n_dev} failed:\n{r.stderr[-2000:]}")
        line = next(l for l in r.stdout.splitlines() if l.startswith("WORKER_JSON "))
        rows[n_dev] = json.loads(line[len("WORKER_JSON "):])
        print(json.dumps(rows[n_dev]), flush=True)

    if args.fixed_tpps:
        # merge the memory-capped fixed rows into the existing artifact
        with open(args.out) as f:
            out = json.load(f)
        key = f"fixed_tpps{args.fixed_tpps}_q_per_s_total"
        for n, row in rows.items():
            out["rows"][str(n)][key] = row["fixed_q_per_s_total"]
        base_v = rows[1]["fixed_q_per_s_total"]
        out[f"fixed_tpps{args.fixed_tpps}_overhead_vs_1dev"] = {
            str(n): round(1.0 - rows[n]["fixed_q_per_s_total"] / base_v, 4)
            for n in rows
        }
        out["fixed_collapse_diagnosis"] = (
            "the tpps=4096 fixed-path drop is a virtual-mesh HOST-MEMORY "
            "artifact, not sharding overhead: 8 concurrent per-device "
            "anchor+rerank scans peak at 18.9 GB maxrss (vs 2.7 GB at 1 "
            "dev) and thrash the single core; capping target_pairs_per_step "
            "to 512 (maxrss 3.0 GB) restores flat scaling. Real chips have "
            "private HBM, so full-size per-device buffers are the intended "
            "behavior there. Probe: n_dev=8 tpps=4096 266 s/iter vs "
            "tpps=512 48.3 s/iter (n_dev=1: 52.0 / 44.4)."
        )
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        print(f"merged fixed_tpps{args.fixed_tpps} rows into {args.out}")
        return

    base = rows[1]
    out = {
        "host": "single CPU core (nproc=1): virtual devices timeslice it; "
        "ideal total q/s is FLAT vs n_dev, any drop is sharding overhead "
        "(dispatch, replication, shard_map partitioning) — the component "
        "that transfers to real multi-chip meshes",
        "rows": rows,
        "fixed_overhead_vs_1dev": {
            n: round(1.0 - rows[n]["fixed_q_per_s_total"] / base["fixed_q_per_s_total"], 4)
            for n in rows
        },
        "adaptive_overhead_vs_1dev": {
            n: round(
                1.0 - rows[n]["adaptive_q_per_s_total"] / base["adaptive_q_per_s_total"], 4
            )
            for n in rows
        },
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
