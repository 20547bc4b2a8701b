"""Bisect the wide-round TPU worker crash (VERDICT r4 item 7).

Round 4 found that adaptive programs with per-round candidate width
> 64 kill the remote TPU worker at first dispatch ("kernel fault", no
diagnostic): budget-300 3-round (width 100) at q=512 x 10k items died
2/2 while width 60 and width 30 ran fine through identical code. The
ridge solve was exonerated (it runs per-query on (S,S) Grams — width
enters only via S growth, and S=300 programs run fine at 5 rounds).
This tool isolates the remaining per-round stages into MINIMAL
single-stage programs at width 100, each in its OWN bounded subprocess
(a crash costs the NEXT process a 9-21 min recovery, so the
orchestrator never touches the backend and probes run serialized):

  topk        lax.top_k(approx (512, 10031), k=100)
  gather      jnp.take(items (10031, 128), ids (chunk, 100)) per chunk
  gatherscore the real scan-chunked CE scoring of a width-100 round
              (the engine's score_fn verbatim: chunk x width pair
              gather -> bert-base CE -> reshape)
  concat      state concat + re-top_k at width 100
  full        the real fused engine at budget 300 @ 3 rounds (known bad)

Each probe prints PROBE_OK or dies; the orchestrator records
ok/crash/timeout per stage in benchmarks/wide_round_probe.json. A warm
op precedes each probe so a pending worker recovery isn't misread as a
crash of THIS stage.

Usage: python -u tools/probe_wide_round.py --all   (real TPU)
       python -u tools/probe_wide_round.py --probe topk
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

Q, M, W, LM, LE = 512, 10000, 100, 128, 128


def _warm():
    import jax.numpy as jnp

    t0 = time.time()
    float(jnp.sum(jnp.ones((8, 8)) @ jnp.ones((8, 8))))
    print(f"# warm op {time.time() - t0:.1f}s", flush=True)


def probe(name: str):
    import jax
    import jax.numpy as jnp

    from anncur_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()
    _warm()
    rng = np.random.default_rng(0)

    if name == "topk":
        x = jnp.asarray(rng.standard_normal((Q, M)), jnp.float32)
        fn = jax.jit(lambda a: jax.lax.top_k(a, W))
        out = fn(x)
        float(np.asarray(out[0][:2, :2]).sum())
    elif name == "concat":
        ids = jnp.asarray(rng.integers(0, M, (Q, 200)), jnp.int32)
        vals = jnp.asarray(rng.standard_normal((Q, 200)), jnp.float32)
        nids = jnp.asarray(rng.integers(0, M, (Q, W)), jnp.int32)
        nvals = jnp.asarray(rng.standard_normal((Q, W)), jnp.float32)

        def fn(i, v, ni, nv):
            i = jnp.concatenate([i, ni], axis=1)
            v = jnp.concatenate([v, nv], axis=1)
            s, order = jax.lax.top_k(v, 10)
            return s, jnp.take_along_axis(i, order, axis=1)

        out = jax.jit(fn)(ids, vals, nids, nvals)
        float(np.asarray(out[0][:2]).sum())
    elif name in ("gather", "gatherscore"):
        from anncur_tpu.core.retriever import _largest_divisor_leq, _make_pair_scorer
        from anncur_tpu.models.bert import BertSpec
        from anncur_tpu.models.crossencoder import CrossEncoder

        spec = BertSpec()
        ce = CrossEncoder(spec=spec, cross_enc_type="default", compute_dtype=jnp.bfloat16)
        params = ce.init(jax.random.PRNGKey(0))
        items = jnp.asarray(rng.integers(1, spec.vocab_size, (M, LE)), jnp.int32)
        qtoks = jnp.asarray(rng.integers(1, spec.vocab_size, (Q, LM)), jnp.int32)
        ids = jnp.asarray(rng.integers(0, M, (Q, W)), jnp.int32)
        # the engine's chunking at width 100, target_pairs_per_step 4096
        chunk = _largest_divisor_leq(Q, max(1, 4096 // W))
        nc = Q // chunk
        score_pairs = _make_pair_scorer(ce, LM, LE, 32)

        if name == "gather":

            def fn(items, ids):
                def body(_, c_blk):
                    return None, jnp.take(items, c_blk, axis=0)

                _, out = jax.lax.scan(body, None, ids.reshape(nc, chunk, W))
                return out.sum(dtype=jnp.int32)

            out = jax.jit(fn)(items, ids)
            int(out)
        else:

            def fn(p, qtoks, items, ids):
                def body(_, inp):
                    m_blk, c_blk = inp
                    cand = jnp.take(items, c_blk, axis=0)
                    return None, score_pairs(p, m_blk, cand, chunk, W)

                _, out = jax.lax.scan(
                    body, None,
                    (qtoks.reshape(nc, chunk, LM), ids.reshape(nc, chunk, W)),
                )
                return out.reshape(Q, W)

            out = jax.jit(fn)(params, qtoks, items, ids)
            float(np.asarray(out[:2, :2]).sum())
    elif name == "full":
        from tools.bench_serving_latency import build_retriever

        retriever, train_scores, spec, rrng = build_retriever()
        qt = rrng.integers(1, spec.vocab_size, size=(Q, LM)).astype(np.int32)
        retriever.query_tokens_adaptive_fused(
            qt, total_budget=300, n_rounds=3, top_k=10,
            train_scores=jnp.asarray(train_scores, jnp.float32),
        )
    else:
        raise SystemExit(f"unknown probe {name}")
    print("PROBE_OK", flush=True)


def orchestrate(out_path: str, probes, tmo: int):
    results = {}
    for name in probes:
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, "-u", os.path.abspath(__file__), "--probe", name],
                capture_output=True, timeout=tmo, text=True,
            )
            status = "ok" if ("PROBE_OK" in r.stdout and r.returncode == 0) else "crash"
            tail = (r.stderr.strip().splitlines() or [""])[-1][:300]
        except subprocess.TimeoutExpired:
            status, tail = "timeout", f"> {tmo}s"
        results[name] = {
            "status": status,
            "wall_s": round(time.time() - t0, 1),
            "tail": tail if status != "ok" else "",
        }
        print(json.dumps({name: results[name]}), flush=True)
        if status != "ok":
            # a crashed worker makes the NEXT probe's first op block
            # 9-21 min on recovery; the warm op inside each probe rides
            # it, but give the tunnel a breather anyway
            time.sleep(30)
    out = {"q": Q, "m": M, "width": W, "probes": results}
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", out_path)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--probe", default="")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--probes", nargs="+",
                    default=["topk", "concat", "gather", "gatherscore", "full"])
    ap.add_argument("--timeout", type=int, default=3600)
    ap.add_argument("--out", default=os.path.join(REPO, "benchmarks", "wide_round_probe.json"))
    args = ap.parse_args(argv)
    if args.probe:
        probe(args.probe)
    else:
        orchestrate(args.out, args.probes, args.timeout)


if __name__ == "__main__":
    main()
