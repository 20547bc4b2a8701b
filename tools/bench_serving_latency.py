"""Serving latency benchmark: per-dispatch p50/p95 for both query modes.

The headline bench (bench.py) measures batched THROUGHPUT; production
serving also cares about the latency of a single dispatch at small
batch. This tool measures wall-clock per dispatch for the fixed-anchor
path (cost = 500 anchors + 100 rerank CE calls/query, the reference
cost model at run_retrieval_eval_wrt_exact_crossenc.py:480-481) and the
fused adaptive engine (budget 150, 5 rounds — matched-recall config,
benchmarks/adaptive_matched_recall.json) across batch sizes, on the
flagship bert-base CE in bf16 over a 10k-item corpus.

Usage (real TPU; serialize with other TPU work):
    python -u tools/bench_serving_latency.py [--out benchmarks/serving_latency.json]

Writes one JSON with per-(mode, batch) {p50_ms, p95_ms, qps} plus the
measurement config. Reps are timed per dispatch (block_until_ready via
the retriever's host return), first dispatch after compile discarded.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_retriever(tiny=False, n_items=10000):
    import jax
    import jax.numpy as jnp

    from anncur_tpu.core.cur import build_cur
    from anncur_tpu.core.retriever import CurRetriever
    from anncur_tpu.models.bert import BertSpec
    from anncur_tpu.models.crossencoder import CrossEncoder
    from anncur_tpu.models.tokenizer import WordPieceTokenizer, make_test_vocab

    spec = (
        BertSpec.tiny(vocab_size=512, max_position_embeddings=256)
        if tiny else BertSpec()
    )
    ce = CrossEncoder(spec=spec, cross_enc_type="default", compute_dtype=jnp.bfloat16)
    params = ce.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    n_train, k_i = 500, 500
    item_toks = rng.integers(1, spec.vocab_size, size=(n_items, 128)).astype(np.int32)
    train_scores = (
        rng.standard_normal((n_train, 16)) @ rng.standard_normal((16, n_items))
    ).astype(np.float32)
    anchors = np.asarray(sorted(rng.choice(n_items, k_i, replace=False)))
    index, u = build_cur(
        rows=jnp.asarray(train_scores),
        cols=jnp.asarray(train_scores[:, anchors]),
        row_idxs=jnp.arange(n_train),
        col_idxs=jnp.asarray(anchors),
        approx_preference="rows",
        validate=False,
        return_u=True,
    )
    # anchor-query tokens + U stored so add_items works (the dynamic-
    # corpus path measured by --add_then_query)
    train_q_toks = rng.integers(1, spec.vocab_size, size=(n_train, 128)).astype(np.int32)
    retriever = CurRetriever(
        encoder=ce,
        params=params,
        tokenizer=WordPieceTokenizer(make_test_vocab()),
        item_tokens=item_toks,
        index=index,
        anchor_item_ids=anchors,
        target_pairs_per_step=4096,
        train_query_tokens=train_q_toks,
        u=np.asarray(u),
    )
    return retriever, train_scores, spec, rng


def time_dispatches(fn, reps: int):
    """Per-dispatch wall times in ms (fn must block until results are
    on host — both retriever entry points return numpy)."""
    times = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        times.append((time.time() - t0) * 1000.0)
    return times


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default=os.path.join(REPO, "benchmarks", "serving_latency.json"))
    ap.add_argument("--reps", type=int, default=16)
    # fixed mode stops at 32 (throughput saturates there, bench.py line 2,
    # and the 512-batch fixed program is 307k pairs of pure extra compile);
    # adaptive includes its 512 throughput-default.
    ap.add_argument("--fixed_batches", type=int, nargs="+", default=[1, 8, 32])
    ap.add_argument("--ada_batches", type=int, nargs="+", default=[1, 8, 32, 512])
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from anncur_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()

    # absorb any pending worker recovery (post-crash the first program of a
    # fresh process can block 9-21 min) before anything is timed
    t0 = time.time()
    float(jnp.sum(jnp.ones((8, 8)) @ jnp.ones((8, 8))))
    print(json.dumps({"warm_op_s": round(time.time() - t0, 1)}), flush=True)

    retriever, train_scores, spec, rng = build_retriever()
    # device-resident ONCE: retriever.query_tokens_adaptive_fused does
    # jnp.asarray(train_scores) per call, so passing host numpy would
    # re-upload the (500, 10k) f32 matrix (~19 MB) through the tunnel on
    # every timed rep — production serving uses the device-cached matrix
    train_scores = jnp.asarray(train_scores, jnp.float32)
    results = {}
    for mode in ("fixed", "adaptive"):
        for b in args.fixed_batches if mode == "fixed" else args.ada_batches:
            qt = rng.integers(1, spec.vocab_size, size=(b, 128)).astype(np.int32)
            if mode == "fixed":
                fn = lambda: retriever.query_tokens_batch(qt, top_k=10, top_k_retvr=100)
            else:
                fn = lambda: retriever.query_tokens_adaptive_fused(
                    qt, total_budget=150, n_rounds=5, top_k=10,
                    train_scores=train_scores, method="cur",
                )
            t0 = time.time()
            fn()  # compile + first dispatch (discarded)
            compile_s = time.time() - t0
            reps = args.reps if b <= 32 else max(4, args.reps // 3)
            times = time_dispatches(fn, reps)
            entry = {
                "p50_ms": round(float(np.percentile(times, 50)), 1),
                "p95_ms": round(float(np.percentile(times, 95)), 1),
                "qps": round(b / (np.percentile(times, 50) / 1000.0), 2),
                "compile_s": round(compile_s, 1),
                "reps": reps,
                # raw times: the tunnel occasionally stalls a dispatch for
                # seconds — keep the evidence so outliers are inspectable
                "times_ms": [round(t, 1) for t in times],
            }
            results[f"{mode}_b{b}"] = entry
            print(json.dumps({f"{mode}_b{b}": entry}), flush=True)

    # ---- time-to-first-query after a corpus edit (VERDICT r3 item 3).
    # The item axis is padded to item_pad_multiple inside every fused
    # program, so a small add keeps program shapes and the next query
    # must NOT retrace. Three rows:
    #   add_items_ms                 — the /add itself (k_q CE calls per
    #                                  new item + one matvec; real cost)
    #   add_then_query_within_block  — first query after a small add
    #                                  (same padded shape: program reuse)
    #   add_then_query_recompile     — first query after emulating the
    #                                  round-3 behavior (compiled-program
    #                                  cache cleared): the cliff the
    #                                  padding removed
    if retriever.u is not None:
        from anncur_tpu.indexer import ScoreMatrixBuilder

        builder = ScoreMatrixBuilder(
            retriever.encoder, None, ment_block=32, ent_block=8, pair_pad_multiple=32
        )
        qt1 = rng.integers(1, spec.vocab_size, size=(1, 128)).astype(np.int32)
        q1 = lambda: retriever.query_tokens_batch(qt1, top_k=10, top_k_retvr=100)
        q1()  # warm (b=1 program compiled above, but be explicit)
        base_ms = float(np.percentile(time_dispatches(q1, 4), 50))

        new_toks = rng.integers(1, spec.vocab_size, size=(16, 128)).astype(np.int32)
        pad_before = retriever._padded_n_items()
        t0 = time.time()
        retriever.add_items(new_toks, builder)
        add_ms = (time.time() - t0) * 1000.0
        assert retriever._padded_n_items() == pad_before, "add crossed a block"
        t0 = time.time()
        q1()
        within_ms = (time.time() - t0) * 1000.0

        t0 = time.time()
        q1()
        second_ms = (time.time() - t0) * 1000.0

        retriever._fused_cache.clear()  # round-3 behavior: drop programs
        t0 = time.time()
        q1()
        recompile_ms = (time.time() - t0) * 1000.0
        results["add_then_query"] = {
            "query_b1_baseline_ms": round(base_ms, 1),
            "add_items_ms": round(add_ms, 1),
            "n_added": 16,
            "add_then_query_within_block_ms": round(within_ms, 1),
            "second_query_after_add_ms": round(second_ms, 1),
            "add_then_query_recompile_ms": round(recompile_ms, 1),
            "note": "within_block pays ONE-TIME device-const re-staging "
            "(~25 MB padded items+latents through the tunnel), not a "
            "recompile — second_query returns to baseline; recompile row "
            "emulates the pre-fix (round-3) program-cache drop",
        }
        print(json.dumps({"add_then_query": results["add_then_query"]}), flush=True)

    out = {
        "platform": jax.devices()[0].platform,
        "config": {
            "model": "bert-base CE bf16",
            "n_items": 10000,
            "fixed": "500 anchors + 100 rerank CE calls/query (cost 600)",
            "adaptive": "budget 150 CE calls, 5 rounds (matched-recall config)",
        },
        "results": results,
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as fout:
        json.dump(out, fout, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
