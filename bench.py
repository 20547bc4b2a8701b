"""Headline benchmarks.

Line 1 — offline index-build throughput: exact cross-encoder (bert-base,
256-token pairs) score-matrix computation, the reference's dominant
workload (SURVEY §3.2: n_ment x n_ent CE forwards,
eval/run_cross_encoder_for_ment_ent_matrix_zeshel.py).

Line 2 — online query throughput at cost=600 CE calls/query (500 anchor
scores + 100 rerank, the reference cost axis at
run_retrieval_eval_wrt_exact_crossenc.py:480-481), through the fused
single-program CurRetriever path.

Line 3 — adaptive query throughput at MATCHED recall: the fused
multi-round engine (core/adaptive_fused.py) at the budget where its
recall@10 matches the fixed-anchor path at cost=600 (budget search
evidence: benchmarks/adaptive_matched_recall.json, produced by
tools/adaptive_matched_recall.py on yugioh-scale synthetic matrices).
The fixed path is at its CE-pairs/s roofline, so equal-recall-fewer-
calls is the honest route to higher effective q/s.

Each line is JSON: {"metric", "value", "unit", "vs_baseline"}.

Baselines: the reference runs per-pair BERT forwards on a single
RTX-8000/2080-ti-class GPU (utils/launch_eval_and_bienc_distill_
jobs.py:162-163); fp16 bert-base at 256 tokens sustains ~400 pairs/s in
its harness (batch 50-100, host-side pair construction), i.e. ~0.67
queries/s at the 600-CE-call budget.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

REFERENCE_GPU_PAIRS_PER_SEC = 400.0


def wait_for_backend():
    """Ride through temporary axon-tunnel outages (observed multi-hour
    UNAVAILABLE windows) instead of failing the round's bench record.

    Probes in a SUBPROCESS: a failed in-process backend init is cached
    by jax and never retried, and the first program after a worker
    crash can legitimately block 9-21 min on recovery — so each probe
    gets a long leash. Bounded by BENCH_WAIT_S (default 1 h, 0 to
    disable); on expiry we proceed and let the real failure surface."""
    budget_s = float(os.environ.get("BENCH_WAIT_S", "3600"))
    if budget_s <= 0:
        return
    deadline = time.time() + budget_s
    probe = (
        "import jax, jax.numpy as jnp; "
        "print(float(jax.jit(lambda a: (a @ a).sum())(jnp.ones((128, 128)))))"
    )
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", probe], capture_output=True, timeout=2400
            )
            if r.returncode == 0:
                if attempt > 1:
                    print(f"# backend recovered after {attempt} probes", file=sys.stderr)
                return
            err = r.stderr.decode(errors="replace").strip().splitlines()
            err = err[-1] if err else "?"
        except subprocess.TimeoutExpired:
            err = "probe timeout (2400s)"
        if time.time() > deadline:
            print(f"# backend still unavailable after {budget_s:.0f}s: {err}", file=sys.stderr)
            return
        print(f"# backend probe {attempt} failed ({err}); retrying", file=sys.stderr)
        time.sleep(60)


def orchestrate():
    """Run the bench lines in bounded subprocesses (one per program
    family), with a recovery probe + one retry each.

    Round 4 made this necessary: the adaptive line-3 program (budget 300,
    batch 512) crashed the remote axon worker mid-compile ("kernel
    fault", the same nondeterministic crash family as the oracle
    programs, CLAUDE.md) — in the old single-process layout that lost
    line 3 AND left the round's bench record truncated. Program families
    in their own subprocesses is the established pattern
    (tools/military_scale.py); the parent never initializes a backend.

    BENCH_NO_SUBPROC=1 restores the single-process path (debugging)."""
    wait_for_backend()
    build_only = bool(os.environ.get("BENCH_SKIP_QUERY"))
    jobs = [(
        "--lines12",
        ("crossenc_score_matrix_build_throughput",)
        + (() if build_only else ("query_throughput_cost600",)),
        7200,
    )]
    if not build_only:
        jobs.append(("--line3", ("query_throughput_at_matched_recall",), 3600))
        jobs.append(("--line4", ("query_throughput_early_stop_worst",), 3600))
    for flag, want_metrics, tmo in jobs:
        for attempt in (1, 2):
            try:
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), flag],
                    capture_output=True, timeout=tmo,
                )
            except subprocess.TimeoutExpired:
                print(f"# {flag} attempt {attempt}: timeout {tmo}s", file=sys.stderr)
                r = None
            got = []
            if r is not None:
                got = [
                    line for line in r.stdout.decode(errors="replace").splitlines()
                    if line.startswith("{")
                ]
                for line in r.stderr.decode(errors="replace").splitlines():
                    if line.startswith("#"):
                        print(line, file=sys.stderr)
            ok = r is not None and r.returncode == 0 and all(
                any(m in g for g in got) for m in want_metrics
            )
            if ok or attempt == 2:
                # buffered, printed once: a retry must not duplicate the
                # lines a half-finished first attempt already produced;
                # on double failure the partial lines still beat nothing
                for line in got:
                    print(line, flush=True)
                if ok:
                    break
            tail = ""
            if r is not None and r.returncode != 0:
                err = r.stderr.decode(errors="replace").strip().splitlines()
                # the last line alone can be useless (e.g. jax's
                # traceback-filtering notice) — keep the last few
                tail = " | ".join(err[-5:]) if err else ""
            if not ok:
                print(
                    f"# {flag} attempt {attempt} failed (rc="
                    f"{'timeout' if r is None else r.returncode}): {tail}",
                    file=sys.stderr,
                )
            if not ok and attempt == 1:
                # a worker crash makes the NEXT process block 9-21 min on
                # recovery; wait_for_backend's 2400 s probe leash rides it
                wait_for_backend()


def main(lines="all"):
    only_line3 = lines in ("3", "4")  # query-path-only lines: skip build + fixed
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from anncur_tpu.utils.platform import enable_compilation_cache

    # persistent XLA cache: remote compiles are 60-90 s each; warm
    # restarts skip them (measured 12.6 s -> 1.1 s on a probe program)
    enable_compilation_cache()

    from anncur_tpu.indexer import ScoreMatrixBuilder
    from anncur_tpu.models.bert import BertSpec
    from anncur_tpu.models.crossencoder import CrossEncoder
    from anncur_tpu.parallel import make_mesh

    n_dev = len(jax.devices())
    mesh = make_mesh((n_dev,), ("data",))

    # flagship model: bert-base cross-encoder, bf16 compute.
    # Measured on v5e: xla attention beats the pallas flash kernel at
    # seq 256 (1282 vs ~850 pairs/s) — flash's tile-grid overhead
    # dominates at short sequences; it is kept as an option for long-seq
    # workloads (BENCH_ATTN=flash to compare).
    attention_impl = os.environ.get("BENCH_ATTN", "xla")
    spec = BertSpec(attention_impl=attention_impl)  # bert-base-uncased shape
    ce = CrossEncoder(spec=spec, cross_enc_type="default", compute_dtype=jnp.bfloat16)
    params = ce.init(jax.random.PRNGKey(0))

    lm = le = 128  # ZeShEL max mention/entity lengths -> 256-token pairs
    rng = np.random.default_rng(0)
    # 32x2048 = 64k pairs per pass: long enough to amortize dispatch
    # (full-scale runs sustain ~1850 pairs/s; tiny passes under-measure)
    n_ments, n_ents = 32, 2048
    ment_toks = rng.integers(1, spec.vocab_size, size=(n_ments, lm)).astype(np.int32)
    ent_toks = rng.integers(1, spec.vocab_size, size=(n_ents, le)).astype(np.int32)

    # best measured shape on v5e with slabbed builder: 32x64 = 2048-pair
    # batches -> 1740 pairs/s (16x128 -> 1705, 24x128 -> 1052, 16x96 ->
    # 770: keep ent_block a multiple of 64 for clean tiling)
    if not only_line3:
        ment_block = int(os.environ.get("BENCH_MENT_BLOCK", "32"))
        ent_block = int(os.environ.get("BENCH_ENT_BLOCK", "64"))
        max_pairs = int(os.environ.get("BENCH_MAX_PAIRS", "32768"))
        builder = ScoreMatrixBuilder(
            ce, mesh, ment_block=ment_block, ent_block=ent_block,
            max_pairs_per_program=max_pairs,
        )

        # warmup/compile
        builder(params, ment_toks[:ment_block], ent_toks)

        # best-of-2: the remote-TPU link adds run-to-run noise (~15%)
        pairs_per_sec = 0.0
        for _ in range(2):
            t0 = time.time()
            scores = builder(params, ment_toks, ent_toks)
            dt = time.time() - t0
            pairs_per_sec = max(pairs_per_sec, (n_ments * n_ents) / dt)

        assert scores.shape == (n_ments, n_ents)
        assert np.all(np.isfinite(scores))

        print(
            json.dumps(
                {
                    "metric": "crossenc_score_matrix_build_throughput",
                    "value": round(pairs_per_sec, 1),
                    "unit": "pairs/s (bert-base, 256-token pairs)",
                    "vs_baseline": round(pairs_per_sec / REFERENCE_GPU_PAIRS_PER_SEC, 2),
                }
            ),
            flush=True,
        )

        if os.environ.get("BENCH_SKIP_QUERY"):
            return

    # ---- line 2: online query path, cost = 500 anchors + 100 rerank ----
    from anncur_tpu.core.cur import build_cur
    from anncur_tpu.core.retriever import CurRetriever
    from anncur_tpu.models.tokenizer import WordPieceTokenizer, make_test_vocab

    n_items, n_train, k_i, k_retvr = 10000, 500, 500, 100
    n_q = int(os.environ.get("BENCH_QUERY_BATCH", "32"))
    item_toks = rng.integers(1, spec.vocab_size, size=(n_items, le)).astype(np.int32)
    train_scores = (
        rng.standard_normal((n_train, 16)) @ rng.standard_normal((16, n_items))
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
    retriever = CurRetriever(
        encoder=ce,
        params=params,
        tokenizer=WordPieceTokenizer(make_test_vocab()),
        item_tokens=item_toks,
        index=index,
        anchor_item_ids=anchors,
        target_pairs_per_step=int(os.environ.get("BENCH_QUERY_TPS", "4096")),
    )
    qtoks = rng.integers(1, spec.vocab_size, size=(n_q, lm)).astype(np.int32)
    if not only_line3:
        retriever.query_tokens_batch(qtoks, top_k=10, top_k_retvr=k_retvr)  # compile
        qps = 0.0
        for _ in range(2):
            t0 = time.time()
            retriever.query_tokens_batch(qtoks, top_k=10, top_k_retvr=k_retvr)
            qps = max(qps, n_q / (time.time() - t0))
        qps /= n_dev  # the unit string claims per-chip; the mesh spans n_dev
        print(
            json.dumps(
                {
                    "metric": "query_throughput_cost600",
                    "value": round(qps, 2),
                    "unit": "queries/s/chip (bert-base CE, 500 anchors + 100 rerank)",
                    "vs_baseline": round(qps / (REFERENCE_GPU_PAIRS_PER_SEC / 600.0), 2),
                }
            ),
            flush=True,
        )
        if lines == "12":
            return

    # ---- line 3: adaptive query path at matched recall -----------------
    budget = int(os.environ.get("BENCH_ADA_BUDGET", "0"))
    n_rounds = int(os.environ.get("BENCH_ADA_ROUNDS", "0"))
    scenario = "env-override"
    amr_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "benchmarks", "adaptive_matched_recall.json"
    )
    method = os.environ.get("BENCH_ADA_METHOD", "")
    axn_rank = None
    if not budget:
        budget, scenario = 200, "default"
        if os.path.exists(amr_path):
            with open(amr_path) as f:
                amr = json.load(f)
            if amr.get("quick"):
                # a --quick (CI smoke) artifact carries no real matched-
                # recall evidence; refusing it keeps line 3 honest
                print("# ignoring quick-mode adaptive_matched_recall.json", file=sys.stderr)
            elif amr.get("headline_matched_budget"):
                budget = int(amr["headline_matched_budget"])
                scenario = str(amr.get("headline_scenario"))
                axn_rank = amr.get("headline_axn_rank")
                n_rounds = n_rounds or int(amr.get("headline_n_rounds", 3))
                if method and method != amr.get("headline_method", "cur"):
                    # BENCH_ADA_METHOD override: use THAT method's own
                    # matched-budget evidence, not the headline method's
                    # (AXN needs ~2x the CUR-ridge budget; running it at
                    # the CUR budget would fabricate the recall claim)
                    variants = [
                        v for v in amr["scenarios"].get(scenario, {}).values()
                        if v.get("method") == method and v.get("matched_budget")
                    ]
                    if variants:
                        best = min(variants, key=lambda v: v["matched_budget"])
                        budget = int(best["matched_budget"])
                        n_rounds = int(best["n_rounds"])
                        axn_rank = best.get("axn_rank")
                    else:
                        print(
                            f"# no matched-budget evidence for method={method}; "
                            "line 3 runs it at the default budget without a "
                            "matched-recall claim", file=sys.stderr,
                        )
                        scenario = "no-evidence"
                else:
                    method = method or amr.get("headline_method", "cur")
    method = method or "cur"
    n_rounds = n_rounds or 3
    # adaptive throughput grows with the query batch (narrow per-round
    # candidate sets need many queries to fill the MXU: measured 11.4 ->
    # 17.9 -> 19.7 -> 20.3 -> 20.5 q/s going 32 -> 128 -> 256 -> 512 ->
    # 1024 at budget 150; tps=8192 regresses to 16.8 like the fixed
    # path). Default: throughput-serving batch of 512 — 20.28 q/s =
    # 3042 effective pairs/s = 100% of the builder roofline; 1024 adds
    # only 1% for 2x the batch latency.
    ada_q = int(os.environ.get("BENCH_ADA_BATCH", "512"))
    ada_toks = rng.integers(1, spec.vocab_size, size=(ada_q, lm)).astype(np.int32)
    # device-resident ONCE: host numpy here would re-upload the ~20 MB
    # train matrix through the tunnel on every timed dispatch (the same
    # bias bench_serving_latency.py documents and avoids)
    ada_kw = dict(
        total_budget=budget, n_rounds=n_rounds, top_k=10,
        train_scores=jnp.asarray(train_scores, jnp.float32),
        method=method, axn_rank=axn_rank,
    )
    if lines == "4":
        # ---- line 4: early-stop engine, WORST case -------------------
        # The per-query early-stop engine (escalate_budget) makes
        # matched recall a property of the ENGINE: every query pays the
        # base budget, only unstable ones escalate to the ceiling
        # (evidence: adaptive_matched_recall.json headline_early_stop —
        # one config matches fixed-anchor recall on every committed
        # spectrum). This line measures its WORST case on chip: every
        # query forced to escalate (stability_overlap > 1 makes the
        # convergence test unsatisfiable — the programs are cost-
        # identical to production, only the comparison constant
        # differs). Easy spectra run the base budget only: measured
        # 30.2 q/s at b100r5 (benchmarks/early_stop_serving.json).
        es = None
        if os.path.exists(amr_path):
            with open(amr_path) as f:
                es_amr = json.load(f)
            if not es_amr.get("quick"):
                es = es_amr.get("headline_early_stop")
        if not es:
            print("# no early-stop calibration; line 4 skipped", file=sys.stderr)
            return
        es_kw = dict(
            total_budget=int(es["base_budget"]), n_rounds=int(es["base_rounds"]),
            top_k=10, train_scores=jnp.asarray(train_scores, jnp.float32),
            method="cur", escalate_budget=int(es["escalate_budget"]),
            escalate_rounds=int(es["escalate_rounds"]), stability_overlap=1.01,
        )
        retriever.query_tokens_adaptive_fused(ada_toks, **es_kw)  # compile
        esqps = 0.0
        for _ in range(2):
            t0 = time.time()
            retriever.query_tokens_adaptive_fused(ada_toks, **es_kw)
            esqps = max(esqps, ada_q / (time.time() - t0))
        esqps /= n_dev
        print(
            json.dumps(
                {
                    "metric": "query_throughput_early_stop_worst",
                    "value": round(esqps, 2),
                    "unit": (
                        f"queries/s/chip (per-query early-stop engine "
                        f"{es['config']}, ALL queries escalated = worst-case "
                        f"avg budget {es['escalate_budget']}; easy spectra stop "
                        f"at {es['base_budget']} (~2.5x this q/s); batch={ada_q}; "
                        "evidence benchmarks/early_stop_serving.json)"
                    ),
                    "vs_baseline": round(esqps / (REFERENCE_GPU_PAIRS_PER_SEC / 600.0), 2),
                }
            ),
            flush=True,
        )
        return

    retriever.query_tokens_adaptive_fused(ada_toks, **ada_kw)  # compile + warmup
    aqps = 0.0
    for _ in range(2):
        t0 = time.time()
        retriever.query_tokens_adaptive_fused(ada_toks, **ada_kw)
        aqps = max(aqps, ada_q / (time.time() - t0))
    aqps /= n_dev  # per-chip, like the unit string says
    print(
        json.dumps(
            {
                "metric": "query_throughput_at_matched_recall",
                "value": round(aqps, 2),
                "unit": (
                    f"queries/s/chip (adaptive {n_rounds}-round {method}, "
                    f"budget={budget} CE calls ~ recall of fixed-anchor cost-600, "
                    f"batch={ada_q}; evidence "
                    f"benchmarks/adaptive_matched_recall.json[{scenario}])"
                ),
                "vs_baseline": round(aqps / (REFERENCE_GPU_PAIRS_PER_SEC / 600.0), 2),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    if "--lines12" in sys.argv:
        main(lines="12")
    elif "--line3" in sys.argv:
        main(lines="3")
    elif "--line4" in sys.argv:
        main(lines="4")
    elif os.environ.get("BENCH_NO_SUBPROC"):
        wait_for_backend()
        main()
    else:
        orchestrate()
