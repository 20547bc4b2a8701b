"""HTTP serving throughput under concurrency: the coalescer, end to end.

tools/bench_serving_latency.py measures raw per-dispatch latency at the
retriever API; this tool measures the full production path — real
sockets, the stdlib ThreadingHTTPServer, and the cross-request
Coalescer (cli/serve.py) — under N concurrent single-query clients,
the workload dynamic batching exists for. Reference has no serving
story at all (its online path lives inside the eval scripts,
eval/run_retrieval_eval_wrt_exact_crossenc_w_fixed_train_test_splits.py
:286-303); this is TPU-serving-specific.

Flow: build the same synthetic 10k-item bert-base retriever as the
latency bench, save a state file, boot `anncur_tpu.cli.serve` in a
thread on 127.0.0.1:0 (adaptive matched-recall config, --batch 32),
warm the compiled program with one query, then fire --clients threads
each POSTing --per_client single-query /query requests. Reports
aggregate q/s, per-request latency percentiles, and the coalescing
factor (queries answered / device dispatches) from /healthz.

Usage (real TPU; serialize with other TPU work):
    python -u tools/bench_http_serving.py [--out benchmarks/http_serving.json]

A sequential single-client pass first gives the no-concurrency
baseline; the concurrent pass should multiply aggregate q/s toward the
batched-dispatch throughput without changing any client's code.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import threading
import time
import urllib.error
import urllib.request

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from bench_serving_latency import build_retriever  # noqa: E402 (same dir)


def http_call(base, path, payload=None, timeout=600):
    req = urllib.request.Request(
        base + path,
        data=None if payload is None else json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="GET" if payload is None else "POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return resp.status, json.loads(resp.read())


def run_pass(base, queries, n_threads):
    """Fire len(queries) single-query requests from n_threads workers;
    return (wall_s, per-request latencies ms, errors)."""
    lat_ms, errs = [], []
    lock = threading.Lock()
    it = iter(queries)

    def worker():
        while True:
            with lock:
                q = next(it, None)
            if q is None:
                return
            t0 = time.time()
            try:
                code, out = http_call(base, "/query", q)
                assert code == 200 and out["results"], out
            except Exception as e:  # noqa: BLE001 — reported below
                with lock:
                    errs.append(repr(e))
                return
            with lock:
                lat_ms.append((time.time() - t0) * 1e3)

    ths = [threading.Thread(target=worker) for _ in range(n_threads)]
    t0 = time.time()
    for t in ths:
        t.start()
    for t in ths:
        t.join()
    return time.time() - t0, lat_ms, errs


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default=os.path.join(REPO, "benchmarks", "http_serving.json"))
    ap.add_argument("--clients", type=int, default=64)
    ap.add_argument("--per_client", type=int, default=4)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--coalesce_ms", type=float, default=25.0)
    ap.add_argument("--budget", type=int, default=150)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--seq_baseline", type=int, default=12,
                    help="sequential single-client queries for the baseline pass")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    # absorb any pending worker recovery before anything is timed
    t0 = time.time()
    float(jnp.sum(jnp.ones((8, 8)) @ jnp.ones((8, 8))))
    print(json.dumps({"warm_op_s": round(time.time() - t0, 1)}), flush=True)

    retriever, _, spec, rng = build_retriever()
    tmp = tempfile.mkdtemp(prefix="bench_http_")
    vocab_path = os.path.join(tmp, "vocab.txt")
    retriever.tokenizer.save_vocab(vocab_path)
    ckpt_path = os.path.join(tmp, "ce.pkl")
    from anncur_tpu.train.checkpoint import save_pytree

    save_pytree(ckpt_path, {"params": retriever.params})
    state_path = os.path.join(tmp, "retr_state.pkl")
    retriever.save(state_path)

    from anncur_tpu.cli import serve

    argv_srv = [
        "--index", state_path, "--vocab_file", vocab_path,
        "--crossenc_ckpt", ckpt_path, "--http", "127.0.0.1:0",
        "--mode", "adaptive", "--budget", str(args.budget),
        "--rounds", str(args.rounds), "--top_k", "10",
        "--batch", str(args.batch), "--coalesce_ms", str(args.coalesce_ms),
        "--max_query_len", "128",
    ]
    th = threading.Thread(target=serve.main, args=(argv_srv,), daemon=True)
    th.start()
    deadline = time.time() + 120
    server = None
    while time.time() < deadline and server is None:
        server = getattr(serve._serve_http, "last_server", None)
        time.sleep(0.05)
    assert server is not None, "HTTP server did not come up"
    base = "http://127.0.0.1:%d" % server.server_address[1]

    # make_test_vocab's only .isalpha() entries are the 26 single letters,
    # so a "real words" filter would yield 26 one-char tokens and make
    # the host-side WordPiece share of this bench unrealistically tiny.
    # Instead synthesize multi-subword mentions: random 4-10 letter
    # strings split into a head char + '##' continuations, so query
    # tokenization does real per-character merge work per request.
    letters = list("abcdefghijklmnopqrstuvwxyz")
    words = [
        "".join(rng.choice(letters, int(n)))
        for n in rng.integers(4, 11, size=500)
    ]
    qs = [
        {"mention": " ".join(rng.choice(words, 3)),
         "context_left": " ".join(rng.choice(words, 5)),
         "context_right": " ".join(rng.choice(words, 5))}
        for _ in range(max(args.clients * args.per_client, args.seq_baseline))
    ]

    # compile pass: one query traces the steady padded-batch program
    t0 = time.time()
    http_call(base, "/query", qs[0])
    compile_s = time.time() - t0
    print(json.dumps({"compile_s": round(compile_s, 1)}), flush=True)

    results = {"config": {
        "mode": "adaptive", "budget": args.budget, "rounds": args.rounds,
        "batch": args.batch, "coalesce_ms": args.coalesce_ms,
        "clients": args.clients, "per_client": args.per_client,
        "model": "bert-base CE bf16", "n_items": 10000,
        "platform": jax.devices()[0].platform,
    }}
    for name, queries, n_threads in (
        ("sequential_1_client", qs[: args.seq_baseline], 1),
        ("concurrent", qs[: args.clients * args.per_client], args.clients),
    ):
        d0 = http_call(base, "/healthz")[1]
        wall, lat, errs = run_pass(base, queries, n_threads)
        d1 = http_call(base, "/healthz")[1]
        assert not errs, errs
        dispatches = d1["dispatches"] - d0["dispatches"]
        entry = {
            "queries": len(queries),
            "wall_s": round(wall, 2),
            "qps": round(len(queries) / wall, 2),
            "latency_p50_ms": round(float(np.percentile(lat, 50)), 1),
            "latency_p95_ms": round(float(np.percentile(lat, 95)), 1),
            "device_dispatches": dispatches,
            "queries_per_dispatch": round(len(queries) / max(dispatches, 1), 1),
        }
        results[name] = entry
        print(json.dumps({name: entry}), flush=True)

    server.shutdown()
    th.join(timeout=30)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as fout:
        json.dump(results, fout, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
