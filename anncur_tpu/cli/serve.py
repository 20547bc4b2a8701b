"""Batch/interactive query serving over a built CUR index.

Completes the production story: load encoder params + CUR index + item
tokens, then answer queries from a JSONL file (or stdin lines formatted
'mention<TAB>context_left<TAB>context_right') with top-k item ids.

Two serving modes (--mode):
- fixed    — anchor-score -> latent-project -> retrieve -> exact rerank;
             cost = n_anchors + top_k_retvr CE calls per query.
- adaptive — fused multi-round engine (core/adaptive_fused.py); cost =
             --budget CE calls per query, matching fixed-mode recall at
             a fraction of the calls (benchmarks/adaptive_matched_
             recall.json). Queries are micro-batched (--batch) either
             way for MXU efficiency.

With --http HOST:PORT the same engine serves over HTTP (stdlib-only,
one TPU dispatch at a time behind a lock). /query traffic is
dynamically batched: a coalescer worker gathers queries ACROSS
concurrent requests into shared fixed-shape device batches (see
Coalescer), so N small clients cost ~N/batch dispatches instead of N;
--coalesce_ms bounds the extra fill-wait latency (default 0):
- GET  /healthz            -> {"status", "n_items", "mode", ...}
- POST /query              -> {"queries": [{"mention", "context_left",
                              "context_right"}, ...]} (or one bare
                              query object) -> {"results": [...]}
- POST /add                -> {"items": [{"title", "description"}, ...]}
                              -> {"ids": [...]}; each added item costs
                              k_q CE calls, no index rebuild
                              (CurRetriever.add_items; requires a state
                              file built by CurRetriever.build)
- POST /remove             -> {"ids": [...]} -> {"removed": N}
Batches are padded to the steady --batch shape so no new device
programs are traced at serve time.
"""

from __future__ import annotations

import argparse
import json
import logging
import sys

import numpy as np

from anncur_tpu.core.cur import load_cur_index
from anncur_tpu.core.retriever import CurRetriever
from anncur_tpu.models.bert import BertSpec
from anncur_tpu.models.crossencoder import CrossEncoder
from anncur_tpu.models.tokenizer import WordPieceTokenizer
from anncur_tpu.train.checkpoint import load_pytree

LOGGER = logging.getLogger("anncur_tpu.serve")


class _Pending:
    """Per-request result slot set: filled by the coalescer worker as
    each device dispatch containing this request's queries completes."""

    def __init__(self, n):
        import threading

        self.rows = [None] * n
        self.remaining = n
        self.done = threading.Event()
        self.error = None

    def set(self, slot, row):
        self.rows[slot] = row
        self.remaining -= 1  # worker-thread only; no lock needed
        if self.remaining == 0:
            self.done.set()

    def fail(self, exc):
        self.error = exc
        self.done.set()


class Coalescer:
    """Cross-request dynamic micro-batching for the HTTP front-end.

    The TPU answers queries in fixed-shape batches (a new shape = a new
    compiled program), so a lone query is padded to ``batch`` rows and
    pays the full dispatch anyway — N concurrent single-query clients
    would pay N full dispatches where one suffices. This worker gathers
    queries ACROSS requests into shared device batches: each dispatch
    answers up to ``batch`` real queries instead of one, multiplying
    useful throughput by up to the batch size under concurrency (the
    standard dynamic-batching pattern of production model servers; the
    reference serves nothing — this is TPU-serving-specific).

    ``window_s`` bounds the extra latency: after the first query
    arrives the worker waits at most this long for the batch to fill
    (0 = dispatch whatever is queued immediately — coalescing then
    still happens under backlog, since queries queue while the device
    is busy). Memory is bounded by the callers: submit() blocks the
    request thread until its rows are filled, so the queue never holds
    more than the live HTTP threads' queries.
    """

    def __init__(self, dispatch, batch, window_s, device_lock):
        import threading

        self._dispatch = dispatch  # (queries, toks) -> rows, len <= batch
        self.batch = int(batch)
        self.window_s = float(window_s)
        self._device_lock = device_lock
        self._cond = threading.Condition()
        self._buf = []  # (query, tok, pending, slot)
        self._stop = False
        self.n_dispatches = 0
        self.n_queries = 0
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def submit(self, queries, toks):
        """Enqueue a whole request (any length) and block until every
        one of its queries is answered; returns rows in request order."""
        pending = _Pending(len(queries))
        with self._cond:
            if self._stop:
                raise RuntimeError("server shutting down")
            self._buf.extend(
                (q, t, pending, i) for i, (q, t) in enumerate(zip(queries, toks))
            )
            self._cond.notify_all()
        # no timeout: the worker always fills or fails every slot (its
        # dispatch call is wrapped); clients bound their own wait
        pending.done.wait()
        if pending.error is not None:
            raise pending.error
        return pending.rows

    def stop(self):
        with self._cond:
            self._stop = True
            self._cond.notify_all()
        self._worker.join(timeout=30)

    def _run(self):
        import time

        while True:
            with self._cond:
                while not self._buf and not self._stop:
                    self._cond.wait()
                if self._stop and not self._buf:
                    return
                if self.window_s > 0:
                    deadline = time.monotonic() + self.window_s
                    while len(self._buf) < self.batch and not self._stop:
                        left = deadline - time.monotonic()
                        if left <= 0:
                            break
                        self._cond.wait(timeout=left)
                take, self._buf = self._buf[: self.batch], self._buf[self.batch :]
                self.n_dispatches += 1
                self.n_queries += len(take)
            try:
                with self._device_lock:
                    rows = self._dispatch([q for q, _, _, _ in take],
                                          [t for _, t, _, _ in take])
                for (_, _, pending, slot), row in zip(take, rows):
                    pending.set(slot, row)
            except Exception as e:  # noqa: BLE001 — propagate to the waiters
                for _, _, pending, _ in take:
                    pending.fail(e)


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--index", required=True, help="CurRetriever.save state file or bare save_cur_index pickle")
    p.add_argument("--ent_tokens_file", default="", help="entity-token .npy (not needed with a CurRetriever.save state file)")
    p.add_argument("--vocab_file", required=True)
    p.add_argument("--crossenc_ckpt", default="")
    p.add_argument("--cross_enc_type", default="default")
    p.add_argument("--queries", default="-", help="JSONL with mention/context_left/context_right ('-' = stdin TSV)")
    p.add_argument("--out", default="-", help="output JSONL ('-' = stdout)")
    p.add_argument("--http", default="",
                   help="serve over HTTP at HOST:PORT (e.g. ':8080') "
                   "instead of reading --queries")
    p.add_argument("--top_k", type=int, default=10)
    p.add_argument("--top_k_retvr", type=int, default=100)
    p.add_argument("--mode", choices=["fixed", "adaptive"], default="fixed")
    p.add_argument("--budget", type=int, default=200,
                   help="adaptive mode: total CE calls per query")
    p.add_argument("--rounds", type=int, default=5,
                   help="adaptive mode: number of rounds")
    p.add_argument("--ada_method", choices=["cur", "axn"], default="cur")
    p.add_argument("--axn_rank", type=int, default=0, help="0 = full rank")
    p.add_argument("--escalate_budget", type=int, default=0,
                   help="adaptive mode: per-query early stopping — queries "
                   "whose top-k hasn't stabilized after --budget CE calls "
                   "spend up to this many total (0 = off); easy queries "
                   "stop at --budget, so the AVERAGE cost adapts to query "
                   "hardness instead of being a global constant")
    p.add_argument("--escalate_rounds", type=int, default=3,
                   help="adaptive mode: rounds for the escalation phase")
    p.add_argument("--batch", type=int, default=32,
                   help="queries per device dispatch (both modes); 32 favors "
                   "latency — adaptive throughput peaks near 512 "
                   "(measured 11.4 -> 20.3 q/s going 32 -> 512 on v5e)")
    p.add_argument("--coalesce_ms", type=float, default=0.0,
                   help="HTTP mode: wait up to this long for concurrent "
                   "requests' queries to fill a shared device batch "
                   "(dynamic batching). 0 keeps single-request latency but "
                   "still coalesces whatever queued while the device was "
                   "busy; a few ms multiplies throughput under many small "
                   "concurrent clients")
    p.add_argument("--max_query_len", type=int, default=None,
                   help="default: the state file's saved value, else 128")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--compute_dtype", choices=["bf16", "f32"], default="bf16",
                   help="encoder compute dtype; bf16 is the TPU serving "
                   "default — use f32 to bit-match an f32-built index "
                   "(rankings only differ within the score noise floor)")
    p.add_argument("--hidden_size", type=int, default=768)
    p.add_argument("--num_layers", type=int, default=12)
    p.add_argument("--num_heads", type=int, default=12)
    p.add_argument("--intermediate_size", type=int, default=3072)
    args = p.parse_args(argv)

    import jax

    from anncur_tpu.utils.platform import enable_compilation_cache

    # persistent XLA compile cache: serving pays 36-115 s of remote
    # compile before the first query on every cold start
    # (benchmarks/military_scale.json); warm restarts read from disk
    # instead (ANNCUR_COMPILE_CACHE=off to disable)
    enable_compilation_cache()

    tokenizer = WordPieceTokenizer.from_vocab_file(args.vocab_file)
    spec = BertSpec(
        vocab_size=tokenizer.vocab_size,
        hidden_size=args.hidden_size,
        num_layers=args.num_layers,
        num_heads=args.num_heads,
        intermediate_size=args.intermediate_size,
    )
    import jax.numpy as jnp

    ce = CrossEncoder(
        spec=spec,
        cross_enc_type=args.cross_enc_type,
        compute_dtype=jnp.float32 if args.compute_dtype == "f32" else jnp.bfloat16,
    )
    if args.crossenc_ckpt:
        tree, _ = load_pytree(args.crossenc_ckpt)
        params = tree.get("params", tree)
    else:
        LOGGER.warning("no --crossenc_ckpt: random cross-encoder")
        params = ce.init(jax.random.PRNGKey(args.seed))

    # two on-disk formats: a full retriever state file (CurRetriever.save
    # — carries item tokens, stable ids, and the dynamic-corpus factors)
    # or a bare CurIndex pickle + a separate entity-token .npy
    import pickle

    with open(args.index, "rb") as fin:
        blob = pickle.load(fin)
    if isinstance(blob, dict) and "item_tokens" in blob:
        retriever = CurRetriever.from_state_dict(blob, ce, params, tokenizer)
        if args.max_query_len is not None:
            # only an EXPLICIT flag overrides the persisted value — the
            # index was built for a specific query-length regime
            retriever.max_query_len = args.max_query_len
    else:
        if not args.ent_tokens_file:
            raise SystemExit("bare CurIndex pickles need --ent_tokens_file")
        ent_toks = np.load(args.ent_tokens_file).astype(np.int32)
        index = load_cur_index(args.index)
        retriever = CurRetriever(
            encoder=ce,
            params=params,
            tokenizer=tokenizer,
            item_tokens=ent_toks,
            index=index,
            anchor_item_ids=np.asarray(index.col_idxs),
            max_query_len=args.max_query_len if args.max_query_len is not None else 128,
        )
    LOGGER.info(
        "serving: %d items, %d anchor items, cost/query = %d + top_k_retvr CE calls",
        retriever.item_tokens.shape[0], len(retriever.anchor_item_ids),
        retriever.cost_per_query,
    )

    def tokenize(query):
        return retriever.tokenize_query(
            query["mention"],
            query.get("context_left", ""),
            query.get("context_right", ""),
        )

    def answer(queries, toks, batch=1):
        """Shared by the file loop and the HTTP handler: pad the batch
        to the steady-state shape (a smaller q traces a NEW fused
        program — 60-90 s remote compile — costing more than the whole
        run), dispatch once, format per-query result rows."""
        qtoks = np.asarray(toks, np.int32)
        n_real = qtoks.shape[0]
        if n_real < batch:
            qtoks = np.concatenate(
                [qtoks, np.repeat(qtoks[-1:], batch - n_real, axis=0)]
            )
        if args.mode == "adaptive":
            scores, ids = retriever.query_tokens_adaptive_fused(
                qtoks,
                total_budget=args.budget,
                n_rounds=args.rounds,
                top_k=args.top_k,
                method=args.ada_method,
                axn_rank=args.axn_rank or None,
                escalate_budget=args.escalate_budget or None,
                escalate_rounds=args.escalate_rounds,
                seed=args.seed,
            )
        else:
            scores, ids = retriever.query_tokens_batch(
                qtoks, top_k=args.top_k, top_k_retvr=args.top_k_retvr
            )
        return [
            {"query": q["mention"], "results": list(zip(i_row.tolist(), s_row.tolist()))}
            for q, s_row, i_row in zip(queries, scores, ids)
        ]

    def flush(queries, toks, fout, batch=1):
        if not queries:
            return
        for row in answer(queries, toks, batch):
            fout.write(json.dumps(row) + "\n")
        fout.flush()

    if args.http:
        return _serve_http(args, retriever, ce, tokenize, answer)

    fin = sys.stdin if args.queries == "-" else open(args.queries)
    fout = sys.stdout if args.out == "-" else open(args.out, "w")
    try:
        queries, toks = [], []
        # stdin is interactive: answer line-by-line; files use --batch
        batch = 1 if args.queries == "-" else max(1, args.batch)
        for line in fin:
            line = line.rstrip("\n")
            if not line:
                continue
            if args.queries == "-" or not line.startswith("{"):
                parts = line.split("\t")
                query = {"mention": parts[0],
                         "context_left": parts[1] if len(parts) > 1 else "",
                         "context_right": parts[2] if len(parts) > 2 else ""}
            else:
                query = json.loads(line)
            queries.append(query)
            toks.append(tokenize(query))
            if len(queries) >= batch:
                flush(queries, toks, fout, batch)
                queries, toks = [], []
        flush(queries, toks, fout, batch)
    finally:
        # never close sys.stdin/sys.stdout: main() is also an in-process
        # API (tests, drive) and closing the process streams breaks the
        # host (ValueError: I/O operation on closed file)
        if fin is not sys.stdin:
            fin.close()
        if fout is not sys.stdout:
            fout.close()


def _serve_http(args, retriever, ce, tokenize, answer):
    """Stdlib HTTP front-end over the serving engine. The TPU runs one
    program at a time, so every retriever call sits behind a lock; the
    threaded server only parallelizes request IO."""
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from anncur_tpu.data.tokenization import get_candidate_representation_ids

    # bound the request-body buffer: 64 MiB comfortably fits the largest
    # legitimate payload (tens of thousands of queries) while stopping a
    # bad Content-Length from OOMing the single-TPU serving process
    MAX_BODY_BYTES = 64 * 1024 * 1024

    lock = threading.Lock()
    # every /query flows through the coalescer: one worker drains a
    # shared queue in --batch slices, so queries from DIFFERENT requests
    # ride the same device dispatch (see Coalescer docstring)
    coalescer = Coalescer(
        dispatch=lambda qs, toks: answer(qs, toks, args.batch),
        batch=max(1, args.batch),
        window_s=max(0.0, args.coalesce_ms) / 1e3,
        device_lock=lock,
    )
    builder_box = {}

    def get_builder():
        # lazily built: /add is the only consumer, and it needs a mesh
        if "b" not in builder_box:
            import jax

            from anncur_tpu.indexer import ScoreMatrixBuilder
            from anncur_tpu.parallel import make_mesh

            mesh = make_mesh((len(jax.devices()),), ("data",))
            builder_box["b"] = ScoreMatrixBuilder(ce, mesh)
        return builder_box["b"]

    max_item_len = int(retriever.item_tokens.shape[1])

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *a):  # route through logging, not stderr
            LOGGER.info("%s " + fmt, self.address_string(), *a)

        def _send(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path != "/healthz":
                return self._send(404, {"error": "unknown path"})
            n_items = int(retriever.item_tokens.shape[0])
            self._send(
                200,
                {
                    "status": "ok",
                    "n_items": n_items,
                    "mode": args.mode,
                    # total CE calls per query, comparable across modes:
                    # adaptive spends its whole budget; fixed spends
                    # n_anchors (approx scores) + top_k_retvr (rerank).
                    # Mirror the engine's clamps (budget and top_k_retvr
                    # are both capped at the live corpus size) so the
                    # number capacity planners see is what is spent.
                    "cost_per_query": int(
                        min(args.budget, n_items)
                        if args.mode == "adaptive"
                        else retriever.cost_per_query
                        + min(args.top_k_retvr, n_items)
                    ),
                    # early-stop ceiling (0 = off): cost_per_query above is
                    # the guaranteed floor; unstable queries may spend up
                    # to this many CE calls
                    "escalate_budget": int(
                        min(args.escalate_budget, n_items)
                        if args.mode == "adaptive" and args.escalate_budget
                        else 0
                    ),
                    "batch": args.batch,
                    "coalesce_ms": args.coalesce_ms,
                    # dynamic-batching observability: dispatches <
                    # queries_answered means cross-request coalescing is
                    # actually saving device programs
                    "dispatches": coalescer.n_dispatches,
                    "queries_answered": coalescer.n_queries,
                },
            )

        def do_POST(self):
            try:
                if "chunked" in self.headers.get("Transfer-Encoding", "").lower():
                    # stdlib handlers don't decode chunked bodies; a
                    # Content-Length-only read would see b"" and emit a
                    # misleading "no queries" 400
                    return self._send(
                        411, {"error": "chunked Transfer-Encoding unsupported; send Content-Length"}
                    )
                n = int(self.headers.get("Content-Length", 0))
                if n < 0:
                    # read(-n) would block until EOF on a keep-alive
                    # connection, hanging this handler thread forever
                    return self._send(400, {"error": "negative Content-Length"})
                if n > MAX_BODY_BYTES:
                    # bound the in-RAM buffer: one bad client must not
                    # OOM the single-TPU serving process
                    return self._send(
                        413, {"error": f"body too large ({n} > {MAX_BODY_BYTES} bytes)"}
                    )
                req = json.loads(self.rfile.read(n) or b"{}")
            except (ValueError, json.JSONDecodeError) as e:
                return self._send(400, {"error": f"bad json: {e}"})
            try:
                if self.path == "/query":
                    queries = req.get("queries", [req] if "mention" in req else [])
                    if not queries:
                        return self._send(400, {"error": "no queries"})
                    # tokenize (pure host-side CPU work) BEFORE entering
                    # the coalescer so concurrent requests only serialize
                    # on the TPU, not on WordPiece
                    toks = [tokenize(q) for q in queries]
                    # the coalescer drains the shared queue in --batch
                    # slices: arbitrary request sizes reuse the steady
                    # compiled program, one huge request can't starve
                    # concurrent small ones (fair at batch granularity),
                    # and queries from different requests share dispatches
                    rows = coalescer.submit(queries, toks)
                    return self._send(200, {"results": rows})
                if self.path == "/add":
                    items = req.get("items", [])
                    if not items:
                        return self._send(400, {"error": "no items"})
                    # id-level fast path (native C++ tokenizer capable),
                    # same ids as the token-level builder (tested parity)
                    toks = np.asarray(
                        [
                            get_candidate_representation_ids(
                                it.get("description", ""),
                                retriever.tokenizer,
                                max_item_len,
                                candidate_title=it.get("title"),
                            )
                            for it in items
                        ],
                        np.int32,
                    )
                    with lock:
                        ids = retriever.add_items(toks, get_builder())
                    return self._send(200, {"ids": [int(i) for i in ids]})
                if self.path == "/remove":
                    ids = req.get("ids", [])
                    if not ids:
                        return self._send(400, {"error": "no ids"})
                    with lock:
                        n_removed = retriever.remove_items(np.asarray(ids, np.int64))
                    # duplicates collapse inside remove_items; report
                    # what actually happened, not the request length
                    return self._send(200, {"removed": n_removed})
                return self._send(404, {"error": "unknown path"})
            except (ValueError, KeyError, TypeError, AttributeError) as e:
                # TypeError/AttributeError cover well-formed JSON of the
                # wrong shape (top-level array, string query items, ...):
                # the client must get a 400, not a dropped connection
                return self._send(400, {"error": str(e)})
            except Exception as e:  # noqa: BLE001 — server fault, not client
                # device OOM / XLA runtime errors must surface as a 500
                # with a server-side traceback, not a dropped socket
                LOGGER.exception("internal error serving %s", self.path)
                return self._send(500, {"error": f"internal error: {e}"})

    # mark any previous in-process server stale BEFORE binding: if this
    # bind fails, pollers must see "no server" (and time out with a clear
    # message), not grab an earlier shut-down instance
    _serve_http.last_server = None
    host, _, port = args.http.rpartition(":")
    host = host.strip("[]")  # accept bracketed IPv6 literals ([::1]:8080)
    # stdlib default request_queue_size=5 (the socket listen backlog):
    # a burst of concurrent clients beyond ~5 simultaneous connects gets
    # RST before accept() ever runs (measured: 44/256 connection-reset
    # at 64 concurrent clients). The whole point of the coalescer is
    # many concurrent small clients, so take a production-sized backlog.
    attrs = {"request_queue_size": 128}
    if ":" in host:  # IPv6 literal needs an AF_INET6 socket
        import socket

        attrs["address_family"] = socket.AF_INET6
    server_cls = type("CoalescingHTTPServer", (ThreadingHTTPServer,), attrs)
    server = server_cls((host or "127.0.0.1", int(port)), Handler)
    LOGGER.info("HTTP serving on %s:%d (mode=%s)", *server.server_address[:2], args.mode)
    # test/embedding hook: callers running main() in a thread can reach
    # the live server (actual port with ':0', shutdown()) through here;
    # .retriever lets the soak harness count compiled fused programs
    # (the no-mid-soak-recompile contract, tools/serving_soak.py)
    server.retriever = retriever
    _serve_http.last_server = server
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
        coalescer.stop()
    return server


if __name__ == "__main__":
    main()
