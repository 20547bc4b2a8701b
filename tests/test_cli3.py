"""CLI round 3: bienc scores producer, ent2ent builder, plot tool —
composed as the full fixed_anc_ent + bienc baseline pipeline."""

import json
import os
import pickle

import numpy as np
import pytest

from anncur_tpu.data.synthetic import make_tokenized_world, make_tokenizer

TINY = ["--hidden_size", "32", "--num_layers", "1", "--num_heads", "2",
        "--intermediate_size", "64"]


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli3")
    ment, ent, gt, tok = make_tokenized_world(seed=6, n_ents=24, n_ments=12, max_ment_len=16, max_ent_len=16)
    vocab = str(root / "vocab.txt")
    tok.save_vocab(vocab)
    npy = str(root / "ents.npy")
    np.save(npy, ent)
    from anncur_tpu.indexer import save_score_matrix

    rng = np.random.default_rng(0)
    scores = rng.standard_normal((12, 24)).astype(np.float32)
    pkl = str(root / "scores.pkl")
    save_score_matrix(pkl, scores, ment, np.arange(24), ent)
    return {"root": str(root), "vocab": vocab, "ent_npy": npy, "scores_pkl": pkl}


def test_compute_bienc_scores_cli(artifacts, tmp_path):
    from anncur_tpu.cli import compute_bienc_scores

    out = str(tmp_path / "bienc.pkl")
    compute_bienc_scores.main(
        ["--score_matrix", artifacts["scores_pkl"], "--ent_tokens_file", artifacts["ent_npy"],
         "--vocab_file", artifacts["vocab"], "--out_file", out, "--batch_size", "8",
         "--pooling_type", "cls"] + TINY
    )
    with open(out, "rb") as fin:
        scores = pickle.load(fin)["scores"]
    assert scores.shape == (12, 24)

    # feeds eval_retrieval --bienc_scores_pkl end-to-end
    from anncur_tpu.cli import eval_retrieval

    eval_retrieval.main(
        ["--mode", "inductive", "--score_matrix", artifacts["scores_pkl"],
         "--res_dir", str(tmp_path / "ind"), "--methods", "bienc",
         "--bienc_scores_pkl", out, "--top_k_vals", "5",
         "--top_k_retvr_vals", "10", "--n_ent_anchors_vals", "8"]
    )
    assert os.path.exists(str(tmp_path / "ind" / "method=bienc_s=0" / "res.json"))


def test_build_ent2ent_cli_and_fixed_anc_eval(artifacts, tmp_path):
    from anncur_tpu.cli import build_ent2ent

    out = str(tmp_path / "e2e.pkl")
    build_ent2ent.main(
        ["--ent_tokens_file", artifacts["ent_npy"], "--vocab_file", artifacts["vocab"],
         "--n_anchors", "6", "--out_file", out, "--ment_block", "4", "--ent_block", "4"] + TINY
    )
    from anncur_tpu.indexer.ent2ent import load_ent_to_ent_pickle

    scores, anchors = load_ent_to_ent_pickle(out)
    assert scores.shape == (24, len(anchors))


def test_plot_results_cli(artifacts, tmp_path, low_rank_factory):
    from anncur_tpu.cli import plot_results
    from anncur_tpu.evalx.transductive import run_transductive_eval

    mat = low_rank_factory(n=30, m=40, rank=4)
    res_dir = str(tmp_path / "trans")
    run_transductive_eval(
        mat, res_dir, methods=("cur",), n_seeds=1,
        n_ment_anchors_vals=[8, 16], n_ent_anchors_vals=[8, 16],
        top_k_vals=[5], top_k_retvr_vals=[16],
    )
    out_dir = str(tmp_path / "plots")
    plot_results.main(
        ["--transductive_json", os.path.join(res_dir, "retrieval_wrt_exact_crossenc.json"),
         "--score_matrix", artifacts["scores_pkl"],
         "--out_dir", out_dir, "--methods", "cur", "--top_k", "5", "--top_k_retvr", "16"]
    )
    files = os.listdir(out_dir)
    assert any(f.startswith("heatmap_cur") for f in files)
    assert "score_distribution.pdf" in files


def test_tfidf_inductive_eval_cli(tmp_path):
    """method=tfidf through the CLI: raw texts -> tfidf scores -> eval."""
    import numpy as np

    from anncur_tpu.cli import eval_retrieval
    from anncur_tpu.data.synthetic import make_tokenizer, make_world, write_world_files
    from anncur_tpu.data.tokenization import tokenize_mentions
    from anncur_tpu.indexer import save_score_matrix

    rng = np.random.default_rng(3)
    mentions, entities = make_world(rng, n_ents=25, n_ments=10)
    files = write_world_files(str(tmp_path), mentions, entities)
    tok = make_tokenizer()
    ment_toks = tokenize_mentions(mentions, tok, 16)
    scores = rng.standard_normal((10, 25)).astype(np.float32)
    pkl = str(tmp_path / "sm.pkl")
    save_score_matrix(pkl, scores, ment_toks, np.arange(25))

    res_dir = str(tmp_path / "res")
    eval_retrieval.main(
        ["--mode", "inductive", "--score_matrix", pkl, "--res_dir", res_dir,
         "--methods", "tfidf", "--ment_file", files["ment_file"],
         "--ent_file", files["ent_file"], "--top_k_vals", "5",
         "--top_k_retvr_vals", "10", "--n_ent_anchors_vals", "8"]
    )
    assert os.path.exists(os.path.join(res_dir, "method=tfidf_s=0", "res.json"))


def test_serve_cli(tmp_path):
    """serve CLI: build an index, persist it, answer file queries."""
    import json as _json

    import numpy as np

    from anncur_tpu.cli import serve
    from anncur_tpu.core.cur import build_cur, save_cur_index
    from anncur_tpu.data.synthetic import make_tokenized_world

    ment, ent, gt, tok = make_tokenized_world(seed=12, n_ents=20, n_ments=10,
                                              max_ment_len=16, max_ent_len=16)
    vocab = str(tmp_path / "vocab.txt")
    tok.save_vocab(vocab)
    npy = str(tmp_path / "ents.npy")
    np.save(npy, ent)
    rng = np.random.default_rng(0)
    train_scores = rng.standard_normal((6, 20)).astype(np.float32)
    anchors = np.arange(0, 20, 4)
    index = build_cur(train_scores, train_scores[:, anchors], np.arange(6), anchors,
                      validate=False)
    idx_path = str(tmp_path / "index.pkl")
    save_cur_index(idx_path, index)

    qfile = str(tmp_path / "queries.jsonl")
    with open(qfile, "w") as fout:
        fout.write(_json.dumps({"mention": "alpha beta", "context_left": "gamma"}) + "\n")
        fout.write(_json.dumps({"mention": "delta"}) + "\n")
    out = str(tmp_path / "out.jsonl")
    serve.main(
        ["--index", idx_path, "--ent_tokens_file", npy, "--vocab_file", vocab,
         "--queries", qfile, "--out", out, "--top_k", "3", "--top_k_retvr", "8",
         "--max_query_len", "16",
         "--hidden_size", "32", "--num_layers", "1", "--num_heads", "2",
         "--intermediate_size", "64"]
    )
    lines = [_json.loads(l) for l in open(out)]
    assert len(lines) == 2
    assert len(lines[0]["results"]) == 3
    assert all(0 <= i < 20 for i, _ in lines[0]["results"])


def test_combine_chunks_gap_detection(tmp_path):
    """Missing chunk -> loud failure, not silent truncation."""
    import numpy as np

    from anncur_tpu.indexer import combine_chunks

    d = str(tmp_path)
    np.savez_compressed(os.path.join(d, "chunk_0.npz"), scores=np.ones((4, 6)), row_start=0)
    np.savez_compressed(os.path.join(d, "chunk_8.npz"), scores=np.ones((4, 6)), row_start=8)
    with pytest.raises(ValueError, match="gap"):
        combine_chunks(d)


def test_serve_cli_retriever_state_file(tmp_path):
    """serve CLI with a CurRetriever.save state file (no separate
    entity-token .npy needed; stable ids survive)."""
    import json as _json

    import jax
    import jax.numpy as jnp
    import numpy as np

    from anncur_tpu.cli import serve
    from anncur_tpu.core.cur import build_cur
    from anncur_tpu.core.retriever import CurRetriever
    from anncur_tpu.data.synthetic import make_tokenized_world
    from anncur_tpu.models.bert import BertSpec
    from anncur_tpu.models.crossencoder import CrossEncoder
    from anncur_tpu.train.checkpoint import save_pytree

    ment, ent, gt, tok = make_tokenized_world(seed=14, n_ents=20, n_ments=10,
                                              max_ment_len=16, max_ent_len=16)
    vocab = str(tmp_path / "vocab.txt")
    tok.save_vocab(vocab)
    spec = BertSpec.tiny(vocab_size=tok.vocab_size, hidden_size=32, num_layers=1,
                         num_heads=2, intermediate_size=64)  # 128 positions:
    # serve pads pairs to pair_pad_multiple (128), so the position table
    # must cover 128 rows
    ce = CrossEncoder(spec=spec, compute_dtype=jnp.float32)
    params = ce.init(jax.random.PRNGKey(4))
    ckpt = str(tmp_path / "ce.pkl")
    save_pytree(ckpt, {"params": params})

    rng = np.random.default_rng(0)
    train_scores = rng.standard_normal((6, 20)).astype(np.float32)
    anchors = np.arange(0, 20, 4)
    index = build_cur(train_scores, train_scores[:, anchors], np.arange(6), anchors,
                      validate=False)
    retr = CurRetriever(
        encoder=ce, params=params, tokenizer=tok, item_tokens=np.asarray(ent),
        index=index, anchor_item_ids=anchors, max_query_len=16,
    )
    state = str(tmp_path / "retr_state.pkl")
    retr.save(state)

    qfile = str(tmp_path / "queries.jsonl")
    with open(qfile, "w") as fout:
        fout.write(_json.dumps({"mention": "alpha beta"}) + "\n")
    out = str(tmp_path / "out.jsonl")
    serve.main(
        ["--index", state, "--vocab_file", vocab, "--crossenc_ckpt", ckpt,
         "--queries", qfile, "--out", out, "--top_k", "3", "--top_k_retvr", "8",
         "--max_query_len", "16",
         "--hidden_size", "32", "--num_layers", "1", "--num_heads", "2",
         "--intermediate_size", "64"]
    )
    lines = [_json.loads(l) for l in open(out)]
    assert len(lines) == 1 and len(lines[0]["results"]) == 3


def test_combine_rr_dirs_enables_from_precomputed(tmp_path, mesh8):
    """Chunked retrieve-rerank dirs -> rr_dirs combine -> re-scoring from
    the combined dir must equal the monolithic run (the file-level
    topk_preds combiner alone could not merge gt_labels.txt)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from anncur_tpu.cli import combine_chunks
    from anncur_tpu.data.synthetic import make_tokenized_world
    from anncur_tpu.evalx.retrieve_rerank import (
        run_from_precomputed_preds,
        run_retrieve_rerank_eval,
    )
    from anncur_tpu.models.bert import BertSpec
    from anncur_tpu.models.biencoder import BiEncoder
    from anncur_tpu.models.crossencoder import CrossEncoder

    ment, ent, gt, tok = make_tokenized_world(seed=16, n_ents=24, n_ments=12,
                                              max_ment_len=16, max_ent_len=16)
    spec = BertSpec.tiny(vocab_size=tok.vocab_size, max_position_embeddings=64)
    bienc = BiEncoder(spec=spec, pooling_type="cls", embed_dim=spec.hidden_size, compute_dtype=jnp.float32)
    ce = CrossEncoder(spec=spec, compute_dtype=jnp.float32)
    bp = bienc.init(jax.random.PRNGKey(0))
    cp = ce.init(jax.random.PRNGKey(1))

    mono = run_retrieve_rerank_eval(
        bienc, bp, ce, cp, ment, ent, gt, top_k=8, batch_size=8,
        res_dir=str(tmp_path / "mono"),
    )
    for start, n in ((0, 6), (6, -1)):
        run_retrieve_rerank_eval(
            bienc, bp, ce, cp, ment, ent, gt, top_k=8, batch_size=8,
            res_dir=str(tmp_path / f"chunk{start}"), ment_start=start, n_ment=n,
        )
    combine_chunks.main([
        "--mode", "rr_dirs",
        "--chunks", str(tmp_path / "chunk0"), str(tmp_path / "chunk6"),
        "--out", str(tmp_path / "combined"),
    ])
    rescored = run_from_precomputed_preds(str(tmp_path / "combined"))
    for head in ("bienc", "crossenc"):
        for metric, val in mono[head].items():
            assert abs(float(rescored[head][metric]) - float(val)) < 1e-6, (head, metric)


def test_retrieve_rerank_empty_slice_fails_cleanly(mesh8):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from anncur_tpu.data.synthetic import make_tokenized_world
    from anncur_tpu.evalx.retrieve_rerank import run_retrieve_rerank_eval
    from anncur_tpu.models.bert import BertSpec
    from anncur_tpu.models.biencoder import BiEncoder
    from anncur_tpu.models.crossencoder import CrossEncoder

    ment, ent, gt, tok = make_tokenized_world(seed=17, n_ents=12, n_ments=6,
                                              max_ment_len=16, max_ent_len=16)
    spec = BertSpec.tiny(vocab_size=tok.vocab_size, max_position_embeddings=64)
    bienc = BiEncoder(spec=spec, pooling_type="cls", embed_dim=spec.hidden_size, compute_dtype=jnp.float32)
    ce = CrossEncoder(spec=spec, compute_dtype=jnp.float32)
    with pytest.raises(ValueError, match="empty mention slice"):
        run_retrieve_rerank_eval(
            bienc, bienc.init(jax.random.PRNGKey(0)), ce, ce.init(jax.random.PRNGKey(1)),
            ment, ent, gt, top_k=4, ment_start=99,
        )


def test_serve_cli_adaptive_mode(tmp_path):
    """serve CLI --mode adaptive: answers come from the fused multi-round
    engine at --budget CE calls per query."""
    import json as _json

    import numpy as np

    from anncur_tpu.cli import serve
    from anncur_tpu.core.cur import build_cur, save_cur_index
    from anncur_tpu.data.synthetic import make_tokenized_world

    ment, ent, gt, tok = make_tokenized_world(seed=12, n_ents=20, n_ments=10,
                                              max_ment_len=16, max_ent_len=16)
    vocab = str(tmp_path / "vocab.txt")
    tok.save_vocab(vocab)
    npy = str(tmp_path / "ents.npy")
    np.save(npy, ent)
    rng = np.random.default_rng(0)
    train_scores = rng.standard_normal((6, 20)).astype(np.float32)
    anchors = np.arange(0, 20, 4)
    index = build_cur(train_scores, train_scores[:, anchors], np.arange(6), anchors,
                      validate=False)
    idx_path = str(tmp_path / "index.pkl")
    save_cur_index(idx_path, index)

    qfile = str(tmp_path / "queries.jsonl")
    with open(qfile, "w") as fout:
        fout.write(_json.dumps({"mention": "alpha beta", "context_left": "gamma"}) + "\n")
        fout.write(_json.dumps({"mention": "delta"}) + "\n")
        fout.write(_json.dumps({"mention": "epsilon zeta"}) + "\n")
    out = str(tmp_path / "out.jsonl")
    serve.main(
        ["--index", idx_path, "--ent_tokens_file", npy, "--vocab_file", vocab,
         "--queries", qfile, "--out", out, "--top_k", "3",
         "--mode", "adaptive", "--budget", "12", "--rounds", "3",
         "--max_query_len", "16",
         "--hidden_size", "32", "--num_layers", "1", "--num_heads", "2",
         "--intermediate_size", "64"]
    )
    lines = [_json.loads(l) for l in open(out)]
    assert len(lines) == 3
    for rec in lines:
        assert len(rec["results"]) == 3
        assert all(0 <= i < 20 for i, _ in rec["results"])
        scores = [s for _, s in rec["results"]]
        assert scores == sorted(scores, reverse=True)

    # early-stop escalation exposed: same pipeline with a ceiling — easy
    # queries stop at --budget, unstable ones spend up to escalate_budget
    out2 = str(tmp_path / "out_es.jsonl")
    serve.main(
        ["--index", idx_path, "--ent_tokens_file", npy, "--vocab_file", vocab,
         "--queries", qfile, "--out", out2, "--top_k", "3",
         "--mode", "adaptive", "--budget", "8", "--rounds", "2",
         "--escalate_budget", "16", "--escalate_rounds", "2",
         "--max_query_len", "16",
         "--hidden_size", "32", "--num_layers", "1", "--num_heads", "2",
         "--intermediate_size", "64"]
    )
    lines2 = [_json.loads(l) for l in open(out2)]
    assert len(lines2) == 3
    for rec in lines2:
        assert len(rec["results"]) == 3
        scores = [s for _, s in rec["results"]]
        assert scores == sorted(scores, reverse=True)


def test_serve_cli_http_mode(tmp_path, mesh8):
    """--http: query/add/remove/healthz over the stdlib HTTP front-end,
    dynamic corpus updates included (add costs k_q CE calls, no
    rebuild)."""
    import json as _json
    import threading
    import time as _time
    import urllib.request

    import jax
    import jax.numpy as jnp
    import numpy as np

    from anncur_tpu.cli import serve
    from anncur_tpu.core.retriever import CurRetriever
    from anncur_tpu.data.synthetic import make_tokenized_world
    from anncur_tpu.indexer.score_matrix import ScoreMatrixBuilder
    from anncur_tpu.models.bert import BertSpec
    from anncur_tpu.models.crossencoder import CrossEncoder
    from anncur_tpu.train.checkpoint import save_pytree

    ment, ent, gt, tok = make_tokenized_world(seed=15, n_ents=20, n_ments=10,
                                              max_ment_len=16, max_ent_len=16)
    vocab = str(tmp_path / "vocab.txt")
    tok.save_vocab(vocab)
    spec = BertSpec.tiny(vocab_size=tok.vocab_size, hidden_size=32, num_layers=1,
                         num_heads=2, intermediate_size=64)
    ce = CrossEncoder(spec=spec, compute_dtype=jnp.float32)
    params = ce.init(jax.random.PRNGKey(4))
    ckpt = str(tmp_path / "ce.pkl")
    save_pytree(ckpt, {"params": params})

    # build (not bare-constructed): /add needs U + anchor-query tokens
    builder = ScoreMatrixBuilder(ce, mesh8, ment_block=2, ent_block=4,
                                 pair_pad_multiple=32)
    retr = CurRetriever.build(
        encoder=ce, params=params, tokenizer=tok,
        train_query_tokens=np.asarray(ment[:6]), item_tokens=np.asarray(ent),
        n_anchor_items=5, builder=builder, max_query_len=16,
    )
    state = str(tmp_path / "retr_state.pkl")
    retr.save(state)

    argv = ["--index", state, "--vocab_file", vocab, "--crossenc_ckpt", ckpt,
            "--http", "127.0.0.1:0", "--top_k", "3", "--top_k_retvr", "50",
            "--batch", "2", "--max_query_len", "16",
            "--hidden_size", "32", "--num_layers", "1", "--num_heads", "2",
            "--intermediate_size", "64"]
    # Clear any stale (shut-down) server left by an earlier HTTP test, else
    # the poll below can grab it and hit "Connection refused".
    serve._serve_http.last_server = None
    t = threading.Thread(target=serve.main, args=(argv,), daemon=True)
    t.start()
    deadline = _time.time() + 60
    server = None
    while _time.time() < deadline and server is None:
        server = getattr(serve._serve_http, "last_server", None)
        _time.sleep(0.05)
    assert server is not None, "HTTP server did not come up"
    base = "http://127.0.0.1:%d" % server.server_address[1]

    def call(path, payload=None):
        req = urllib.request.Request(
            base + path,
            data=None if payload is None else _json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
            method="GET" if payload is None else "POST",
        )
        try:
            with urllib.request.urlopen(req, timeout=120) as resp:
                return resp.status, _json.loads(resp.read())
        except urllib.error.HTTPError as e:
            return e.code, _json.loads(e.read())

    try:
        code, health = call("/healthz")
        assert code == 200 and health["status"] == "ok" and health["n_items"] == 20

        # 3 queries through a batch-2 program: padded tail, results exact
        code, out = call("/query", {"queries": [
            {"mention": "alpha beta", "context_left": "gamma"},
            {"mention": "delta"},
            {"mention": "epsilon zeta"},
        ]})
        assert code == 200 and len(out["results"]) == 3
        for row in out["results"]:
            assert len(row["results"]) == 3  # top_k
            ids = [i for i, _ in row["results"]]
            assert all(0 <= i < 20 for i in ids)

        # single bare query object also accepted
        code, out1 = call("/query", {"mention": "alpha beta", "context_left": "gamma"})
        assert code == 200
        assert out1["results"][0]["results"] == out["results"][0]["results"]

        code, added = call("/add", {"items": [
            {"title": "new thing", "description": "alpha alpha beta"}]})
        assert code == 200 and added["ids"] == [20]
        code, health = call("/healthz")
        assert health["n_items"] == 21
        code, out2 = call("/query", {"mention": "alpha beta"})
        assert code == 200  # queries recompile against the grown corpus

        # duplicate ids collapse to one removal (a double-counted slot
        # used to double-shift every anchor position past it, silently
        # corrupting col_idxs for all later queries)
        code, removed = call("/remove", {"ids": [20, 20]})
        assert code == 200 and removed["removed"] == 1
        code, health = call("/healthz")
        assert health["n_items"] == 20
        # corpus is back to the build state; anchors must be intact, so
        # the same query returns byte-identical results
        code, out3 = call("/query", {"mention": "alpha beta", "context_left": "gamma"})
        assert code == 200
        assert out3["results"][0]["results"] == out["results"][0]["results"]

        # error paths surface as 400s, not hung connections
        assert call("/query", {})[0] == 400
        assert call("/remove", {"ids": [999]})[0] == 400
        assert call("/nope", {"x": 1})[0] == 404
        # well-formed JSON of the wrong SHAPE must also 400 (not drop
        # the socket): top-level array, string query items, non-dict add
        assert call("/query", [{"mention": "x"}])[0] == 400
        assert call("/query", {"queries": ["just a string"]})[0] == 400
        assert call("/add", {"items": ["nope"]})[0] == 400

        # healthz cost_per_query counts the FULL fixed-mode cost:
        # n_anchors (approx) + top_k_retvr (rerank) CE calls per query —
        # with top_k_retvr mirroring the engine's corpus-size clamp
        # (--top_k_retvr 50 on a 20-item corpus actually spends 20)
        code, health = call("/healthz")
        assert health["cost_per_query"] == retr.cost_per_query + 20
    finally:
        server.shutdown()
        t.join(timeout=30)
    assert not t.is_alive()


def test_serve_http_concurrent_clients(tmp_path, mesh8):
    """The threaded HTTP server serializes device work per batch slice;
    N concurrent clients (queries + healthz interleaved) must all get
    correct answers — no dropped sockets, no cross-request bleed."""
    import json as _json
    import threading
    import time as _time
    import urllib.request

    import jax
    import jax.numpy as jnp
    import numpy as np

    from anncur_tpu.cli import serve
    from anncur_tpu.core.retriever import CurRetriever
    from anncur_tpu.data.synthetic import make_tokenized_world
    from anncur_tpu.indexer.score_matrix import ScoreMatrixBuilder
    from anncur_tpu.models.bert import BertSpec
    from anncur_tpu.models.crossencoder import CrossEncoder
    from anncur_tpu.train.checkpoint import save_pytree

    ment, ent, gt, tok = make_tokenized_world(seed=17, n_ents=16, n_ments=8,
                                              max_ment_len=16, max_ent_len=16)
    vocab = str(tmp_path / "vocab.txt")
    tok.save_vocab(vocab)
    spec = BertSpec.tiny(vocab_size=tok.vocab_size, hidden_size=32, num_layers=1,
                         num_heads=2, intermediate_size=64)
    ce = CrossEncoder(spec=spec, compute_dtype=jnp.float32)
    params = ce.init(jax.random.PRNGKey(6))
    ckpt = str(tmp_path / "ce.pkl")
    save_pytree(ckpt, {"params": params})
    builder = ScoreMatrixBuilder(ce, mesh8, ment_block=2, ent_block=4,
                                 pair_pad_multiple=32)
    retr = CurRetriever.build(
        encoder=ce, params=params, tokenizer=tok,
        train_query_tokens=np.asarray(ment[:4]), item_tokens=np.asarray(ent),
        n_anchor_items=4, builder=builder, max_query_len=16,
    )
    state = str(tmp_path / "retr_state.pkl")
    retr.save(state)

    argv = ["--index", state, "--vocab_file", vocab, "--crossenc_ckpt", ckpt,
            "--http", "127.0.0.1:0", "--top_k", "2", "--top_k_retvr", "6",
            "--batch", "2", "--max_query_len", "16",
            "--hidden_size", "32", "--num_layers", "1", "--num_heads", "2",
            "--intermediate_size", "64"]
    serve._serve_http.last_server = None  # stale-server guard, as above
    t = threading.Thread(target=serve.main, args=(argv,), daemon=True)
    t.start()
    deadline = _time.time() + 60
    server = None
    while _time.time() < deadline and server is None:
        server = getattr(serve._serve_http, "last_server", None)
        _time.sleep(0.05)
    assert server is not None
    base = "http://127.0.0.1:%d" % server.server_address[1]

    def call(path, payload=None):
        req = urllib.request.Request(
            base + path,
            data=None if payload is None else _json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
            method="GET" if payload is None else "POST",
        )
        with urllib.request.urlopen(req, timeout=120) as resp:
            return resp.status, _json.loads(resp.read())

    try:
        # warm the steady program once, and capture the expected answer
        # per distinct mention
        mentions = [f"alpha {i}" for i in range(4)]
        expect = {}
        for m in mentions:
            code, out = call("/query", {"mention": m})
            assert code == 200
            expect[m] = out["results"][0]["results"]

        errors, lock = [], threading.Lock()

        def client(mention, reps):
            try:
                for _ in range(reps):
                    code, out = call("/query", {"queries": [{"mention": mention}] * 3})
                    assert code == 200 and len(out["results"]) == 3
                    for row in out["results"]:
                        assert row["results"] == expect[mention], (
                            mention, row["results"], expect[mention])
                    code, health = call("/healthz")
                    assert code == 200 and health["n_items"] == 16
            except Exception as e:  # noqa: BLE001 — collected for the main thread
                with lock:
                    errors.append(f"{mention}: {e!r}")

        threads = [
            threading.Thread(target=client, args=(m, 3))
            for m in mentions + mentions  # two clients per mention
        ]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=300)
        assert not errors, errors

        # burst phase: many clients CONNECT at the same instant. The
        # stdlib default listen backlog (request_queue_size=5) RSTs
        # connections beyond ~5 simultaneous connects before accept()
        # runs (measured 44/256 resets at 64 clients on the TPU bench);
        # the server must take a production-sized backlog instead.
        assert type(server).request_queue_size >= 48, type(server).request_queue_size
        burst_errors = []
        barrier = threading.Barrier(48)

        def burst_client(i):
            m = mentions[i % len(mentions)]
            try:
                barrier.wait(timeout=60)
                code, out = call("/query", {"mention": m})
                assert code == 200 and out["results"][0]["results"] == expect[m]
            except Exception as e:  # noqa: BLE001 — collected for the main thread
                with lock:
                    burst_errors.append(f"{i}: {e!r}")

        burst = [threading.Thread(target=burst_client, args=(i,)) for i in range(48)]
        for th in burst:
            th.start()
        for th in burst:
            th.join(timeout=300)
        # a hung client appends nothing — without this the test would
        # pass vacuously on a wedged coalescer/socket (ADVICE r3)
        assert not any(th.is_alive() for th in burst), "burst client(s) hung"
        assert not burst_errors, burst_errors
    finally:
        server.shutdown()
        t.join(timeout=30)
    assert not t.is_alive()


def test_serve_http_coalesces_concurrent_queries(tmp_path, mesh8):
    """Dynamic batching: single-query requests fired concurrently must
    share device dispatches (healthz dispatches < queries_answered),
    with every client still getting its own exact answer."""
    import json as _json
    import threading
    import time as _time
    import urllib.request

    import jax
    import jax.numpy as jnp
    import numpy as np

    from anncur_tpu.cli import serve
    from anncur_tpu.core.retriever import CurRetriever
    from anncur_tpu.data.synthetic import make_tokenized_world
    from anncur_tpu.indexer.score_matrix import ScoreMatrixBuilder
    from anncur_tpu.models.bert import BertSpec
    from anncur_tpu.models.crossencoder import CrossEncoder
    from anncur_tpu.train.checkpoint import save_pytree

    ment, ent, gt, tok = make_tokenized_world(seed=23, n_ents=16, n_ments=8,
                                              max_ment_len=16, max_ent_len=16)
    vocab = str(tmp_path / "vocab.txt")
    tok.save_vocab(vocab)
    spec = BertSpec.tiny(vocab_size=tok.vocab_size, hidden_size=32, num_layers=1,
                         num_heads=2, intermediate_size=64)
    ce = CrossEncoder(spec=spec, compute_dtype=jnp.float32)
    params = ce.init(jax.random.PRNGKey(9))
    ckpt = str(tmp_path / "ce.pkl")
    save_pytree(ckpt, {"params": params})
    builder = ScoreMatrixBuilder(ce, mesh8, ment_block=2, ent_block=4,
                                 pair_pad_multiple=32)
    retr = CurRetriever.build(
        encoder=ce, params=params, tokenizer=tok,
        train_query_tokens=np.asarray(ment[:4]), item_tokens=np.asarray(ent),
        n_anchor_items=4, builder=builder, max_query_len=16,
    )
    state = str(tmp_path / "retr_state.pkl")
    retr.save(state)

    argv = ["--index", state, "--vocab_file", vocab, "--crossenc_ckpt", ckpt,
            "--http", "127.0.0.1:0", "--top_k", "2", "--top_k_retvr", "6",
            "--batch", "4", "--coalesce_ms", "300", "--max_query_len", "16",
            "--hidden_size", "32", "--num_layers", "1", "--num_heads", "2",
            "--intermediate_size", "64"]
    serve._serve_http.last_server = None  # stale-server guard, as above
    t = threading.Thread(target=serve.main, args=(argv,), daemon=True)
    t.start()
    deadline = _time.time() + 60
    server = None
    while _time.time() < deadline and server is None:
        server = getattr(serve._serve_http, "last_server", None)
        _time.sleep(0.05)
    assert server is not None
    base = "http://127.0.0.1:%d" % server.server_address[1]

    def call(path, payload=None):
        req = urllib.request.Request(
            base + path,
            data=None if payload is None else _json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
            method="GET" if payload is None else "POST",
        )
        with urllib.request.urlopen(req, timeout=120) as resp:
            return resp.status, _json.loads(resp.read())

    try:
        # warm the steady program and capture expected answers; one
        # batched request = exactly one dispatch
        mentions = [f"alpha {i}" for i in range(4)]
        code, out = call("/query", {"queries": [{"mention": m} for m in mentions]})
        assert code == 200
        expect = {m: row["results"] for m, row in zip(mentions, out["results"])}

        barrier = threading.Barrier(4)
        errors, results, lock = [], {}, threading.Lock()

        def client(mention):
            try:
                barrier.wait(timeout=30)
                code, out = call("/query", {"mention": mention})
                assert code == 200
                with lock:
                    results[mention] = out["results"][0]["results"]
            except Exception as e:  # noqa: BLE001 — collected for the main thread
                with lock:
                    errors.append(f"{mention}: {e!r}")

        threads = [threading.Thread(target=client, args=(m,)) for m in mentions]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=300)
        assert not errors, errors
        # every client got ITS OWN answer despite sharing a batch
        for m in mentions:
            assert results[m] == expect[m], (m, results[m], expect[m])

        code, health = call("/healthz")
        assert code == 200
        assert health["queries_answered"] == 8  # 4 warm + 4 hammered
        # the 4 simultaneous single-query requests fit the 300 ms window:
        # at most 2 dispatches for them (1 warm dispatch before)
        assert health["dispatches"] <= 3, health
        assert health["dispatches"] < health["queries_answered"]
    finally:
        server.shutdown()
        t.join(timeout=30)
    assert not t.is_alive()
