"""End-to-end drive: full flow through public APIs on cpu-mesh or tpu.

    python tools/drive_e2e.py cpu   # 8-virtual-device mesh: sharding paths
    python tools/drive_e2e.py tpu   # real chip: numerics + recall

Used by the verify skill (.claude/skills/verify) each round; exits
nonzero on any failed assertion.

Covers the paths changed this session:
  - default CE head (cls_only final layer, now also under train=True)
  - w_embeds CE head (tag-position-only final layer)
  - bi-encoder cls + spl_tkns pooling (selective final layer)
  - one real Trainer step for both model types
  - offline ScoreMatrixBuilder -> CurRetriever build -> fused batched
    query -> exact rerank -> recall vs brute force (must be ~1.0 on a
    low-rank world)
  - use_remat='attn' Trainer step (structural _attn_core checkpoint):
    loss identical to the no-remat step on the same batch
  - HTTP serving front-end (cpu backend only): /query /add /remove
    /healthz over a real socket, results == direct retriever queries
"""
import os
import sys

backend = sys.argv[1] if len(sys.argv) > 1 else "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if backend == "cpu":
    from anncur_tpu.utils.platform import force_cpu_devices

    force_cpu_devices(8)

import jax

from anncur_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp
import numpy as np

print(f"backend={backend} devices={len(jax.devices())} platform={jax.devices()[0].platform}")

from anncur_tpu.config import Config
from anncur_tpu.core.metrics import topk_overlap_frac
from anncur_tpu.core.retriever import CurRetriever
from anncur_tpu.data.synthetic import make_tokenized_world
from anncur_tpu.indexer import ScoreMatrixBuilder
from anncur_tpu.models.bert import BertSpec
from anncur_tpu.models.biencoder import BiEncoder
from anncur_tpu.models.crossencoder import CrossEncoder
from anncur_tpu.parallel import make_mesh
from anncur_tpu.train.data import EntLinkDataset, bienc_batches, crossenc_batches, mine_negatives
from anncur_tpu.train.trainer import Trainer

n_dev = len(jax.devices())
mesh = make_mesh((n_dev,), ("data",))

ment, ent, gt, tok = make_tokenized_world(
    seed=0, n_ents=max(64, 8 * n_dev), n_ments=48, max_ment_len=24, max_ent_len=24
)
data = EntLinkDataset(ment, ent, gt)
spec = BertSpec.tiny(vocab_size=tok.vocab_size)

# ---- 1. one Trainer step per model type (exercises train-mode selective layer)
for model_type, model in [
    ("bi_enc", BiEncoder(spec=spec, pooling_type="cls", embed_dim=spec.hidden_size, compute_dtype=jnp.float32)),
    ("bi_enc", BiEncoder(spec=spec, pooling_type="spl_tkns", embed_dim=spec.hidden_size, compute_dtype=jnp.float32)),
    ("cross_enc", CrossEncoder(spec=spec, cross_enc_type="default", compute_dtype=jnp.float32)),
    ("cross_enc", CrossEncoder(spec=spec, cross_enc_type="w_embeds", compute_dtype=jnp.float32)),
]:
    cfg = Config(model_type=model_type, loss_type="ce", num_negs=2,
                 train_batch_size=2 * n_dev, grad_acc_steps=1,
                 base_res_dir="/tmp/drive_r2_train")
    tr = Trainer(cfg, model, mesh=mesh, total_steps=2)
    st = tr.init_state()
    step = tr.make_train_step()
    negs = mine_negatives(data, "random", cfg.num_negs, seed=0)
    gen = bienc_batches(data, negs, cfg.train_batch_size, shuffle=False) if model_type == "bi_enc" \
        else crossenc_batches(data, negs, cfg.train_batch_size, shuffle=False)
    batch = next(gen)
    st, m = step(st, tr._shard_batch(batch))
    loss = float(m["loss"])
    variant = getattr(model, "cross_enc_type", None) or model.pooling_type
    assert np.isfinite(loss), (model_type, variant, loss)
    print(f"train step ok: {model_type}/{variant} loss={loss:.4f}")

# ---- 2. offline build -> retriever -> fused query -> recall vs brute force
# Train the CE briefly so the score matrix carries REAL ranking signal:
# a random-init CE yields a rank-1-ish matrix whose entire signal sits at
# the TPU matmul noise floor (measured sigma2/sigma1 = 0.003) — recall on
# such a matrix measures cross-program rounding, not the product.
ce = CrossEncoder(spec=spec, cross_enc_type="default", compute_dtype=jnp.float32)
# batch FIXED at 16 (not 2*n_dev): with the same 120 pinned steps a
# device-dependent batch would feed the 1-chip tpu run 8x fewer pairs
# and leave its matrix near the noise floor the training exists to escape
cfg = Config(model_type="cross_enc", loss_type="ce", num_negs=4,
             train_batch_size=16, grad_acc_steps=1,
             learning_rate=1e-3, num_epochs=40,
             base_res_dir="/tmp/drive_r2_ce_train")
tr = Trainer(cfg, ce, mesh=mesh, total_steps=120)
st = tr.init_state()
step = tr.make_train_step()
negs = mine_negatives(data, "random", cfg.num_negs, seed=0)
MAX_STEPS = 120  # fixed across backends so the matrix structure matches
done = False
for ep in range(1000):
    for batch in crossenc_batches(data, negs, cfg.train_batch_size, shuffle=False):
        st, m = step(st, tr._shard_batch(batch))
        if int(st.step) >= MAX_STEPS:
            done = True
            break
    if done:
        break
print(f"CE trained {int(st.step)} steps, final loss {float(m['loss']):.4f}")
params = st.params
builder = ScoreMatrixBuilder(ce, mesh, ment_block=4, ent_block=8, pair_pad_multiple=32)

n_train = 24
R_probe = np.asarray(builder(params, np.asarray(ment[:n_train]), np.asarray(ent)))
sv = np.linalg.svd(R_probe, compute_uv=False)
print(f"train-score spectrum: s2/s1={sv[1]/sv[0]:.4f} s5/s1={sv[4]/sv[0]:.4f} (need >> 1e-3 noise floor)")
retr = CurRetriever.build(
    encoder=ce, params=params, tokenizer=tok,
    train_query_tokens=np.asarray(ment[:n_train]),
    item_tokens=np.asarray(ent),
    # 32 anchors: the rbg-trained matrix carries a real spectral tail
    # (s5/s1 ~ 0.11) and at 24 anchors CUR honestly misses one top-5
    # item at depth 32 (verified product == numpy-oracle pinv CUR at
    # 24/32/48 anchors, recall 0.900/1.000/1.000 — approximation error,
    # not a product bug). 32 anchors capture the tail.
    n_anchor_items=32,
    builder=builder,
    max_query_len=ment.shape[1],
    train_scores=R_probe,  # already computed for the spectrum probe
)
# brute-force exact scores for the test queries
test_q = np.asarray(ment[n_train:n_train + 8])
exact = np.asarray(builder(params, test_q, ent))  # (8, n_ents)

s16, i16 = retr.query_tokens_batch(test_q, top_k=5, top_k_retvr=16)
scores, idx = retr.query_tokens_batch(test_q, top_k=5, top_k_retvr=32)
exact_top = np.argsort(-exact, axis=1)[:, :5]
rec16 = float(np.mean(np.asarray(topk_overlap_frac(exact_top, i16))))
rec = float(np.mean(np.asarray(topk_overlap_frac(exact_top, idx))))
print(f"retriever recall@5 (vs brute force): depth16 {rec16:.3f} / depth32 {rec:.3f}")
# reranked scores must equal the exact scores at the returned indices
got = np.take_along_axis(exact, idx, axis=1)
np.testing.assert_allclose(scores, got, rtol=1e-4, atol=1e-4)
print("rerank scores == exact CE scores at returned indices")
# tie-robust recall: every returned item must score within tol of the
# 5th-best exact score (a random-init CE yields near-tied scores; TPU
# cross-program matmul rounding ~1e-4 legitimately flips exact ties,
# while a real recall collapse would miss by whole score units)
fifth = np.sort(exact, axis=1)[:, -5][:, None]
spread = float(exact.std())
margin = (got - fifth) / spread
print(f"worst margin vs 5th-best (in score-std units): {margin.min():.5f}")
assert margin.min() > -0.01, (rec, margin.min())

# ---- 2b. round-4 paths: item-axis padding (corpus edits reuse compiled
# programs) and per-query early-stop adaptive serving.
retr.item_pad_multiple = 96  # 64 items -> padded 96; small adds stay in-block
retr._invalidate()  # padding changed -> refresh device constants
s_pad, i_pad = retr.query_tokens_batch(test_q, top_k=5, top_k_retvr=32)
np.testing.assert_array_equal(i_pad, idx)
np.testing.assert_allclose(s_pad, scores, rtol=1e-5, atol=1e-5)
print("item-padded fixed path == unpadded results")
progs_before = dict(retr._fused_cache)
new_ids = retr.add_items(np.asarray(ent[:4]), builder)  # 64 -> 68 <= 96
assert retr._fused_cache == progs_before, "in-block add must keep compiled programs"
s_add, i_add = retr.query_tokens_batch(test_q, top_k=5, top_k_retvr=32)
ent_ext = np.concatenate([np.asarray(ent), np.asarray(ent[:4])], axis=0)
exact_ext = np.asarray(builder(params, test_q, ent_ext))
pos_of = {int(e): p for p, e in enumerate(retr.item_ids)}
got_add = np.stack([
    exact_ext[k, [pos_of[int(e)] for e in i_add[k]]] for k in range(len(test_q))
])
np.testing.assert_allclose(s_add, got_add, rtol=1e-4, atol=1e-4)
print(f"add_items in-block: programs reused, scores exact (new ids {new_ids.tolist()})")
retr.remove_items(new_ids)  # restore the 64-item corpus for what follows

# early-stop adaptive: base budget + engine-decided escalation
s_es, i_es, es_stats = retr.query_tokens_adaptive_fused(
    test_q, total_budget=12, n_rounds=3, top_k=5, train_scores=R_probe,
    escalate_budget=32, escalate_rounds=2, return_stats=True,
)
got_es = np.take_along_axis(exact, i_es, axis=1)
np.testing.assert_allclose(s_es, got_es, rtol=1e-4, atol=1e-4)
s_b, i_b = retr.query_tokens_adaptive_fused(
    test_q, total_budget=12, n_rounds=3, top_k=5, train_scores=R_probe,
)
rec_es = float(np.mean(np.asarray(topk_overlap_frac(exact_top, i_es))))
rec_b = float(np.mean(np.asarray(topk_overlap_frac(exact_top, i_b))))
assert rec_es >= rec_b - 1e-9, (rec_es, rec_b)
print(
    f"early-stop adaptive: recall@5 {rec_es:.3f} (base-only {rec_b:.3f}), "
    f"avg budget {es_stats['avg_budget']:.1f} of ceiling 32, "
    f"escalated {es_stats['frac_escalated']:.2f}"
)

# round-5 serving-latency fix: a caller's DEVICE-RESIDENT train matrix
# must stay on device through the item-axis padding (the round-4 code
# round-tripped it through the host per call: +0.5 s/query through the
# tunnel, DESIGN §27) and give identical results to the numpy route
s_dev, i_dev = retr.query_tokens_adaptive_fused(
    test_q, total_budget=12, n_rounds=3, top_k=5,
    train_scores=jnp.asarray(R_probe),
)
np.testing.assert_array_equal(i_dev, i_b)
np.testing.assert_allclose(s_dev, s_b, atol=1e-6)
print("device-resident train matrix: padded on device, results identical")

# round-5 shortlist mode (large-corpus mitigation): rounds 2+ pick from
# a frozen top-L pool; returned scores must still be exact CE scores
s_sl, i_sl = retr.query_tokens_adaptive_fused(
    test_q, total_budget=12, n_rounds=3, top_k=5, train_scores=R_probe,
    shortlist=48,
)
got_sl = np.take_along_axis(exact, i_sl, axis=1)
np.testing.assert_allclose(s_sl, got_sl, rtol=1e-4, atol=1e-4)
rec_sl = float(np.mean(np.asarray(topk_overlap_frac(exact_top, i_sl))))
assert rec_sl >= rec_b - 0.21, (rec_sl, rec_b)  # bounded pool-freeze cost
print(f"shortlist-48 adaptive: recall@5 {rec_sl:.3f} (full-pool {rec_b:.3f}), scores exact")

# AXN completion backend through the same fused engine (round-4 defaults:
# lam_rel 1e-2, fit rank auto=full on this tiny matrix) — returned scores
# must still be EXACT CE scores (completion only picks candidates)
s_ax, i_ax = retr.query_tokens_adaptive_fused(
    test_q, total_budget=32, n_rounds=3, top_k=5, train_scores=R_probe,
    method="axn",
)
got_ax = np.take_along_axis(exact, i_ax, axis=1)
np.testing.assert_allclose(s_ax, got_ax, rtol=1e-4, atol=1e-4)
rec_ax = float(np.mean(np.asarray(topk_overlap_frac(exact_top, i_ax))))
assert rec_ax >= 0.5, rec_ax  # catastrophic-collapse detector at budget 32/64 items
print(f"axn adaptive serving: recall@5 {rec_ax:.3f}, exact scores at returned ids")

# mesh-sharded adaptive serving (round 4): queries sharded over the data
# axis, per-query solves need no collectives — results must equal the
# single-device engine's exactly (only meaningful on the multi-device
# cpu mesh; on the 1-chip tpu run the shard_map wrap is a no-op)
if n_dev > 1:
    import dataclasses

    retr_sh = dataclasses.replace(retr, mesh=mesh)
    s_sh, i_sh = retr_sh.query_tokens_adaptive_fused(
        test_q, total_budget=12, n_rounds=3, top_k=5, train_scores=R_probe,
    )
    np.testing.assert_array_equal(i_sh, i_b)
    np.testing.assert_allclose(s_sh, s_b, atol=1e-5)
    s_she, i_she = retr_sh.query_tokens_adaptive_fused(
        test_q, total_budget=12, n_rounds=3, top_k=5, train_scores=R_probe,
        escalate_budget=32, escalate_rounds=2,
    )
    np.testing.assert_allclose(
        np.take_along_axis(exact, i_she, axis=1), s_she, rtol=1e-4, atol=1e-4
    )
    print(f"mesh-sharded adaptive == single-device ({n_dev} devices)")

# ---- 3. w_embeds head end-to-end consistency: score == dot(embed_paired)
cew = CrossEncoder(spec=spec, cross_enc_type="w_embeds", compute_dtype=jnp.float32)
pw = cew.init(jax.random.PRNGKey(2))
from anncur_tpu.data.tokenization import create_input_label_pair

pairs = np.stack([
    create_input_label_pair(np.asarray(ment[i]), np.asarray(ent[i]))
    for i in range(6)
])
s = np.asarray(cew.score(pw, jnp.asarray(pairs), first_segment_end=ment.shape[1]))
me, ee = cew.embed_paired(pw, jnp.asarray(pairs), ment.shape[1])
np.testing.assert_allclose(s, np.asarray(jnp.sum(me * ee, axis=-1)), atol=1e-4)
print("w_embeds: score == dot(embed_paired) ok")

# ---- 4. use_remat='attn' (selective structural checkpoint of the
# attention core): a real Trainer step must produce the SAME loss as the
# no-remat step from the same init/batch — remat changes memory, not math.
losses = {}
for mode in (False, "attn"):
    ce_r = CrossEncoder(spec=spec, cross_enc_type="default",
                        compute_dtype=jnp.float32, remat=mode)
    cfg_r = Config(model_type="cross_enc", loss_type="ce", num_negs=2,
                   train_batch_size=2 * n_dev, grad_acc_steps=1,
                   use_remat=mode, base_res_dir="/tmp/drive_r3_remat")
    tr_r = Trainer(cfg_r, ce_r, mesh=mesh, total_steps=2)
    st_r = tr_r.init_state()
    batch = next(crossenc_batches(data, negs, cfg_r.train_batch_size, shuffle=False))
    st_r, m_r = tr_r.make_train_step()(st_r, tr_r._shard_batch(batch))
    losses[mode] = float(m_r["loss"])
    assert np.isfinite(losses[mode])
np.testing.assert_allclose(losses["attn"], losses[False], rtol=1e-6)
print(f"remat='attn' train step ok: loss {losses['attn']:.6f} == no-remat {losses[False]:.6f}")

# ---- 5. HTTP serving front-end over a real socket (cpu only: the layer
# is backend-agnostic host code; the TPU query path is section 2).
if backend == "cpu":
    import json as _json
    import tempfile
    import threading
    import time as _time
    import urllib.request

    from anncur_tpu.cli import serve
    from anncur_tpu.train.checkpoint import save_pytree

    tmp = tempfile.mkdtemp(prefix="drive_serve_")
    vocab_path = os.path.join(tmp, "vocab.txt")
    tok.save_vocab(vocab_path)
    ckpt_path = os.path.join(tmp, "ce.pkl")
    save_pytree(ckpt_path, {"params": params})
    state_path = os.path.join(tmp, "retr_state.pkl")
    retr.save(state_path)

    argv = ["--index", state_path, "--vocab_file", vocab_path,
            "--crossenc_ckpt", ckpt_path, "--http", "127.0.0.1:0",
            "--top_k", "5", "--top_k_retvr", "32", "--batch", "4",
            "--coalesce_ms", "300",  # deterministic window for the
            # concurrent-coalescing check below
            "--max_query_len", str(ment.shape[1]),
            "--hidden_size", str(spec.hidden_size),
            "--num_layers", str(spec.num_layers),
            "--num_heads", str(spec.num_heads),
            "--intermediate_size", str(spec.intermediate_size)]
    th = threading.Thread(target=serve.main, args=(argv,), daemon=True)
    th.start()
    deadline = _time.time() + 120
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
            method="GET" if payload is None else "POST")
        try:
            with urllib.request.urlopen(req, timeout=300) as resp:
                return resp.status, _json.loads(resp.read())
        except urllib.error.HTTPError as e:
            return e.code, _json.loads(e.read())

    try:
        code, health = call("/healthz")
        assert code == 200 and health["n_items"] == ent.shape[0], health
        assert health["cost_per_query"] == retr.cost_per_query + 32, health

        # 3 text queries through the batch-4 program (padded tail):
        # top-5 per query, ids in range, scores descending
        qtexts = [{"mention": "alpha beta"}, {"mention": "delta"},
                  {"mention": "epsilon zeta", "context_left": "gamma"}]
        code, out = call("/query", {"queries": qtexts})
        assert code == 200 and len(out["results"]) == 3, out
        for row in out["results"]:
            ids = [i for i, _ in row["results"]]
            sc = [s for _, s in row["results"]]
            assert len(ids) == 5 and all(0 <= i < ent.shape[0] for i in ids)
            assert sc == sorted(sc, reverse=True)
        # error paths surface as 400s (wrong-shape JSON included)
        assert call("/query", {})[0] == 400
        assert call("/query", [{"mention": "x"}])[0] == 400
        assert call("/add", {"items": ["nope"]})[0] == 400
        # dynamic corpus: add then remove one item, n_items tracks
        # (the id allocator is monotonic for the retriever's LIFETIME —
        # section 2b's add/remove already consumed ids, so the new id is
        # >= n0, not == n0)
        n0 = ent.shape[0]
        code, added = call("/add", {"items": [{"title": "new", "description": "thing"}]})
        assert code == 200 and len(added["ids"]) == 1 and added["ids"][0] >= n0, added
        new_id = added["ids"][0]
        assert call("/healthz")[1]["n_items"] == n0 + 1
        # duplicate ids collapse to one removal (dup positions used to
        # double-shift anchor positions → silently corrupted col_idxs)
        code, removed = call("/remove", {"ids": [new_id, new_id]})
        assert code == 200 and removed["removed"] == 1, removed
        assert call("/healthz")[1]["n_items"] == n0
        # corpus restored to the build state ⇒ anchors intact ⇒ the same
        # queries return identical results through the recompiled program
        code, out2 = call("/query", {"queries": qtexts})
        assert code == 200 and out2["results"] == out["results"], "post-remove drift"
        # dynamic batching: concurrent single-query requests share device
        # dispatches (the coalescer) and still get their own answers
        d0 = call("/healthz")[1]["dispatches"]
        expect_rows = {q["mention"]: r["results"]
                       for q, r in zip(qtexts, out2["results"])}
        got, errs, barrier = {}, [], threading.Barrier(len(qtexts))

        def one_client(q):
            try:
                barrier.wait(timeout=30)
                c, o = call("/query", q)
                assert c == 200, o
                got[q["mention"]] = o["results"][0]["results"]
            except Exception as e:  # noqa: BLE001 — surfaced below
                errs.append(repr(e))

        ths = [threading.Thread(target=one_client, args=(q,)) for q in qtexts]
        for x in ths:
            x.start()
        for x in ths:
            x.join(timeout=120)
        assert not errs, errs
        assert got == expect_rows, (got, expect_rows)
        code, health = call("/healthz")
        used = health["dispatches"] - d0
        assert used < len(qtexts), (
            f"no coalescing: {used} dispatches for {len(qtexts)} concurrent queries")
        # burst: 48 clients CONNECT at the same instant — beyond the
        # stdlib default listen backlog (request_queue_size=5, which
        # RSTs the excess before accept(); measured 44/256 resets at 64
        # clients on the TPU HTTP bench before the server took a
        # production backlog)
        assert type(server).request_queue_size >= 48
        b_errs, b_barrier = [], threading.Barrier(48)

        def burst_client(i):
            q = qtexts[i % len(qtexts)]
            try:
                b_barrier.wait(timeout=60)
                c, o = call("/query", q)
                assert c == 200, o
                assert o["results"][0]["results"] == expect_rows[q["mention"]]
            except Exception as e:  # noqa: BLE001 — surfaced below
                b_errs.append(f"{i}: {e!r}")

        burst = [threading.Thread(target=burst_client, args=(i,)) for i in range(48)]
        for x in burst:
            x.start()
        for x in burst:
            x.join(timeout=300)
        assert not any(x.is_alive() for x in burst), "burst client(s) hung"
        assert not b_errs, b_errs
        print(f"http serve ok: healthz/query/add/remove(dup) + 400 paths; "
              f"coalesced {len(qtexts)} concurrent queries into {used} dispatch(es); "
              f"48-client burst clean")
    finally:
        server.shutdown()
        th.join(timeout=30)

# bench.py pre-flight: the backend-availability gate must no-op when
# disabled and return after ONE probe when the backend answers (the
# driver's round-end bench rides through tunnel outages on this)
import subprocess as _sp

import bench as _bench

os.environ["BENCH_WAIT_S"] = "0"
_bench.wait_for_backend()  # disabled -> returns without probing
os.environ["BENCH_WAIT_S"] = "60"
_real_run, _n = _sp.run, [0]


def _fake_run(cmd, **kw):
    _n[0] += 1
    return type("R", (), {"returncode": 0, "stderr": b""})()


_sp.run = _fake_run
try:
    _bench.wait_for_backend()
finally:
    _sp.run = _real_run
assert _n[0] == 1, f"expected exactly one probe, got {_n[0]}"
os.environ.pop("BENCH_WAIT_S")
print("bench backend-gate ok: disabled no-op, single-probe success")

print(f"DRIVE OK ({backend})")
