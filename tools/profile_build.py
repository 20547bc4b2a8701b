"""Profile the CE build step and attribute the non-matmul residue
(VERDICT r3 item 6: 57% MFU leaves a measurable 43% to explain).

Two mechanisms, because the axon remote-TPU backend may not ship device
traces:

1. jax.profiler trace of one builder-sized CE forward (written to
   --trace-dir; inspect with xprof/tensorboard where available).
2. Sub-block timing suite: each compute family of a BERT layer is timed
   as its OWN jit program at bench shapes (b=2048 pairs, s=256, h=768):
   the 4 projection matmuls, attention einsums+softmax, the 2 MLP
   matmuls, gelu, layernorms, embedding+head. Separate programs pay
   HBM round trips the fused model amortizes, so each number is an
   UPPER bound for its family — useful to rank candidates, not to sum
   exactly.

Also prints XLA's own cost_analysis (flops / bytes) for the full step.

Usage: python tools/profile_build.py [--quick] [--trace-dir DIR]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("ANNCUR_ALLOW_CPU", "1")
# xprof's bundled protos lag the installed C++ protobuf; pure-python
# parsing works (only used to post-process the trace)
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import numpy as np


def parse_trace_hlo_stats(trace_dir: str, top_n: int = 15):
    """xplane.pb -> per-HLO-op self-time table + per-category rollup,
    via the xprof converter (returns None if parsing is unavailable)."""
    import glob

    paths = sorted(glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.xplane.pb")))
    if not paths:
        return None
    try:
        from xprof.convert import raw_to_tool_data

        # single newest session only: the converter returns None when fed
        # xspaces from different profiling sessions
        data, _ = raw_to_tool_data.xspace_to_tool_data([paths[-1]], "hlo_stats", {})
        if isinstance(data, bytes):
            data = data.decode()
        d = json.loads(data)
    except Exception as e:
        return {"error": f"{type(e).__name__}: {e}"}
    cols = [c["id"] for c in d["cols"]]
    rows = [dict(zip(cols, [c["v"] for c in r["c"]])) for r in d["rows"]]

    def col(r, *names, default=0.0):
        for n in names:
            if n in r:
                return r[n]
        return default

    cat_pct = {}
    ops = []
    for r in rows:
        cat = str(col(r, "hlo_category", "category", default="?"))
        pct = float(col(r, "total_self_time_percent", default=0.0))
        cat_pct[cat] = cat_pct.get(cat, 0.0) + pct
        ops.append(
            {
                "op": str(col(r, "hlo_op_name", "hlo_op_expression", default="?"))[:90],
                "category": cat,
                "self_pct": round(pct * 100, 2),
                "occurrences": col(r, "occurrences", default=None),
            }
        )
    ops.sort(key=lambda o: -o["self_pct"])
    return {
        "by_category_pct": {
            k: round(v * 100, 2) for k, v in sorted(cat_pct.items(), key=lambda kv: -kv[1])
        },
        "top_ops": ops[:top_n],
    }


def _force(out):
    # axon-tunnel gotcha: block_until_ready can return before queued work
    # (incl. the remote COMPILE) has executed for large outputs; a tiny
    # scalar fetch forces completion. The reduction runs ON DEVICE —
    # np.asarray(leaf) would pull the whole (possibly GB-sized) output
    # through the tunnel
    import jax
    import jax.numpy as jnp

    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    tiny = leaf[(slice(0, 1),) * leaf.ndim] if leaf.ndim else leaf
    float(jnp.sum(tiny.astype(jnp.float32)))


def timed(fn, *args, reps=3):
    _force(fn(*args))  # compile + first run fully retired before the clock
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    _force(out)
    return (time.time() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--trace-dir", default="/tmp/anncur_profile")
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--no-cost-analysis", action="store_true")
    ap.add_argument("--no-trace", action="store_true")
    args = ap.parse_args()

    import jax

    if args.quick:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from anncur_tpu.models.bert import BertSpec
    from anncur_tpu.models.crossencoder import CrossEncoder

    if args.quick:
        spec = BertSpec.tiny(vocab_size=512)
        b, s = 32, 32
        dtype = jnp.float32
    else:
        spec = BertSpec()
        b, s = args.batch, 256
        dtype = jnp.bfloat16

    h, inter, heads = spec.hidden_size, spec.intermediate_size, spec.num_heads
    hd = spec.head_dim
    rng = np.random.default_rng(0)
    ce = CrossEncoder(spec=spec, compute_dtype=dtype)
    params = ce.init(jax.random.PRNGKey(0))
    pairs = rng.integers(1, spec.vocab_size, size=(b, s)).astype(np.int32)
    fse = s // 2

    print(json.dumps({"stage": "init_done", "devices": str(jax.devices())}), flush=True)
    score = jax.jit(lambda p, t: ce.score(p, t, first_segment_end=fse))
    t_compile = time.time()
    _force(score(params, jnp.asarray(pairs)))
    print(json.dumps({"stage": "full_step_compiled", "s": round(time.time() - t_compile, 1)}), flush=True)
    full_t = timed(score, params, jnp.asarray(pairs))
    res = {"shape": {"batch": b, "seq": s}, "full_step_s": round(full_t, 4), "families": {}}
    print(json.dumps({"stage": "full_step_timed", "s": res["full_step_s"]}), flush=True)

    # ---- sub-block programs at layer shapes --------------------------- #
    # inputs are generated ON DEVICE: host-side generation at these
    # shapes (up to 12.9 GB f64 for the attention probs) would stream
    # gigabytes through the remote-TPU tunnel and stall for hours
    import jax.random as jrandom

    def dev_normal(key, shape, scale=1.0):
        arr = jax.jit(
            lambda k: (jrandom.normal(k, shape, jnp.float32) * scale).astype(dtype),
        )(jrandom.PRNGKey(key))
        jax.block_until_ready(arr)
        return arr

    x = dev_normal(0, (b, s, h))
    w_h_h = dev_normal(1, (h, h), 0.02)
    w_h_i = dev_normal(2, (h, inter), 0.02)
    w_i_h = dev_normal(3, (inter, h), 0.02)
    xi = dev_normal(4, (b, s, inter))
    qh = dev_normal(5, (b, heads, s, hd))
    probs_shape = dev_normal(6, (b, heads, s, s))
    gamma = jnp.ones((h,), jnp.float32)
    beta = jnp.zeros((h,), jnp.float32)
    print(json.dumps({"stage": "family_inputs_on_device"}), flush=True)

    fams = {
        # one (h,h) projection; x4 per layer (q,k,v,out)
        "proj_matmul_hh": (jax.jit(lambda a, w: a @ w), (x, w_h_h), 4),
        "mlp_matmul_up": (jax.jit(lambda a, w: a @ w), (x, w_h_i), 1),
        "mlp_matmul_down": (jax.jit(lambda a, w: a @ w), (xi, w_i_h), 1),
        "attn_scores_einsum": (
            jax.jit(lambda q, k: jnp.einsum("bhsd,bhtd->bhst", q, k)),
            (qh, qh), 1,
        ),
        "attn_softmax": (jax.jit(lambda p: jax.nn.softmax(p, axis=-1)), (probs_shape,), 1),
        "attn_context_einsum": (
            jax.jit(lambda p, v: jnp.einsum("bhst,bhtd->bhsd", p, v)),
            (probs_shape, qh), 1,
        ),
        "gelu": (jax.jit(lambda a: jax.nn.gelu(a, approximate=True)), (xi,), 1),
        "layernorm": (
            jax.jit(
                lambda a, g, bta: (
                    (a - a.mean(-1, keepdims=True))
                    / jnp.sqrt(a.astype(jnp.float32).var(-1, keepdims=True) + 1e-12)
                    * g
                    + bta
                ).astype(a.dtype)
            ),
            (x, gamma, beta), 2,
        ),
    }
    n_layers = spec.num_layers
    total_est = 0.0
    for name, (fn, fargs, per_layer) in fams.items():
        t = timed(fn, *fargs)
        est = t * per_layer * n_layers
        total_est += est
        res["families"][name] = {
            "one_call_s": round(t, 5),
            "per_layer_calls": per_layer,
            "est_model_total_s": round(est, 4),
            "pct_of_full_step": round(100 * est / full_t, 1),
        }
        print(json.dumps({name: res["families"][name]}), flush=True)
    res["sum_family_estimates_s"] = round(total_est, 4)
    res["unattributed_s"] = round(full_t - total_est, 4)
    # families are the point of this tool — print them before the
    # riskier steps (cost_analysis hung indefinitely on the axon remote
    # backend; the trace needs a working device plane)
    print(json.dumps(res, indent=1), flush=True)

    # XLA's own cost model for the full step (LAST: may hang on remote
    # backends — the attribution above is already printed)
    on_cpu = jax.devices()[0].platform == "cpu"
    if not args.no_cost_analysis and not on_cpu:
        # hangs indefinitely on the axon remote backend (CLAUDE.md) and
        # a hang is uncatchable — auto-skip off-CPU; --no-cost-analysis
        # documents the same for explicit control
        print(json.dumps({"stage": "cost_analysis_skipped", "reason": "non-cpu backend"}), flush=True)
    elif not args.no_cost_analysis:
        try:
            print(json.dumps({"stage": "cost_analysis_start"}), flush=True)
            lowered = score.lower(params, jnp.asarray(pairs))
            ca = lowered.compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            res["cost_analysis"] = {
                k: float(v) for k, v in ca.items() if k in ("flops", "bytes accessed")
            }
            if "flops" in res["cost_analysis"]:
                res["model_flops_util_at_197tflops"] = round(
                    res["cost_analysis"]["flops"] / full_t / 197e12, 3
                )
        except Exception as e:  # cost_analysis availability varies by backend
            res["cost_analysis"] = f"unavailable: {e}"

    # ---- profiler trace ------------------------------------------------ #
    if args.no_trace:
        print(json.dumps(res, indent=1))
        return
    try:
        print(json.dumps({"stage": "trace_start"}), flush=True)
        os.makedirs(args.trace_dir, exist_ok=True)
        jax.profiler.start_trace(args.trace_dir)
        out = score(params, jnp.asarray(pairs))
        jax.block_until_ready(out)
        jax.profiler.stop_trace()
        files = []
        for root, _, fs in os.walk(args.trace_dir):
            for f in fs:
                p = os.path.join(root, f)
                files.append((os.path.getsize(p), os.path.relpath(p, args.trace_dir)))
        res["trace_files"] = [f for _, f in sorted(files, reverse=True)[:8]]
        res["hlo_stats"] = parse_trace_hlo_stats(args.trace_dir)
    except Exception as e:
        res["trace_files"] = f"trace failed: {e}"

    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
