"""Probe attention einsum spellings against the layout-copy residue.

Round-3 trace finding (tools/profile_build.py hlo_stats): the CE build
step at b=2048 s=256 spends 88.6 ms (13.6%) in `copy` data-formatting
ops — {2,1,0}->{1,2,0} layout flips XLA inserts on the Q/K/V projection
outputs around the batched attention dots. `anncur_tpu/models/bert.py::
_ATTN_SPELLING` exposes three spellings that steer XLA's layout
assignment differently; this tool measures the full CE score step under
each on the real device.

Usage:
  python tools/probe_attn_layouts.py --cpu-check   # numerics (CPU, f32)
  python tools/probe_attn_layouts.py               # TPU timing probe

Reference hot loop this accelerates:
/root/reference/eval/run_cross_encoder_for_ment_ent_matrix_zeshel.py:80-123
"""

import argparse
import json
import time

from profile_build import _force

SPELLINGS = ("bnqk", "bqnk", "bnsd_proj")


def _build(batch, seq, dtype_name):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from anncur_tpu.models.bert import BertSpec
    from anncur_tpu.models.crossencoder import CrossEncoder

    spec = BertSpec()
    ce = CrossEncoder(
        spec=spec,
        compute_dtype=jnp.bfloat16 if dtype_name == "bf16" else jnp.float32,
    )
    params = ce.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    pairs = jnp.asarray(
        rng.integers(1, spec.vocab_size, size=(batch, seq)).astype(np.int32)
    )
    return ce, params, pairs, seq // 2


def cpu_check():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import numpy as np

    import anncur_tpu.models.bert as bert_mod

    ce, params, pairs, fse = _build(4, 64, "f32")
    outs = {}
    orig_spelling = bert_mod._ATTN_SPELLING
    try:
        for s in SPELLINGS:
            bert_mod._ATTN_SPELLING = s
            fn = jax.jit(lambda p, t: ce.score(p, t, first_segment_end=fse))
            outs[s] = np.asarray(fn(params, pairs))
    finally:
        bert_mod._ATTN_SPELLING = orig_spelling
    ref = outs["bnqk"]
    report = {
        s: float(np.max(np.abs(outs[s] - ref))) for s in SPELLINGS if s != "bnqk"
    }
    print(json.dumps({"cpu_check_max_abs_diff_vs_bnqk": report}))
    assert all(v < 1e-4 for v in report.values()), report


def tpu_probe(batch, seq, reps, spellings=SPELLINGS):
    import jax

    import anncur_tpu.models.bert as bert_mod

    ce, params, pairs, fse = _build(batch, seq, "bf16")
    results = {}
    orig_spelling = bert_mod._ATTN_SPELLING
    try:
        for s in spellings:
            bert_mod._ATTN_SPELLING = s
            fn = jax.jit(lambda p, t: ce.score(p, t, first_segment_end=fse))
            t0 = time.time()
            _force(fn(params, pairs))
            compile_s = time.time() - t0
            t0 = time.time()
            for _ in range(reps):
                out = fn(params, pairs)
            _force(out)
            step_s = (time.time() - t0) / reps
            results[s] = {
                "compile_s": round(compile_s, 1),
                "step_s": round(step_s, 4),
                "pairs_per_s": round(batch / step_s, 1),
            }
            print(json.dumps({s: results[s]}), flush=True)
    finally:
        bert_mod._ATTN_SPELLING = orig_spelling
    base = results[spellings[0]]["step_s"]
    print(
        json.dumps(
            {
                "summary": {
                    s: round(base / r["step_s"], 3) for s, r in results.items()
                },
                "note": "values are speedup vs the first listed spelling",
            }
        )
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu-check", action="store_true")
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--seq", type=int, default=256)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--spellings", default=",".join(SPELLINGS))
    args = ap.parse_args()
    if args.cpu_check:
        cpu_check()
    else:
        tpu_probe(args.batch, args.seq, args.reps, tuple(args.spellings.split(",")))


if __name__ == "__main__":
    main()
