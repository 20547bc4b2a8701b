"""Differential parity harness: the reference's OWN math vs anncur_tpu.

Runs the reference repo's CURApprox + compute_overlap (imported from
/root/reference and executed directly — never vendored) through the exact
per-mention eval loop of run_retrieval_eval_wrt_exact_crossenc.py:47-158,
and the inductive get_complete_row online path of
run_retrieval_eval_wrt_exact_crossenc_w_fixed_train_test_splits.py:286-303,
against our evalx on the SAME matrix with the SAME anchor sampling.

The real ZeShEL data and the HF checkpoints named in the reference README
are unobtainable here (zero network egress, no HF cache), so this is the
strongest available evidence for recall parity: both systems consume a
reference-format score-matrix pickle and must produce equal metrics.

Usage:
    python tools/parity_check.py [--out PARITY.md] [--quick]

Writes side-by-side metric tables and exits non-zero on any mismatch
beyond tolerance.
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
sys.path.insert(0, REPO)

import jax  # noqa: E402

# CPU is sufficient and keeps this runnable anywhere (incl. CI)
jax.config.update("jax_platforms", "cpu")

TOL_RECALL = 5e-3  # mean common_frac is averaged over >=100 mentions
TOL_ERR_REL = 2e-3  # f32-torch-pinv (reference) vs f64-host-pinv (ours)


def _import_reference():
    sys.path.insert(0, REFERENCE)
    import torch  # noqa: F401

    from eval.eval_utils import compute_overlap  # reference code, executed in place
    from eval.matrix_approx_zeshel import CURApprox

    return CURApprox, compute_overlap


def _reference_eval_w_seed(
    CURApprox, compute_overlap, A_t, n_ment_anchors, n_ent_anchors, top_k, top_k_retvr, seed, oracle=False
):
    """The reference's run_approx_eval_w_seed (run_retrieval_eval_wrt_
    exact_crossenc.py:47-158), driven with the reference's own CURApprox
    and compute_overlap. A_t is a torch.float32 (n_ments, n_ents) tensor."""
    import torch

    n_ments, n_ents = A_t.shape
    rng = np.random.default_rng(seed=seed)
    anchor_ments = sorted(rng.choice(n_ments, size=n_ment_anchors, replace=False))
    anchor_ents = sorted(rng.choice(n_ents, size=n_ent_anchors, replace=False))
    non_anchor_ments = sorted(set(range(n_ments)) - set(anchor_ments))

    # The reference ctor's intersection check `assert torch.eq(a, b)` is
    # ill-formed for multi-element tensors (RuntimeError on truthiness);
    # reduce it faithfully for the duration of the call.
    orig_eq = torch.eq
    torch.eq = lambda a, b: bool(orig_eq(a, b).all())
    try:
        approx_obj = CURApprox(
            rows=A_t[anchor_ments, :],
            cols=A_t[:, anchor_ents],
            row_idxs=anchor_ments,
            col_idxs=anchor_ents,
            approx_preference="rows",
            A=A_t if oracle else None,
        )
    finally:
        torch.eq = orig_eq
    approx = approx_obj.get(list(range(n_ments)), list(range(n_ents)))

    topk_idx, rr_idx = [], []
    for ment_idx in range(n_ments):
        exact_row = A_t[ment_idx]
        _, top_k_indices = exact_row.topk(top_k)
        _, approx_top = approx[ment_idx].topk(top_k_retvr)
        temp = torch.zeros(exact_row.shape) - 99999999999999
        temp[approx_top] = exact_row[approx_top]
        _, rr_top = temp.topk(top_k)
        topk_idx.append(top_k_indices.numpy())
        rr_idx.append(rr_top.numpy())
    topk_idx = np.stack(topk_idx)
    rr_idx = np.stack(rr_idx)

    def split_metrics(idxs):
        ov = compute_overlap(
            indices_list1=topk_idx[idxs], indices_list2=rr_idx[idxs]
        )
        out = {}
        for metric, (mean_s, std_s, p50_s) in ov.items():
            out[f"exact_vs_reranked_approx_retvr~{metric}_mean"] = float(mean_s[5:])
            out[f"exact_vs_reranked_approx_retvr~{metric}_std"] = float(std_s[4:])
            out[f"exact_vs_reranked_approx_retvr~{metric}_p50"] = float(p50_s[4:])
        err = float(torch.norm((approx - A_t)[idxs, :]))
        out["approx_error"] = err
        out["approx_error_relative"] = err / float(torch.norm(A_t[idxs, :]))
        return out

    return {
        "anchor": split_metrics(anchor_ments),
        "non_anchor": split_metrics(non_anchor_ments),
        "all": split_metrics(list(range(n_ments))),
    }


def _reference_inductive_cur(CURApprox, train_t, test_t, anchor_ents, top_k, top_k_retvr):
    """Reference fixed-splits method=cur (..._w_fixed_train_test_splits
    .py:286-303): index on ALL train rows, project unseen test mentions
    from their anchor-column scores, retrieve, rerank with exact."""
    import torch

    n_train, n_ents = train_t.shape
    orig_eq = torch.eq
    torch.eq = lambda a, b: bool(orig_eq(a, b).all())
    try:
        approx_obj = CURApprox(
            rows=train_t,
            cols=train_t[:, anchor_ents],
            row_idxs=list(range(n_train)),
            col_idxs=list(anchor_ents),
            approx_preference="rows",
        )
    finally:
        torch.eq = orig_eq
    test_anchor_scores = test_t[:, anchor_ents]
    approx = approx_obj.get_complete_row(test_anchor_scores)

    exact_idx, rr_idx = [], []
    for i in range(test_t.shape[0]):
        _, ex = test_t[i].topk(top_k)
        _, retr = approx[i].topk(top_k_retvr)
        temp = torch.zeros(n_ents) - 99999999999999
        temp[retr] = test_t[i][retr]
        _, rr = temp.topk(top_k)
        exact_idx.append(ex.numpy())
        rr_idx.append(rr.numpy())
    frac = [
        len(set(a.tolist()) & set(b.tolist())) / top_k
        for a, b in zip(exact_idx, rr_idx)
    ]
    return float(np.mean(frac))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default=os.path.join(REPO, "PARITY.md"))
    p.add_argument("--quick", action="store_true", help="smaller grid")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import torch

    from anncur_tpu.evalx.transductive import run_approx_eval_w_seed
    from anncur_tpu.evalx.inductive import run_inductive_eval
    from anncur_tpu.indexer import load_score_matrix, save_score_matrix

    CURApprox, compute_overlap = _import_reference()

    # --- synthetic CE-like score matrix, saved through the REFERENCE
    # pickle format and loaded back (exercises the interchange path) ---
    rng = np.random.default_rng(args.seed)
    n_ments, n_ents, rank = (120, 400, 8) if args.quick else (300, 1500, 16)
    A = rng.standard_normal((n_ments, rank)) @ rng.standard_normal((rank, n_ents))
    A += 0.05 * rng.standard_normal((n_ments, n_ents))
    A = A.astype(np.float32)

    with tempfile.TemporaryDirectory() as td:
        pkl = os.path.join(td, "world_mat.pkl")
        save_score_matrix(
            pkl,
            ment_to_ent_scores=A,
            mention_tokens_list=np.zeros((n_ments, 4), np.int32),
            entity_id_list=np.arange(n_ents),
            entity_tokens_list=np.zeros((n_ents, 4), np.int32),
        )
        loaded = load_score_matrix(pkl)
        A = np.asarray(loaded["ment_to_ent_scores"], np.float32)
    A_t = torch.tensor(A)

    grid = (
        [(50, 40, 10, 64, "cur"), (50, 40, 10, 64, "cur_oracle")]
        if args.quick
        else [
            (100, 50, 10, 100, "cur"),
            (100, 100, 10, 200, "cur"),
            (200, 100, 1, 100, "cur"),
            (200, 100, 50, 200, "cur"),
            (100, 50, 10, 100, "cur_oracle"),
            (200, 100, 10, 200, "cur_oracle"),
        ]
    )

    key_metrics = [
        "exact_vs_reranked_approx_retvr~common_frac_mean",
        "exact_vs_reranked_approx_retvr~common_frac_p50",
        "approx_error_relative",
    ]
    rows_md = []
    failures = []
    for n_m, n_e, top_k, top_k_retvr, method in grid:
        ref = _reference_eval_w_seed(
            CURApprox, compute_overlap, A_t, n_m, n_e, top_k, top_k_retvr,
            seed=args.seed, oracle=(method == "cur_oracle"),
        )
        # parity mode: reproduce the reference's numpy-default pinv cutoff
        rcond_ref = max(n_m, n_e) * float(np.finfo(np.float64).eps)
        ours = run_approx_eval_w_seed(
            method, A, n_m, n_e, top_k, top_k_retvr, seed=args.seed,
            rcond=rcond_ref,
        )
        # our default: f32-machine-eps cutoff (better conditioned on noisy
        # square anchor intersections; see ops/pinv.py)
        ours_default = run_approx_eval_w_seed(
            method, A, n_m, n_e, top_k, top_k_retvr, seed=args.seed
        )
        for split in ("anchor", "non_anchor", "all"):
            for metric in key_metrics:
                rv, ov = ref[split][metric], ours[split][metric]
                dv = ours_default[split][metric]
                tol = TOL_ERR_REL if "error" in metric else TOL_RECALL
                ok = abs(rv - ov) <= tol
                if not ok:
                    failures.append((method, n_m, n_e, top_k, top_k_retvr, split, metric, rv, ov))
                rows_md.append(
                    f"| {method} | {n_m}x{n_e} | k={top_k} r={top_k_retvr} | {split} "
                    f"| {metric.split('~')[-1]} | {rv:.6f} | {ov:.6f} | {abs(rv-ov):.2e} "
                    f"| {dv:.6f} | {'OK' if ok else 'FAIL'} |"
                )
        print(f"transductive {method} m={n_m} e={n_e} k={top_k} r={top_k_retvr}: "
              f"ref={ref['non_anchor'][key_metrics[0]]:.4f} "
              f"ours={ours['non_anchor'][key_metrics[0]]:.4f} "
              f"ours_default={ours_default['non_anchor'][key_metrics[0]]:.4f}")

    # --- inductive (online-query) path ---
    n_train = 40 if args.quick else 100
    train, test = A[:n_train], A[n_train:]
    ind_rows = []
    for n_anc, top_k, top_k_retvr in ([(30, 10, 50)] if args.quick else [(50, 10, 100), (100, 10, 200), (100, 1, 100)]):
        rng2 = np.random.default_rng(seed=args.seed)
        anchor_ents = np.asarray(sorted(rng2.choice(n_ents, size=n_anc, replace=False)))
        ref_recall = _reference_inductive_cur(
            CURApprox, torch.tensor(train), torch.tensor(test), anchor_ents, top_k, top_k_retvr
        )
        # pin the pinv cutoff to the reference's (np.linalg.pinv default
        # on the (n_train, n_anc) anchor block) — like the transductive
        # leg; otherwise the parity column compares cutoffs, not math
        rcond_ref_ind = max(train.shape[0], n_anc) * float(np.finfo(np.float64).eps)
        with tempfile.TemporaryDirectory() as td:
            res = run_inductive_eval(
                test, train, td, method="cur", seed=args.seed,
                top_k_vals=[top_k], top_k_retvr_vals=[top_k_retvr],
                n_ent_anchors_vals=[n_anc], rcond=rcond_ref_ind,
            )
        ours_recall = res[f"top_k={top_k}"][f"k_retvr={top_k_retvr}"][f"anc_n_e={n_anc}"][
            "exact_vs_reranked_approx_retvr~common_frac_mean"
        ]
        ok = abs(ref_recall - ours_recall) <= TOL_RECALL
        if not ok:
            failures.append(("inductive_cur", n_train, n_anc, top_k, top_k_retvr, "test", "common_frac_mean", ref_recall, ours_recall))
        ind_rows.append(
            f"| cur (online) | {n_train} train rows, {n_anc} anchors | k={top_k} r={top_k_retvr} "
            f"| {ref_recall:.6f} | {ours_recall:.6f} | {abs(ref_recall-ours_recall):.2e} | {'OK' if ok else 'FAIL'} |"
        )
        print(f"inductive cur anc={n_anc} k={top_k} r={top_k_retvr}: ref={ref_recall:.4f} ours={ours_recall:.4f}")

    md = [
        "# PARITY — reference math vs anncur_tpu (differential harness)",
        "",
        "Generated by `python tools/parity_check.py`. The reference's own",
        "`CURApprox` and `compute_overlap` (imported from `/root/reference`,",
        "executed in place) are driven through the exact eval loops of",
        "`run_retrieval_eval_wrt_exact_crossenc.py:47-158` (transductive) and",
        "`..._w_fixed_train_test_splits.py:286-303` (inductive/online), on the",
        "same synthetic CE-like score matrix — round-tripped through the",
        "reference pickle format — with identical anchor sampling",
        "(`np.random.default_rng(seed).choice`, sorted).",
        "",
        "## Why synthetic",
        "",
        "This environment has zero network egress and no HF cache: the real",
        "ZeShEL data and the three reference checkpoints",
        "(`/root/reference/README.md:54-58`) cannot be downloaded. The",
        "differential harness below is the strongest available substitute: it",
        "proves the retrieval/eval math (pinv, projection, retrieve+rerank,",
        "overlap metrics) is equal between the two systems to float tolerance",
        "on matrices with the same spectral structure (low-rank + noise) the",
        "method assumes. Tokenizer-level parity is separately fuzz-tested",
        "against `transformers.BertTokenizer` (see `tests/test_tokenizer_fuzz.py`)",
        "and the context builders are differentially tested against the",
        "reference's own `get_context_representation` executed directly",
        "(`tests/test_data.py`).",
        "",
        f"Tolerances: recall metrics {TOL_RECALL}, relative Frobenius error {TOL_ERR_REL}.",
        "",
        "## pinv conditioning: a deliberate, measured improvement",
        "",
        "The parity columns below run our pinv at the reference's cutoff",
        "(numpy-default rcond) and match it to <=5e-3. Our DEFAULT cutoff is",
        "f32-machine-eps relative (ops/pinv.py): on noisy square anchor",
        "intersections (e.g. 100x100 anchors on a rank-16+noise matrix,",
        "condition number ~1e5) the reference's near-zero cutoff keeps",
        "noise singular values and loses recall (measured 0.986 recall@10 /",
        "0.41 relative Frobenius error, vs 1.000 / 0.065 with our default —",
        "see the `anncur_tpu (default)` column). We therefore keep the",
        "better-conditioned default and expose `rcond` for bit-parity.",
        "",
        "## Transductive (matrix-approximation) parity",
        "",
        "| method | anchors (m x e) | grid | split | metric | reference | anncur_tpu (rcond=ref) | abs diff | anncur_tpu (default) | status |",
        "|---|---|---|---|---|---|---|---|---|---|",
        *rows_md,
        "",
        "## Inductive (online-query) parity",
        "",
        "| method | index | grid | reference recall | anncur_tpu recall | abs diff | status |",
        "|---|---|---|---|---|---|---|",
        *ind_rows,
        "",
        f"**Result: {'ALL OK' if not failures else f'{len(failures)} FAILURES'}**",
        "",
        "## Tokenizer / representation parity (tested separately)",
        "",
        "- `tests/test_tokenizer_fuzz.py` + `tests/test_tokenizer_fuzz_realistic.py`:",
        "  our WordPiece (python AND native C++) fuzzed against",
        "  `transformers.BertTokenizer` on a ~28k-entry vocab structurally",
        "  mirroring bert-base-uncased ([PAD]=0, [unused0..]=1-99, [UNK]=100,",
        "  [CLS]=101, [SEP]=102, [MASK]=103, accents/greek/cyrillic/CJK chars,",
        "  ##-continuations), 800 hypothesis examples + adversarial cases",
        "  (>100-char words, ligatures, CJK, control chars).",
        "- `tests/test_data.py::test_context_rep_matches_reference_exec`: the",
        "  mention-context builder compared against the reference's own",
        "  `get_context_representation` executed directly, across 7 quota",
        "  edge cases incl. the `[-0:]` whole-left-context quirk.",
        "",
        "## What real-data validation would add",
        "",
        "With network access, load the three HF checkpoints named in",
        "`/root/reference/README.md:54-58`, rebuild the yugioh 3374x10031",
        "matrix with `cli/build_score_matrix.py`, and re-run this harness on",
        "it; everything downstream of the score matrix is already covered",
        "above, so the only untested link is BERT-forward numerical parity,",
        "which `tests/test_bert.py` covers against `transformers` (random",
        "weights, same architecture).",
        "",
    ]
    with open(args.out, "w") as fout:
        fout.write("\n".join(md))
    print(f"wrote {args.out}")
    if failures:
        for f in failures:
            print("FAIL:", f)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
