"""Generic RQ pivot machinery + RQ5/RQ6/RQ7 plot families
(parity: process_res_for_rq / plot_processed_results,
eval/compile_emnlp_retrieval_eval_wrt_exact_crossenc.py:103-277, and
utils/plot_emnlp_retrieval_eval_wrt_exact_crossenc.py:244-440, 704-775)."""

import json
import os

import numpy as np
import pytest

from anncur_tpu.evalx.aggregate import (
    DEFAULT_RQ_TEMPLATE,
    combined_res_from_inductive,
    compile_rqs,
    process_res_for_rq,
    trim_row_name,
    write_rq_pivot_csvs,
)


def test_process_res_for_rq_same_cost_folding():
    """CUR-family x keys fold to cost=top_k_retvr+anc_n_e with max over
    configurations landing on the same cost (reference :247-275)."""
    combined = {
        "nm_train=100~top_k_retvr=90~top_k=10~model=cur~anc_n_e=10": {"prec@k": 80.0},
        "nm_train=100~top_k_retvr=50~top_k=10~model=cur~anc_n_e=50": {"prec@k": 90.0},
        "nm_train=100~top_k_retvr=100~top_k=10~model=bienc~anc_n_e=10": {"prec@k": 70.0},
        "nm_train=100~top_k_retvr=100~top_k=10~model=bienc~anc_n_e=50": {"prec@k": 70.0},
    }
    all_vals = {
        "nm_train": [100],
        "top_k": [10],
        "model": ["cur", "bienc"],
        "top_k_retvr": [50, 90, 100],
        "anc_n_e": [10, 50],
    }
    out = process_res_for_rq(
        combined, DEFAULT_RQ_TEMPLATE, all_vals,
        fixed_params=["nm_train", "top_k"], var_params=["model"],
        x_axis_params=["top_k_retvr", "anc_n_e"], same_cost=True,
    )
    cell = out["nm_train=100~top_k=10"]
    # both cur configs cost 100 -> max survives
    assert cell["model=cur"] == {"cost=100": 90.0}
    # bienc cost ignores anc_n_e
    assert cell["model=bienc"] == {"cost=100": 70.0}


def test_process_res_for_rq_requires_cost_axes():
    with pytest.raises(ValueError):
        process_res_for_rq({}, DEFAULT_RQ_TEMPLATE, {}, [], [], ["top_k"], same_cost=True)


def test_trim_row_name():
    assert trim_row_name("model=bienc~anc_n_e=50") == "model=bienc~anc_n_e=None"
    assert trim_row_name("model=cur~anc_n_e=50") == "model=cur~anc_n_e=50"
    assert (
        trim_row_name("model=fixed_anc_ent_cur~anc_n_e=100")
        == "model=fixed_anc_ent_cur~anc_n_e=100"
    )


def test_compile_rqs_two_worlds(tmp_path, low_rank_factory):
    """Pivot CSVs per RQ from inductive sweeps over two synthetic worlds
    (VERDICT r1 next-step #7)."""
    from anncur_tpu.evalx.inductive import run_inductive_eval

    for world_i in range(2):
        mat = low_rank_factory(n=60, m=50 + 10 * world_i, rank=4)
        res_dir = str(tmp_path / f"world{world_i}" / "res")
        per_method = {}
        for method, kwargs in (
            ("cur", dict(train_scores=mat[:40])),
            ("fixed_anc_ent", dict(
                train_scores=None,
                ent_to_ent_data={
                    "scores": np.asarray(mat[40:].T @ mat[40:], np.float32)[:, :8],
                    "anchor_ents": np.arange(8),
                },
            )),
            ("bienc", dict(train_scores=None, bienc_scores=mat[40:] + 0.5)),
        ):
            res = run_inductive_eval(
                mat[40:], kwargs.pop("train_scores"), res_dir, method=method,
                top_k_vals=[5, 10], top_k_retvr_vals=[10, 20],
                n_ent_anchors_vals=[8], **kwargs,
            )
            per_method[method] = res

        out_dir = str(tmp_path / f"world{world_i}" / "compiled")
        csvs = compile_rqs(per_method, nm_train=40, out_dir=out_dir)
        assert set(csvs) == {
            "RQ1_Model_Performance_At_Equal_Num_Retrieved",
            "RQ2_Model_Performance_At_Equal_Test_Cost",
        }
        for rq, paths in csvs.items():
            assert paths, f"no pivot CSVs for {rq} (world {world_i})"
            assert os.path.exists(
                os.path.join(out_dir, "RQs", rq, "processed_res.json")
            )
        # RQ2 CSV columns are cost=<n> sorted numerically; cur rows fold
        # anchor cost in
        rq2 = csvs["RQ2_Model_Performance_At_Equal_Test_Cost"]
        with open(rq2[0]) as fin:
            header = fin.readline().strip().split(",")
        costs = [int(h.split("=")[1]) for h in header[1:]]
        assert costs == sorted(costs)
        assert any(c > 20 for c in costs)  # cur cost = kr + anc_n_e > max kr


def test_ce_baselines_plot_and_rq7(tmp_path, low_rank_factory):
    from anncur_tpu.evalx.inductive import run_inductive_eval
    from anncur_tpu.evalx.plots import plot_ce_baselines_from_pivot, rq7_heatmaps
    from anncur_tpu.evalx.transductive import run_transductive_eval

    mat = low_rank_factory(n=60, m=50, rank=4)
    per_method = {
        "cur": run_inductive_eval(
            mat[40:], mat[:40], str(tmp_path / "res"), method="cur",
            top_k_vals=[10], top_k_retvr_vals=[40, 90], n_ent_anchors_vals=[10],
        )
    }
    out_dir = str(tmp_path / "compiled")
    csvs = compile_rqs(per_method, nm_train=40, out_dir=out_dir)
    pdf = plot_ce_baselines_from_pivot(
        csvs["RQ2_Model_Performance_At_Equal_Test_Cost"][0],
        str(tmp_path / "rq5.pdf"),
        x_prefix="cost",
        x_vals=(50, 100),
    )
    assert pdf and os.path.exists(pdf)

    # RQ7 multi-metric heat maps from a transductive tree
    tr = run_transductive_eval(
        mat, str(tmp_path / "trans"), methods=["cur"],
        top_k_vals=[5], top_k_retvr_vals=[20],
        n_ment_anchors_vals=[20], n_ent_anchors_vals=[10], n_seeds=1,
    )
    made = rq7_heatmaps(
        tr, str(tmp_path / "rq7"), methods=["cur"],
        top_k_vals=[5], top_k_retvr_vals=[20],
    )
    assert len(made) == 2  # prec_at_k + approx_error
    assert any("prec_at_k" in m for m in made) and any("approx_error" in m for m in made)
