"""Golden-VALUE tests for the results compiler / pivot / plot layer
(VERDICT r2 weak #4: structural tests passed on wrong-but-well-formed
numbers). A hand-computed tiny sweep goes through compile_rqs ->
processed_res.json -> pivot CSVs -> plot bar data, and every number is
asserted exactly, including the equal-cost folding arithmetic
(reference: process_res_for_rq + plot_processed_results,
eval/compile_emnlp_retrieval_eval_wrt_exact_crossenc.py:103-277)."""

import csv
import json
import os

import numpy as np

from anncur_tpu.evalx.aggregate import compile_rqs

METRIC = "exact_vs_reranked_approx_retvr~common_frac_mean"


def _tree(cells):
    """{(top_k, kr, anc): metric} -> nested inductive res tree."""
    out = {}
    for (tk, kr, anc), v in cells.items():
        out.setdefault(f"top_k={tk}", {}).setdefault(f"top_k_retvr={kr}", {})[
            f"anc_n_e={anc}"
        ] = {METRIC: v}
    return out


# hand-designed sweep: 'cur' is a budget method (cost = kr + anc);
# 'bienc' is not (cost = kr, anchor axis collapses by max)
CUR = {
    (10, 10, 50): 0.50,   # cost 60
    (10, 50, 10): 0.70,   # cost 60  -> same-cost cell keeps max = 70.00
    (10, 10, 100): 0.80,  # cost 110
    (10, 50, 100): 0.90,  # cost 150
}
BIENC = {
    (10, 10, 50): 0.30,   # cost 10
    (10, 10, 100): 0.35,  # cost 10 -> max = 35.00
    (10, 50, 50): 0.60,   # cost 50 -> max = 60.00
    (10, 50, 100): 0.55,
}


def _compile(tmp_path):
    per_method = {"cur": _tree(CUR), "bienc": _tree(BIENC)}
    out = compile_rqs(per_method, nm_train=100, out_dir=str(tmp_path))
    return out, str(tmp_path)


def test_rq2_same_cost_folding_golden(tmp_path):
    _compile(tmp_path)
    with open(
        os.path.join(tmp_path, "RQs", "RQ2_Model_Performance_At_Equal_Test_Cost", "processed_res.json")
    ) as f:
        proc = json.load(f)
    fixed = proc["nm_train=100~top_k=10"]
    # cost = kr + anc for cur; duplicate cost-60 cell keeps the max
    assert fixed["model=cur"] == {
        "cost=60": 70.0,
        "cost=110": 80.0,
        "cost=150": 90.0,
    }
    # cost = kr alone for bienc; anchor axis collapses by max
    assert fixed["model=bienc"] == {"cost=10": 35.0, "cost=50": 60.0}


def test_rq1_pivot_golden(tmp_path):
    _compile(tmp_path)
    with open(
        os.path.join(
            tmp_path, "RQs", "RQ1_Model_Performance_At_Equal_Num_Retrieved", "processed_res.json"
        )
    ) as f:
        proc = json.load(f)
    fixed = proc["nm_train=100~top_k=10"]
    assert fixed["model=cur~anc_n_e=50"] == {"top_k_retvr=10": 50.0}
    assert fixed["model=cur~anc_n_e=10"] == {"top_k_retvr=50": 70.0}
    assert fixed["model=cur~anc_n_e=100"] == {
        "top_k_retvr=10": 80.0,
        "top_k_retvr=50": 90.0,
    }
    assert fixed["model=bienc~anc_n_e=50"] == {
        "top_k_retvr=10": 30.0,
        "top_k_retvr=50": 60.0,
    }


def test_rq2_csv_golden(tmp_path):
    paths, _ = _compile(tmp_path)[0]["RQ2_Model_Performance_At_Equal_Test_Cost"], tmp_path
    (path,) = paths
    assert os.path.basename(path) == "nm_train=100~top_k=10.csv"
    with open(path) as f:
        reader = csv.DictReader(f)
        rows = {r["model"]: r for r in reader}
        cols = reader.fieldnames
    # cost columns sorted numerically, not lexically (10 < 50 < 60 < 110)
    assert cols == ["model", "cost=10", "cost=50", "cost=60", "cost=110", "cost=150"]
    assert rows["model=cur"]["cost=60"] == "70.00"
    assert rows["model=cur"]["cost=110"] == "80.00"
    assert rows["model=cur"]["cost=150"] == "90.00"
    assert rows["model=cur"]["cost=10"] == ""
    assert rows["model=bienc"]["cost=10"] == "35.00"
    assert rows["model=bienc"]["cost=50"] == "60.00"


def test_rq1_csv_trim_merges_bienc_rows_golden(tmp_path):
    paths = _compile(tmp_path)[0]["RQ1_Model_Performance_At_Equal_Num_Retrieved"]
    (path,) = paths
    with open(path) as f:
        reader = csv.DictReader(f)
        rows = {r["model~anc_n_e"]: r for r in reader}
    # bienc keeps only model (anc_n_e -> None) and the three anc variants
    # merge by max: kr=10 -> max(30, 35) = 35; kr=50 -> max(60, 55) = 60
    assert rows["model=bienc~anc_n_e=None"]["top_k_retvr=10"] == "35.00"
    assert rows["model=bienc~anc_n_e=None"]["top_k_retvr=50"] == "60.00"
    # budget method keeps its anchor subscript as distinct rows
    assert rows["model=cur~anc_n_e=100"]["top_k_retvr=50"] == "90.00"
    assert rows["model=cur~anc_n_e=50"]["top_k_retvr=10"] == "50.00"
    assert rows["model=cur~anc_n_e=50"]["top_k_retvr=50"] == ""


def test_plot_bar_data_golden(tmp_path, monkeypatch):
    """The RQ5-style plot must put exactly the pivot's numbers on the
    bars (captured via an ax.bar spy)."""
    import anncur_tpu.evalx.plots as plots_mod

    out, root = _compile(tmp_path)
    (csv_path,) = out["RQ2_Model_Performance_At_Equal_Test_Cost"]

    captured = []
    real_subplots = plots_mod.plt.subplots

    def spy_subplots(*a, **kw):
        fig, ax = real_subplots(*a, **kw)
        real_bar = ax.bar

        def bar(x, heights, **kwargs):
            captured.append((kwargs.get("label"), list(map(float, heights))))
            return real_bar(x, heights, **kwargs)

        ax.bar = bar
        return fig, ax

    monkeypatch.setattr(plots_mod.plt, "subplots", spy_subplots)
    res = plots_mod.plot_ce_baselines_from_pivot(
        csv_path,
        os.path.join(root, "rq5.png"),
        x_prefix="cost",
        model_tags=("cur", "bienc"),
    )
    assert res is not None
    by_label = dict(captured)
    # x order: every cost column (10, 50, 60, 110, 150); each method
    # contributes only its own cells
    assert by_label["cur"] == [70.0, 80.0, 90.0]
    assert by_label["bienc"] == [35.0, 60.0]
