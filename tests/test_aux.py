"""Aux subsystems: dense index, ent2ent builder, rank probe, tracker,
launcher, plots."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_dense_index_exact(rng, mesh8):
    from anncur_tpu.ops.dense_index import DenseIndex, build_flat_or_ivff_index

    items = rng.standard_normal((200, 32)).astype(np.float32)
    q = rng.standard_normal((5, 32)).astype(np.float32)
    idx = build_flat_or_ivff_index(items, force_exact_search=True)
    s, i = idx.search(q, 10)
    want = np.argsort(-(q @ items.T), axis=1)[:, :10]
    np.testing.assert_array_equal(i, want)
    # sharded variant agrees
    idx8 = DenseIndex(items, mesh=mesh8)
    s8, i8 = idx8.search(q, 10)
    np.testing.assert_array_equal(i8, want)
    # add() extends the index
    idx.add(items[:8] * 10.0)  # strongly-matching copies
    s2, i2 = idx.search(q[:1], 3)
    assert i2.max() >= 200 or s2.max() >= s.max()


def test_ent2ent_builder_and_pickle(tmp_path, mesh8):
    from anncur_tpu.data.synthetic import make_tokenized_world
    from anncur_tpu.indexer.ent2ent import (
        build_ent_to_ent_scores,
        kmeanspp_anchor_ids,
        load_ent_to_ent_pickle,
        save_ent_to_ent_pickle,
    )
    from anncur_tpu.indexer.score_matrix import ScoreMatrixBuilder
    from anncur_tpu.models.bert import BertSpec
    from anncur_tpu.models.crossencoder import CrossEncoder

    _, ent_toks, _, tok = make_tokenized_world(seed=2, n_ents=24, n_ments=4, max_ent_len=16)
    embeds = np.random.default_rng(0).standard_normal((24, 8)).astype(np.float32)
    anchors = kmeanspp_anchor_ids(embeds, 6)
    assert 1 <= len(anchors) <= 6 and np.all(np.diff(anchors) > 0)

    spec = BertSpec.tiny(vocab_size=tok.vocab_size, max_position_embeddings=64)
    ce = CrossEncoder(spec=spec, compute_dtype=jnp.float32)
    params = ce.init(jax.random.PRNGKey(0))
    builder = ScoreMatrixBuilder(ce, mesh8, ment_block=4, ent_block=8, pair_pad_multiple=32)
    e2e = build_ent_to_ent_scores(builder, params, ent_toks, anchors)
    assert e2e.shape == (24, len(anchors))

    path = str(tmp_path / "e2e.pkl")
    save_ent_to_ent_pickle(path, e2e, anchors)
    scores, anchors2 = load_ent_to_ent_pickle(path)
    np.testing.assert_allclose(scores, e2e)
    np.testing.assert_array_equal(anchors2, anchors)

    # feeds the fixed_anc_ent transductive method end-to-end
    from anncur_tpu.evalx.transductive import run_transductive_eval

    exact = np.random.default_rng(1).standard_normal((16, 24)).astype(np.float32)
    res = run_transductive_eval(
        exact,
        str(tmp_path / "res"),
        methods=("fixed_anc_ent",),
        n_seeds=1,
        n_ment_anchors_vals=[8],
        n_ent_anchors_vals=[len(anchors)],
        top_k_vals=[5],
        top_k_retvr_vals=[10],
        ent_to_ent_data={len(anchors): {"scores": e2e, "anchor_ents": anchors}},
    )
    assert "fixed_anc_ent" in res


def test_rank_probe(low_rank_factory):
    from anncur_tpu.evalx.rank_probe import bienc_score_matrix, matrix_rank_report

    mat = low_rank_factory(n=40, m=60, rank=5)
    rep = matrix_rank_report(mat)
    assert rep["rank"] == 5
    assert rep["rank_99pct_energy"] <= 5

    inp = np.random.default_rng(0).standard_normal((10, 4)).astype(np.float32)
    lab = np.random.default_rng(1).standard_normal((20, 4)).astype(np.float32)
    bm = bienc_score_matrix(inp, lab)
    assert matrix_rank_report(bm)["rank"] <= 4


def test_tracker(tmp_path):
    from anncur_tpu.utils.tracker import ExperimentTracker, StageTimer

    tr = ExperimentTracker(str(tmp_path), config={"a": 1})
    tr.log({"loss": 1.5})
    tr.log({"loss": 1.2}, step=5)
    tr.progress("eval", 0.5)
    tr.alert("boom")
    tr.finish()
    lines = [json.loads(l) for l in open(tr.metrics_path)]
    assert lines[0]["loss"] == 1.5 and lines[1]["step"] == 5
    assert any("eval_frac" in l for l in lines)
    assert any(l.get("alert") == "boom" for l in lines)

    st = StageTimer()
    with st.stage("a"):
        pass
    assert "a" in st.report()


def test_launcher_skip_done(tmp_path):
    from anncur_tpu.utils.launcher import launch, make_eval_jobs, make_train_jobs

    probe = str(tmp_path / "done_{seed}.txt")
    with open(str(tmp_path / "done_1.txt"), "w") as fout:
        fout.write("x")
    jobs = make_train_jobs("cfg.json", {"seed": [0, 1], "loss_type": ["ce"]}, result_probe=probe)
    assert len(jobs) == 2
    assert jobs[1]["done"] and not jobs[0]["done"]
    launched = launch(jobs, backend="print", skip_done=True)
    assert len(launched) == 1

    ejobs = make_eval_jobs(
        "inductive",
        score_matrix_template=str(tmp_path / "{domain}.pkl"),
        res_dir_template=str(tmp_path / "res_{domain}"),
        grid={"domain": ["yugioh"], "method": ["cur"], "seed": [0]},
    )
    assert "eval_retrieval" in ejobs[0]["cmd"] and "--methods cur" in ejobs[0]["cmd"]


def test_plots(tmp_path, low_rank_factory):
    from anncur_tpu.evalx.plots import (
        plot_heat_map,
        plot_recall_vs_cost,
        plot_score_distribution,
    )

    mat = np.random.default_rng(0).uniform(0, 100, (3, 4))
    out = plot_heat_map(mat, [50, 100, 200], [10, 50, 100, 500], str(tmp_path / "hm.pdf"))
    assert os.path.exists(out)

    rows = {"cur": [{"cost": 10, "recall": 0.5}, {"cost": 100, "recall": 0.9}],
            "bienc": [{"cost": 10, "recall": 0.4}]}
    out2 = plot_recall_vs_cost(rows, str(tmp_path / "rc.pdf"), top_k=10)
    assert os.path.exists(out2)

    out3 = plot_score_distribution(low_rank_factory(), str(tmp_path / "sd.pdf"))
    assert os.path.exists(out3)


def test_heat_map_from_transductive(tmp_path, low_rank_factory):
    from anncur_tpu.evalx.plots import heat_map_from_transductive
    from anncur_tpu.evalx.transductive import run_transductive_eval

    mat = low_rank_factory(n=40, m=60, rank=4)
    res = run_transductive_eval(
        mat, str(tmp_path), methods=("cur",), n_seeds=1,
        n_ment_anchors_vals=[10, 20], n_ent_anchors_vals=[8, 16],
        top_k_vals=[5], top_k_retvr_vals=[16],
    )
    out = heat_map_from_transductive(res, "cur", 5, 16, str(tmp_path))
    assert out is not None and os.path.exists(out)


def test_rq_plots(tmp_path):
    from anncur_tpu.evalx.plots import plot_recall_vs_domain_size, plot_recall_vs_train_size

    p1 = plot_recall_vs_domain_size(
        {"yugioh": {"n_ents": 10031, "recall": 0.9},
         "military": {"n_ents": 104520, "recall": 0.8}},
        str(tmp_path / "rq3.pdf"),
    )
    p2 = plot_recall_vs_train_size(
        {100: {"cur": 0.7, "bienc": 0.5}, 2000: {"cur": 0.95, "bienc": 0.5}},
        str(tmp_path / "rq4.pdf"),
    )
    assert os.path.exists(p1) and os.path.exists(p2)


def test_paper_style_mapping():
    """The paper display-name/color map must match the reference's
    assignments exactly (plot_emnlp...py:75-104, 289-294): annCUR
    yellowgreen family, fixedITEM darkblue, itemCUR turquoise/teal,
    TF-IDF lightseagreen, DE gold/darkorange/maroon."""
    from anncur_tpu.evalx.paper_style import (
        method_color,
        method_display,
        split_model_key,
    )

    assert method_display("cur") == "annCUR"
    assert method_display("cur", "100") == "annCUR$_{100}$"
    assert method_display("cur", "100", latex=True) == r"\textsc{annCUR}\textsubscript{100}"
    assert method_display("fixed_anc_ent") == "fixedITEM"
    assert method_display("fixed_anc_ent_cur", "200") == "itemCUR$_{200}$"
    assert method_display("tfidf") == "TF-IDF"
    assert method_display("bienc", "base+ce") == "DE$_{base+ce}$"
    assert method_display("unknown_method") == "unknown_method"

    assert method_color("tfidf") == "lightseagreen"
    assert method_color("cur", "100") == "limegreen"
    assert method_color("cur", "200") == "darkgreen"
    assert method_color("cur") == "yellowgreen"
    assert method_color("fixed_anc_ent") == "darkblue"
    assert method_color("fixed_anc_ent_cur", "200") == "teal"
    assert method_color("bienc", "bert+ce") == "maroon"
    assert method_color("nope") is None

    # longest-key-wins split: itemCUR rows must not parse as fixedITEM
    assert split_model_key("fixed_anc_ent_cur_200") == ("fixed_anc_ent_cur", "200")
    assert split_model_key("fixed_anc_ent") == ("fixed_anc_ent", None)
    assert split_model_key("cur_100") == ("cur", "100")
    assert split_model_key("bienc") == ("bienc", None)


def test_paper_style_plots_render(tmp_path):
    """Every RQ plot family renders under style='paper' (no LaTeX
    needed: mathtext subscripts stand in for \\textsubscript)."""
    from anncur_tpu.evalx.plots import (
        plot_ce_baselines_from_pivot,
        plot_recall_vs_cost,
        plot_recall_vs_domain_size,
        plot_recall_vs_train_size,
    )

    rows = {
        "cur": [{"cost": 10, "recall": 0.5}, {"cost": 100, "recall": 0.9}],
        "fixed_anc_ent_cur_100": [{"cost": 10, "recall": 0.4}],
    }
    p1 = plot_recall_vs_cost(rows, str(tmp_path / "rc_paper.pdf"), top_k=10, style="paper")
    p2 = plot_recall_vs_domain_size(
        {"yugioh": {"n_ents": 10031, "recall": 0.9},
         "military": {"n_ents": 104520, "recall": 0.8}},
        str(tmp_path / "rq3_paper.pdf"),
        style="paper",
    )
    p3 = plot_recall_vs_train_size(
        {100: {"cur": 0.7, "bienc": 0.5}, 2000: {"cur": 0.95, "bienc": 0.5}},
        str(tmp_path / "rq4_paper.pdf"),
        style="paper",
    )
    import csv as _csv

    csv_path = str(tmp_path / "pivot.csv")
    with open(csv_path, "w", newline="") as fout:
        w = _csv.DictWriter(fout, fieldnames=["row", "cost=100", "cost=500"])
        w.writeheader()
        w.writerow({"row": "model=cur~anc_n_e=100", "cost=100": "0.8", "cost=500": "0.95"})
        w.writerow({"row": "model=fixed_anc_ent~anc_n_e=None", "cost=100": "0.5", "cost=500": "0.7"})
    p4 = plot_ce_baselines_from_pivot(
        csv_path, str(tmp_path / "rq5_paper.pdf"), x_prefix="cost", style="paper"
    )
    for p in (p1, p2, p3, p4):
        assert p is not None and os.path.exists(p), p
