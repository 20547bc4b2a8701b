"""Smoke tests for the round-3 measurement tools (quick CPU modes).

These tools are user-facing entry points (scale drive, packing
measurement, build profiler, matched-recall search); each must keep
running end-to-end and producing its JSON artifact."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(tool, out, extra=()):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", tool), "--quick", "--out", out, *extra],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    with open(out) as f:
        return json.load(f)


def test_scale_drive_quick(tmp_path):
    d = _run(
        "scale_drive_tpu.py", str(tmp_path / "sd.json"),
        extra=("--work-dir", str(tmp_path / "work")),
    )
    assert set(d["stages"]) == {
        "offline_build", "transductive", "inductive", "adaptive_axn", "retrieve_rerank",
    }
    assert d["stages"]["offline_build"]["pairs_per_s"] > 0
    assert 0 <= d["stages"]["adaptive_axn"]["fixed_anchor_recall@10_at_cost600"] <= 1
    assert d["stages"]["transductive"]["oracle_probe"]["oracle_recall_pct"] >= 0


def test_measure_packing_quick(tmp_path):
    d = _run("measure_packing.py", str(tmp_path / "pk.json"))
    assert set(d["regimes"]) == {"full", "mixed", "short"}
    for r in d["regimes"].values():
        # bucketing must stay EXACT (dropped positions are PAD)
        assert r["max_abs_err_over_std"] < 1e-4
    assert d["regimes"]["full"]["padding_ratio"] == 0.0
    assert d["regimes"]["short"]["padding_ratio"] > 0.3


def test_matched_recall_quick(tmp_path):
    out = str(tmp_path / "amr.json")
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "adaptive_matched_recall.py"),
         "--quick", "--out", out],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    d = json.load(open(out))
    assert d["headline_scenario"] is not None
    assert d["headline_matched_budget"] is not None


def test_profile_build_quick(tmp_path):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "profile_build.py"), "--quick",
         "--trace-dir", str(tmp_path / "trace")],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    # stdout = one-line stage/progress JSONs, then pretty-printed result
    # blobs; the FINAL blob (starting at the last top-level "{" line) is
    # the full report
    lines = r.stdout.splitlines()
    start_line = max(i for i, ln in enumerate(lines) if ln == "{")
    d = json.loads("\n".join(lines[start_line:]))
    assert d["full_step_s"] > 0
    assert set(d["families"]) >= {"proj_matmul_hh", "attn_softmax", "gelu", "layernorm"}
