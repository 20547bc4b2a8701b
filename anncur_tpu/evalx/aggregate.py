"""Result aggregation across domains/worlds.

Parity with eval/avg_zeshel_results.py:20-111 (macro + mention-weighted
micro averages of res.json metric dicts) and the flat combined key-value
export of eval/compile_emnlp_retrieval_eval_wrt_exact_crossenc.py:280-355.
"""

from __future__ import annotations

import csv
import glob
import json
import logging
import os
from collections import defaultdict
from typing import Dict, List, Optional, Sequence

import numpy as np

LOGGER = logging.getLogger(__name__)


def _to_float(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return None


def avg_results(
    per_domain: Dict[str, Dict],
    weights: Optional[Dict[str, float]] = None,
) -> Dict[str, Dict[str, float]]:
    """Macro + (weighted) micro averages of flat metric dicts
    (reference: get_avg_perf, eval/avg_zeshel_results.py:20-63)."""
    metrics = defaultdict(list)
    wvals = defaultdict(list)
    for domain, res in per_domain.items():
        w = (weights or {}).get(domain, 1.0)
        for metric, val in res.items():
            f = _to_float(val)
            if f is None:
                continue
            metrics[metric].append(f)
            wvals[metric].append((f, w))
    macro = {m: float(np.mean(vals)) for m, vals in metrics.items()}
    micro = {
        m: float(sum(v * w for v, w in vw) / max(sum(w for _, w in vw), 1e-30))
        for m, vw in wvals.items()
    }
    return {"macro": macro, "micro": micro}


def flatten_result_tree(tree: Dict, prefix: str = "") -> Dict[str, float]:
    """Nested eval JSON -> flat {joined~key: value}
    (reference: create_combine_result_file, compile_...py:280-355)."""
    out = {}
    for key, val in tree.items():
        path = f"{prefix}~{key}" if prefix else str(key)
        if isinstance(val, dict):
            out.update(flatten_result_tree(val, path))
        else:
            f = _to_float(val)
            if f is not None:
                out[path] = f
    return out


def combine_result_files(result_glob: str, out_path: str) -> Dict[str, float]:
    """Glob per-method res.json files into one flat key-value JSON."""
    combined = {}
    for path in sorted(glob.glob(result_glob)):
        with open(path) as fin:
            tree = json.load(fin)
        tag = os.path.basename(os.path.dirname(path))
        combined.update(flatten_result_tree(tree, tag))
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as fout:
        json.dump(combined, fout, indent=2, sort_keys=True)
    LOGGER.info("combined %s -> %s (%d keys)", result_glob, out_path, len(combined))
    return combined


def recall_vs_cost_table(
    result: Dict,
    method: str,
    top_k: int,
    metric: str = "exact_vs_reranked_approx_retvr~common_frac_mean",
) -> List[Dict[str, float]]:
    """Extract (cost, recall) rows from an inductive res.json: cost =
    top_k_retvr + n_ent_anchors for CUR-family, top_k_retvr otherwise
    (reference cost model: compile_...py:247-258)."""
    rows = []
    tree = result.get(f"top_k={top_k}", {})
    budget_method = any(tag in method for tag in ("cur", "fixed_anc_ent", "axn"))
    for kr_key, by_anchor in tree.items():
        kr = int(kr_key.split("=")[1])
        for anc_key, metrics in by_anchor.items():
            n_anc = int(anc_key.split("=")[-1])
            cost = kr + n_anc if budget_method else kr
            if metric in metrics:
                rows.append(
                    {"cost": cost, "top_k_retvr": kr, "n_ent_anchors": n_anc, "recall": metrics[metric]}
                )
    rows.sort(key=lambda r: r["cost"])
    return rows


def best_recall_at_cost(rows: Sequence[Dict], max_cost: float) -> Optional[Dict]:
    """Best recall among configurations within a CE-call budget."""
    feasible = [r for r in rows if r["cost"] <= max_cost]
    return max(feasible, key=lambda r: r["recall"]) if feasible else None


def write_csv(rows: Sequence[Dict], path: str) -> None:
    if not rows:
        return
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", newline="") as fout:
        writer = csv.DictWriter(fout, fieldnames=list(rows[0].keys()))
        writer.writeheader()
        writer.writerows(rows)
