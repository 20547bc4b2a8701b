"""Matrix-rank probes for score matrices.

Parity with eval/compute_m2e_matrix_ranks.py:29-114: reports effective
numerical rank of cross-encoder score matrices (the empirical motivation
for CUR — CE matrices are approximately low-rank), plus the bi-encoder
full-matrix scorer (by construction rank <= embed_dim).
"""

from __future__ import annotations

import logging
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

LOGGER = logging.getLogger(__name__)


def matrix_rank_report(matrix: np.ndarray, rcond: Optional[float] = None) -> Dict:
    """Numerical rank + singular-value spectrum summary."""
    mat = np.asarray(matrix, np.float32)
    # host numpy SVD: the input is host-resident and the report is
    # host-side — jnp here ran on the force-set axon TPU backend, paying
    # a 60-90s remote compile per matrix shape and shipping the whole
    # matrix over the tunnel (and contending for the single-process chip)
    sv = np.linalg.svd(mat, compute_uv=False)
    if rcond is None:
        rcond = max(mat.shape) * np.finfo(np.float32).eps
    cutoff = rcond * sv[0] if len(sv) else 0.0
    rank = int(np.sum(sv > cutoff))
    energy = np.cumsum(sv**2) / max(np.sum(sv**2), 1e-30)
    return {
        "shape": list(mat.shape),
        "rank": rank,
        "rank_99pct_energy": int(np.searchsorted(energy, 0.99) + 1),
        "rank_999pct_energy": int(np.searchsorted(energy, 0.999) + 1),
        "top_singular_values": sv[:10].tolist(),
        "rcond": float(rcond),
    }


def bienc_score_matrix(input_embeds: np.ndarray, label_embeds: np.ndarray) -> np.ndarray:
    """Full dense bi-encoder score matrix (reference:
    compute_binec_ment_to_ent_scores, compute_m2e_matrix_ranks.py:58-114)."""
    return np.asarray(
        jnp.dot(
            jnp.asarray(input_embeds, jnp.float32),
            jnp.asarray(label_embeds, jnp.float32).T,
            precision="highest",
        )
    )
