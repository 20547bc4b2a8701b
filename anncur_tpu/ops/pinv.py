"""Moore-Penrose pseudoinverse for TPU.

The reference relies on LAPACK float64 ``np.linalg.pinv`` for the CUR ``U``
matrix (reference: eval/matrix_approx_zeshel.py:47-49). On TPU we run the
SVD in float32 under jit with an explicit relative cutoff; a float64 host
path is kept for parity checks (tests compare the two on ill-conditioned
inputs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def pinv(mat: jax.Array, rcond: float | None = None) -> jax.Array:
    """SVD-based pseudoinverse, jit-friendly, f32 on TPU.

    rcond defaults to ``max(m, n) * eps`` of the dtype, matching numpy.
    """
    mat = jnp.asarray(mat)
    if rcond is None:
        rcond = max(mat.shape[-2], mat.shape[-1]) * float(jnp.finfo(mat.dtype).eps)
    return jnp.linalg.pinv(mat.astype(jnp.float32), rcond=rcond)


def noise_rcond(mat) -> float:
    """Noise-adaptive relative pinv cutoff (Gavish-Donoho 2014 optimal
    hard threshold for singular values, unknown-noise form).

    The singular values of a low-rank-plus-noise matrix split into
    signal and a noise bulk whose scale shows up in the MEDIAN singular
    value; the optimal hard threshold is ``omega(beta) * sigma_med``
    with ``omega`` a function of the aspect ratio ``beta = m/n``
    (approximation from the paper, eq. 5: accurate to ~0.02). Use as
    ``rcond=noise_rcond(C)`` when the matrix's structure may sit near
    the compute noise floor — e.g. score matrices produced by DIFFERENT
    TPU programs whose bf16-level matmul rounding differs (offline
    builder vs online fused query program); the f32-eps default keeps
    decades of noise directions there and pinv amplifies the
    inconsistency (measured recall@5 0.5 -> 0.9 on a rank-1-ish CE
    matrix, tools note in CLAUDE.md).
    """
    mat = np.asarray(mat, dtype=np.float64)
    m, n = mat.shape[-2], mat.shape[-1]
    beta = min(m, n) / max(m, n)
    omega = 0.56 * beta**3 - 0.95 * beta**2 + 1.82 * beta + 1.43
    sv = np.linalg.svd(mat, compute_uv=False)
    if sv[..., 0] == 0:
        return 0.0
    return float(omega * np.median(sv, axis=-1) / sv[..., 0])


def pinv_f64(mat, rcond: float | None = None) -> np.ndarray:
    """Host float64 pseudoinverse (numpy/LAPACK) for conditioning parity.

    Scores arrive as float32, so singular values below float32 noise are
    pure noise: keeping them (numpy's default f64 rcond would) produces a
    U with huge entries that destroys float32 downstream matmuls. Default
    rcond therefore cuts at f32 machine precision.
    """
    mat = np.asarray(mat, dtype=np.float64)
    if rcond is None:
        rcond = max(mat.shape[-2], mat.shape[-1]) * float(np.finfo(np.float32).eps)
    return np.linalg.pinv(mat, rcond=rcond)


def auto_rcond(mat, kappa_threshold: float = 1e4) -> float | None:
    """Condition-aware pinv cutoff: Gavish-Donoho noise threshold ONLY
    when the matrix is genuinely ill-conditioned, else the f32-eps
    default (None).

    Rationale (measured on the yugioh-scale synthetic, inductive
    recall@100 with 500 train rows): near-SQUARE anchor intersections
    (n_anchors ~ n_train) have exploding condition numbers — their
    smallest singular values are noise and the eps cutoff keeps them,
    collapsing recall (38% at anc=500 vs 91% with the noise cutoff).
    But when anchors <= effective rank, the spectrum is ALL signal,
    Gavish-Donoho's median-based noise estimate lands mid-signal and
    over-truncates (recall 70% -> 9% at anc=200). Condition number
    separates the regimes cleanly: all-signal spectra stay moderate
    (kappa ~ 1e2), noise-reaching spectra explode (>= 1e4, where f32
    solves lose most of their precision anyway).
    """
    mat = np.asarray(mat, dtype=np.float64)
    sv = np.linalg.svd(mat, compute_uv=False)
    if sv[..., 0] == 0:
        return 0.0
    kappa = float(sv[..., 0] / max(float(sv[..., -1]), 1e-300))
    if kappa < kappa_threshold:
        return None  # well-conditioned: keep everything above f32 eps
    return noise_rcond(mat)
