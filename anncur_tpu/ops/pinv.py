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
