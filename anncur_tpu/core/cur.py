"""CUR matrix-decomposition index — the heart of the engine.

Given exact cross-encoder scores of ``k_r`` anchor queries against all
items (``R``, k_r x m) and of all queries against ``k_c`` anchor items
(``C``, n x k_c), approximate the full score matrix as ``C @ U @ R`` with
``U = pinv(C[row_idxs, :])``. Capability parity with the reference
``CURApprox`` (eval/matrix_approx_zeshel.py:19-126) including the
``approx_preference`` ('rows'/'cols') latent factorization and the
oracle-U variant, but redesigned as an immutable jax pytree so index
build *and* query are jit/pjit compatible:

- build = one small pinv (k_c x k_r) + one matmul -> runs under jit,
- online query = dense (q, k) @ (k, m) matmul + ``lax.top_k``; batched
  queries hit the MXU directly.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from anncur_tpu.ops.pinv import pinv, pinv_f64


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("latent_rows", "latent_cols", "row_idxs", "col_idxs"),
    meta_fields=("approx_preference",),
)
@dataclasses.dataclass(frozen=True)
class CurIndex:
    """Latent-factor form of the CUR approximation.

    approx_preference='rows':  latent_rows = C (n x k_c),
                               latent_cols = U @ R (k_c x m)
    approx_preference='cols':  latent_rows = C @ U (n x k_r),
                               latent_cols = R (k_r x m)

    (reference: eval/matrix_approx_zeshel.py:57-69)
    """

    latent_rows: jax.Array  # (n, k)
    latent_cols: jax.Array  # (k, m)
    row_idxs: jax.Array  # (k_r,) anchor row (query) ids
    col_idxs: jax.Array  # (k_c,) anchor col (item) ids
    approx_preference: str = "rows"

    # ---- full / sliced reconstruction ------------------------------- #

    @property
    def n_rows(self) -> int:
        return self.latent_rows.shape[0]

    @property
    def n_cols(self) -> int:
        return self.latent_cols.shape[1]

    def reconstruct(self) -> jax.Array:
        """Full (n x m) approximate score matrix."""
        return jnp.dot(
            self.latent_rows, self.latent_cols, preferred_element_type=jnp.float32, precision="highest"
        )

    def get_rows(self, row_idxs: jax.Array) -> jax.Array:
        return jnp.dot(
            self.latent_rows[row_idxs, :],
            self.latent_cols,
            preferred_element_type=jnp.float32, precision="highest",
        )

    def get_cols(self, col_idxs: jax.Array) -> jax.Array:
        return jnp.dot(
            self.latent_rows,
            self.latent_cols[:, col_idxs],
            preferred_element_type=jnp.float32, precision="highest",
        )

    def get(self, row_idxs: jax.Array, col_idxs: jax.Array) -> jax.Array:
        return jnp.dot(
            self.latent_rows[row_idxs, :],
            self.latent_cols[:, col_idxs],
            preferred_element_type=jnp.float32, precision="highest",
        )

    # ---- online query path ------------------------------------------ #

    def get_complete_row(self, sparse_rows: jax.Array) -> jax.Array:
        """Project unseen queries' anchor-item scores to all-item scores.

        sparse_rows: (q, k_c) exact CE scores of q new queries against the
        anchor items. Returns (q, m). Requires approx_preference='rows'
        (reference: eval/matrix_approx_zeshel.py:109-119).
        """
        if self.approx_preference != "rows":
            raise ValueError(
                "get_complete_row requires an index built with approx_preference='rows'"
            )
        return jnp.dot(
            sparse_rows, self.latent_cols, preferred_element_type=jnp.float32, precision="highest"
        )

    def get_complete_col(self, sparse_cols: jax.Array) -> jax.Array:
        """Dual: project new items' anchor-query scores to all-query scores.

        sparse_cols: (k_r, c). Returns (n, c). Requires
        approx_preference='cols' (reference: matrix_approx_zeshel.py:88-98).
        """
        if self.approx_preference != "cols":
            raise ValueError(
                "get_complete_col requires an index built with approx_preference='cols'"
            )
        return jnp.dot(
            self.latent_rows, sparse_cols, preferred_element_type=jnp.float32, precision="highest"
        )

    def topk_in_row(self, sparse_rows: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
        """(scores, indices) of the approx top-k items for new queries."""
        return lax.top_k(self.get_complete_row(sparse_rows), k)

    def topk_in_col(self, sparse_cols: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
        return lax.top_k(self.get_complete_col(sparse_cols).T, k)


def build_cur(
    rows: jax.Array,  # R: (k_r, m) anchor-query scores against all items
    cols: jax.Array,  # C: (n, k_c) all-query scores against anchor items
    row_idxs: jax.Array,
    col_idxs: jax.Array,
    approx_preference: str = "rows",
    full_matrix: Optional[jax.Array] = None,  # oracle-U (reference :46-47)
    rcond: Optional[float] = None,
    validate: bool = True,
    pinv_impl: str = "auto",
    return_u: bool = False,
) -> CurIndex:
    """Build a CUR index from anchor rows/cols of the score matrix.

    ``full_matrix`` enables the better-conditioned oracle estimate
    ``U = pinv(C) @ A @ pinv(R)`` used as a correctness upper bound
    (reference: eval/matrix_approx_zeshel.py:46-49).

    ``pinv_impl``: 'f64_host' computes U with float64 LAPACK on the host
    (numerical parity with the reference's np.linalg.pinv), 'f32' runs the
    SVD in float32 under jit (TPU-native). 'auto' picks f64_host for
    concrete inputs and f32 when tracing.

    ``rcond``: float cutoff, None (f32-eps relative — right when the
    matrix structure sits well above the compute noise floor), the
    string 'noise' for the Gavish-Donoho median-based adaptive threshold
    (ops/pinv.py::noise_rcond; host-only — requires concrete inputs), or
    'auto' — noise threshold only when the inverted matrix is genuinely
    ill-conditioned (kappa >= 1e4), eps cutoff otherwise. 'auto' is the
    right default for anchor sweeps: near-square anchor intersections
    need the noise cut (measured recall 38% -> 91% at n_anc == n_train)
    while all-signal spectra must NOT be Gavish-Donoho-truncated
    (70% -> 9% at n_anc below the effective rank); see
    ops/pinv.py::auto_rcond for the measurements.
    """
    rows = jnp.asarray(rows, jnp.float32)
    cols = jnp.asarray(cols, jnp.float32)
    row_idxs = jnp.asarray(row_idxs, jnp.int32)
    col_idxs = jnp.asarray(col_idxs, jnp.int32)

    if rows.shape[0] != row_idxs.shape[0]:
        raise ValueError(f"rows {rows.shape} vs row_idxs {row_idxs.shape}")
    if cols.shape[1] != col_idxs.shape[0]:
        raise ValueError(f"cols {cols.shape} vs col_idxs {col_idxs.shape}")

    tracing = any(
        isinstance(x, jax.core.Tracer)
        for x in (rows, cols, row_idxs, col_idxs, full_matrix)
    )
    if validate and not tracing:
        # anchor intersection consistency (reference assertion at :44).
        # Auto-skipped under jit: the bool() on a tracer would raise
        # TracerBoolConversionError, breaking the module's advertised
        # jit-compatibility for the default arguments.
        inter_from_cols = cols[row_idxs, :]
        inter_from_rows = rows[:, col_idxs]
        if not bool(jnp.allclose(inter_from_cols, inter_from_rows, atol=1e-4)):
            raise ValueError(
                "rows/cols intersection mismatch: R[:, col_idxs] != C[row_idxs, :]"
            )

    if pinv_impl == "auto":
        pinv_impl = "f32" if tracing else "f64_host"
    if isinstance(rcond, str):
        if rcond not in ("noise", "auto"):
            raise ValueError(f"rcond={rcond!r} not in (None, float, 'noise', 'auto')")
        if tracing:
            # every matrix _pinv may see (cols, rows in the oracle
            # branch, full_matrix) must be concrete for the host SVD
            raise ValueError(f"rcond={rcond!r} needs concrete inputs (host SVD)")
        from anncur_tpu.ops.pinv import auto_rcond, noise_rcond

        # per-inversion threshold: the oracle branch inverts BOTH cols
        # and rows, whose aspect ratios and spectra differ — one shared
        # cutoff would be wrong for the other matrix
        fn = noise_rcond if rcond == "noise" else auto_rcond
        _rcond = lambda m: fn(np.asarray(m))  # noqa: E731
    else:
        _rcond = lambda m: rcond  # noqa: E731
    if pinv_impl == "f64_host":
        _pinv = lambda m: jnp.asarray(pinv_f64(m, _rcond(m)), jnp.float32)  # noqa: E731
    elif pinv_impl == "f32":
        _pinv = lambda m: pinv(m, _rcond(m))  # noqa: E731
    else:
        raise ValueError(f"pinv_impl={pinv_impl!r} not in ('auto','f32','f64_host')")

    if full_matrix is not None:
        full_matrix = jnp.asarray(full_matrix, jnp.float32)
        u = jnp.dot(
            jnp.dot(_pinv(cols), full_matrix, preferred_element_type=jnp.float32, precision="highest"),
            _pinv(rows),
            preferred_element_type=jnp.float32, precision="highest",
        )  # (k_c, k_r)
    else:
        u = _pinv(cols[row_idxs, :])  # (k_c, k_r)

    if approx_preference == "rows":
        latent_rows = cols  # (n, k_c)
        latent_cols = jnp.dot(u, rows, preferred_element_type=jnp.float32, precision="highest")  # (k_c, m)
    elif approx_preference == "cols":
        latent_rows = jnp.dot(cols, u, preferred_element_type=jnp.float32, precision="highest")  # (n, k_r)
        latent_cols = rows  # (k_r, m)
    else:
        raise ValueError(f"approx_preference={approx_preference!r} not in ('rows','cols')")

    index = CurIndex(
        latent_rows=latent_rows,
        latent_cols=latent_cols,
        row_idxs=row_idxs,
        col_idxs=col_idxs,
        approx_preference=approx_preference,
    )
    # ``return_u``: also hand back the pseudoinverse — callers that
    # support incremental item addition need it (a new item's latent
    # column is U @ r_new; U depends only on the anchor intersection,
    # which new items never touch).
    return (index, u) if return_u else index


def save_cur_index(path: str, index: CurIndex) -> None:
    """Persist the latent factors + anchor ids (numpy pickle; loadable
    without jax on any host)."""
    import os
    import pickle

    import numpy as np

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as fout:
        pickle.dump(
            {
                "latent_rows": np.asarray(index.latent_rows),
                "latent_cols": np.asarray(index.latent_cols),
                "row_idxs": np.asarray(index.row_idxs),
                "col_idxs": np.asarray(index.col_idxs),
                "approx_preference": index.approx_preference,
                "format_version": 1,
            },
            fout,
        )


def load_cur_index(path: str) -> CurIndex:
    import pickle

    with open(path, "rb") as fin:
        d = pickle.load(fin)
    return CurIndex(
        latent_rows=jnp.asarray(d["latent_rows"]),
        latent_cols=jnp.asarray(d["latent_cols"]),
        row_idxs=jnp.asarray(d["row_idxs"]),
        col_idxs=jnp.asarray(d["col_idxs"]),
        approx_preference=d["approx_preference"],
    )


def build_cur_from_matrix(
    matrix: jax.Array,
    row_idxs: jax.Array,
    col_idxs: jax.Array,
    approx_preference: str = "rows",
    oracle: bool = False,
    rcond: Optional[float] = None,
    pinv_impl: str = "auto",
) -> CurIndex:
    """Convenience: slice anchor rows/cols out of a dense matrix and build."""
    matrix = jnp.asarray(matrix, jnp.float32)
    row_idxs = jnp.asarray(row_idxs, jnp.int32)
    col_idxs = jnp.asarray(col_idxs, jnp.int32)
    return build_cur(
        rows=matrix[row_idxs, :],
        cols=matrix[:, col_idxs],
        row_idxs=row_idxs,
        col_idxs=col_idxs,
        approx_preference=approx_preference,
        full_matrix=matrix if oracle else None,
        rcond=rcond,
        validate=False,
        pinv_impl=pinv_impl,
    )
