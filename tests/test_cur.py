"""CUR index correctness tests.

Oracles derived from the reference's implicit checks (SURVEY §4):
(a) exact reconstruction on low-rank matrices when anchors span the rank,
(b) anchor rows/cols reproduce exactly,
(c) oracle-U at least as good as plain CUR,
(d) get_complete_row == the corresponding reconstructed rows,
(e) parity with a float64 numpy reference implementation.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from anncur_tpu.core import CurIndex, build_cur
from anncur_tpu.core.cur import build_cur_from_matrix
from anncur_tpu.ops.pinv import pinv_f64


def numpy_cur_reference(matrix, row_idxs, col_idxs, preference="rows"):
    """Straight float64 transcription of the CUR math
    (behavioral model of eval/matrix_approx_zeshel.py:19-69)."""
    R = matrix[row_idxs, :].astype(np.float64)
    C = matrix[:, col_idxs].astype(np.float64)
    U = pinv_f64(C[row_idxs, :])
    if preference == "rows":
        return C, U @ R
    return C @ U, R


@pytest.mark.parametrize("preference", ["rows", "cols"])
def test_exact_on_low_rank(low_rank_factory, preference):
    mat = low_rank_factory(n=64, m=96, rank=6)
    row_idxs = np.arange(0, 64, 8)  # 8 anchors >= rank 6
    col_idxs = np.arange(0, 96, 12)  # 8 anchors
    idx = build_cur_from_matrix(mat, row_idxs, col_idxs, approx_preference=preference)
    approx = np.asarray(idx.reconstruct())
    np.testing.assert_allclose(approx, mat, rtol=1e-3, atol=2e-2)


def test_matches_numpy_reference(low_rank_factory):
    mat = low_rank_factory(n=40, m=50, rank=5, noise=0.05)
    row_idxs = np.sort(np.random.default_rng(1).choice(40, 10, replace=False))
    col_idxs = np.sort(np.random.default_rng(2).choice(50, 10, replace=False))
    for pref in ("rows", "cols"):
        lr, lc = numpy_cur_reference(mat, row_idxs, col_idxs, pref)
        idx = build_cur_from_matrix(mat, row_idxs, col_idxs, approx_preference=pref)
        ref = lr @ lc
        got = np.asarray(idx.reconstruct())
        np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)


def test_anchor_rows_cols_roundtrip(low_rank_factory):
    mat = low_rank_factory(n=64, m=96, rank=4)
    row_idxs = np.arange(0, 64, 16)
    col_idxs = np.arange(0, 96, 16)
    idx = build_cur_from_matrix(mat, row_idxs, col_idxs)
    # anchor rows reconstruct near-exactly (reference oracle: anchor vs
    # non_anchor mention splits, run_retrieval_eval_wrt_exact_crossenc.py:47-153)
    np.testing.assert_allclose(
        np.asarray(idx.get_rows(jnp.asarray(row_idxs))), mat[row_idxs], atol=2e-2, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(idx.get_cols(jnp.asarray(col_idxs))), mat[:, col_idxs], atol=2e-2, rtol=1e-3
    )
    sub = np.asarray(idx.get(jnp.asarray(row_idxs), jnp.asarray(col_idxs)))
    np.testing.assert_allclose(sub, mat[np.ix_(row_idxs, col_idxs)], atol=2e-2, rtol=1e-3)


def test_oracle_u_not_worse(low_rank_factory):
    mat = low_rank_factory(n=60, m=80, rank=12, noise=0.3)
    rng = np.random.default_rng(3)
    row_idxs = np.sort(rng.choice(60, 8, replace=False))  # under-ranked anchors
    col_idxs = np.sort(rng.choice(80, 8, replace=False))
    plain = build_cur_from_matrix(mat, row_idxs, col_idxs)
    oracle = build_cur_from_matrix(mat, row_idxs, col_idxs, oracle=True)
    err_plain = np.linalg.norm(np.asarray(plain.reconstruct()) - mat)
    err_oracle = np.linalg.norm(np.asarray(oracle.reconstruct()) - mat)
    assert err_oracle <= err_plain * 1.01


def test_get_complete_row_matches_reconstruction(low_rank_factory):
    mat = low_rank_factory(n=64, m=96, rank=6)
    row_idxs = np.arange(32)  # "train" queries are the anchors
    col_idxs = np.arange(0, 96, 12)
    idx = build_cur_from_matrix(mat, row_idxs, col_idxs, approx_preference="rows")
    # unseen queries: rows 32..63; their anchor-item scores project to all items
    sparse = jnp.asarray(mat[32:, col_idxs])
    dense = np.asarray(idx.get_complete_row(sparse))
    assert dense.shape == (32, 96)
    np.testing.assert_allclose(dense, mat[32:], atol=5e-2, rtol=1e-2)
    scores, inds = idx.topk_in_row(sparse, k=10)
    exact_top = np.argsort(-mat[32:], axis=1)[:, :10]
    # top-1 must match on an exactly-low-rank matrix
    np.testing.assert_array_equal(np.asarray(inds[:, 0]), exact_top[:, 0])


def test_complete_col_dual(low_rank_factory):
    mat = low_rank_factory(n=64, m=96, rank=6)
    row_idxs = np.arange(0, 64, 8)
    col_idxs = np.arange(48)
    idx = build_cur_from_matrix(mat, row_idxs, col_idxs, approx_preference="cols")
    sparse_cols = jnp.asarray(mat[np.ix_(row_idxs, np.arange(48, 96))])
    dense = np.asarray(idx.get_complete_col(sparse_cols))
    np.testing.assert_allclose(dense, mat[:, 48:], atol=5e-2, rtol=1e-2)


def test_preference_guards(low_rank_factory):
    mat = low_rank_factory()
    idx = build_cur_from_matrix(mat, np.arange(8), np.arange(8), approx_preference="rows")
    with pytest.raises(ValueError):
        idx.get_complete_col(jnp.zeros((8, 3)))
    idx2 = build_cur_from_matrix(mat, np.arange(8), np.arange(8), approx_preference="cols")
    with pytest.raises(ValueError):
        idx2.get_complete_row(jnp.zeros((3, 8)))


def test_intersection_validation():
    rows = np.ones((2, 10), np.float32)
    cols = np.zeros((8, 2), np.float32)  # inconsistent with rows at intersection
    with pytest.raises(ValueError):
        build_cur(rows, cols, np.array([0, 1]), np.array([0, 1]))


def test_index_is_jittable_pytree(low_rank_factory):
    import jax

    mat = low_rank_factory(n=32, m=48, rank=4)
    idx = build_cur_from_matrix(mat, np.arange(8), np.arange(8))

    @jax.jit
    def query(index: CurIndex, sparse):
        return index.topk_in_row(sparse, 5)

    scores, inds = query(idx, jnp.asarray(mat[:4, :8]))
    assert scores.shape == (4, 5) and inds.shape == (4, 5)


def test_noise_rcond_recovers_rank():
    """Gavish-Donoho threshold must land between the smallest signal
    singular value and the noise bulk on a low-rank + noise matrix."""
    from anncur_tpu.ops.pinv import noise_rcond

    rng = np.random.default_rng(0)
    rank, n = 8, 100
    signal = rng.standard_normal((n, rank)) @ rng.standard_normal((rank, n))
    noise = 1e-3 * rng.standard_normal((n, n))
    mat = (signal + noise).astype(np.float32)
    rc = noise_rcond(mat)
    sv = np.linalg.svd(mat, compute_uv=False)
    kept = int(np.sum(sv > rc * sv[0]))
    assert kept == rank, (kept, rank, rc)


def test_build_cur_rcond_noise_beats_default_on_noisy_square():
    """On a noisy square anchor intersection, rcond='noise' must not be
    worse than the near-zero-cutoff reconstruction and must beat it when
    the intersection is ill-conditioned (the PARITY.md scenario: noise
    directions amplified through the pinv destroy non-anchor rows)."""
    rng = np.random.default_rng(1)
    rank, n_m, n_e, k = 8, 80, 120, 40
    M = (rng.standard_normal((n_m, rank)) @ rng.standard_normal((rank, n_e))).astype(np.float32)
    M += 5e-3 * rng.standard_normal(M.shape).astype(np.float32)
    row_idxs = np.arange(k)
    col_idxs = np.asarray(sorted(rng.choice(n_e, k, replace=False)))

    def frob_err(rcond):
        idx = build_cur(
            rows=M[row_idxs, :], cols=M[:, col_idxs],
            row_idxs=row_idxs, col_idxs=col_idxs,
            approx_preference="rows", rcond=rcond, validate=False,
        )
        rec = np.asarray(idx.reconstruct())
        return float(np.linalg.norm(rec - M) / np.linalg.norm(M))

    err_noise = frob_err("noise")
    err_tiny = frob_err(1e-12)
    assert err_noise <= err_tiny + 1e-6, (err_noise, err_tiny)
    assert err_noise < 0.05, err_noise


def test_build_cur_rcond_noise_rejects_tracers():
    import jax

    rng = np.random.default_rng(2)
    M = rng.standard_normal((16, 24)).astype(np.float32)

    def f(m):
        return build_cur(
            rows=m[:8], cols=m[:, :8], row_idxs=jnp.arange(8),
            col_idxs=jnp.arange(8), rcond="noise", validate=False,
        ).reconstruct()

    with pytest.raises(ValueError, match="concrete"):
        jax.jit(f)(jnp.asarray(M))


def test_build_cur_default_validate_is_jit_safe(low_rank_factory):
    """The module advertises jit-compatibility; the intersection check
    must auto-skip under tracing instead of raising
    TracerBoolConversionError on the default validate=True."""
    import jax

    mat = low_rank_factory(n=24, m=40, rank=4)
    row_idxs = np.arange(6)
    col_idxs = np.arange(6)

    @jax.jit
    def build(rows, cols):
        return build_cur(rows, cols, row_idxs, col_idxs)

    idx = build(jnp.asarray(mat[:6]), jnp.asarray(mat[:, :6]))
    ref = build_cur(mat[:6], mat[:, :6], row_idxs, col_idxs)
    np.testing.assert_allclose(
        np.asarray(idx.reconstruct()), np.asarray(ref.reconstruct()), atol=5e-3
    )
