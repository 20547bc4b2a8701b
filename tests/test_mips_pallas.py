"""Streaming / Pallas fused MIPS vs brute-force oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from anncur_tpu.ops.mips import mips_topk
from anncur_tpu.ops.mips_pallas import mips_topk_pallas, mips_topk_streaming


@pytest.mark.parametrize("n,chunk", [(1000, 256), (512, 512), (300, 128)])
def test_streaming_matches_brute(rng, n, chunk):
    q = rng.standard_normal((16, 64)).astype(np.float32)
    items = rng.standard_normal((n, 64)).astype(np.float32)
    s1, i1 = mips_topk(jnp.asarray(q), jnp.asarray(items), 10)
    s2, i2 = mips_topk_streaming(jnp.asarray(q), jnp.asarray(items), 10, chunk=chunk)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s1), rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(i1))


def test_streaming_k_larger_than_chunk(rng):
    q = rng.standard_normal((4, 32)).astype(np.float32)
    items = rng.standard_normal((600, 32)).astype(np.float32)
    s1, i1 = mips_topk(jnp.asarray(q), jnp.asarray(items), 50)
    s2, i2 = mips_topk_streaming(jnp.asarray(q), jnp.asarray(items), 50, chunk=128)
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(i1))


def test_pallas_interpret_matches_brute(rng):
    # interpret=True runs the kernel logic on CPU (compiled path is
    # exercised on the real TPU in bench/verify drives)
    q = rng.standard_normal((8, 128)).astype(np.float32)
    items = rng.standard_normal((512, 128)).astype(np.float32)
    s1, i1 = mips_topk(jnp.asarray(q), jnp.asarray(items), 16)
    s2, i2 = mips_topk_pallas(jnp.asarray(q), jnp.asarray(items), 16, tile=128, interpret=True)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s1), rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(i1))


def test_pallas_interpret_padding(rng):
    q = rng.standard_normal((4, 32)).astype(np.float32)
    items = rng.standard_normal((300, 32)).astype(np.float32)  # not tile-divisible
    s1, i1 = mips_topk(jnp.asarray(q), jnp.asarray(items), 7)
    s2, i2 = mips_topk_pallas(jnp.asarray(q), jnp.asarray(items), 7, tile=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(i1))
    assert np.all(np.asarray(i2) < 300)


def test_maxmask_interpret_matches_brute(rng):
    """In-kernel max-and-mask selection (no lax.top_k — the variant that
    lowers on real Mosaic): exact scores, exact id SET (ties break to
    the smaller id, which may differ from lax.top_k's order)."""
    from anncur_tpu.ops.mips_pallas import mips_topk_pallas_maxmask

    q = rng.standard_normal((8, 128)).astype(np.float32)
    items = rng.standard_normal((512, 128)).astype(np.float32)
    s1, i1 = mips_topk(jnp.asarray(q), jnp.asarray(items), 16)
    s2, i2 = mips_topk_pallas_maxmask(
        jnp.asarray(q), jnp.asarray(items), 16, tile=128, interpret=True
    )
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s1), rtol=1e-4, atol=1e-4)
    # scores descending + ids identical as sets (distinct values here)
    assert np.all(np.diff(np.asarray(s2), axis=1) <= 1e-7)
    for r_ in range(8):
        assert set(np.asarray(i2)[r_].tolist()) == set(np.asarray(i1)[r_].tolist())


def test_maxmask_interpret_padding_and_ties(rng):
    from anncur_tpu.ops.mips_pallas import mips_topk_pallas_maxmask

    q = rng.standard_normal((4, 32)).astype(np.float32)
    items = rng.standard_normal((300, 32)).astype(np.float32)
    items[37] = items[251]  # exact duplicate rows -> tied scores
    s1, i1 = mips_topk(jnp.asarray(q), jnp.asarray(items), 7)
    s2, i2 = mips_topk_pallas_maxmask(
        jnp.asarray(q), jnp.asarray(items), 7, tile=128, interpret=True
    )
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s1), rtol=1e-4, atol=1e-4)
    assert np.all(np.asarray(i2) < 300)
    # every id returned must carry the same exact score as brute force at
    # its rank (tie order may differ between implementations)
    full = np.asarray(q) @ np.asarray(items).T
    got = np.take_along_axis(full, np.asarray(i2), axis=1)
    np.testing.assert_allclose(got, np.asarray(s1), rtol=1e-4, atol=1e-4)
    # no duplicate ids within a row (mask removes exactly the picked entry)
    for r_ in range(4):
        assert len(set(np.asarray(i2)[r_].tolist())) == 7


def test_maxmask_interpret_query_tiling(rng):
    """q_tile < q exercises the 2-D grid (round 4: the q axis is tiled
    so the VMEM working set is (q_tile, tile) regardless of total
    queries) including query-axis padding when q is not tile-divisible."""
    from anncur_tpu.ops.mips_pallas import mips_topk_pallas_maxmask

    q = rng.standard_normal((10, 32)).astype(np.float32)  # 10 % 4 != 0
    items = rng.standard_normal((300, 32)).astype(np.float32)
    s1, i1 = mips_topk(jnp.asarray(q), jnp.asarray(items), 5)
    s2, i2 = mips_topk_pallas_maxmask(
        jnp.asarray(q), jnp.asarray(items), 5, tile=128, q_tile=4, interpret=True
    )
    assert s2.shape == (10, 5) and i2.shape == (10, 5)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s1), rtol=1e-4, atol=1e-4)
    for r_ in range(10):
        assert set(np.asarray(i2)[r_].tolist()) == set(np.asarray(i1)[r_].tolist())


def test_fused_dispatch_by_score_matrix_size(rng):
    """fused_mips_topk picks materialize under the byte budget and
    streaming above it (military-scale measurement: materialize is 3x
    faster when the matrix fits HBM); both must agree exactly."""
    from anncur_tpu.ops.mips_pallas import fused_mips_topk

    q = rng.standard_normal((8, 32)).astype(np.float32)
    items = rng.standard_normal((500, 32)).astype(np.float32)
    s_mat, i_mat = fused_mips_topk(
        jnp.asarray(q), jnp.asarray(items), 9
    )  # 8*500*4 = 16 kB << default budget -> materialize
    s_str, i_str = fused_mips_topk(
        jnp.asarray(q), jnp.asarray(items), 9, chunk=128, materialize_bytes=0
    )  # forced streaming
    np.testing.assert_allclose(np.asarray(s_str), np.asarray(s_mat), rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i_str), np.asarray(i_mat))
