"""MIPS tests: single-device, masked, and 8-device sharded top-k must agree
with a numpy brute-force oracle (the role FAISS exactness plays for the
reference, models/nearest_nbr.py:24-55)."""

import numpy as np
import jax.numpy as jnp

from anncur_tpu.ops import mips_topk, mips_topk_sharded, masked_topk
from anncur_tpu.ops.mips import pad_items


def brute_topk(q, items, k):
    scores = q @ items.T
    idx = np.argsort(-scores, axis=1)[:, :k]
    return np.take_along_axis(scores, idx, axis=1), idx


def test_mips_topk_matches_numpy(rng):
    q = rng.standard_normal((16, 32)).astype(np.float32)
    items = rng.standard_normal((200, 32)).astype(np.float32)
    s, i = mips_topk(jnp.asarray(q), jnp.asarray(items), 10)
    ws, wi = brute_topk(q, items, 10)
    np.testing.assert_allclose(np.asarray(s), ws, rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(i), wi)


def test_masked_topk_excludes_invalid(rng):
    scores = rng.standard_normal((4, 20)).astype(np.float32)
    valid = np.ones(20, bool)
    valid[5] = False
    scores[:, 5] = 100.0  # would win top-1 if not masked
    s, i = masked_topk(jnp.asarray(scores), 3, jnp.asarray(valid))
    assert not np.any(np.asarray(i) == 5)


def test_sharded_matches_single(mesh8, rng):
    q = rng.standard_normal((8, 64)).astype(np.float32)
    items = rng.standard_normal((512, 64)).astype(np.float32)
    s1, i1 = mips_topk(jnp.asarray(q), jnp.asarray(items), 7)
    s8, i8 = mips_topk_sharded(jnp.asarray(q), jnp.asarray(items), 7, mesh8)
    np.testing.assert_allclose(np.asarray(s8), np.asarray(s1), rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(i8), np.asarray(i1))


def test_sharded_with_padding(mesh8, rng):
    q = rng.standard_normal((4, 16)).astype(np.float32)
    items = rng.standard_normal((100, 16)).astype(np.float32)  # not divisible by 8
    padded, n_valid = pad_items(jnp.asarray(items), 8)
    assert padded.shape[0] == 104 and n_valid == 100
    s8, i8 = mips_topk_sharded(jnp.asarray(q), padded, 5, mesh8, n_valid=n_valid)
    ws, wi = brute_topk(q, items, 5)
    np.testing.assert_allclose(np.asarray(s8), ws, rtol=1e-4, atol=1e-4)
    assert np.all(np.asarray(i8) < 100)
    np.testing.assert_array_equal(np.asarray(i8), wi)


def test_sharded_fn_is_cached_across_calls(mesh8):
    """Rebuilding the jitted shard_map program per call forces a retrace
    every call; the factory must return the same object for same args."""
    from anncur_tpu.ops.mips import _sharded_fn

    assert _sharded_fn(mesh8, "data", 5, 8, 64) is _sharded_fn(mesh8, "data", 5, 8, 64)
    assert _sharded_fn(mesh8, "data", 5, 8, 64) is not _sharded_fn(mesh8, "data", 5, 8, 63)
