"""Int8 MIPS: quantization round trip + retrieval quality vs exact."""

import numpy as np

import jax.numpy as jnp

from anncur_tpu.core.metrics import topk_overlap_frac
from anncur_tpu.ops.mips import mips_topk
from anncur_tpu.ops.quantized import QuantizedItems, mips_topk_int8, quantize_items


def test_quantize_roundtrip(rng):
    items = rng.standard_normal((50, 32)).astype(np.float32)
    q = quantize_items(jnp.asarray(items))
    deq = np.asarray(q.values, np.float32) * np.asarray(q.scales)
    rel = np.abs(deq - items).max() / np.abs(items).max()
    assert rel < 0.01  # int8 per-row error bound
    assert np.asarray(q.values).dtype == np.int8


def test_int8_topk_high_overlap(rng):
    queries = rng.standard_normal((16, 64)).astype(np.float32)
    items = rng.standard_normal((2000, 64)).astype(np.float32)
    _, exact_idx = mips_topk(jnp.asarray(queries), jnp.asarray(items), 20)
    q = quantize_items(jnp.asarray(items))
    s, idx = mips_topk_int8(jnp.asarray(queries), q, 20, chunk=512)
    overlap = float(np.asarray(topk_overlap_frac(idx, exact_idx)).mean())
    assert overlap > 0.95, overlap
    # top-1 is essentially always preserved
    top1 = float(np.mean(np.asarray(idx[:, 0]) == np.asarray(exact_idx[:, 0])))
    assert top1 >= 0.9


def test_int8_padding_masked(rng):
    queries = rng.standard_normal((4, 16)).astype(np.float32)
    items = rng.standard_normal((100, 16)).astype(np.float32)
    q = quantize_items(jnp.asarray(items))
    s, idx = mips_topk_int8(jnp.asarray(queries), q, 10, chunk=64)
    assert np.all(np.asarray(idx) < 100)


def test_dense_index_quantized(rng):
    from anncur_tpu.ops.dense_index import DenseIndex

    items = rng.standard_normal((500, 32)).astype(np.float32)
    q = rng.standard_normal((4, 32)).astype(np.float32)
    idx_q = DenseIndex(items, quantize=True)
    idx_f = DenseIndex(items)
    s1, i1 = idx_f.search(q, 10)
    s2, i2 = idx_q.search(q, 10)
    overlap = float(np.asarray(topk_overlap_frac(jnp.asarray(i2), jnp.asarray(i1))).mean())
    assert overlap > 0.9


def test_dense_index_add_updates_quantized_store():
    """add() on a quantized index must re-quantize: searches previously
    missed appended items silently."""
    import numpy as np

    from anncur_tpu.ops.dense_index import DenseIndex

    rng = np.random.default_rng(0)
    base = rng.standard_normal((64, 32)).astype(np.float32)
    idx = DenseIndex(base, quantize=True)
    # a new item that dominates every query direction
    strong = np.ones((1, 32), np.float32) * 10.0
    idx.add(strong)
    q = np.ones((3, 32), np.float32)
    s, i = idx.search(q, k=1)
    assert (i == 64).all(), i
