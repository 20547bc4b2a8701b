"""Fused matmul + running-top-k MIPS kernels.

For large item sets the naive path materializes the (n_queries, n_items)
score matrix in HBM before ``lax.top_k`` — at ZeShEL-military scale
(13k x 104k f32 = 5.4 GB) that wastes HBM bandwidth, the usual TPU
bottleneck. Two implementations that stream item tiles and keep only a
(q, k) running top-k on chip:

- :func:`mips_topk_streaming` — pure-XLA ``lax.scan`` over item chunks
  (portable: CPU/TPU, any backend; merge = concat + top_k per chunk).
- :func:`mips_topk_pallas` — Pallas kernel: item tiles are pipelined
  HBM->VMEM by the Pallas grid machinery, scores come off the MXU into a
  VMEM scratch accumulator, merged per tile; only the final (q, k)
  leaves the chip.

Both are tested for exact index equality against the brute-force oracle.

Mosaic note (measured on v5e, jax 0.9): ``lax.top_k`` / ``lax.sort`` have
no Pallas-TPU lowering, so the in-kernel merge of :func:`mips_topk_pallas`
only runs in interpret mode / future Mosaic versions. On TPU hardware the
streaming fused path is :func:`mips_topk_streaming` — per-chunk matmul
and top-k fuse inside one XLA while-loop body with identical memory
behavior. :func:`fused_mips_topk` dispatches accordingly.

Military-scale measurement (round 4, v5e, benchmarks/military_scale.json):
at the FULL reference scale (13,063 queries x 104,520 items, d=768) the
naive materialize-then-top_k program runs in 0.385 s vs 1.145 s for the
best streaming chunk (8192) — the 5.46 GB score matrix FITS the 16 GB
HBM and one giant fused matmul+top_k beats a 13-step scan. Streaming
only pays when the matrix does NOT fit (bigger q*n, more of the chip
held by serving state, or smaller-HBM parts). :func:`fused_mips_topk`
therefore dispatches by SIZE: brute materialize when the score matrix
fits a conservative budget, streaming above it. Caveat recorded with the
same measurement: one materialize attempt at this shape wedged the
remote worker for 42+ min (nondeterministic; the committed number is
from a clean run), so offline tools that can't tolerate a wedge should
call mips_topk_streaming explicitly.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF_F32 = -3.0e38  # python float: pallas kernels cannot capture traced constants


def fused_mips_topk(
    queries, items, k, chunk: int = 4096, materialize_bytes: float = 6e9
):
    """Exact MIPS for large item sets, dispatched by score-matrix size
    (military-scale measurement in the module docstring): when the
    (q, n) f32 matrix fits ``materialize_bytes`` (default 6 GB — room
    for the measured-fastest 5.46 GB case with headroom on a 16 GB
    chip), one fused matmul+top_k program is 3x faster than streaming;
    above it, the streaming scan keeps live memory at O(q*k + chunk*d).
    Pass ``materialize_bytes=0`` to force streaming (e.g. when serving
    state already holds much of HBM)."""
    q, n = queries.shape[0], items.shape[0]
    if q * n * 4 <= materialize_bytes:
        from anncur_tpu.ops.mips import mips_topk

        return mips_topk(queries, items, k)
    return mips_topk_streaming(queries, items, k, chunk=chunk)


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def mips_topk_streaming(
    queries: jax.Array,  # (q, d)
    items: jax.Array,  # (n, d); pad so n % chunk == 0 for best layout
    k: int,
    chunk: int = 4096,
) -> Tuple[jax.Array, jax.Array]:
    """Streaming exact MIPS: O(q*k + chunk*d) live memory."""
    q, d = queries.shape
    n = items.shape[0]
    chunk = min(chunk, n)
    n_pad = n + ((-n) % chunk)
    if n_pad != n:
        items = jnp.concatenate(
            [items, jnp.zeros((n_pad - n, d), items.dtype)], axis=0
        )
    n_chunks = n_pad // chunk
    items = items.reshape(n_chunks, chunk, d)

    init_scores = jnp.full((q, k), NEG_INF_F32, jnp.float32)
    init_idx = jnp.zeros((q, k), jnp.int32)

    def body(carry, inp):
        run_s, run_i = carry
        tile, c = inp
        scores = jnp.dot(
            queries, tile.T, preferred_element_type=jnp.float32, precision="highest"
        )  # (q, chunk)
        col = c * chunk + lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col < n, scores, NEG_INF_F32)
        comb_s = jnp.concatenate([run_s, scores], axis=1)
        comb_i = jnp.concatenate([run_i, col], axis=1)
        new_s, pos = lax.top_k(comb_s, k)
        new_i = jnp.take_along_axis(comb_i, pos, axis=1)
        return (new_s, new_i), None

    (scores, idx), _ = lax.scan(
        body, (init_scores, init_idx), (items, jnp.arange(n_chunks))
    )
    return scores, idx


def _mips_kernel(q_ref, item_ref, out_s_ref, out_i_ref, acc_s, acc_i, *, k, tile, n_valid):
    """Pallas kernel body: one grid step = one item tile.

    acc_s/acc_i: VMEM scratch (q, k) running top-k, persists across grid
    steps (TPU grid is sequential on a core).
    """
    t = pl.program_id(0)
    n_tiles = pl.num_programs(0)

    @pl.when(t == 0)
    def _():
        acc_s[:] = jnp.full_like(acc_s, NEG_INF_F32)
        acc_i[:] = jnp.zeros_like(acc_i)

    scores = jnp.dot(
        q_ref[:], item_ref[:].T, preferred_element_type=jnp.float32,
        precision="highest",  # score-path matmul rule (CLAUDE.md)
    )  # (q, tile)
    col = t * tile + lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    scores = jnp.where(col < n_valid, scores, NEG_INF_F32)

    comb_s = jnp.concatenate([acc_s[:], scores], axis=1)  # (q, k + tile)
    comb_i = jnp.concatenate([acc_i[:], col], axis=1)
    new_s, pos = lax.top_k(comb_s, k)
    acc_s[:] = new_s
    acc_i[:] = jnp.take_along_axis(comb_i, pos, axis=1)

    @pl.when(t == n_tiles - 1)
    def _():
        out_s_ref[:] = acc_s[:]
        out_i_ref[:] = acc_i[:]


def _maxmask_kernel(q_ref, item_ref, out_s_ref, out_i_ref, acc_s, acc_i, *, k, tile, n_valid):
    """Pallas kernel with IN-KERNEL k-selection that lowers on Mosaic
    (VERDICT r3 item 7): iterative max-and-mask instead of lax.top_k
    (which has no Pallas-TPU lowering, jax 0.9). Each of the k unrolled
    iterations takes the global max over (running acc, this tile's
    scores), records (value, item id), and masks exactly that entry —
    only max/min reductions, `where`, and iota, all of which Mosaic
    lowers. Ties break to the smallest item id (the min-reduction over
    matching ids), matching no particular order of lax.top_k but
    deterministic. Cost: k VPU passes over (qt, tile) per tile — pays
    for small k; the k<=16 regime VERDICT asked to try.

    2-D grid (query tiles x item tiles, round 4): the first cut held the
    WHOLE query block + its (q, tile) intermediates in VMEM and the
    remote Mosaic compile failed (HTTP 500 from tpu_compile_helper) at
    q=1024 — the k-unrolled loop keeps several (q, tile) where-masks
    live at once. Tiling q bounds the working set at (qt, tile)
    regardless of total queries."""
    t = pl.program_id(1)
    n_tiles = pl.num_programs(1)

    @pl.when(t == 0)
    def _():
        acc_s[:] = jnp.full_like(acc_s, NEG_INF_F32)
        acc_i[:] = jnp.zeros_like(acc_i)

    scores = jnp.dot(
        q_ref[:], item_ref[:].T, preferred_element_type=jnp.float32,
        precision="highest",
    )  # (qt, tile)
    col = t * tile + lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    scores = jnp.where(col < n_valid, scores, NEG_INF_F32)

    run_s = acc_s[:]  # (qt, k) value copies; refs are rewritten below
    run_i = acc_i[:]
    big = jnp.int32(2**31 - 1)
    for j in range(k):
        m = jnp.maximum(jnp.max(scores, axis=1), jnp.max(run_s, axis=1))  # (qt,)
        id_s = jnp.min(jnp.where(scores == m[:, None], col, big), axis=1)
        id_a = jnp.min(jnp.where(run_s == m[:, None], run_i, big), axis=1)
        idx = jnp.minimum(id_s, id_a)
        acc_s[:, j] = m
        acc_i[:, j] = idx
        scores = jnp.where(
            (scores == m[:, None]) & (col == idx[:, None]), NEG_INF_F32, scores
        )
        run_s = jnp.where(
            (run_s == m[:, None]) & (run_i == idx[:, None]), NEG_INF_F32, run_s
        )

    @pl.when(t == n_tiles - 1)
    def _():
        out_s_ref[:] = acc_s[:]
        out_i_ref[:] = acc_i[:]


def mips_topk_pallas_maxmask(
    queries: jax.Array,  # (q, d)
    items: jax.Array,  # (n, d)
    k: int,
    tile: int = 512,
    q_tile: int = 256,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Fused MIPS whose in-kernel selection RUNS ON REAL MOSAIC (no
    lax.top_k/sort): see _maxmask_kernel. Exact same contract as
    mips_topk_pallas; ties broken toward the smaller item id."""
    q, d = queries.shape
    n = items.shape[0]
    if k > 64:
        raise ValueError(f"max-and-mask selection unrolls k iterations; k={k} > 64")
    tile = min(tile, max(128, 1 << int(np.ceil(np.log2(max(n, 1))))))
    n_pad = n + ((-n) % tile)
    if n_pad != n:
        items = jnp.concatenate(
            [items, jnp.zeros((n_pad - n, d), items.dtype)], axis=0
        )
    n_tiles = n_pad // tile
    q_tile = min(q_tile, q)
    q_pad = q + ((-q) % q_tile)
    if q_pad != q:
        queries = jnp.concatenate(
            [queries, jnp.zeros((q_pad - q, d), queries.dtype)], axis=0
        )
    n_q_tiles = q_pad // q_tile

    kernel = functools.partial(_maxmask_kernel, k=k, tile=tile, n_valid=n)
    out_s, out_i = pl.pallas_call(
        kernel,
        grid=(n_q_tiles, n_tiles),  # row-major: item tiles innermost
        in_specs=[
            pl.BlockSpec((q_tile, d), lambda qi, t: (qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda qi, t: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((q_tile, k), lambda qi, t: (qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((q_tile, k), lambda qi, t: (qi, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((q_pad, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((q_tile, k), jnp.float32),
            pltpu.VMEM((q_tile, k), jnp.int32),
        ],
        interpret=interpret,
    )(queries, items)
    return out_s[:q], out_i[:q]


def mips_topk_pallas(
    queries: jax.Array,  # (q, d)
    items: jax.Array,  # (n, d)
    k: int,
    tile: int = 1024,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Fused Pallas MIPS. Queries stay resident in VMEM; item tiles are
    double-buffered HBM->VMEM by the grid pipeline; the (q, n) score
    matrix never exists."""
    q, d = queries.shape
    n = items.shape[0]
    tile = min(tile, max(128, 1 << int(np.ceil(np.log2(max(n, 1))))))
    n_pad = n + ((-n) % tile)
    if n_pad != n:
        items = jnp.concatenate(
            [items, jnp.zeros((n_pad - n, d), items.dtype)], axis=0
        )
    n_tiles = n_pad // tile

    kernel = functools.partial(_mips_kernel, k=k, tile=tile, n_valid=n)
    out_s, out_i = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((q, d), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda t: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((q, k), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((q, k), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q, k), jnp.float32),
            jax.ShapeDtypeStruct((q, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((q, k), jnp.float32),
            pltpu.VMEM((q, k), jnp.int32),
        ],
        interpret=interpret,
    )(queries, items)
    return out_s, out_i
