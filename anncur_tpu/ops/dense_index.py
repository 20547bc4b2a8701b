"""Dense MIPS index API — drop-in replacement for the reference's FAISS
usage (models/nearest_nbr.py:24-80).

The reference picks IndexFlatIP (exact) for <=11k vectors and IVF-Flat
(approximate, nlist=floor(sqrt(n)), nprobe=floor(sqrt(nlist))*mult)
above. On TPU exact search saturates the MXU at every ZeShEL scale, so
the IVF approximation is unnecessary: ``DenseIndex`` is always exact,
with three execution strategies (brute / streaming / mesh-sharded)
chosen by item count and available devices. ``force_exact_search`` is
accepted for API parity and is a no-op.
"""

from __future__ import annotations

import logging
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from anncur_tpu.ops.mips import mips_topk, mips_topk_sharded, pad_items
from anncur_tpu.ops.mips_pallas import mips_topk_streaming
from anncur_tpu.parallel.mesh import Mesh

LOGGER = logging.getLogger(__name__)

# score-matrix bytes above which the streaming kernel takes over.
# Measured at military scale (round 4, v5e, benchmarks/
# military_scale.json): a 5.46 GB materialize beats streaming 3x when it
# FITS HBM, so the cut is by q*n*4 bytes, not item count — 6 GB leaves
# ~10 GB for inputs/workspace on a 16 GB chip.
_MATERIALIZE_BYTES = 6e9


class DenseIndex:
    """Exact inner-product search over item embeddings.

    API parity with the reference FAISS wrapper
    (build_flat_or_ivff_index -> index.search(q, k),
    models/nearest_nbr.py:24-55).
    """

    def __init__(
        self,
        embeds: np.ndarray,
        mesh: Optional[Mesh] = None,
        quantize: bool = False,
    ):
        """``quantize=True`` stores items as int8 with per-item scales
        (ops/quantized.py): ~4x less HBM traffic on the retrieval scan at
        <0.5% score error — pair with exact reranking for free accuracy."""
        self.mesh = mesh
        self._quantize = bool(quantize)
        if quantize and mesh is not None and mesh.devices.size > 1:
            # the int8 kernel is single-device; don't pretend otherwise
            LOGGER.warning(
                "quantize=True: int8 search runs single-device; the "
                "%d-device mesh is ignored for search", mesh.devices.size
            )
        self._host_embeds = np.asarray(embeds, np.float32)
        self._rebuild_device_state()

    def _rebuild_device_state(self) -> None:
        """ONE device-resident copy of the corpus, matching the strategy
        search() will actually use (int8 store, padded mesh shards, or
        the plain f32 array) — a second full replica doubled HBM."""
        self.n, self.dim = self._host_embeds.shape
        self.embeds = None
        self.quantized = None
        self._padded, self._n_valid = None, self.n
        if self._quantize:
            from anncur_tpu.ops.quantized import quantize_items

            self.quantized = quantize_items(jnp.asarray(self._host_embeds))
        elif self.mesh is not None and self.mesh.devices.size > 1:
            self._padded, self._n_valid = pad_items(
                jnp.asarray(self._host_embeds), self.mesh.devices.size
            )
        else:
            self.embeds = jnp.asarray(self._host_embeds)

    def add(self, embeds: np.ndarray) -> None:
        """Append items (FAISS .add parity). Rebuilds device placement
        and, for a quantized index, re-quantizes so searches see the new
        items (scales are per-item, so this is a cheap rebuild)."""
        self._host_embeds = np.concatenate(
            [self._host_embeds, np.asarray(embeds, np.float32)]
        )
        self._rebuild_device_state()

    def search(self, queries: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
        """(scores (q, k), indices (q, k)) — exact top-k by inner product."""
        queries = jnp.asarray(queries, jnp.float32)
        k = min(k, self.n)
        if self.quantized is not None:
            from anncur_tpu.ops.quantized import mips_topk_int8

            s, i = mips_topk_int8(queries, self.quantized, k)
            return np.asarray(s), np.asarray(i)
        if self.mesh is not None and self.mesh.devices.size > 1:
            s, i = mips_topk_sharded(
                queries, self._padded, k, self.mesh, n_valid=self._n_valid
            )
        elif queries.shape[0] * self.n * 4 > _MATERIALIZE_BYTES:
            s, i = mips_topk_streaming(queries, self.embeds, k)
        else:
            s, i = mips_topk(queries, self.embeds, k)
        return np.asarray(s), np.asarray(i)


def build_flat_or_ivff_index(
    embeds: np.ndarray,
    force_exact_search: bool = False,
    approx_search_mult: int = 0,
    mesh: Optional[Mesh] = None,
) -> DenseIndex:
    """Name/signature parity with the reference builder
    (models/nearest_nbr.py:24-55); always exact on TPU (see module doc)."""
    if not force_exact_search and embeds.shape[0] > 11000:
        LOGGER.info(
            "reference would build IVF here (n=%d); TPU exact search used instead",
            embeds.shape[0],
        )
    return DenseIndex(embeds, mesh=mesh)
