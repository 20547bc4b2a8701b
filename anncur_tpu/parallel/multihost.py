"""Multi-host (DCN) execution: process-spanning meshes, global batches
from process-local data, and the cross-process build protocol.

The reference scales across machines two ways: PL ``strategy="ddp"``
multi-process training (models/pairwise_trainer.py:241-249) and
SLURM-chunked score-matrix jobs recombined from files
(eval/run_cross_encoder_for_ment_ent_matrix_zeshel.py:294,
eval/combine_chunked_computations.py:125-250). The TPU-native
equivalents here:

- training: ONE global mesh over every process's devices
  (``jax.distributed.initialize`` + ``global_mesh``); each process feeds
  its local batch shard (``global_batch_from_local``) and the jit'd
  train step is unchanged — XLA emits the gradient all-reduce over
  ICI within a host and DCN across hosts.
- offline build: processes own contiguous mention ranges and write
  chunk files into a shared directory; process 0 combines
  (``ScoreMatrixBuilder.build_multihost``). Coordination is
  filesystem-first (the reference's own cross-job protocol), which
  doubles as preemption tolerance — a restarted process resumes from
  its existing chunks.

Verified end-to-end by the 2-process CPU integration test
(tests/test_multihost.py): gloo collectives over localhost, one DP
train step and one sharded build, equal to the single-process results.
"""

from __future__ import annotations

import logging
from typing import Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

LOGGER = logging.getLogger(__name__)


def global_mesh(axis_names=("data",), shape=None) -> Mesh:
    """Mesh over ALL processes' devices (call after
    jax.distributed.initialize). Default: 1-D over everything."""
    devs = jax.devices()
    if shape is None:
        shape = (len(devs),) + (1,) * (len(axis_names) - 1)
    return Mesh(np.asarray(devs).reshape(tuple(shape)), tuple(axis_names))


def process_range(n: int, n_proc: Optional[int] = None, pid: Optional[int] = None) -> Tuple[int, int]:
    """Contiguous balanced [start, end) row range owned by this process
    (first ``n % n_proc`` processes get one extra row)."""
    n_proc = jax.process_count() if n_proc is None else n_proc
    pid = jax.process_index() if pid is None else pid
    base, extra = divmod(n, n_proc)
    start = pid * base + min(pid, extra)
    return start, start + base + (1 if pid < extra else 0)


def global_batch_from_local(
    mesh: Mesh, tree: Dict[str, np.ndarray], spec: P
) -> Dict[str, jax.Array]:
    """Assemble global jax.Arrays from each process's LOCAL portion
    (concatenated along the sharded dims by jax)."""
    sharding = NamedSharding(mesh, spec)
    return {
        k: jax.make_array_from_process_local_data(sharding, np.asarray(v))
        for k, v in tree.items()
    }


def replicate_from_host(mesh: Mesh, tree):
    """Replicate identical host values onto every device of a (possibly
    multi-process) mesh. All processes must pass the same values.

    Typed PRNG keys (jax.random.key — e.g. the default rbg train rng)
    cannot pass through np.asarray; detour via key_data/wrap_key_data.
    """
    sharding = NamedSharding(mesh, P())

    def _replicate(x):
        if hasattr(x, "dtype") and jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key):
            impl = str(jax.random.key_impl(x))
            data = jax.make_array_from_process_local_data(
                sharding, np.asarray(jax.random.key_data(x))
            )
            return jax.random.wrap_key_data(data, impl=impl)
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree_util.tree_map(_replicate, tree)


def barrier(name: str) -> None:
    """Cross-process sync point (no-op single-process)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)
