"""Device mesh + sharding helpers.

The reference scales with PyTorch-Lightning DP/DDP over NCCL
(models/pairwise_trainer.py:241-249); here parallelism is SPMD over a
``jax.sharding.Mesh``: batch dims are sharded along the ``data`` axis,
gradients are all-reduced by XLA over ICI automatically under jit, and
multi-host runs extend the same mesh over DCN via
``jax.distributed.initialize`` (no user-visible backend).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Sequence[int],
    axis_names: Sequence[str] = ("data",),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n_needed = int(np.prod(shape))
    if n_needed > len(devices):
        raise ValueError(f"mesh shape {tuple(shape)} needs {n_needed} devices, have {len(devices)}")
    arr = np.asarray(devices[:n_needed]).reshape(tuple(shape))
    return Mesh(arr, tuple(axis_names))


def default_mesh(axis_name: str = "data") -> Mesh:
    """1-D mesh over all local devices."""
    return make_mesh((len(jax.devices()),), (axis_name,))


def shard_batch(tree, mesh: Mesh, axis: str = "data"):
    """Place a pytree of host arrays with leading batch dim sharded on axis."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.device_put(tree, sharding)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def require_accelerator(tracker=None, allow_cpu_env: str = "ANNCUR_ALLOW_CPU"):
    """Hard-fail (with a tracker alert) when no accelerator is present.

    Parity with the reference's GPU-absence guard + wandb alert
    (run_cross_encoder_w_binenc_retriever_zeshel.py:82-84). Set
    ANNCUR_ALLOW_CPU=1 to bypass (tests, smoke runs).
    """
    import os

    platform = jax.devices()[0].platform
    if platform == "cpu" and not os.environ.get(allow_cpu_env):
        msg = (
            "No TPU/accelerator available (platform=cpu). "
            f"Set {allow_cpu_env}=1 to run on CPU anyway."
        )
        if tracker is not None:
            tracker.alert(msg)
        raise RuntimeError(msg)
    return platform


# Multi-host initialization lives in parallel/multihost.py (the real,
# tested DCN path: jax.distributed.initialize + global_mesh). Dead
# wrappers that duplicated it here were removed — one entry point only.
