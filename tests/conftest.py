"""Test config: force an 8-virtual-device CPU platform BEFORE jax imports.

This is the TPU-world analogue of a fake distributed backend (the reference
has none — SURVEY §4): all sharding/collective paths run on 8 host devices
so multi-chip code is exercised in CI without TPU hardware.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
os.environ.setdefault("ANNCUR_ALLOW_CPU", "1")  # CLIs' accelerator guard

# the one shared implementation of the force-CPU recipe (CLAUDE.md):
# replaces any preexisting device-count flag instead of keeping a stale
# value that would silently shrink the mesh
from anncur_tpu.utils.platform import force_cpu_devices  # noqa: E402

force_cpu_devices(8)

import jax  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from anncur_tpu.parallel import make_mesh

    return make_mesh((8,), ("data",))


@pytest.fixture()
def rng():
    return np.random.default_rng(0)


def make_low_rank(rng, n, m, rank, noise=0.0):
    """Synthetic score matrix of known rank (CUR is exact when
    rank(anchor intersection) == rank(A) — the core correctness oracle)."""
    a = rng.standard_normal((n, rank)).astype(np.float32)
    b = rng.standard_normal((rank, m)).astype(np.float32)
    mat = a @ b
    if noise:
        mat = mat + noise * rng.standard_normal((n, m)).astype(np.float32)
    return mat


@pytest.fixture()
def low_rank_factory(rng):
    def _make(n=64, m=96, rank=8, noise=0.0):
        return make_low_rank(rng, n, m, rank, noise)

    return _make
