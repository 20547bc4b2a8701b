"""Checkpointing: pytree save/load + top-k retention by dev metric.

Parity with the reference's two ModelCheckpoint callbacks (top-k by
dev_{loss|mrr} and end-of-epoch 'eoe-{epoch}-last',
models/pairwise_trainer.py:214-237) and its prefix-stripping state-dict
loader (models/biencoder.py:386-409). Format: pickled numpy pytrees +
a JSON manifest (no framework lock-in; orbax-free by design so restore
works anywhere numpy does).
"""

from __future__ import annotations

import json
import logging
import os
import pickle
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

LOGGER = logging.getLogger(__name__)


class _KeyLeaf:
    """Pickle-safe stand-in for a typed PRNG key array (e.g. the rbg
    hardware-RNG keys the trainer uses for dropout): raw key data plus
    the impl name, restored with jax.random.wrap_key_data."""

    def __init__(self, data: np.ndarray, impl: str):
        self.data = data
        self.impl = impl


def _to_host(x):
    if hasattr(x, "dtype") and jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key):
        impl = str(jax.random.key_impl(x))
        return _KeyLeaf(np.asarray(jax.random.key_data(x)), impl)
    return np.asarray(x)


def _from_host(x):
    if isinstance(x, _KeyLeaf):
        return jax.random.wrap_key_data(jnp.asarray(x.data), impl=x.impl)
    return x


def save_pytree(path: str, tree: Any, metadata: Optional[Dict] = None) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    host_tree = jax.tree_util.tree_map(_to_host, tree)
    with open(path, "wb") as fout:
        pickle.dump({"tree": host_tree, "metadata": metadata or {}}, fout)


def load_pytree(path: str) -> Tuple[Any, Dict]:
    with open(path, "rb") as fin:
        data = pickle.load(fin)
    tree = jax.tree_util.tree_map(
        _from_host, data["tree"], is_leaf=lambda x: isinstance(x, _KeyLeaf)
    )
    return tree, data.get("metadata", {})


class TopKCheckpointManager:
    """Keep the best-k checkpoints by a metric (mode 'min' or 'max') plus
    rolling end-of-epoch checkpoints."""

    def __init__(self, ckpt_dir: str, k: int = 2, metric: str = "loss", mode: str = "min"):
        self.ckpt_dir = ckpt_dir
        self.k = k
        self.metric = metric
        self.mode = mode
        self.manifest_path = os.path.join(ckpt_dir, "manifest.json")
        self.entries: List[Dict] = []
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as fin:
                manifest = json.load(fin)
            old_metric = manifest.get("metric", metric)
            if old_metric != metric:
                # resuming with a DIFFERENT ckpt metric: old values would
                # compete numerically against the new metric's values and
                # corrupt top-k retention — start the top-k list fresh
                LOGGER.warning(
                    "manifest metric %r != configured %r; ignoring %d old "
                    "top-k entries", old_metric, metric,
                    len(manifest.get("topk", [])),
                )
            else:
                self.entries = manifest.get("topk", [])

    def _better(self, a: float, b: float) -> bool:
        return a < b if self.mode == "min" else a > b

    def _write_manifest(self) -> None:
        os.makedirs(self.ckpt_dir, exist_ok=True)
        with open(self.manifest_path, "w") as fout:
            json.dump(
                {"topk": self.entries, "metric": self.metric, "mode": self.mode},
                fout,
                indent=2,
            )

    def maybe_save(self, tree: Any, value: float, step: int, epoch: int) -> Optional[str]:
        """Save if the value ranks in the current top-k; evict the worst."""
        name = f"{self.metric}={value:.6f}-step={step}.ckpt"
        path = os.path.join(self.ckpt_dir, name)
        entry = {"path": path, "value": float(value), "step": int(step), "epoch": int(epoch)}
        candidates = self.entries + [entry]
        candidates.sort(key=lambda e: e["value"], reverse=self.mode == "max")
        keep = candidates[: self.k]
        if entry not in keep:
            return None
        save_pytree(path, tree, metadata=entry)
        for old in self.entries:
            if old not in keep and os.path.exists(old["path"]):
                os.remove(old["path"])
        self.entries = keep
        self._write_manifest()
        return path

    def save_end_of_epoch(self, tree: Any, epoch: int, step: int) -> str:
        path = os.path.join(self.ckpt_dir, f"eoe-{epoch}-last.ckpt")
        save_pytree(path, tree, metadata={"epoch": int(epoch), "step": int(step)})
        with open(os.path.join(self.ckpt_dir, "last.json"), "w") as fout:
            json.dump({"path": path, "epoch": int(epoch), "step": int(step)}, fout)
        # rolling: only the newest eoe is reachable through last.json
        # (reference PL end-of-epoch callback keeps save_top_k=1,
        # pairwise_trainer.py:228-237) — prune older ones, which for a
        # bert-base run are ~400MB+ of params+opt_state EACH
        for name in os.listdir(self.ckpt_dir):
            if name.startswith("eoe-") and name != os.path.basename(path):
                try:
                    os.remove(os.path.join(self.ckpt_dir, name))
                except FileNotFoundError:
                    pass
        return path

    def best_path(self) -> Optional[str]:
        return self.entries[0]["path"] if self.entries else None

    def latest_eoe(self) -> Optional[Dict]:
        meta = os.path.join(self.ckpt_dir, "last.json")
        if os.path.exists(meta):
            with open(meta) as fin:
                return json.load(fin)
        return None
