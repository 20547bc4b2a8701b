"""anncur-tpu: a TPU-native index-and-query engine for cross-encoder nearest
neighbor search via CUR matrix decomposition.

Re-implements the capabilities of the reference `anncur` research code
(EMNLP 2022, "Efficient Nearest Neighbor Search for Cross-Encoder Models
using Matrix Factorization") as an idiomatic JAX / XLA / Pallas / pjit
framework:

- ``anncur_tpu.core``    : CUR index (jit-able pytree) + ranking metrics.
- ``anncur_tpu.ops``     : fused Pallas matmul+top-k MIPS kernels, pinv.
- ``anncur_tpu.models``  : from-scratch JAX BERT, bi-/cross-encoders,
                           WordPiece tokenizer, HF checkpoint import.
- ``anncur_tpu.parallel``: device-mesh/sharding utilities (pjit/shard_map).
- ``anncur_tpu.indexer`` : mesh-sharded offline score-matrix builds.
- ``anncur_tpu.train``   : data-parallel training runtime (optax).
- ``anncur_tpu.data``    : ZeShEL registry/loaders, TF-IDF, synthetic data.
- ``anncur_tpu.evalx``   : retrieval eval harnesses + aggregation.
"""

__version__ = "0.1.0"

from anncur_tpu.config import Config  # noqa: F401

# Lazy top-level API (PEP 562): `import anncur_tpu` stays light; heavy
# modules load on first attribute access.
_LAZY = {
    "CurIndex": ("anncur_tpu.core.cur", "CurIndex"),
    "build_cur": ("anncur_tpu.core.cur", "build_cur"),
    "CurRetriever": ("anncur_tpu.core.retriever", "CurRetriever"),
    "ScoreMatrixBuilder": ("anncur_tpu.indexer.score_matrix", "ScoreMatrixBuilder"),
    "DenseIndex": ("anncur_tpu.ops.dense_index", "DenseIndex"),
    "BertSpec": ("anncur_tpu.models.bert", "BertSpec"),
    "BiEncoder": ("anncur_tpu.models.biencoder", "BiEncoder"),
    "CrossEncoder": ("anncur_tpu.models.crossencoder", "CrossEncoder"),
    "WordPieceTokenizer": ("anncur_tpu.models.tokenizer", "WordPieceTokenizer"),
    "Trainer": ("anncur_tpu.train.trainer", "Trainer"),
    "default_mesh": ("anncur_tpu.parallel.mesh", "default_mesh"),
    "make_mesh": ("anncur_tpu.parallel.mesh", "make_mesh"),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'anncur_tpu' has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_LAZY))
