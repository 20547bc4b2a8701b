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
