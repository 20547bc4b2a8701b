from anncur_tpu.indexer.score_matrix import (  # noqa: F401
    ScoreMatrixBuilder,
    build_pairs,
    save_score_matrix,
    load_score_matrix,
)
from anncur_tpu.indexer.combine import combine_chunks  # noqa: F401
