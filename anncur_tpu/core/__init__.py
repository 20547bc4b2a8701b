from anncur_tpu.core.cur import CurIndex, build_cur  # noqa: F401
from anncur_tpu.core.metrics import (  # noqa: F401
    frobenius_error,
    overlap_metrics,
    reciprocal_ranks,
    score_topk_preds,
    topk_overlap_frac,
)
