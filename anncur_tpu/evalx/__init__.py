from anncur_tpu.evalx.core import (  # noqa: F401
    eval_approx_for_all_topk,
    retrieve_rerank,
)
from anncur_tpu.evalx.transductive import run_transductive_eval  # noqa: F401
from anncur_tpu.evalx.inductive import run_inductive_eval  # noqa: F401
