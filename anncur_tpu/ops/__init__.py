from anncur_tpu.ops.pinv import pinv, pinv_f64  # noqa: F401
from anncur_tpu.ops.mips import (  # noqa: F401
    mips_topk,
    mips_topk_sharded,
    masked_topk,
)
