from anncur_tpu.parallel.mesh import (  # noqa: F401
    default_mesh,
    make_mesh,
    replicate,
    shard_batch,
)
