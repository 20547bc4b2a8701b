from anncur_tpu.train.losses import (  # noqa: F401
    bienc_loss_w_negs,
    bienc_loss_in_batch_negs,
    crossenc_loss,
    distill_loss,
)
from anncur_tpu.train.optimizer import make_optimizer  # noqa: F401
from anncur_tpu.train.trainer import Trainer, TrainState  # noqa: F401
