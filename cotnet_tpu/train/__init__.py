from cotnet_tpu.train.loss import (
    create_loss_fn,
    cross_entropy,
    jsd_cross_entropy,
    label_smoothing_cross_entropy,
    soft_target_cross_entropy,
)
from cotnet_tpu.train.optim import (
    adamp,
    create_optimizer,
    sgdp,
    sync_lookahead,
    wd_mask,
)
from cotnet_tpu.train.schedule import (
    PlateauController,
    cosine_schedule,
    create_scheduler,
    multistep_schedule,
    step_schedule,
    tanh_schedule,
)
from cotnet_tpu.train.state import TrainState, ema_update
from cotnet_tpu.train.step import make_eval_step, make_train_step

__all__ = [k for k in dir() if not k.startswith("_")]
