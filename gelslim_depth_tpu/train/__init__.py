from gelslim_depth_tpu.train.ema import EmaState, ema_init, ema_update
from gelslim_depth_tpu.train.steps import (
    TrainState,
    create_train_state,
    make_optimizer,
    make_train_step,
    make_eval_step,
    mse_loss,
)

__all__ = [
    "EmaState",
    "ema_init",
    "ema_update",
    "TrainState",
    "create_train_state",
    "make_optimizer",
    "make_train_step",
    "make_eval_step",
    "mse_loss",
]
