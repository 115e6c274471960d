from gelslim_depth_tpu.train.ema import EmaState, ema_init, ema_update
from gelslim_depth_tpu.train.checkpoint import (
    save_weights,
    load_checkpoint,
    save_train_state,
    load_train_state,
    save_quantized,
    load_quantized,
)
from gelslim_depth_tpu.train.steps import (
    TrainState,
    create_train_state,
    make_optimizer,
    make_train_step,
    make_eval_step,
    mse_loss,
)

__all__ = [
    "save_weights",
    "load_checkpoint",
    "save_train_state",
    "load_train_state",
    "save_quantized",
    "load_quantized",
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

from gelslim_depth_tpu.train.loop import Trainer  # noqa: E402  (after submodules)

__all__.append("Trainer")
