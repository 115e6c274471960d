"""Exponential moving average of parameters as a pure pytree update.

Replicates torch_ema.ExponentialMovingAverage semantics (the reference
updates it after every optimizer step and runs val/test/checkpointing under
the averaged weights; ref train_utils/train_unet.py:309,376,389,480-483):

- decay ramp: with use_num_updates (torch_ema's default), the effective
  decay at update t (0-based count AFTER increment) is
  min(decay, (1 + t) / (10 + t)) — warm starts instead of biasing toward
  the random init.
- update: shadow <- shadow - (1 - d) * (shadow - param), over *trainable*
  params only (batch-norm running stats are not EMA'd; they ride along
  from the live model exactly as in torch_ema, which only tracks
  requires_grad parameters).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class EmaState(NamedTuple):
    shadow: Any           # pytree mirroring params
    num_updates: jnp.ndarray  # int32 scalar, -1 when the ramp is disabled
    decay: float


def ema_init(params, decay: float = 0.995, use_num_updates: bool = True) -> EmaState:
    # real copies, not aliases: params and shadow travel together in a
    # donated TrainState, and aliased buffers break XLA donation
    return EmaState(
        shadow=jax.tree_util.tree_map(lambda p: jnp.asarray(p).copy(), params),
        num_updates=jnp.asarray(0 if use_num_updates else -1, jnp.int32),
        decay=float(decay),
    )


def ema_update(state: EmaState, params) -> EmaState:
    n = jnp.where(state.num_updates >= 0, state.num_updates + 1, -1)
    ramp = (1.0 + n) / (10.0 + n)
    d = jnp.where(n >= 0, jnp.minimum(state.decay, ramp), state.decay)
    one_minus = (1.0 - d).astype(jnp.float32)
    shadow = jax.tree_util.tree_map(
        lambda s, p: s - one_minus * (s - p), state.shadow, params
    )
    return EmaState(shadow=shadow, num_updates=n, decay=state.decay)
