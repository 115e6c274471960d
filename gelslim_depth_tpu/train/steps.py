"""Pure jitted train/eval steps (the reference's inner loops, functionalized).

Reference behavior matched (ref train_utils/train_unet.py):
- loss: MSE over the batch (:51-52), with a NaN-loss guard that zeroes a
  bad batch's contribution (:370-372). Here a NaN loss skips the entire
  parameter/optimizer/EMA update for that batch (lax.cond) and reports 0 —
  strictly safer than the reference, whose guard would desync the graph.
- optimizer: Adam(lr=1e-3, weight_decay=1e-6) with torch semantics — the
  L2 term is added to the gradient *before* the moment estimates
  (optax.add_decayed_weights placed before scale_by_adam), unlike AdamW
  (:306).
- EMA(0.995) updated after every optimizer step (:309,376); validation,
  test, and checkpoints all use the EMA shadow params (:389,428,480).
- batch-norm running stats update in train mode and are used in eval mode.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from gelslim_depth_tpu.models.unet import UNetConfig, init_unet, unet_apply
from gelslim_depth_tpu.train.ema import EmaState, ema_init, ema_update


def mse_loss(pred: jnp.ndarray, target: jnp.ndarray, valid_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """MSE over all elements; with a per-sample valid_mask (bool, (N,)),
    padded samples are excluded (used by the trainers' static-shape padded
    tail batches). The masked form is sum-based — sum(sq * w) over ONE
    denominator (valid count x per-sample elements) — so the padded batch's
    forward value AND gradient scaling are element-for-element identical to
    the unpadded ragged batch's (tests/test_train_steps.py::
    test_padded_vs_ragged_exact), rather than equal only in exact
    arithmetic."""
    if valid_mask is None:
        return jnp.mean(jnp.square(pred - target))
    sq = jnp.square(pred - target)
    m = valid_mask.astype(sq.dtype)
    w = m.reshape((-1,) + (1,) * (sq.ndim - 1))
    per_sample_elems = 1
    for d in sq.shape[1:]:
        per_sample_elems *= d
    denom = jnp.maximum(jnp.sum(m), 1.0) * per_sample_elems
    return jnp.sum(sq * w) / denom


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    ema: EmaState
    step: jnp.ndarray


def make_optimizer(learning_rate: float = 1e-3, weight_decay: float = 1e-6) -> optax.GradientTransformation:
    """torch.optim.Adam equivalence: L2 into the gradient, then Adam moments,
    then -lr scaling (NOT decoupled AdamW)."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale(-learning_rate),
    )


def create_train_state(
    key: jax.Array,
    unet_cfg: UNetConfig,
    optimizer: optax.GradientTransformation,
    *,
    ema_decay: float = 0.995,
    reinit_std: Optional[float] = 0.01,
    params=None,
    batch_stats=None,
) -> TrainState:
    """Fresh state with the reference's N(0, 0.01) weight re-init
    (train_unet.py:246-250), or wrap provided (fine-tune) weights.

    The whole construction runs under one jit: eagerly it is ~200 tiny
    device programs, each paying a full round trip on tunneled runtimes."""

    def build(key, params, batch_stats):
        if params is None:
            k_init, k_reinit = jax.random.split(key)
            params, batch_stats = init_unet(k_init, unet_cfg)
            if reinit_std is not None:
                from gelslim_depth_tpu.models.unet import reinit_weights_normal

                params = reinit_weights_normal(params, k_reinit, std=reinit_std)
        return TrainState(
            params=params,
            batch_stats=batch_stats,
            opt_state=optimizer.init(params),
            ema=ema_init(params, decay=ema_decay),
            step=jnp.zeros((), jnp.int32),
        )

    if params is not None and batch_stats is not None:
        return jax.jit(lambda p, s: build(None, p, s))(params, batch_stats)
    return jax.jit(lambda k: build(k, None, None))(key)


def make_train_step(
    unet_cfg: UNetConfig,
    optimizer: optax.GradientTransformation,
    *,
    compute_dtype=jnp.float32,
    channels_last: bool = False,
    masked: bool = False,
    remat: bool = False,
) -> Callable[..., Tuple[TrainState, jnp.ndarray]]:
    """Returns step(state, images, targets[, valid_mask]) -> (state, loss).
    Pure; jit (or shard over a mesh) at the call site. With masked=True the
    step takes a per-sample bool mask: padded static-shape batches
    contribute no loss AND no batch-norm statistics (mask-weighted BN in
    unet_apply), so a padded batch's update equals the ragged batch's.
    remat=True rematerializes each DoubleConv in the backward pass for
    larger batches (jax.checkpoint)."""

    def loss_fn(params, batch_stats, images, targets, valid_mask):
        pred, new_stats = unet_apply(
            unet_cfg, params, batch_stats, images,
            train=True, compute_dtype=compute_dtype, channels_last=channels_last,
            remat=remat, sample_mask=valid_mask,
        )
        return mse_loss(pred, targets, valid_mask), new_stats

    def step(state: TrainState, images: jnp.ndarray, targets: jnp.ndarray, valid_mask=None):
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, images, targets,
            valid_mask if masked else None,
        )
        bad = jnp.logical_not(jnp.isfinite(loss))

        # NaN guard as a per-leaf select rather than lax.cond: same
        # semantics (a non-finite loss leaves params/moments/EMA/stats
        # untouched and reports 0), but the update math stays in the main
        # dataflow where XLA schedules/fuses it freely — measured ~8%
        # faster per step on v5e than the cond formulation, whose branch
        # boundary fenced the whole optimizer.
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        def pick(new, old):
            return jax.tree_util.tree_map(lambda n, o: jnp.where(bad, o, n), new, old)

        new_state = TrainState(
            params=pick(params, state.params),
            batch_stats=pick(new_stats, state.batch_stats),
            opt_state=pick(opt_state, state.opt_state),
            ema=pick(ema_update(state.ema, params), state.ema),
            step=state.step + 1,
        )
        return new_state, jnp.where(bad, 0.0, loss)

    return step


def make_train_epoch_fn(
    unet_cfg: UNetConfig,
    optimizer: optax.GradientTransformation,
    *,
    compute_dtype=jnp.float32,
    channels_last: bool = False,
    remat: bool = False,
    mesh=None,
    axis_name: str = "data",
):
    """A WHOLE training epoch as one jitted program.

    epoch(state, images, depths, perm, masks) -> (state, mean_loss) where
    images/depths are the full baked split, perm is (n_batches, batch) int32
    sample indices and masks the matching validity mask. The per-batch
    gather + train step runs under lax.scan, so an epoch is ONE dispatch —
    on runtimes with high per-call overhead (tunneled TPU terminals) this
    is the difference between seconds and hours per epoch, and on healthy
    runtimes it still removes per-step host round trips. The math is
    batch-for-batch identical to looping make_train_step.

    With mesh given, each gathered batch is sharding-constrained over the
    mesh's data axis inside the scan body, so the whole epoch runs
    data-parallel (XLA inserts the gradient all-reduce per step)."""
    step = make_train_step(
        unet_cfg, optimizer, compute_dtype=compute_dtype, channels_last=channels_last,
        masked=True, remat=remat,
    )

    def _constrain(x, spec_nd):
        if mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P(axis_name, *([None] * (spec_nd - 1))))
        )

    def epoch(state: TrainState, images, depths, perm, masks):
        def body(st, xs):
            idx, m = xs
            img = _constrain(jnp.take(images, idx, axis=0), 4)
            dep = _constrain(jnp.take(depths, idx, axis=0), 4)
            st, loss = step(st, img, dep, _constrain(m, 1))
            return st, loss

        state, losses = jax.lax.scan(body, state, (perm, masks))
        return state, jnp.mean(losses)

    return epoch


def make_train_epoch_from_batches_fn(
    unet_cfg: UNetConfig,
    optimizer: optax.GradientTransformation,
    *,
    compute_dtype=jnp.float32,
    channels_last: bool = False,
    remat: bool = False,
    mesh=None,
    axis_name: str = "data",
):
    """A whole training epoch scanned over PRE-GATHERED batch buffers:
    epoch(state, images, depths, masks) -> (state, mean_loss) with
    images/depths shaped (n_batches, batch, ...) and masks (n_batches,
    batch).

    This is the multi-host scan-epoch program: when the dataset is sharded
    per host, the in-scan gather of make_train_epoch_fn is impossible
    (no process holds the whole dataset), so each process instead
    pre-gathers its local rows of every batch host-side and contributes
    them to one globally-sharded (n_batches, global_batch, ...) buffer
    (jax.make_array_from_process_local_data, sharded on the BATCH axis).
    The scan then consumes one sharded batch per step — the whole epoch is
    one dispatch per process, recovering the dispatch amortization the
    per-step multi-host path forfeits. Memory: the buffer is one shuffled
    copy of the local shard (each sample appears once per epoch), so HBM
    holds shard + buffer, not the global dataset."""
    step = make_train_step(
        unet_cfg, optimizer, compute_dtype=compute_dtype, channels_last=channels_last,
        masked=True, remat=remat,
    )

    def _constrain(x, spec_nd):
        if mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P(axis_name, *([None] * (spec_nd - 1))))
        )

    def epoch(state: TrainState, images, depths, masks):
        def body(st, xs):
            img, dep, m = xs
            st, loss = step(st, _constrain(img, 4), _constrain(dep, 4), _constrain(m, 1))
            return st, loss

        state, losses = jax.lax.scan(body, state, (images, depths, masks))
        return state, jnp.mean(losses)

    return epoch


def make_eval_epoch_from_batches_fn(
    unet_cfg: UNetConfig,
    *,
    use_ema: bool = True,
    compute_dtype=jnp.float32,
    channels_last: bool = False,
    mesh=None,
    axis_name: str = "data",
):
    """Evaluation twin of make_train_epoch_from_batches_fn:
    epoch(state, images, depths, masks) -> mean loss over the buffered
    sharded batches."""
    step = make_eval_step(
        unet_cfg, use_ema=use_ema, compute_dtype=compute_dtype,
        channels_last=channels_last, masked=True,
    )

    def _constrain(x, spec_nd):
        if mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P(axis_name, *([None] * (spec_nd - 1))))
        )

    def epoch(state: TrainState, images, depths, masks):
        def body(_, xs):
            img, dep, m = xs
            return None, step(state, _constrain(img, 4), _constrain(dep, 4), _constrain(m, 1))

        _, losses = jax.lax.scan(body, None, (images, depths, masks))
        return jnp.mean(losses)

    return epoch


def make_eval_epoch_fn(
    unet_cfg: UNetConfig,
    *,
    use_ema: bool = True,
    compute_dtype=jnp.float32,
    channels_last: bool = False,
):
    """A whole evaluation epoch as one jitted program; see
    make_train_epoch_fn. Returns epoch(state, images, depths, perm, masks)
    -> mean loss."""
    step = make_eval_step(
        unet_cfg, use_ema=use_ema, compute_dtype=compute_dtype,
        channels_last=channels_last, masked=True,
    )

    def epoch(state: TrainState, images, depths, perm, masks):
        def body(_, xs):
            idx, m = xs
            return None, step(state, jnp.take(images, idx, axis=0), jnp.take(depths, idx, axis=0), m)

        _, losses = jax.lax.scan(body, None, (perm, masks))
        return jnp.mean(losses)

    return epoch


def make_eval_step(
    unet_cfg: UNetConfig,
    *,
    use_ema: bool = True,
    compute_dtype=jnp.float32,
    channels_last: bool = False,
    masked: bool = False,
) -> Callable[..., jnp.ndarray]:
    """Returns eval(state, images, targets[, valid_mask]) -> loss, run under
    the EMA shadow params by default (the reference validates/tests under
    ema.average_parameters(); train_unet.py:389,428)."""

    def step(state: TrainState, images: jnp.ndarray, targets: jnp.ndarray, valid_mask=None) -> jnp.ndarray:
        params = state.ema.shadow if use_ema else state.params
        pred, _ = unet_apply(
            unet_cfg, params, state.batch_stats, images,
            train=False, compute_dtype=compute_dtype, channels_last=channels_last,
        )
        loss = mse_loss(pred, targets, valid_mask if masked else None)
        return jnp.where(jnp.isfinite(loss), loss, 0.0)

    return step
