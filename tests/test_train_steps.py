"""Training-step parity and data-parallel equivalence tests.

The strongest gate here: 3 full optimizer steps (Adam + L2-into-grad +
EMA ramp + batch-norm stat updates) must track a torch implementation of
the reference training semantics parameter-for-parameter.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gelslim_depth_tpu.models import UNetConfig
from gelslim_depth_tpu.models.torch_import import (
    import_torch_state_dict,
    export_torch_state_dict,
)
from gelslim_depth_tpu.train import (
    create_train_state,
    ema_init,
    ema_update,
    make_eval_step,
    make_optimizer,
    make_train_step,
)
from gelslim_depth_tpu.train.steps import TrainState
from tests.torch_fixture import make_state_dict, torch_train_steps

DIMS = (8, 16)
CFG = UNetConfig(layer_dimensions=DIMS)


def make_batches(rng, n, bs=4, hw=(16, 24)):
    return [
        (
            rng.uniform(0, 1, (bs, 3, *hw)).astype(np.float32),
            rng.uniform(-0.9, 0, (bs, 1, *hw)).astype(np.float32),
        )
        for _ in range(n)
    ]


def test_three_step_training_parity_vs_torch(rng):
    sd = make_state_dict(rng, DIMS)
    batches = make_batches(rng, 5)
    t_losses, t_params, t_shadow = torch_train_steps(sd, batches, DIMS, n_steps=5)

    params, stats = import_torch_state_dict(sd, CFG)
    opt = make_optimizer(1e-3, 1e-6)
    state = TrainState(
        params=params,
        batch_stats=stats,
        opt_state=opt.init(params),
        ema=ema_init(params, 0.995),
        step=jnp.zeros((), jnp.int32),
    )
    step = jax.jit(make_train_step(CFG, opt))
    j_losses = []
    for x, y in batches:
        state, loss = step(state, jnp.asarray(x), jnp.asarray(y))
        j_losses.append(float(loss))
    np.testing.assert_allclose(j_losses, t_losses, rtol=1e-4, atol=1e-6)

    got_sd = export_torch_state_dict(state.params, state.batch_stats, CFG)
    for k in t_params:
        np.testing.assert_allclose(
            got_sd[k], t_params[k], rtol=5e-3, atol=2e-3, err_msg=f"param {k} diverged"
        )
    got_ema = export_torch_state_dict(state.ema.shadow, state.batch_stats, CFG)
    for k in t_shadow:
        np.testing.assert_allclose(
            got_ema[k], t_shadow[k], rtol=5e-3, atol=2e-3, err_msg=f"ema {k} diverged"
        )


def test_nan_batch_skips_update(rng):
    sd = make_state_dict(rng, DIMS)
    params, stats = import_torch_state_dict(sd, CFG)
    opt = make_optimizer()
    state = TrainState(params, stats, opt.init(params), ema_init(params), jnp.zeros((), jnp.int32))
    step = jax.jit(make_train_step(CFG, opt))
    x = np.full((2, 3, 16, 24), np.nan, np.float32)
    y = np.zeros((2, 1, 16, 24), np.float32)
    new_state, loss = step(state, jnp.asarray(x), jnp.asarray(y))
    assert float(loss) == 0.0
    np.testing.assert_array_equal(
        np.asarray(new_state.params["inc"]["conv1_w"]), np.asarray(params["inc"]["conv1_w"])
    )
    assert int(new_state.step) == 1


def test_padded_vs_ragged_exact(rng):
    """Mask-weighted batch norm: a tail batch padded to the static batch
    size (repeating sample 0, mask False) must produce the SAME update as
    the unpadded ragged batch. Losses and batch-norm statistics are
    asserted at tolerance 0 — padding is mathematically invisible there
    (masked rows contribute exact zeros to elementwise reductions and
    every denominator is the identical valid count). Parameters are
    asserted at ULP tolerance: the batch axis is a CONTRACTING dimension
    of the conv-gradient dot-generals, and XLA's reduction tree for a
    (5, ...) contraction differs from a (3, ...) one, so the extra exact
    zeros still reassociate those sums — a shape-dependent summation-order
    artifact bounded by ~2 ULP, not a masking error."""
    sd = make_state_dict(rng, DIMS)
    params, stats = import_torch_state_dict(sd, CFG)
    opt = make_optimizer()

    def fresh():
        return TrainState(params, stats, opt.init(params), ema_init(params), jnp.zeros((), jnp.int32))

    # 3 "epoch" batches of 5/5/3 samples at batch size 5
    x = rng.uniform(0, 1, (13, 3, 16, 24)).astype(np.float32)
    y = rng.uniform(-0.9, 0, (13, 1, 16, 24)).astype(np.float32)
    step = make_train_step(CFG, opt, masked=True)

    def run_epoch(pad):
        st, losses = fresh(), []
        for lo in (0, 5, 10):
            xb, yb = x[lo:lo + 5], y[lo:lo + 5]
            n = xb.shape[0]
            if pad and n < 5:  # repeat sample 0, like BatchIterator.padded_epoch
                xb = np.concatenate([xb, np.repeat(xb[:1], 5 - n, axis=0)])
                yb = np.concatenate([yb, np.repeat(yb[:1], 5 - n, axis=0)])
            mask = np.zeros((xb.shape[0],), bool)
            mask[:n] = True
            st, l = jax.jit(step)(st, jnp.asarray(xb), jnp.asarray(yb), jnp.asarray(mask))
            losses.append(float(l))
        return st, losses

    r_state, r_losses = run_epoch(pad=False)
    m_state, m_losses = run_epoch(pad=True)

    np.testing.assert_array_equal(m_losses, r_losses)
    # forward-pass state (BN running stats): bit-equal
    for r_leaf, m_leaf in zip(
        jax.tree_util.tree_leaves(r_state.batch_stats),
        jax.tree_util.tree_leaves(m_state.batch_stats),
    ):
        np.testing.assert_array_equal(np.asarray(r_leaf), np.asarray(m_leaf))
    # gradient-derived state (params, Adam moments, EMA): ULP-level only,
    # per the conv-gradient contraction argument in the docstring
    for r_leaf, m_leaf in zip(
        jax.tree_util.tree_leaves(r_state), jax.tree_util.tree_leaves(m_state)
    ):
        np.testing.assert_allclose(
            np.asarray(r_leaf, np.float64), np.asarray(m_leaf, np.float64),
            rtol=1e-5, atol=5e-8,
        )

    # and vs the UNMASKED step the mask-weighted full-batch math agrees to
    # float reassociation noise (different but equivalent reduction forms)
    plain = jax.jit(make_train_step(CFG, opt))
    p_state, p_losses = fresh(), []
    for lo in (0, 5, 10):
        p_state, l = plain(p_state, jnp.asarray(x[lo:lo + 5]), jnp.asarray(y[lo:lo + 5]))
        p_losses.append(float(l))
    np.testing.assert_allclose(m_losses, p_losses, rtol=1e-5, atol=1e-7)


def test_eval_step_uses_ema_params(rng):
    sd = make_state_dict(rng, DIMS)
    params, stats = import_torch_state_dict(sd, CFG)
    zeroed = jax.tree_util.tree_map(jnp.zeros_like, params)
    state = TrainState(zeroed, stats, None, ema_init(params), jnp.zeros((), jnp.int32))
    x, y = make_batches(rng, 1)[0]
    ema_loss = float(make_eval_step(CFG, use_ema=True)(state, jnp.asarray(x), jnp.asarray(y)))
    raw_loss = float(make_eval_step(CFG, use_ema=False)(state, jnp.asarray(x), jnp.asarray(y)))
    assert ema_loss != raw_loss  # shadow params differ from (zeroed) live params


def test_ema_ramp():
    p = {"w": jnp.ones(3)}
    st = ema_init(p, decay=0.995)
    st = ema_update(st, {"w": jnp.zeros(3)})
    # first update: d = min(0.995, 2/11); shadow = 1 - (1-d)*1 = d
    np.testing.assert_allclose(np.asarray(st.shadow["w"]), 2.0 / 11.0, rtol=1e-6)
    assert int(st.num_updates) == 1


def test_create_train_state_reinit():
    opt = make_optimizer()
    st = create_train_state(jax.random.PRNGKey(0), CFG, opt)
    w = np.asarray(st.params["inc"]["conv1_w"]).ravel()
    assert abs(w.std() - 0.01) < 0.005
    # EMA starts as a copy of params
    np.testing.assert_array_equal(
        np.asarray(st.ema.shadow["inc"]["conv1_w"]), np.asarray(st.params["inc"]["conv1_w"])
    )


class TestDataParallel:
    def test_dp_matches_single_device(self):
        from gelslim_depth_tpu.parallel import make_mesh, make_dp_train_step, replicate, shard_batch

        # own rng (NOT the shared session fixture): the comparison below is
        # tolerance-tuned, and Adam amplifies reduction-reassociation noise
        # data-dependently — the test data must not shift with suite order
        rng = np.random.RandomState(42)
        assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
        sd = make_state_dict(rng, DIMS)
        params, stats = import_torch_state_dict(sd, CFG)
        opt = make_optimizer()

        def fresh_state():
            return TrainState(params, stats, opt.init(params), ema_init(params), jnp.zeros((), jnp.int32))

        batches = make_batches(rng, 2, bs=8)

        single = jax.jit(make_train_step(CFG, opt))
        s_state = fresh_state()
        s_losses = []
        for x, y in batches:
            s_state, l = single(s_state, jnp.asarray(x), jnp.asarray(y))
            s_losses.append(float(l))

        mesh = make_mesh(8)
        dp = make_dp_train_step(CFG, opt, mesh, donate=False)
        d_state = replicate(mesh, fresh_state())
        d_losses = []
        for x, y in batches:
            xs = shard_batch(mesh, jnp.asarray(x))
            ys = shard_batch(mesh, jnp.asarray(y))
            d_state, l = dp(d_state, xs, ys)
            d_losses.append(float(l))

        # cross-device reductions reassociate f32 sums, so DP loss is
        # close-but-not-bit-equal to single-device (divergence compounds
        # slightly through the BN/grad chain across steps)
        np.testing.assert_allclose(d_losses, s_losses, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(d_state.params["inc"]["conv1_w"]),
            np.asarray(s_state.params["inc"]["conv1_w"]),
            rtol=1e-3, atol=1e-5,
        )
        # global batch norm: running stats must match single-device exactly
        np.testing.assert_allclose(
            np.asarray(d_state.batch_stats["inc"]["bn1_mean"]),
            np.asarray(s_state.batch_stats["inc"]["bn1_mean"]),
            rtol=1e-3, atol=1e-5,
        )

    def test_dp_predict(self, rng):
        from gelslim_depth_tpu.parallel import make_mesh, make_dp_predict, replicate, shard_batch
        from gelslim_depth_tpu.models.unet import unet_apply

        sd = make_state_dict(rng, DIMS)
        params, stats = import_torch_state_dict(sd, CFG)
        mesh = make_mesh(8)
        predict = make_dp_predict(CFG, mesh)
        x = rng.uniform(0, 1, (16, 3, 16, 24)).astype(np.float32)
        got = predict(replicate(mesh, params), replicate(mesh, stats), shard_batch(mesh, jnp.asarray(x)))
        want, _ = unet_apply(CFG, params, stats, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_bf16_train_step_runs_and_learns(rng):
    """bfloat16 compute must be differentiable end-to-end (conv gradient
    rules reject mixed-dtype operands, so the bf16 path keeps conv outputs
    in bf16 and accumulates batch-norm statistics in f32)."""
    sd = make_state_dict(rng, DIMS)
    params, stats = import_torch_state_dict(sd, CFG)
    opt = make_optimizer()
    state = TrainState(params, stats, opt.init(params), ema_init(params), jnp.zeros((), jnp.int32))
    step = jax.jit(make_train_step(CFG, opt, compute_dtype=jnp.bfloat16))
    losses = []
    for x, y in make_batches(rng, 4):
        state, loss = step(state, jnp.asarray(x), jnp.asarray(y))
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # moves downhill
    # params stay f32 even under bf16 compute
    assert state.params["inc"]["conv1_w"].dtype == jnp.float32


def test_remat_train_step_matches_standard(rng):
    """jax.checkpoint rematerialization must not change the math."""
    sd = make_state_dict(rng, DIMS)
    params, stats = import_torch_state_dict(sd, CFG)
    opt = make_optimizer()

    def run(remat):
        state = TrainState(params, stats, opt.init(params), ema_init(params), jnp.zeros((), jnp.int32))
        step = jax.jit(make_train_step(CFG, opt, remat=remat))
        losses = []
        for x, y in make_batches(rng_local, 2):
            state, loss = step(state, jnp.asarray(x), jnp.asarray(y))
            losses.append(float(loss))
        return losses, state

    rng_local = np.random.RandomState(5)
    l0, s0 = run(False)
    rng_local = np.random.RandomState(5)
    l1, s1 = run(True)
    np.testing.assert_allclose(l0, l1, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(s0.params["inc"]["conv1_w"]), np.asarray(s1.params["inc"]["conv1_w"]),
        rtol=1e-6, atol=1e-7,
    )


class TestMultiHost:
    def test_process_local_indices_single_process(self):
        from gelslim_depth_tpu.parallel import process_local_indices

        # one real process: the local slice is everything
        np.testing.assert_array_equal(process_local_indices(10), np.arange(10))

    def test_global_batch_from_local(self, rng):
        from gelslim_depth_tpu.parallel import make_mesh, global_batch_from_local

        mesh = make_mesh(8)
        x = rng.randn(16, 3, 4, 5).astype(np.float32)
        arr = global_batch_from_local(mesh, x)
        assert arr.shape == (16, 3, 4, 5)
        np.testing.assert_array_equal(np.asarray(arr), x)
        # sharded over the data axis
        assert len(arr.sharding.device_set) == 8


def test_dp_scan_epoch_matches_single(rng):
    """A whole DP epoch in one scan (sharding-constrained batches) matches
    the single-device scan epoch."""
    from gelslim_depth_tpu.parallel import make_mesh, replicate
    from gelslim_depth_tpu.train.steps import make_train_epoch_fn

    sd = make_state_dict(rng, DIMS)
    params, stats = import_torch_state_dict(sd, CFG)
    opt = make_optimizer()

    images = jnp.asarray(rng.uniform(0, 1, (24, 3, 16, 24)).astype(np.float32))
    depths = jnp.asarray(rng.uniform(-0.9, 0, (24, 1, 16, 24)).astype(np.float32))
    perm = jnp.asarray(np.arange(24).reshape(3, 8), jnp.int32)
    masks = jnp.ones((3, 8), bool)

    def fresh():
        return TrainState(params, stats, opt.init(params), ema_init(params), jnp.zeros((), jnp.int32))

    single = jax.jit(make_train_epoch_fn(CFG, opt))
    s_state, s_loss = single(fresh(), images, depths, perm, masks)

    mesh = make_mesh(8)
    dp = jax.jit(make_train_epoch_fn(CFG, opt, mesh=mesh))
    d_state, d_loss = dp(replicate(mesh, fresh()), replicate(mesh, images),
                         replicate(mesh, depths), replicate(mesh, perm), replicate(mesh, masks))
    np.testing.assert_allclose(float(d_loss), float(s_loss), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(d_state.params["inc"]["conv1_w"]), np.asarray(s_state.params["inc"]["conv1_w"]),
        rtol=1e-3, atol=2e-4,  # cross-device reduction order through 3 Adam steps
    )


def test_make_mesh_refuses_undersized_mesh():
    """make_mesh must raise rather than silently build a smaller mesh when
    fewer devices exist than requested (round-1 gate failure mode: an
    '8-device' dryrun quietly running on 1 chip)."""
    import pytest

    from gelslim_depth_tpu.parallel import make_mesh

    with pytest.raises(RuntimeError, match="requested 9 devices"):
        make_mesh(9)  # conftest pins an 8-virtual-device CPU backend


def test_driver_serving_gate_on_non_dividing_device_count():
    """__graft_entry__._dryrun_serving must pass at device counts that do
    NOT divide its nominal 80-px gate height (here 3): the spatial gates
    height-shard concrete arrays, and device_put requires the sharded axis
    to divide evenly, so the gate rounds its height up to a multiple of
    the device count. Locks the driver gate against e.g. 32-chip slices
    (80 % 32 != 0) where every serving path genuinely works."""
    import importlib.util
    import os

    from gelslim_depth_tpu.parallel import make_mesh

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "__graft_entry__.py",
    )
    spec = importlib.util.spec_from_file_location("graft_entry_for_test", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod._dryrun_serving(3, make_mesh(3))  # raises on any inequality
