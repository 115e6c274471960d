"""Parity tests against the REFERENCE CODE ITSELF (not a transcription).

Every other parity test in this suite compares against
tests/torch_fixture.py — an independently re-derived torch implementation.
A transcription error there hides a real parity break (this is how the
round-1 decoder kernel_size bug slipped through: the reference's Up block
never forwards kernel_size to its DoubleConv, ref
gelslim_depth/models/unet.py:37, while both the repo and the fixture did).
These tests sys.path-import /root/reference and use its actual modules as
the oracle:

- gelslim_depth.models.unet.UNet            (eval + train mode, k=3 and k=5)
- gelslim_depth.processing_utils.normalization_utils  (all 4+4 methods,
  normalize + denormalize, 3-D and 4-D inputs, short-param broadcast)
- gelslim_depth.processing_utils.image_utils (diff image, area resize at the
  shipped non-integer 320x427<->160x213 sizes)
- full reference training semantics (real UNet module + torch Adam + the
  torch_ema update rule) vs this repo's jitted train step.

The reference's image_utils imports torchvision at module scope; only its
gaussian_blur actually needs it, so a stub module is injected when
torchvision is absent — blur parity stays covered by the transcribed
golden test in test_ops.py (torchvision is not installed here).
"""

import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

REFERENCE_ROOT = "/root/reference"
if REFERENCE_ROOT not in sys.path:
    sys.path.append(REFERENCE_ROOT)

try:  # image_utils does `import torchvision.transforms.functional as TF`
    import torchvision  # noqa: F401
except ImportError:
    tv = types.ModuleType("torchvision")
    tv_t = types.ModuleType("torchvision.transforms")
    tv_f = types.ModuleType("torchvision.transforms.functional")

    def _no_blur(*a, **k):  # pragma: no cover - oracle for blur unavailable
        raise NotImplementedError("torchvision not installed; blur oracle unavailable")

    tv_f.gaussian_blur = _no_blur
    tv.transforms = tv_t
    tv_t.functional = tv_f
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tv_t
    sys.modules["torchvision.transforms.functional"] = tv_f

from gelslim_depth.models.unet import UNet as RefUNet  # noqa: E402
from gelslim_depth.processing_utils import image_utils as ref_iu  # noqa: E402
from gelslim_depth.processing_utils import normalization_utils as ref_nu  # noqa: E402

from gelslim_depth_tpu import ops  # noqa: E402
from gelslim_depth_tpu.models import UNetConfig, init_unet, unet_apply  # noqa: E402
from gelslim_depth_tpu.models.torch_import import (  # noqa: E402
    export_torch_state_dict,
    import_torch_state_dict,
)

DIMS = [8, 16, 32]


def _seeded_ref_unet(k=3, dims=DIMS):
    torch.manual_seed(0)
    net = RefUNet(3, 1, layer_dimensions=list(dims), kernel_size=k)
    # keep values in a well-conditioned range for tight tolerances
    with torch.no_grad():
        for name, p in net.named_parameters():
            if "weight" in name and p.dim() == 4:
                p.mul_(0.2)
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    return net


@pytest.mark.parametrize("k", [3, 5])
def test_unet_eval_parity_vs_reference(rng, k):
    """Forward the reference's own nn.Module and this repo's apply on the
    same imported weights. k=5 exercises the decoder-is-always-3x3 quirk."""
    net = _seeded_ref_unet(k)
    sd = {key: v.detach().numpy().copy() for key, v in net.state_dict().items()
          if "num_batches_tracked" not in key}
    cfg = UNetConfig(layer_dimensions=tuple(DIMS), kernel_size=k)
    params, stats = import_torch_state_dict(sd, cfg)

    x = rng.uniform(0, 1, (2, 3, 40, 53)).astype(np.float32)
    net.eval()
    with torch.no_grad():
        want = net(torch.from_numpy(x)).numpy()
    got, _ = unet_apply(cfg, params, stats, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("k", [3, 5])
def test_init_export_loads_into_reference_module(rng, k):
    """init_unet's parameter shapes must exactly match the reference module
    tree — load_state_dict(strict=True) is the oracle. Fails for k != 3 if
    decoder DoubleConvs wrongly inherit kernel_size (round-1 bug)."""
    cfg = UNetConfig(layer_dimensions=tuple(DIMS), kernel_size=k)
    params, stats = init_unet(jax.random.PRNGKey(0), cfg)
    sd = export_torch_state_dict(params, stats, cfg)
    net = RefUNet(3, 1, layer_dimensions=list(DIMS), kernel_size=k)
    missing, unexpected = net.load_state_dict(
        {key: torch.from_numpy(np.array(v)) for key, v in sd.items()}, strict=False
    )
    assert not unexpected, f"keys the reference module does not have: {unexpected}"
    assert all("num_batches_tracked" in m for m in missing), f"missing: {missing}"
    # and the loaded module agrees with our forward
    x = rng.uniform(0, 1, (1, 3, 32, 48)).astype(np.float32)
    net.eval()
    with torch.no_grad():
        want = net(torch.from_numpy(x)).numpy()
    got, _ = unet_apply(cfg, params, stats, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_unet_train_mode_parity_vs_reference(rng):
    """Train-mode forward (batch statistics) + running-stat updates match
    the reference module exactly (momentum 0.1, unbiased running var)."""
    net = _seeded_ref_unet(3)
    sd = {key: v.detach().numpy().copy() for key, v in net.state_dict().items()
          if "num_batches_tracked" not in key}
    cfg = UNetConfig(layer_dimensions=tuple(DIMS))
    params, stats = import_torch_state_dict(sd, cfg)

    x = rng.uniform(0, 1, (4, 3, 32, 48)).astype(np.float32)
    net.train()
    with torch.no_grad():
        want = net(torch.from_numpy(x)).numpy()
    got, new_stats = unet_apply(cfg, params, stats, jnp.asarray(x), train=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)

    ref_sd = net.state_dict()
    got_sd = export_torch_state_dict(params, new_stats, cfg)
    for key in ref_sd:
        if "running_" in key:
            np.testing.assert_allclose(
                got_sd[key], ref_sd[key].numpy(), rtol=1e-4, atol=1e-5,
                err_msg=f"running stat {key} diverged",
            )


def test_training_parity_vs_reference_module(rng):
    """Three optimizer steps with the REFERENCE UNet module + torch Adam
    (lr 1e-3, weight_decay 1e-6) + the torch_ema update rule
    (decay min(0.995, (1+n)/(10+n)), applied after optimizer.step, ref
    train_unet.py:306-309,374-376) track this repo's jitted train step."""
    from gelslim_depth_tpu.train import ema_init, make_optimizer, make_train_step
    from gelslim_depth_tpu.train.steps import TrainState

    dims = (8, 16)
    net = _seeded_ref_unet(3, dims)
    sd = {key: v.detach().numpy().copy() for key, v in net.state_dict().items()
          if "num_batches_tracked" not in key}
    cfg = UNetConfig(layer_dimensions=dims)
    params, stats = import_torch_state_dict(sd, cfg)

    batches = [
        (
            rng.uniform(0, 1, (4, 3, 16, 24)).astype(np.float32),
            rng.uniform(-0.9, 0, (4, 1, 16, 24)).astype(np.float32),
        )
        for _ in range(3)
    ]

    opt_t = torch.optim.Adam(net.parameters(), lr=1e-3, weight_decay=1e-6)
    shadow = {key: p.detach().clone() for key, p in net.named_parameters()}
    net.train()
    t_losses, n_updates = [], 0
    for x, y in batches:
        pred = net(torch.from_numpy(x))
        loss = ((pred - torch.from_numpy(y)) ** 2).mean()
        opt_t.zero_grad()
        loss.backward()
        opt_t.step()
        n_updates += 1
        d = min(0.995, (1 + n_updates) / (10 + n_updates))
        with torch.no_grad():
            for key, p in net.named_parameters():
                shadow[key] -= (1 - d) * (shadow[key] - p)
        t_losses.append(loss.item())

    opt = make_optimizer(1e-3, 1e-6)
    state = TrainState(
        params=params,
        batch_stats=stats,
        opt_state=opt.init(params),
        ema=ema_init(params, 0.995),
        step=jnp.zeros((), jnp.int32),
    )
    step = jax.jit(make_train_step(cfg, opt))
    j_losses = []
    for x, y in batches:
        state, loss = step(state, jnp.asarray(x), jnp.asarray(y))
        j_losses.append(float(loss))
    np.testing.assert_allclose(j_losses, t_losses, rtol=1e-4, atol=1e-6)

    ref_params = {key: p.detach().numpy() for key, p in net.named_parameters()}
    got_sd = export_torch_state_dict(state.params, state.batch_stats, cfg)
    for key in ref_params:
        np.testing.assert_allclose(
            got_sd[key], ref_params[key], rtol=5e-3, atol=2e-3,
            err_msg=f"param {key} diverged from reference training",
        )
    got_ema = export_torch_state_dict(state.ema.shadow, state.batch_stats, cfg)
    for key in shadow:
        np.testing.assert_allclose(
            got_ema[key], shadow[key].numpy(), rtol=5e-3, atol=2e-3,
            err_msg=f"EMA {key} diverged from reference training",
        )


# ---------------------------------------------------------------------------
# processing_utils oracles
# ---------------------------------------------------------------------------

IMG_PARAMS = ([1.0, 2.0, 3.0], [250.0, 240.0, 230.0], [100.0, 110.0, 120.0], [30.0, 31.0, 32.0])
SHORT_PARAMS = ([5.0], [250.0], [120.0], [33.0])  # exercises min(i, len-1)
DEPTH_PARAMS = (-1.9180814027786255, 0.0, -0.25, 0.42)

# 'min_max_to_-1_1' is intentionally absent: the reference's own code for
# that image method CRASHES (latent bug discovered by this oracle, see
# test_reference_image_min_max_method_is_broken) — intended-formula coverage
# for it lives in test_ops.py::test_image_normalization_roundtrip.
IMAGE_METHODS = ["mean_std", "0_255_to_-1_1", "0_255_to_0_1"]
DEPTH_METHODS = ["min_max_to_-1_1", "mean_std", "min_max_to_0_1", "min_max_to_0_-1"]


def test_reference_image_min_max_method_is_broken():
    """Documents a latent reference bug: normalize_tactile_image's
    'min_max_to_-1_1' branch evaluates `0.5*(tensor).tolist()` — float times
    list — and raises TypeError (ref normalization_utils.py:9). The shipped
    recipe only ever uses '0_255_to_0_1' so the branch never runs in
    production. This repo implements the evidently-intended per-channel
    formula instead (tested in test_ops.py); if a reference release ever
    fixes the branch, this test will fail and the method should be added to
    IMAGE_METHODS above."""
    x = torch.rand(2, 3, 8, 8) * 255
    with pytest.raises(TypeError):
        ref_nu.normalize_tactile_image(x, "min_max_to_-1_1", 0.9, IMG_PARAMS)
    with pytest.raises(TypeError):
        ref_nu.denormalize_tactile_image(x, "min_max_to_-1_1", 0.9, IMG_PARAMS)


@pytest.mark.parametrize("method", IMAGE_METHODS)
@pytest.mark.parametrize("batched", [True, False])
@pytest.mark.parametrize("params", [IMG_PARAMS, SHORT_PARAMS])
def test_image_normalization_vs_reference(rng, method, batched, params):
    shape = (4, 3, 10, 12) if batched else (3, 10, 12)
    x = rng.uniform(0, 255, shape).astype(np.float32)
    want = ref_nu.normalize_tactile_image(torch.from_numpy(x), method, 0.9, params).numpy()
    got = np.asarray(ops.normalize_tactile_image(jnp.asarray(x), method, 0.9, params))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    back_want = ref_nu.denormalize_tactile_image(torch.from_numpy(want), method, 0.9, params).numpy()
    back_got = np.asarray(ops.denormalize_tactile_image(jnp.asarray(got), method, 0.9, params))
    np.testing.assert_allclose(back_got, back_want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("method", DEPTH_METHODS)
@pytest.mark.parametrize("batched", [True, False])
def test_depth_normalization_vs_reference(rng, method, batched):
    shape = (4, 1, 10, 12) if batched else (1, 10, 12)
    x = rng.uniform(-1.9, 0, shape).astype(np.float32)
    want = ref_nu.normalize_depth_image(torch.from_numpy(x), method, 0.9, DEPTH_PARAMS).numpy()
    got = np.asarray(ops.normalize_depth_image(jnp.asarray(x), method, 0.9, DEPTH_PARAMS))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    back_want = ref_nu.denormalize_depth_image(torch.from_numpy(want), method, 0.9, DEPTH_PARAMS).numpy()
    back_got = np.asarray(ops.denormalize_depth_image(jnp.asarray(got), method, 0.9, DEPTH_PARAMS))
    np.testing.assert_allclose(back_got, back_want, rtol=1e-4, atol=1e-5)


def test_difference_image_vs_reference(rng):
    img = rng.uniform(0, 255, (2, 6, 16, 20)).astype(np.float32)
    base = rng.uniform(0, 255, (2, 6, 16, 20)).astype(np.float32)
    want = ref_iu.get_difference_image(torch.from_numpy(img), torch.from_numpy(base)).numpy()
    got = np.asarray(ops.get_difference_image(jnp.asarray(img), jnp.asarray(base)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5)


@pytest.mark.parametrize(
    "in_size,out_size",
    [((320, 427), (160, 213)), ((160, 213), (320, 427)), ((17, 23), (11, 9))],
)
def test_area_resize_vs_reference(rng, in_size, out_size):
    """The shipped non-integer downsample AND the inference upsample-back
    through the reference's own sample_multi_channel_image_to_desired_size."""
    x = rng.uniform(0, 255, (2, 3) + in_size).astype(np.float32)
    want = ref_iu.sample_multi_channel_image_to_desired_size(
        torch.from_numpy(x), out_size
    ).numpy()
    got = np.asarray(ops.sample_multi_channel_image_to_desired_size(jnp.asarray(x), out_size))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_fixture_matches_reference_module(rng):
    """Guards the guard: tests/torch_fixture.py (used by the wider suite)
    must itself agree with the actual reference module — a seeded
    transcription error in the fixture now fails CI here."""
    from tests.torch_fixture import make_state_dict, torch_unet_forward

    for k in (3, 5):
        sd = make_state_dict(rng, tuple(DIMS), k=k)
        net = RefUNet(3, 1, layer_dimensions=list(DIMS), kernel_size=k)
        net.load_state_dict(
            {key: torch.from_numpy(np.array(v)) for key, v in sd.items()}, strict=False
        )
        net.eval()
        x = rng.uniform(0, 1, (2, 3, 32, 48)).astype(np.float32)
        with torch.no_grad():
            want = net(torch.from_numpy(x)).numpy()
        got = torch_unet_forward(dict(sd), x, tuple(DIMS))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5, err_msg=f"k={k}")
