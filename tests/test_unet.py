"""U-Net parity and behavior tests.

Parity gate: per-pixel agreement with an independently-built torch
implementation of the reference architecture, through the torch-state-dict
importer (the same path the published unet_bigdata.pth would take).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gelslim_depth_tpu.models import UNetConfig, init_unet, unet_apply, UNet
from gelslim_depth_tpu.models.torch_import import (
    import_torch_state_dict,
    export_torch_state_dict,
)
from tests.torch_fixture import make_state_dict, torch_unet_forward

DIMS = (8, 16, 32)
CFG = UNetConfig(n_channels=3, n_classes=1, layer_dimensions=DIMS)


def test_eval_parity_with_torch(rng):
    """Eval-mode forward matches torch bit-nearly on awkward (non-pow2) sizes,
    including the shipped 160x213-style odd W that forces decoder padding."""
    sd = make_state_dict(rng, DIMS)
    params, stats = import_torch_state_dict(sd, CFG)
    x = rng.uniform(0, 1, (2, 3, 40, 53)).astype(np.float32)
    want = torch_unet_forward(sd, x, DIMS)
    got, _ = unet_apply(CFG, params, stats, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_train_mode_parity_and_stat_updates(rng):
    sd = make_state_dict(rng, DIMS)
    params, stats = import_torch_state_dict(sd, CFG)
    x = rng.uniform(0, 1, (4, 3, 32, 48)).astype(np.float32)
    sd_mut = dict(sd)
    want = torch_unet_forward(sd_mut, x, DIMS, train=True)
    got, new_stats = unet_apply(CFG, params, stats, jnp.asarray(x), train=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)
    # running stats must match torch's momentum-0.1/unbiased-var update
    np.testing.assert_allclose(
        np.asarray(new_stats["inc"]["bn1_mean"]),
        sd_mut["inc.double_conv.1.running_mean"],
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(new_stats["down_0"]["bn2_var"]),
        sd_mut["down.0.maxpool_conv.1.double_conv.4.running_var"],
        rtol=1e-4, atol=1e-5,
    )
    # eval mode must leave stats untouched
    _, same_stats = unet_apply(CFG, params, stats, jnp.asarray(x), train=False)
    assert same_stats is stats


def test_full_size_shapes():
    """The shipped config: 3->1, dims (64..1024)/shrunk here, input 160x213;
    output must be same spatial size (decoder pads odd skips)."""
    # must be a doubling sequence: the Up block concatenates skip (dims[i-1])
    # with the in//2-channel upconv output and feeds a DoubleConv expecting
    # dims[i] channels, so dims[i-1] == dims[i]//2 is an architecture
    # invariant (holds for the shipped [64,128,256,512,1024])
    cfg = UNetConfig(layer_dimensions=(4, 8, 16, 32, 64))
    params, stats = init_unet(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((1, 3, 160, 213), jnp.float32)
    y, _ = unet_apply(cfg, params, stats, x)
    assert y.shape == (1, 1, 160, 213)


def test_bf16_compute_close_to_f32(rng):
    sd = make_state_dict(rng, DIMS)
    params, stats = import_torch_state_dict(sd, CFG)
    x = rng.uniform(0, 1, (2, 3, 32, 48)).astype(np.float32)
    y32, _ = unet_apply(CFG, params, stats, jnp.asarray(x))
    y16, _ = unet_apply(CFG, params, stats, jnp.asarray(x), compute_dtype=jnp.bfloat16)
    assert y16.dtype == jnp.float32
    err = np.abs(np.asarray(y16) - np.asarray(y32))
    scale = np.abs(np.asarray(y32)).max() + 1e-6
    assert err.max() / scale < 0.05, f"bf16 rel err too large: {err.max() / scale}"


def test_channels_last_equivalence(rng):
    sd = make_state_dict(rng, DIMS)
    params, stats = import_torch_state_dict(sd, CFG)
    x = rng.uniform(0, 1, (2, 3, 24, 33)).astype(np.float32)
    y1, _ = unet_apply(CFG, params, stats, jnp.asarray(x))
    y2, _ = unet_apply(
        CFG, params, stats, jnp.transpose(jnp.asarray(x), (0, 2, 3, 1)), channels_last=True
    )
    np.testing.assert_allclose(np.asarray(y1), np.transpose(np.asarray(y2), (0, 3, 1, 2)), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("act", ["relu", "tanh", "mish"])
def test_activations_run(act, rng):
    cfg = UNetConfig(layer_dimensions=(4, 8), activation=act)
    params, stats = init_unet(jax.random.PRNGKey(1), cfg)
    x = jnp.asarray(rng.uniform(0, 1, (1, 3, 16, 20)).astype(np.float32))
    y, _ = unet_apply(cfg, params, stats, x)
    assert np.isfinite(np.asarray(y)).all()


def test_state_dict_roundtrip(rng):
    sd = make_state_dict(rng, DIMS)
    params, stats = import_torch_state_dict(sd, CFG)
    back = export_torch_state_dict(params, stats, CFG)
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_allclose(back[k], sd[k], rtol=1e-6, atol=1e-7)


def test_reinit_weights_normal():
    from gelslim_depth_tpu.models.unet import reinit_weights_normal

    cfg = UNetConfig(layer_dimensions=(16, 32))
    params, _ = init_unet(jax.random.PRNGKey(0), cfg)
    newp = reinit_weights_normal(params, jax.random.PRNGKey(7), std=0.01)
    w = np.asarray(newp["inc"]["conv1_w"]).ravel()
    assert abs(w.std() - 0.01) < 0.003  # N(0, 0.01) on kernels
    s = np.asarray(newp["inc"]["bn1_scale"])
    assert abs(float(np.std(s)) - 0.01) < 0.01 and abs(float(np.mean(s))) < 0.02
    # biases untouched
    np.testing.assert_array_equal(
        np.asarray(newp["up_0"]["upconv_b"]), np.asarray(params["up_0"]["upconv_b"])
    )


def test_oo_wrapper_matches_reference_signature():
    net = UNet(n_channels=3, n_classes=1, layer_dimensions=[4, 8], kernel_size=3, maxpool_size=2, upconv_stride=2)
    params, stats = net.init(jax.random.PRNGKey(0))
    y, _ = net.apply(params, stats, jnp.zeros((1, 3, 16, 21)))
    assert y.shape == (1, 1, 16, 21)
