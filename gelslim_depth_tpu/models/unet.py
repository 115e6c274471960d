"""Functional U-Net for tactile depth estimation (TPU-native).

Capability-equivalent to the reference torch model
(ref: gelslim_depth/models/unet.py:7-88) but designed for XLA/TPU:

- Pure init/apply functions over parameter pytrees — no module objects, so
  the whole forward (and train step) jits into one XLA program, EMA is a
  tree_map, and sharding is a NamedSharding over leaves.
- NHWC activations / HWIO weights internally (TPU conv layout); the public
  apply accepts NCHW to preserve the reference's calling convention and
  transposes once at the boundary.
- Mixed precision: `compute_dtype=bfloat16` runs every conv on the MXU in
  bf16 with f32 accumulation (preferred_element_type), keeping params and
  batch-norm statistics in f32. f32 end-to-end remains the parity default.

Reference architecture contract being matched (including its quirks, which
affect numerical parity — see SURVEY.md section 2 #1):
- DoubleConv = (Conv k=kernel_size, padding hard-coded 1, bias=False ->
  BatchNorm -> activation) x2 (ref unet.py:7-20; padding stays 1 even for
  k != 3).
- Down = MaxPool(maxpool_size) + DoubleConv (ref unet.py:22-31).
- Up = ConvTranspose(in -> in//2, k=kernel_size-1, stride=upconv_stride,
  bias=True), pad output to the skip's spatial size (left/top gets diff//2),
  channel-concat [skip, up], DoubleConv (ref unet.py:33-49,75). NOTE: the
  reference's Up does NOT forward kernel_size to its DoubleConv
  (ref unet.py:37: `DoubleConv(in_channels, out_channels)`), so decoder
  convs are ALWAYS 3x3 even when the encoder uses kernel_size != 3.
- OutConv = 1x1 conv with bias (ref unet.py:51-57).
- The reference accepts a `bilinear` flag but never uses it; we drop it.
- The reference hard-wires ReLU despite recording an `activation_func`
  option in its configs (ref unet.py:13 vs train_unet.py:285). Here the
  activation knob is honored ('relu' | 'tanh' | 'mish'), defaulting to relu.

BatchNorm follows torch BatchNorm2d semantics exactly: eps 1e-5, momentum
0.1, training normalizes with biased batch variance while the running var
update uses the unbiased estimate; eval normalizes with running stats.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

Params = Dict[str, Any]
BatchStats = Dict[str, Any]

_EXACT = lax.Precision.HIGHEST

BN_EPS = 1e-5
BN_MOMENTUM = 0.1


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    n_channels: int = 3
    n_classes: int = 1
    layer_dimensions: Tuple[int, ...] = (64, 128, 256, 512, 1024)
    kernel_size: int = 3
    maxpool_size: int = 2
    upconv_stride: int = 2
    activation: str = "relu"

    @property
    def num_levels(self) -> int:
        return len(self.layer_dimensions)


def _activation_fn(name: str):
    if name == "relu":
        return jax.nn.relu
    if name == "tanh":
        return jnp.tanh
    if name == "mish":
        return lambda x: x * jnp.tanh(jax.nn.softplus(x))
    raise ValueError(f"Unknown activation {name!r}; expected relu|tanh|mish")


# ---------------------------------------------------------------------------
# Initialization (torch-compatible distributions)
# ---------------------------------------------------------------------------

def _conv_init(key, kh, kw, cin, cout):
    """torch Conv2d default: kaiming_uniform(a=sqrt(5)) == U(-b, b) with
    b = sqrt(6 / ((1 + 5) * fan_in)) = 1/sqrt(fan_in)."""
    fan_in = cin * kh * kw
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, (kh, kw, cin, cout), jnp.float32, -bound, bound)


def _bias_init(key, fan_in, n):
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, (n,), jnp.float32, -bound, bound)


def _double_conv_init(key, cin, cout, k) -> Tuple[Params, BatchStats]:
    k1, k2 = jax.random.split(key)
    params = {
        "conv1_w": _conv_init(k1, k, k, cin, cout),
        "bn1_scale": jnp.ones((cout,), jnp.float32),
        "bn1_bias": jnp.zeros((cout,), jnp.float32),
        "conv2_w": _conv_init(k2, k, k, cout, cout),
        "bn2_scale": jnp.ones((cout,), jnp.float32),
        "bn2_bias": jnp.zeros((cout,), jnp.float32),
    }
    stats = {
        "bn1_mean": jnp.zeros((cout,), jnp.float32),
        "bn1_var": jnp.ones((cout,), jnp.float32),
        "bn2_mean": jnp.zeros((cout,), jnp.float32),
        "bn2_var": jnp.ones((cout,), jnp.float32),
    }
    return params, stats


def init_unet(key: jax.Array, cfg: UNetConfig) -> Tuple[Params, BatchStats]:
    """Initialize (params, batch_stats) pytrees with torch-default inits."""
    dims = cfg.layer_dimensions
    keys = jax.random.split(key, 2 * len(dims) + 2)
    ki = iter(keys)
    params: Params = {}
    stats: BatchStats = {}
    params["inc"], stats["inc"] = _double_conv_init(next(ki), cfg.n_channels, dims[0], cfg.kernel_size)
    for i in range(len(dims) - 1):
        params[f"down_{i}"], stats[f"down_{i}"] = _double_conv_init(
            next(ki), dims[i], dims[i + 1], cfg.kernel_size
        )
    up_k = cfg.kernel_size - 1
    for j, i in enumerate(range(len(dims) - 1, 0, -1)):
        cin, cout = dims[i], dims[i - 1]
        kw_, kb_, kd_ = jax.random.split(next(ki), 3)
        # decoder DoubleConvs are always k=3: the reference's Up never
        # forwards kernel_size to DoubleConv (ref unet.py:37)
        dc_params, dc_stats = _double_conv_init(kd_, cin, cout, 3)
        params[f"up_{j}"] = {
            # stored in torch layout (in, out, kh, kw) transposed to
            # (kh, kw, out, in) for lax.conv_transpose(transpose_kernel=True)
            "upconv_w": _conv_init(kw_, up_k, up_k, cin, cin // 2).transpose(0, 1, 3, 2),
            "upconv_b": _bias_init(kb_, cin * up_k * up_k, cin // 2),
            **dc_params,
        }
        stats[f"up_{j}"] = dc_stats
    kw_, kb_ = jax.random.split(next(ki))
    params["outc"] = {
        "w": _conv_init(kw_, 1, 1, dims[0], cfg.n_classes),
        "b": _bias_init(kb_, dims[0], cfg.n_classes),
    }
    return params, stats


def reinit_weights_normal(
    params: Params, key: jax.Array, std: float = 0.01
) -> Params:
    """The reference trainer re-initializes every parameter whose torch name
    contains 'weight' — conv + convtranspose kernels AND BatchNorm scales —
    to N(0, 0.01), leaving biases at their defaults
    (ref: train_utils/train_unet.py:246-250)."""
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    keys = jax.random.split(key, len(leaves_with_paths))
    new_leaves = []
    for (path, leaf), k in zip(leaves_with_paths, keys):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        is_weight = name.endswith("_w") or name == "w" or "scale" in name
        if is_weight:
            new_leaves.append(std * jax.random.normal(k, leaf.shape, leaf.dtype))
        else:
            new_leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


# ---------------------------------------------------------------------------
# Forward pass
# ---------------------------------------------------------------------------

def _conv(x, w, padding, compute_dtype, precision):
    # bf16 path: leave the output in bf16 (the MXU still accumulates in f32
    # internally). Forcing preferred_element_type=f32 with bf16 operands
    # breaks the conv transpose (gradient) rule with a dtype mismatch, so
    # the f32 upcast is only requested on the f32 path where it is a no-op.
    preferred = jnp.float32 if compute_dtype == jnp.float32 else None
    return lax.conv_general_dilated(
        x.astype(compute_dtype),
        w.astype(compute_dtype),
        window_strides=(1, 1),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
        preferred_element_type=preferred,
    )


def _batch_norm(x, scale, bias, mean, var, train: bool, sample_weight=None):
    """Returns (y, batch_mean, batch_var_biased) — stats None in eval.
    Statistics always accumulate in f32 (bf16 reductions lose precision).

    sample_weight ((N, 1, 1, 1) f32 of 0/1, train mode only) computes
    MASK-WEIGHTED batch statistics: padded samples contribute nothing to
    the mean/variance, so a padded static-shape batch normalizes its valid
    samples with exactly the statistics the unpadded ragged batch would
    use (train/steps.py masked steps; the padded rows still flow through
    the convs but are excluded here and from the masked loss)."""
    if train:
        xf = x.astype(jnp.float32)
        if sample_weight is None:
            m = jnp.mean(xf, axis=(0, 1, 2))
            v = jnp.mean(jnp.square(xf), axis=(0, 1, 2)) - jnp.square(m)
        else:
            xw = xf * sample_weight
            n = jnp.sum(sample_weight) * (x.shape[1] * x.shape[2])
            m = jnp.sum(xw, axis=(0, 1, 2)) / n
            v = jnp.sum(xf * xw, axis=(0, 1, 2)) / n - jnp.square(m)
        # NB: evaluating this normalization chain in bf16 (folded affine
        # with f32-derived coefficients) was measured at +0.5-1% on v5e —
        # XLA already fuses the f32 arithmetic into the surrounding ops
        # without materializing f32 activations — so the parity-clean f32
        # math stays (docs/PERFORMANCE.md training decomposition)
        y = (xf - m) * lax.rsqrt(v + BN_EPS) * scale + bias
        return y, m, v
    # eval: fold running stats into one affine (XLA fuses with the conv)
    inv = lax.rsqrt(var + BN_EPS) * scale
    return x * inv + (bias - mean * inv), None, None


def _double_conv(x, p, s, *, act_name, train, compute_dtype, precision, sample_weight=None):
    """Pure block: returns (y, stats_updates | None). Side-effect free so it
    can be wrapped in jax.checkpoint for rematerialized training."""
    act = _activation_fn(act_name)
    pad = [(1, 1), (1, 1)]  # reference hard-codes padding=1 (unet.py:11,14)
    y = _conv(x, p["conv1_w"], pad, compute_dtype, precision)
    y, m1, v1 = _batch_norm(y, p["bn1_scale"], p["bn1_bias"], s["bn1_mean"], s["bn1_var"], train, sample_weight)
    y = act(y).astype(compute_dtype)
    y = _conv(y, p["conv2_w"], pad, compute_dtype, precision)
    y, m2, v2 = _batch_norm(y, p["bn2_scale"], p["bn2_bias"], s["bn2_mean"], s["bn2_var"], train, sample_weight)
    y = act(y).astype(compute_dtype)
    if not train:
        return y, None
    if sample_weight is None:
        n = x.shape[0] * x.shape[1] * x.shape[2]
        corr = n / max(n - 1, 1)  # torch updates running var with the unbiased estimate
    else:
        n = jnp.sum(sample_weight) * (x.shape[1] * x.shape[2])
        corr = n / jnp.maximum(n - 1.0, 1.0)
    updates = {
        "bn1_mean": (1 - BN_MOMENTUM) * s["bn1_mean"] + BN_MOMENTUM * m1,
        "bn1_var": (1 - BN_MOMENTUM) * s["bn1_var"] + BN_MOMENTUM * v1 * corr,
        "bn2_mean": (1 - BN_MOMENTUM) * s["bn2_mean"] + BN_MOMENTUM * m2,
        "bn2_var": (1 - BN_MOMENTUM) * s["bn2_var"] + BN_MOMENTUM * v2 * corr,
    }
    return y, updates


def _maxpool(x, m):
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, m, m, 1), (1, m, m, 1), "VALID")


def _upconv_float(x, p, cfg, compute_dtype, precision):
    """The float transposed conv + bias, shared by _up_block and the
    quantized apply (models/quantize.py _apply_int8) so the two paths
    cannot drift."""
    preferred = jnp.float32 if compute_dtype == jnp.float32 else None
    return lax.conv_transpose(
        x.astype(compute_dtype),
        p["upconv_w"].astype(compute_dtype),
        strides=(cfg.upconv_stride, cfg.upconv_stride),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        transpose_kernel=True,
        precision=precision,
        preferred_element_type=preferred,
    ).astype(compute_dtype) + p["upconv_b"].astype(compute_dtype)


def _up_block(x, skip, p, s, cfg, dc_fn, compute_dtype, precision):
    y = _upconv_float(x, p, cfg, compute_dtype, precision)
    # pad up-sampled map to the skip's spatial size (ref unet.py:41-47):
    # F.pad([diffX//2, diffX - diffX//2, diffY//2, ...])
    dy = skip.shape[1] - y.shape[1]
    dx = skip.shape[2] - y.shape[2]
    y = jnp.pad(y, ((0, 0), (dy // 2, dy - dy // 2), (dx // 2, dx - dx // 2), (0, 0)))
    y = jnp.concatenate([skip.astype(compute_dtype), y], axis=-1)  # [x2, x1] order
    return dc_fn(y, p, s)


def unet_apply(
    cfg: UNetConfig,
    params: Params,
    batch_stats: BatchStats,
    x: jnp.ndarray,
    *,
    train: bool = False,
    compute_dtype: jnp.dtype = jnp.float32,
    channels_last: bool = False,
    remat: bool = False,
    sample_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, BatchStats]:
    """Run the U-Net. x is NCHW by default (reference convention); pass
    channels_last=True to feed NHWC directly and skip the transposes.

    remat=True rematerializes each DoubleConv block in the backward pass
    (jax.checkpoint), trading ~30% extra FLOPs for dropping the block's
    inner activations from HBM — enables much larger training batches.

    sample_mask ((N,) bool, train mode): mask-weighted batch-norm
    statistics — padded samples are excluded from every BN batch mean/var
    (and running-stat update), making a padded static-shape batch's math
    equal to the ragged batch's (see _batch_norm).

    Returns (logits in the input layout, new_batch_stats). In eval mode the
    returned batch_stats is the input object unchanged.
    """
    precision = _EXACT if compute_dtype == jnp.float32 else lax.Precision.DEFAULT
    if not channels_last:
        x = jnp.transpose(x, (0, 2, 3, 1))
    sample_weight = None
    if train and sample_mask is not None:
        sample_weight = sample_mask.astype(jnp.float32).reshape(-1, 1, 1, 1)

    dc_fn = functools.partial(
        _double_conv,
        act_name=cfg.activation,
        train=train,
        compute_dtype=compute_dtype,
        precision=precision,
        sample_weight=sample_weight,
    )
    if remat:
        dc_fn = jax.checkpoint(dc_fn)

    new_stats: BatchStats = dict(batch_stats) if train else batch_stats

    def run_dc(name, h):
        out, updates = dc_fn(h, params[name], batch_stats[name])
        if train:
            new_stats[name] = updates
        return out

    skips = [run_dc("inc", x)]
    for i in range(cfg.num_levels - 1):
        h = _maxpool(skips[-1], cfg.maxpool_size)
        skips.append(run_dc(f"down_{i}", h))
    h = skips[-1]
    for j in range(cfg.num_levels - 1):
        name = f"up_{j}"

        def dc_collect(y, p, s, _name=name):
            out, updates = dc_fn(y, p, s)
            if train:
                new_stats[_name] = updates
            return out

        h = _up_block(
            h, skips[-2 - j], params[name], batch_stats[name], cfg, dc_collect, compute_dtype, precision
        )
    out = _conv(h, params["outc"]["w"], [(0, 0), (0, 0)], compute_dtype, precision)
    out = out + params["outc"]["b"].astype(out.dtype)
    out = out.astype(jnp.float32)
    if not channels_last:
        out = jnp.transpose(out, (0, 3, 1, 2))
    return out, new_stats


class UNet:
    """Thin OO convenience wrapper mirroring the reference constructor
    signature (ref unet.py:61). Holds config only — params stay explicit."""

    def __init__(
        self,
        n_channels: int,
        n_classes: int,
        layer_dimensions: Sequence[int] = (64, 128, 256, 512, 1024),
        kernel_size: int = 3,
        maxpool_size: int = 2,
        upconv_stride: int = 2,
        activation: str = "relu",
    ):
        self.config = UNetConfig(
            n_channels=n_channels,
            n_classes=n_classes,
            layer_dimensions=tuple(layer_dimensions),
            kernel_size=kernel_size,
            maxpool_size=maxpool_size,
            upconv_stride=upconv_stride,
            activation=activation,
        )

    def init(self, key: jax.Array) -> Tuple[Params, BatchStats]:
        return init_unet(key, self.config)

    def apply(self, params, batch_stats, x, **kw):
        return unet_apply(self.config, params, batch_stats, x, **kw)
