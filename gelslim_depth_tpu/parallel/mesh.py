"""Data-parallel scaling via jax.sharding.Mesh + NamedSharding.

The reference is single-process single-GPU with no distributed code at all
(SURVEY.md section 2.3); this module *adds* multi-chip data parallelism as
first-class functionality, the TPU way: the train step stays the pure
function from train/steps.py, parameters/optimizer/EMA state are replicated,
the batch is sharded over the 'data' mesh axis, and XLA inserts the gradient
all-reduce (psum over ICI) automatically from the sharding annotations —
there are no explicit collectives to maintain.

Batch-norm note: because the batch statistics are means over the sharded
batch axis, XLA turns them into cross-device reductions — i.e. DP training
here computes *global* (synced) batch norm, matching single-device math
exactly instead of diverging per-replica.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gelslim_depth_tpu.models.unet import UNetConfig, unet_apply
from gelslim_depth_tpu.train.steps import make_train_step, make_eval_step


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    """1-D device mesh over the first n (default all) local devices.

    Raises if fewer than n_devices are available — a silently smaller mesh
    would make 'n-device' tests/dryruns quietly run on one chip."""
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise RuntimeError(
                f"make_mesh: requested {n_devices} devices but only "
                f"{len(devices)} {devices[0].platform} device(s) are visible; "
                "for a virtual CPU mesh set "
                f"XLA_FLAGS=--xla_force_host_platform_device_count={n_devices} "
                "and JAX_PLATFORMS=cpu before JAX initializes"
            )
        devices = devices[:n_devices]
    return jax.sharding.Mesh(devices, (axis_name,))


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(mesh: Mesh, tree, axis_name: str = "data"):
    """Shard leading (batch) axis of every leaf across the mesh."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.device_put(tree, sharding)


def make_dp_train_step(
    unet_cfg: UNetConfig,
    optimizer,
    mesh: Mesh,
    *,
    axis_name: str = "data",
    compute_dtype=jnp.float32,
    channels_last: bool = False,
    donate: bool = True,
    masked: bool = False,
    remat: bool = False,
):
    """Jitted DP train step: state replicated, batch sharded on its leading
    axis. Returns step(state, images, targets[, valid_mask]) ->
    (state, loss). masked=True enables static-shape padded tail batches."""
    base = make_train_step(
        unet_cfg, optimizer, compute_dtype=compute_dtype, channels_last=channels_last,
        masked=masked, remat=remat,
    )
    repl = NamedSharding(mesh, P())
    batched = NamedSharding(mesh, P(axis_name, None, None, None))
    masksh = NamedSharding(mesh, P(axis_name))
    in_sh = (repl, batched, batched) + ((masksh,) if masked else ())
    return jax.jit(
        base,
        in_shardings=in_sh,
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )


def make_dp_eval_step(
    unet_cfg: UNetConfig,
    mesh: Mesh,
    *,
    axis_name: str = "data",
    use_ema: bool = True,
    compute_dtype=jnp.float32,
    channels_last: bool = False,
    masked: bool = False,
):
    base = make_eval_step(
        unet_cfg, use_ema=use_ema, compute_dtype=compute_dtype, channels_last=channels_last, masked=masked
    )
    repl = NamedSharding(mesh, P())
    batched = NamedSharding(mesh, P(axis_name, None, None, None))
    masksh = NamedSharding(mesh, P(axis_name))
    in_sh = (repl, batched, batched) + ((masksh,) if masked else ())
    return jax.jit(base, in_shardings=in_sh, out_shardings=repl)


def make_dp_predict(
    unet_cfg: UNetConfig,
    mesh: Mesh,
    *,
    axis_name: str = "data",
    compute_dtype=jnp.float32,
):
    """Batch-sharded eval-mode forward for high-throughput inference
    (BASELINE.json config 5's multi-chip streaming half)."""
    repl = NamedSharding(mesh, P())
    batched = NamedSharding(mesh, P(axis_name, None, None, None))

    def fwd(params, batch_stats, images):
        y, _ = unet_apply(
            unet_cfg, params, batch_stats, images, train=False, compute_dtype=compute_dtype
        )
        return y

    return jax.jit(fwd, in_shardings=(repl, repl, batched), out_shardings=batched)


def _pallas_front_end_wanted(use_pallas, config) -> bool:
    """Same auto rule as inference.fused_predict_dual: default-on on TPU,
    and only for the area interp the kernel hard-wires."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    return bool(use_pallas) and config.interp_method == "area"


def _shard_mapped_dual_graph(
    mesh: Mesh, axis_name: str, n_state_args: int, local_fn
):
    """Manually partition the whole per-frame dual graph over the batch
    axis with shard_map: each device runs local_fn — INCLUDING the Pallas
    fused preprocess kernel, which has no GSPMD partitioning rule and so
    cannot live under a plain sharded jit (VERDICT r4 item 3) — on its own
    batch shard. Sound because the per-frame pipeline has no cross-device
    dependence (weights replicate, every op maps over frames)."""
    state_specs = (P(),) * n_state_args
    return jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=state_specs + (P(axis_name, None, None, None), P(None, None, None)),
        out_specs=P(axis_name, None, None, None),
        # pallas_call has no varying-manual-axes rule either; every output
        # is sharded on the batch axis, so the vma check adds nothing
        check_vma=False,
    )


def make_dp_fused_predictor(
    config,
    unet_cfg: UNetConfig,
    mesh: Mesh,
    output_size,
    *,
    axis_name: str = "data",
    compute_dtype=jnp.float32,
    use_pallas=None,
):
    """The FULL dual-frame inference graph (diff -> resize -> normalize ->
    U-Net -> denorm -> resize back) batch-sharded over the mesh: frames
    shard on their leading axis, weights replicate, the per-frame pipeline
    needs no cross-device communication at all — linear throughput scaling
    over ICI-connected chips (BASELINE.json config 5).

    use_pallas (default None = auto on TPU, same rule as
    inference.fused_predict_dual) routes each device's shard through the
    fused Pallas preprocess kernel via shard_map manual partitioning —
    pallas_call has no GSPMD rule, so under the plain sharded jit the
    kernel would force an all-gather; shard_map runs it locally per shard
    instead (the per-frame pipeline has no cross-device dependence). The
    shard_map path requires the batch to divide the mesh and a shared
    (6, H, W) base; other shapes fall back to the XLA front-end, which
    GSPMD partitions cleanly (decided at trace time — one compiled graph
    either way).

    Returns predict(params, batch_stats, frames, base) -> (N, 2, *out)."""
    from gelslim_depth_tpu.inference import fused_predict_dual

    pallas_ok = _pallas_front_end_wanted(use_pallas, config)
    repl = NamedSharding(mesh, P())
    frames_sh = NamedSharding(mesh, P(axis_name, None, None, None))

    def fwd(params, batch_stats, frames, base):
        if pallas_ok and base.ndim == 3 and frames.shape[0] % mesh.devices.size == 0:
            return _shard_mapped_dual_graph(
                mesh, axis_name, 2,
                lambda p, s, fr, b: fused_predict_dual(
                    config, unet_cfg, p, s, fr, b, tuple(output_size),
                    compute_dtype=compute_dtype, use_pallas=True,
                ),
            )(params, batch_stats, frames, base)
        return fused_predict_dual(
            config, unet_cfg, params, batch_stats, frames, base,
            tuple(output_size), compute_dtype=compute_dtype, use_pallas=False,
        )

    return jax.jit(
        fwd,
        in_shardings=(repl, repl, frames_sh, repl),
        out_shardings=frames_sh,
    )


def make_dp_renderer(
    mesh: Mesh,
    *,
    spec,
    image_size=(320, 427),
    mm_per_pixel: float = 12.0 / 320.0,
    fill_iters: int = 6,
    invert_affine: bool = False,
    lr_flip: bool = False,
    axis_name: str = "data",
):
    """Mesh->depth GT rendering sharded over the pose batch: the point
    cloud replicates, each device min-splats its slice of the poses —
    embarrassingly parallel, zero collectives, linear scaling of the
    ~1,000 samples/s/chip on-chip rate (docs/PERFORMANCE.md meshgen
    section; the reference renders one pose at a time through CPU
    Delaunay, ref depth_from_mesh.py:60-77).

    Returns render(pc (P,3) mm, poses (B,3), widths (B,)) ->
    (B, 2, H, W) sharded on B. B must be divisible by the mesh size.
    Output equality with the unsharded renderer is tested on the virtual
    8-device mesh (tests/test_meshgen.py::test_dp_renderer_matches_single)."""
    from gelslim_depth_tpu.meshgen import render_depth_batch

    repl = NamedSharding(mesh, P())
    pose_sh = NamedSharding(mesh, P(axis_name))
    out_sh = NamedSharding(mesh, P(axis_name, None, None, None))

    def render(pc, poses, widths):
        return render_depth_batch(
            pc, poses, widths, spec=spec, image_size=tuple(image_size),
            mm_per_pixel=mm_per_pixel, fill_iters=fill_iters,
            invert_affine=invert_affine, lr_flip=lr_flip,
        )

    return jax.jit(
        render,
        in_shardings=(repl, pose_sh, pose_sh),
        out_shardings=out_sh,
    )


def make_spatial_predictor(
    config,
    unet_cfg: UNetConfig,
    mesh: Mesh,
    output_size,
    *,
    axis_name: str = "data",
    compute_dtype=jnp.float32,
):
    """Single-frame LATENCY scaling: shard the image HEIGHT axis across
    the mesh instead of the batch axis — the CNN analog of sequence
    parallelism. Weights replicate; every conv/pool/resize needs only its
    neighbors' boundary rows, and XLA's GSPMD partitioner derives the halo
    exchanges (ppermute rings over ICI) from the sharding annotations
    alone — no hand-written collectives, exactly the mesh-first design
    SURVEY.md section 2.3 calls for. Where DP (make_dp_fused_predictor)
    scales THROUGHPUT at fixed per-frame latency, this scales the latency
    of a single dual frame, the regime batch-1 streaming lives in.

    Output equality with the unsharded graph is tested on the virtual
    8-device CPU mesh
    (tests/test_inference.py::test_spatial_predictor_matches_single) and
    gated every round by the driver (__graft_entry__.dryrun_multichip).

    Returns predict(params, batch_stats, frames, base) -> (N, 2, *out),
    frames sharded on their height axis."""
    from gelslim_depth_tpu.inference import fused_predict_dual

    repl = NamedSharding(mesh, P())
    # NCHW: axis 2 is height, for both the (N, 6, H, W) frames and the
    # (N, 2, H', W') depth output
    spatial = NamedSharding(mesh, P(None, None, axis_name, None))
    base_sh = NamedSharding(mesh, P(None, axis_name, None))

    def fwd(params, batch_stats, frames, base):
        # use_pallas=False: pallas_call has no SPMD partitioning rule
        # (same reason as make_dp_fused_predictor)
        return fused_predict_dual(
            config, unet_cfg, params, batch_stats, frames, base,
            tuple(output_size), compute_dtype=compute_dtype, use_pallas=False,
        )

    return jax.jit(
        fwd,
        in_shardings=(repl, repl, spatial, base_sh),
        out_shardings=spatial,
    )


def make_spatial_predictor_int8(
    config,
    q,
    mesh: Mesh,
    output_size,
    *,
    axis_name: str = "data",
    compute_dtype=jnp.bfloat16,
):
    """Height-sharded single-frame serving of the int8 PTQ graph — the
    spatial-parallel analog of make_dp_fused_predictor_int8, completing
    the sharding matrix ({batch, height} x {float, int8}). GSPMD derives
    the conv halo exchanges for the s8xs8->s32 convs exactly as for the
    float graph; the int8 weights/scales replicate. Use for the batch-1
    latency regime on a multi-chip slice when the quantized graph is the
    deployed one.

    Output equality with the unsharded quantized graph is tested on the
    virtual 8-device CPU mesh
    (tests/test_inference.py::test_spatial_predictor_int8_matches_single).

    Returns predict(q, frames, base) -> (N, 2, *out), frames sharded on
    their height axis."""
    from gelslim_depth_tpu.inference import fused_predict_dual
    from gelslim_depth_tpu.models.quantize import unet_apply_int8

    repl = NamedSharding(mesh, P())
    spatial = NamedSharding(mesh, P(None, None, axis_name, None))
    base_sh = NamedSharding(mesh, P(None, axis_name, None))

    def fwd(q, frames, base):
        return fused_predict_dual(
            config, q.cfg, q.params, q.batch_stats, frames, base,
            tuple(output_size), compute_dtype=compute_dtype, use_pallas=False,
            net_fn=lambda z: unet_apply_int8(q, z, compute_dtype=compute_dtype),
        )

    return jax.jit(
        fwd,
        in_shardings=(repl, spatial, base_sh),
        out_shardings=spatial,
    )


def make_dp_fused_predictor_int8(
    config,
    q,
    mesh: Mesh,
    output_size,
    *,
    axis_name: str = "data",
    compute_dtype=jnp.bfloat16,
    use_pallas=None,
):
    """Multi-chip serving of the int8 PTQ graph (models/quantize.py):
    int8 weights + scales replicate, frames shard on the batch axis —
    the quantized per-frame pipeline needs no cross-device communication,
    so throughput scales linearly over ICI-connected chips exactly like
    the float predictor above.

    use_pallas: same semantics as make_dp_fused_predictor — the Pallas
    fused preprocess runs per-shard under shard_map when the shapes allow.

    Returns predict(q, frames, base) -> (N, 2, *out) mm depth; pass the
    QuantizedUNet explicitly so its buffers stay runtime arguments."""
    from gelslim_depth_tpu.inference import fused_predict_dual
    from gelslim_depth_tpu.models.quantize import unet_apply_int8

    pallas_ok = _pallas_front_end_wanted(use_pallas, config)
    repl = NamedSharding(mesh, P())
    frames_sh = NamedSharding(mesh, P(axis_name, None, None, None))

    def _graph(q, frames, base, use_pallas_now):
        return fused_predict_dual(
            config, q.cfg, q.params, q.batch_stats, frames, base,
            tuple(output_size), compute_dtype=compute_dtype,
            use_pallas=use_pallas_now,
            net_fn=lambda x: unet_apply_int8(q, x, compute_dtype=compute_dtype),
        )

    def fwd(q, frames, base):
        if pallas_ok and base.ndim == 3 and frames.shape[0] % mesh.devices.size == 0:
            return _shard_mapped_dual_graph(
                mesh, axis_name, 1,
                lambda qq, fr, b: _graph(qq, fr, b, True),
            )(q, frames, base)
        return _graph(q, frames, base, False)

    return jax.jit(
        fwd, in_shardings=(repl, frames_sh, repl), out_shardings=frames_sh
    )
