"""Checkpointing: weights + frozen config artifacts, plus full-state resume.

The reference saves only the EMA-averaged model weights at each new best
validation loss (`torch.save(unet.state_dict())`, ref train_unet.py:476-484)
and pairs them with a generated config .py; optimizer/EMA state is lost, so
"resume" means fine-tuning from weights (:239-244). This rebuild keeps that
weight+config contract (including emitting the reference-format .py and a
torch-loadable .pth via the exporter) AND adds true train-state resume
(params + Adam moments + EMA shadow + step + batch stats) for preemption
recovery — the aux subsystem the reference lacks (SURVEY.md section 5.3/5.4).

Format: flat np.savez keyed by pytree paths — dependency-free and stable.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from gelslim_depth_tpu.config import GelslimConfig
from gelslim_depth_tpu.train.ema import EmaState
from gelslim_depth_tpu.train.steps import TrainState


def replace_durable(tmp: str, path: str) -> None:
    """os.replace(tmp, path) with fsync of the data and the directory:
    atomic against process preemption AND durable against host crash/power
    loss — without the fsyncs some filesystems can surface a zero-length
    file at the final path after a crash that follows the rename."""
    with open(tmp, "rb") as f:
        os.fsync(f.fileno())
    os.replace(tmp, path)
    try:
        dfd = os.open(os.path.dirname(os.path.abspath(path)), os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)
    except OSError:
        # directory fsync is best-effort (not supported on some platforms /
        # filesystems); the data fsync above already bounds the damage to
        # "rename lost", never "truncated file"
        pass


def _flatten(tree, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = prefix + "/".join(
            str(p.key) if hasattr(p, "key") else str(getattr(p, "idx", p)) for p in path
        )
        out[key] = np.asarray(leaf)
    return out


def _unflatten_like(template, flat: Dict[str, np.ndarray], prefix: str = ""):
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(template)[0]
    treedef = jax.tree_util.tree_structure(template)
    leaves = []
    for path, leaf in leaves_with_paths:
        key = prefix + "/".join(
            str(p.key) if hasattr(p, "key") else str(getattr(p, "idx", p)) for p in path
        )
        arr = flat[key]
        leaves.append(jnp.asarray(arr.reshape(np.shape(leaf))))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_weights(
    ckpt_dir: str,
    config: GelslimConfig,
    params,
    batch_stats,
    *,
    name: str = None,
    emit_torch_pth: bool = True,
    emit_python_config: bool = True,
) -> str:
    """The reference's checkpoint unit: weights + frozen config. Writes
    <dir>/<name>.npz, <name>.json, optionally config_<name>.py and a
    torch-loadable <name>.pth."""
    name = name or config.weights_name
    os.makedirs(ckpt_dir, exist_ok=True)
    flat = {}
    flat.update(_flatten(params, "params/"))
    flat.update(_flatten(batch_stats, "batch_stats/"))
    np.savez(os.path.join(ckpt_dir, f"{name}.npz"), **flat)
    config.save_json(os.path.join(ckpt_dir, f"{name}.json"))
    if emit_python_config:
        config.emit_python_config(os.path.join(ckpt_dir, f"config_{name}.py"))
    if emit_torch_pth:
        try:
            import torch

            from gelslim_depth_tpu.models.torch_import import export_torch_state_dict

            sd = export_torch_state_dict(params, batch_stats, config.unet_config())
            torch.save({k: torch.from_numpy(np.array(v)) for k, v in sd.items()},
                       os.path.join(ckpt_dir, f"{name}.pth"))
        except ImportError:
            pass
    return os.path.join(ckpt_dir, f"{name}.npz")


def _resolve_checkpoint_name(ckpt_dir: str) -> str:
    """Pick the checkpoint name in a save_weights directory.

    Directories produced by long runs legitimately contain the best-val
    checkpoint PLUS epoch-pinned snapshots `<name>_epoch<e>` (ref
    train_unet.py:485-490 policy), so "exactly one .json" is wrong. Rule:
    if one candidate is the bare weights_name and every other candidate is
    that name plus an `_epoch<N>` suffix, prefer the bare name (the
    best-validation weights). Anything else is genuinely ambiguous."""
    cands = sorted(
        f[:-5]
        for f in os.listdir(ckpt_dir)
        if f.endswith(".json") and not f.endswith("state.json")
    )
    if not cands:
        raise FileNotFoundError(f"no checkpoint .json in {ckpt_dir}")
    if len(cands) == 1:
        return cands[0]
    import re

    bases = {re.sub(r"_epoch\d+$", "", c) for c in cands}
    if len(bases) == 1:
        base = bases.pop()
        if base in cands:
            return base
        # only epoch-pinned snapshots: take the latest epoch
        return max(cands, key=lambda c: int(re.search(r"_epoch(\d+)$", c).group(1)))
    raise ValueError(f"ambiguous checkpoint dir {ckpt_dir}: {cands}; pass name=")


def load_checkpoint(ckpt_dir: str, name: str = None) -> Tuple[GelslimConfig, Any, Any]:
    """Load (config, params, batch_stats) from a save_weights directory."""
    if name is None:
        name = _resolve_checkpoint_name(ckpt_dir)
    config = GelslimConfig.from_json(os.path.join(ckpt_dir, f"{name}.json"))
    from gelslim_depth_tpu.models.unet import init_unet

    template_p, template_s = init_unet(jax.random.PRNGKey(0), config.unet_config())
    flat = dict(np.load(os.path.join(ckpt_dir, f"{name}.npz")))
    params = _unflatten_like(template_p, flat, "params/")
    stats = _unflatten_like(template_s, flat, "batch_stats/")
    return config, params, stats


def save_train_state(ckpt_dir: str, state: TrainState, *, name: str = "train_state") -> str:
    """Full resumable state (params, batch stats, Adam moments, EMA, step)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    flat = _flatten(
        {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "ema_shadow": state.ema.shadow,
        }
    )
    flat["__num_updates"] = np.asarray(state.ema.num_updates)
    flat["__ema_decay"] = np.asarray(state.ema.decay)
    flat["__step"] = np.asarray(state.step)
    # atomic AND durable: a preemption mid-write must never leave a
    # truncated .npz at the final path, and a host crash/power loss right
    # after the rename must never surface a zero-length file there
    path = os.path.join(ckpt_dir, f"{name}.npz")
    tmp = os.path.join(ckpt_dir, f"{name}.tmp.npz")
    np.savez(tmp, **flat)
    replace_durable(tmp, path)
    return path


def load_train_state(ckpt_dir: str, template: TrainState, *, name: str = "train_state") -> TrainState:
    flat = dict(np.load(os.path.join(ckpt_dir, f"{name}.npz")))
    tree = _unflatten_like(
        {
            "params": template.params,
            "batch_stats": template.batch_stats,
            "opt_state": template.opt_state,
            "ema_shadow": template.ema.shadow,
        },
        flat,
    )
    return TrainState(
        params=tree["params"],
        batch_stats=tree["batch_stats"],
        opt_state=tree["opt_state"],
        ema=EmaState(
            shadow=tree["ema_shadow"],
            num_updates=jnp.asarray(flat["__num_updates"]),
            decay=float(flat["__ema_decay"]),
        ),
        step=jnp.asarray(flat["__step"]),
    )


# ---------------------------------------------------------------------------
# Quantized serving checkpoints (models/quantize.py)
# ---------------------------------------------------------------------------

def save_quantized(ckpt_dir: str, config: GelslimConfig, q, *, name: str = None) -> str:
    """Persist a QuantizedUNet so serving can skip re-calibration: one
    <name>_int8.npz holding the float params/stats, the int8 weights with
    their per-channel scales, the static activation scales, and the
    calibration fitness delta, plus the frozen config json."""
    import json as _json

    name = name or config.weights_name
    os.makedirs(ckpt_dir, exist_ok=True)
    flat = {}
    flat.update(_flatten(q.params, "params/"))
    flat.update(_flatten(q.batch_stats, "batch_stats/"))
    flat.update(_flatten(q.w8, "w8/"))
    flat.update(_flatten(q.w_scale, "w_scale/"))
    flat["float_delta"] = np.asarray(q.float_delta)
    flat["act_scale_json"] = np.frombuffer(
        _json.dumps({k: float(v) for k, v in q.act_scale.items()}).encode(),
        dtype=np.uint8,
    )
    path = os.path.join(ckpt_dir, f"{name}_int8.npz")
    np.savez(path, **flat)
    # own json name: writing <name>.json here could clobber an existing
    # float checkpoint's frozen config (e.g. quantizing a reference .pth
    # under a name that already exists in the directory)
    config.save_json(os.path.join(ckpt_dir, f"{name}_int8.json"))
    return path


def load_quantized(ckpt_dir: str, name: str = None):
    """Load a save_quantized artifact -> (config, QuantizedUNet)."""
    import json as _json

    from gelslim_depth_tpu.models.quantize import QuantizedUNet
    from gelslim_depth_tpu.models.unet import init_unet

    if name is None:
        cands = sorted(f[:-9] for f in os.listdir(ckpt_dir) if f.endswith("_int8.npz"))
        if not cands:
            raise FileNotFoundError(f"no *_int8.npz quantized artifact in {ckpt_dir}")
        if len(cands) > 1:
            raise ValueError(
                f"ambiguous quantized artifacts in {ckpt_dir}: {cands}; pass name="
            )
        name = cands[0]
    cfg_path = os.path.join(ckpt_dir, f"{name}_int8.json")
    if not os.path.exists(cfg_path):  # artifacts from before the rename
        cfg_path = os.path.join(ckpt_dir, f"{name}.json")
    config = GelslimConfig.from_json(cfg_path)
    unet_cfg = config.unet_config()
    with np.load(os.path.join(ckpt_dir, f"{name}_int8.npz")) as z:
        flat = {k: z[k] for k in z.files}
    t_params, t_stats = init_unet(jax.random.PRNGKey(0), unet_cfg)
    params = _unflatten_like(t_params, flat, "params/")
    batch_stats = _unflatten_like(t_stats, flat, "batch_stats/")
    w8: Dict[str, Any] = {}
    w_scale: Dict[str, Any] = {}
    # iterate the sites the ARTIFACT carries (not _quantized_sites) so
    # artifacts with and without int8 upconvs both load
    for key in flat:
        if key.startswith("w8/"):
            block, conv = key[len("w8/"):].split("/")
            scale_key = f"w_scale/{block}/{conv}"
            if scale_key not in flat:
                raise KeyError(
                    f"quantized artifact {name}_int8.npz carries {key} but "
                    f"not {scale_key} — truncated or corrupt file?"
                )
            w8.setdefault(block, {})[conv] = jnp.asarray(flat[key])
            w_scale.setdefault(block, {})[conv] = jnp.asarray(flat[scale_key])
    # ... but a valid artifact must carry AT LEAST the baseline conv sites:
    # a truncated/partially-written .npz would otherwise load 'successfully'
    # and only die later inside jit tracing with an opaque KeyError
    from gelslim_depth_tpu.models.quantize import _quantized_sites

    missing = [f"w8/{b}/{c}" for b, c in _quantized_sites(unet_cfg)
               if c not in w8.get(b, {})]
    if missing:
        raise KeyError(
            f"quantized artifact {name}_int8.npz is missing int8 weight "
            f"arrays {missing} — truncated or corrupt file?"
        )
    if "act_scale_json" not in flat:
        raise KeyError(
            f"quantized artifact {name}_int8.npz is missing the "
            f"act_scale_json activation-scale record — truncated or "
            f"corrupt file?"
        )
    act_scale = _json.loads(bytes(flat["act_scale_json"]).decode())
    return config, QuantizedUNet(
        unet_cfg, params, batch_stats, w8, w_scale,
        # traced runtime leaves (models/quantize.py QuantizedUNet docstring)
        {k: jnp.float32(float(v)) for k, v in act_scale.items()},
        jnp.asarray(flat["float_delta"]),
    )
