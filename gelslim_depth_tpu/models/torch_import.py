"""Import PyTorch `.pth` state_dicts of the reference U-Net into pytrees.

The published checkpoint (`unet_bigdata.pth`, ref README.md:180-181) stores a
torch state_dict with this key structure (ref unet.py module tree):

    inc.double_conv.{0,3}.weight                conv kernels, OIHW
    inc.double_conv.{1,4}.{weight,bias,running_mean,running_var}
    down.{i}.maxpool_conv.1.double_conv.{0,1,3,4}.*
    up.{i}.up.{weight,bias}                     convtranspose, (in,out,kh,kw)
    up.{i}.conv.double_conv.{0,1,3,4}.*
    outc.conv.{weight,bias}

Layout conversions into this package's TPU pytrees:
    conv OIHW            -> HWIO            (transpose 2,3,1,0)
    convtranspose IOHW   -> (kh,kw,out,in)  (transpose 2,3,1,0)
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np
import jax.numpy as jnp

from gelslim_depth_tpu.models.unet import UNetConfig, Params, BatchStats


def _to_np(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def _double_conv_from(sd: Dict[str, Any], prefix: str) -> Tuple[dict, dict]:
    params = {
        "conv1_w": jnp.asarray(_to_np(sd[f"{prefix}.0.weight"]).transpose(2, 3, 1, 0)),
        "bn1_scale": jnp.asarray(_to_np(sd[f"{prefix}.1.weight"])),
        "bn1_bias": jnp.asarray(_to_np(sd[f"{prefix}.1.bias"])),
        "conv2_w": jnp.asarray(_to_np(sd[f"{prefix}.3.weight"]).transpose(2, 3, 1, 0)),
        "bn2_scale": jnp.asarray(_to_np(sd[f"{prefix}.4.weight"])),
        "bn2_bias": jnp.asarray(_to_np(sd[f"{prefix}.4.bias"])),
    }
    stats = {
        "bn1_mean": jnp.asarray(_to_np(sd[f"{prefix}.1.running_mean"])),
        "bn1_var": jnp.asarray(_to_np(sd[f"{prefix}.1.running_var"])),
        "bn2_mean": jnp.asarray(_to_np(sd[f"{prefix}.4.running_mean"])),
        "bn2_var": jnp.asarray(_to_np(sd[f"{prefix}.4.running_var"])),
    }
    return params, stats


def import_torch_state_dict(state_dict: Dict[str, Any], cfg: UNetConfig) -> Tuple[Params, BatchStats]:
    """Convert a reference-architecture torch state_dict to (params, batch_stats)."""
    sd = state_dict
    params: Params = {}
    stats: BatchStats = {}
    params["inc"], stats["inc"] = _double_conv_from(sd, "inc.double_conv")
    n_down = cfg.num_levels - 1
    for i in range(n_down):
        params[f"down_{i}"], stats[f"down_{i}"] = _double_conv_from(
            sd, f"down.{i}.maxpool_conv.1.double_conv"
        )
    for j in range(n_down):
        dc_params, dc_stats = _double_conv_from(sd, f"up.{j}.conv.double_conv")
        params[f"up_{j}"] = {
            "upconv_w": jnp.asarray(_to_np(sd[f"up.{j}.up.weight"]).transpose(2, 3, 1, 0)),
            "upconv_b": jnp.asarray(_to_np(sd[f"up.{j}.up.bias"])),
            **dc_params,
        }
        stats[f"up_{j}"] = dc_stats
    params["outc"] = {
        "w": jnp.asarray(_to_np(sd["outc.conv.weight"]).transpose(2, 3, 1, 0)),
        "b": jnp.asarray(_to_np(sd["outc.conv.bias"])),
    }
    return params, stats


def load_torch_checkpoint(path: str, cfg: UNetConfig) -> Tuple[Params, BatchStats]:
    """Load a `.pth` file. Prefers the torch-free reader; falls back to torch."""
    from gelslim_depth_tpu.data.pt_io import load_pt

    sd = load_pt(path)
    return import_torch_state_dict(sd, cfg)


def export_torch_state_dict(params: Params, batch_stats: BatchStats, cfg: UNetConfig) -> Dict[str, np.ndarray]:
    """Inverse conversion so checkpoints trained here remain loadable by
    reference-API torch consumers (numpy arrays; wrap in torch.from_numpy)."""
    out: Dict[str, np.ndarray] = {}

    def put_dc(prefix, p, s):
        out[f"{prefix}.0.weight"] = np.asarray(p["conv1_w"]).transpose(3, 2, 0, 1)
        out[f"{prefix}.1.weight"] = np.asarray(p["bn1_scale"])
        out[f"{prefix}.1.bias"] = np.asarray(p["bn1_bias"])
        out[f"{prefix}.1.running_mean"] = np.asarray(s["bn1_mean"])
        out[f"{prefix}.1.running_var"] = np.asarray(s["bn1_var"])
        out[f"{prefix}.3.weight"] = np.asarray(p["conv2_w"]).transpose(3, 2, 0, 1)
        out[f"{prefix}.4.weight"] = np.asarray(p["bn2_scale"])
        out[f"{prefix}.4.bias"] = np.asarray(p["bn2_bias"])
        out[f"{prefix}.4.running_mean"] = np.asarray(s["bn2_mean"])
        out[f"{prefix}.4.running_var"] = np.asarray(s["bn2_var"])

    put_dc("inc.double_conv", params["inc"], batch_stats["inc"])
    for i in range(cfg.num_levels - 1):
        put_dc(f"down.{i}.maxpool_conv.1.double_conv", params[f"down_{i}"], batch_stats[f"down_{i}"])
        put_dc(f"up.{i}.conv.double_conv", params[f"up_{i}"], batch_stats[f"up_{i}"])
        out[f"up.{i}.up.weight"] = np.asarray(params[f"up_{i}"]["upconv_w"]).transpose(3, 2, 0, 1)
        out[f"up.{i}.up.bias"] = np.asarray(params[f"up_{i}"]["upconv_b"])
    out["outc.conv.weight"] = np.asarray(params["outc"]["w"]).transpose(3, 2, 0, 1)
    out["outc.conv.bias"] = np.asarray(params["outc"]["b"])
    return out
