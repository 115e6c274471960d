"""Independent torch implementation of the reference U-Net *behavior spec*
for parity testing (built functionally from the state-dict layout, not a
copy of the reference module code).

Spec (SURVEY.md section 2 #1 / reference gelslim_depth/models/unet.py):
encoder = DoubleConv then (maxpool + DoubleConv) per level; decoder =
convtranspose(in->in//2, k=kernel_size-1, stride), pad-to-skip, concat
[skip, up], DoubleConv; head = 1x1 conv. DoubleConv = conv(pad=1, no bias)
-> batchnorm -> relu, twice.
"""

import numpy as np
import torch
import torch.nn.functional as F


def make_state_dict(rng: np.random.RandomState, dims=(8, 16, 32), n_channels=3, n_classes=1, k=3):
    """Random reference-layout state_dict (numpy float32)."""
    sd = {}

    def dc(prefix, cin, cout, k=k):
        sd[f"{prefix}.0.weight"] = rng.randn(cout, cin, k, k).astype(np.float32) * 0.1
        sd[f"{prefix}.1.weight"] = rng.uniform(0.5, 1.5, cout).astype(np.float32)
        sd[f"{prefix}.1.bias"] = rng.randn(cout).astype(np.float32) * 0.1
        sd[f"{prefix}.1.running_mean"] = rng.randn(cout).astype(np.float32) * 0.1
        sd[f"{prefix}.1.running_var"] = rng.uniform(0.5, 1.5, cout).astype(np.float32)
        sd[f"{prefix}.3.weight"] = rng.randn(cout, cout, k, k).astype(np.float32) * 0.1
        sd[f"{prefix}.4.weight"] = rng.uniform(0.5, 1.5, cout).astype(np.float32)
        sd[f"{prefix}.4.bias"] = rng.randn(cout).astype(np.float32) * 0.1
        sd[f"{prefix}.4.running_mean"] = rng.randn(cout).astype(np.float32) * 0.1
        sd[f"{prefix}.4.running_var"] = rng.uniform(0.5, 1.5, cout).astype(np.float32)

    dc("inc.double_conv", n_channels, dims[0])
    for i in range(len(dims) - 1):
        dc(f"down.{i}.maxpool_conv.1.double_conv", dims[i], dims[i + 1])
    up_k = k - 1
    for j, i in enumerate(range(len(dims) - 1, 0, -1)):
        cin, cout = dims[i], dims[i - 1]
        sd[f"up.{j}.up.weight"] = rng.randn(cin, cin // 2, up_k, up_k).astype(np.float32) * 0.1
        sd[f"up.{j}.up.bias"] = rng.randn(cin // 2).astype(np.float32) * 0.1
        # reference Up never forwards kernel_size to its DoubleConv
        # (ref unet.py:37) -> decoder convs are always 3x3
        dc(f"up.{j}.conv.double_conv", cin, cout, k=3)
    sd["outc.conv.weight"] = rng.randn(n_classes, dims[0], 1, 1).astype(np.float32) * 0.1
    sd["outc.conv.bias"] = rng.randn(n_classes).astype(np.float32) * 0.1
    return sd


def torch_train_steps(sd, batches, dims=(8, 16, 32), lr=1e-3, wd=1e-6, n_steps=3, ema_decay=0.995):
    """Reference training-loop semantics in torch: Adam(lr, weight_decay)
    with L2-into-grad, MSE loss, torch_ema-style EMA (num_updates ramp)
    updated after each optimizer step. Returns (losses, params, ema_shadow)
    as numpy dicts. `batches` yields (images, targets) numpy pairs."""
    t = {}
    for k, v in sd.items():
        tensor = torch.from_numpy(np.array(v))
        t[k] = tensor.requires_grad_(True) if "running_" not in k else tensor

    trainable = {k: v for k, v in t.items() if "running_" not in k}
    opt = torch.optim.Adam(trainable.values(), lr=lr, weight_decay=wd)
    shadow = {k: v.detach().clone() for k, v in trainable.items()}
    losses, n_updates = [], 0
    for step in range(n_steps):
        x_np, y_np = batches[step]
        pred = _forward(t, torch.from_numpy(x_np), dims, 2, 2, train=True)
        loss = ((pred - torch.from_numpy(y_np)) ** 2).mean()
        opt.zero_grad()
        loss.backward()
        opt.step()
        n_updates += 1
        d = min(ema_decay, (1 + n_updates) / (10 + n_updates))
        with torch.no_grad():
            for k in shadow:
                shadow[k] -= (1 - d) * (shadow[k] - trainable[k])
        losses.append(loss.item())
    params = {k: v.detach().numpy() for k, v in t.items()}
    return losses, params, {k: v.numpy() for k, v in shadow.items()}


def _forward(t, x, dims, maxpool, upconv_stride, train):
    """Differentiable functional forward over tensor dict `t` (same spec as
    torch_unet_forward but without no_grad, for training parity tests)."""

    def dcv(prefix, h):
        h = F.conv2d(h, t[f"{prefix}.0.weight"], padding=1)
        h = F.batch_norm(
            h, t[f"{prefix}.1.running_mean"], t[f"{prefix}.1.running_var"],
            t[f"{prefix}.1.weight"], t[f"{prefix}.1.bias"], training=train, momentum=0.1, eps=1e-5,
        )
        h = F.relu(h)
        h = F.conv2d(h, t[f"{prefix}.3.weight"], padding=1)
        h = F.batch_norm(
            h, t[f"{prefix}.4.running_mean"], t[f"{prefix}.4.running_var"],
            t[f"{prefix}.4.weight"], t[f"{prefix}.4.bias"], training=train, momentum=0.1, eps=1e-5,
        )
        return F.relu(h)

    skips = [dcv("inc.double_conv", x)]
    for i in range(len(dims) - 1):
        skips.append(dcv(f"down.{i}.maxpool_conv.1.double_conv", F.max_pool2d(skips[-1], maxpool)))
    h = skips[-1]
    for j in range(len(dims) - 1):
        skip = skips[-2 - j]
        h = F.conv_transpose2d(h, t[f"up.{j}.up.weight"], t[f"up.{j}.up.bias"], stride=upconv_stride)
        dy, dx = skip.shape[2] - h.shape[2], skip.shape[3] - h.shape[3]
        h = F.pad(h, [dx // 2, dx - dx // 2, dy // 2, dy - dy // 2])
        h = dcv(f"up.{j}.conv.double_conv", torch.cat([skip, h], dim=1))
    return F.conv2d(h, t["outc.conv.weight"], t["outc.conv.bias"])


def torch_unet_forward(sd, x_np, dims=(8, 16, 32), maxpool=2, upconv_stride=2, train=False):
    """Functional forward over a reference-layout state_dict.

    If train=True, uses batch statistics and updates running stats in `sd`
    in place (torch batch_norm semantics, momentum 0.1).
    """
    t = {k: torch.from_numpy(np.array(v)) for k, v in sd.items()}
    x = torch.from_numpy(x_np)

    def dcv(prefix, h):
        h = F.conv2d(h, t[f"{prefix}.0.weight"], padding=1)
        h = F.batch_norm(
            h, t[f"{prefix}.1.running_mean"], t[f"{prefix}.1.running_var"],
            t[f"{prefix}.1.weight"], t[f"{prefix}.1.bias"], training=train, momentum=0.1, eps=1e-5,
        )
        h = F.relu(h)
        h = F.conv2d(h, t[f"{prefix}.3.weight"], padding=1)
        h = F.batch_norm(
            h, t[f"{prefix}.4.running_mean"], t[f"{prefix}.4.running_var"],
            t[f"{prefix}.4.weight"], t[f"{prefix}.4.bias"], training=train, momentum=0.1, eps=1e-5,
        )
        return F.relu(h)

    with torch.no_grad():
        skips = [dcv("inc.double_conv", x)]
        for i in range(len(dims) - 1):
            h = F.max_pool2d(skips[-1], maxpool)
            skips.append(dcv(f"down.{i}.maxpool_conv.1.double_conv", h))
        h = skips[-1]
        for j in range(len(dims) - 1):
            skip = skips[-2 - j]
            h = F.conv_transpose2d(h, t[f"up.{j}.up.weight"], t[f"up.{j}.up.bias"], stride=upconv_stride)
            dy, dx = skip.shape[2] - h.shape[2], skip.shape[3] - h.shape[3]
            h = F.pad(h, [dx // 2, dx - dx // 2, dy // 2, dy - dy // 2])
            h = dcv(f"up.{j}.conv.double_conv", torch.cat([skip, h], dim=1))
        out = F.conv2d(h, t["outc.conv.weight"], t["outc.conv.bias"])

    if train:  # write updated running stats back
        for k in sd:
            if "running_" in k:
                sd[k] = t[k].numpy()
    return out.numpy()
