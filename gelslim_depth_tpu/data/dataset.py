"""HBM-resident baked dataset (TPU-first rebuild of GeneralDataset).

The reference eagerly loads every `.pt` into host RAM and then re-runs
per-sample channel-loop normalization on the CPU inside __getitem__ for
every sample of every epoch (ref gelslim_depth/datasets/general_dataset.py:
134-183, 211-231 — flagged as the per-epoch hot spot in SURVEY.md section
3.1). Here preprocessing is data, not Python loops: each object file is
preprocessed ONCE (difference image -> per-finger split -> area resize ->
optional blur), statistics are computed over the baked arrays, the whole
set is normalized in one vectorized pass, and the result lives as device
(HBM) arrays; a training batch is then a pure gather.

Reference semantics preserved:
- separate_fingers: the 6-channel dual-finger image splits into two
  3-channel samples concatenated along the batch axis, doubling N
  (general_dataset.py:69-77); depth 2ch -> two 1ch the same way.
- difference image vs base_tactile_image per finger (:70-71).
- input size = (int(H*downsample_factor), int(W*downsample_factor)) taken
  from the FIRST object file (:66-67).
- gaussian blur of depth when depth_image_blur_kernel > 1 (:74-75).
- object_index tags (:88); the extra (real_data) directory restarts its
  object indices at 0, exactly like load_extra_object_dataset (:99-132).
- max_datapoints_per_object random subsetting (:91-97).
- train-set statistics: depth (min, max, mean, std) over all depth values,
  image per-channel (mins, maxes, means, stds), std unbiased like torch
  (:189-209); val/test receive the train set's parameters.
- accepts both 'depth_image' and 'depth_images' dict keys (the README/code
  disagree; SURVEY.md known-bugs list).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from gelslim_depth_tpu import ops
from gelslim_depth_tpu.data.pt_io import load_pt


def _get_depth(data: Dict) -> Optional[np.ndarray]:
    if "depth_image" in data:
        return np.asarray(data["depth_image"])
    if "depth_images" in data:
        return np.asarray(data["depth_images"])
    return None


@dataclasses.dataclass
class BakedDataset:
    """Preprocessed, normalized, device-resident arrays.

    channels_last=True stores (N, h, w, C) — the TPU conv layout — so the
    hot training loop never pays the per-step NCHW->NHWC activation
    transpose at the model boundary (the round-2 train-MFU finding;
    docs/PERFORMANCE.md). Statistics are always computed/frozen in f32
    regardless of the storage dtype."""

    tactile_image: jnp.ndarray  # (N, 3, h, w) normalized (or NHWC)
    depth_image: jnp.ndarray    # (N, 1, h, w) normalized (or NHWC)
    object_index: jnp.ndarray   # (N,) int32
    depth_normalization_parameters: Tuple[float, float, float, float]
    image_normalization_parameters: Tuple[list, list, list, list]
    input_tactile_image_size: Tuple[int, int]
    channels_last: bool = False

    def __len__(self) -> int:
        return int(self.tactile_image.shape[0])


def _np_area_resize(x: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """Host-side adaptive-average resize with the same static weight
    matrices as ops.area_resize (bake is one-shot host work; routing it
    through the device costs a compile per object shape plus tunneled
    readbacks — observed stalling full-resolution bakes)."""
    from gelslim_depth_tpu.ops.resize import _area_weight_matrix

    h_in, w_in = x.shape[-2:]
    h_out, w_out = int(size[0]), int(size[1])
    if (h_in, w_in) == (h_out, w_out):
        return x
    ah = _area_weight_matrix(h_in, h_out)
    aw = _area_weight_matrix(w_in, w_out)
    y = np.einsum("oh,...hw->...ow", ah, x, optimize=True)
    return np.einsum("pw,...ow->...op", aw, y, optimize=True).astype(np.float32)


def _np_gaussian_blur(x: np.ndarray, k: int) -> np.ndarray:
    from gelslim_depth_tpu.ops.image import _gaussian_kernel_1d

    kern = _gaussian_kernel_1d(int(k))
    pad = k // 2
    nd = x.ndim
    y = np.pad(x, [(0, 0)] * (nd - 2) + [(pad, pad), (0, 0)], mode="reflect")
    y = np.apply_along_axis(lambda a: np.convolve(a, kern, mode="valid"), -2, y)
    y = np.pad(y, [(0, 0)] * (nd - 2) + [(0, 0), (pad, pad)], mode="reflect")
    return np.apply_along_axis(lambda a: np.convolve(a, kern, mode="valid"), -1, y).astype(np.float32)


def _preprocess_object(
    data: Dict,
    *,
    use_difference_image: bool,
    separate_fingers: bool,
    target_size: Tuple[int, int],
    depth_image_blur_kernel: int,
    interp_method: str,
) -> Tuple[np.ndarray, np.ndarray]:
    """One object's dict -> (tactile (M,3,h,w), depth (M,1,h,w)) float32.
    Pure numpy: the bake runs once on the host; only the final normalized
    arrays travel to the device."""
    img = np.asarray(data["tactile_image"], np.float32)
    depth = _get_depth(data)
    if depth is None:
        depth = np.zeros((img.shape[0], 2, img.shape[2], img.shape[3]), np.float32)
    depth = depth.astype(np.float32)

    if use_difference_image:
        base = np.asarray(data["base_tactile_image"], np.float32)
        if base.ndim == 3:
            base = base[None]
        img = (img - base[:, : img.shape[1]] + 255.0) / 2.0

    if separate_fingers:
        img = np.concatenate([img[:, 0:3], img[:, 3:6]], axis=0)
        depth = np.concatenate([depth[:, 0:1], depth[:, 1:2]], axis=0)

    if interp_method != "area":
        img = np.asarray(ops.resize(jnp.asarray(img), target_size, interp_method))
        depth = np.asarray(ops.resize(jnp.asarray(depth), target_size, interp_method))
    else:
        img = _np_area_resize(img, target_size)
        depth = _np_area_resize(depth, target_size)
    if depth_image_blur_kernel > 1:
        depth = _np_gaussian_blur(depth, depth_image_blur_kernel)
    return img, depth


def _unbiased_std(x: np.ndarray) -> float:
    return float(np.std(x.astype(np.float64), ddof=1))


def bake_dataset(
    directory: Optional[str] = None,
    pt_file_list: Optional[Sequence[str]] = None,
    extra_directory: Optional[str] = None,
    extra_pt_list: Optional[Sequence[str]] = None,
    *,
    use_difference_image: bool = False,
    depth_normalization_method: str = "min_max_to_0_-1",
    image_normalization_method: str = "mean_std",
    separate_fingers: bool = True,
    downsample_factor: float = 0.5,
    depth_image_blur_kernel: int = 1,
    depth_normalization_parameters=None,
    image_normalization_parameters=None,
    norm_scale: Optional[float] = None,
    max_datapoints_per_object: Optional[int] = None,
    interp_method: str = "area",
    seed: int = 0,
    device=None,
    preloaded: Optional[Sequence[Dict]] = None,
    extra_preloaded: Optional[Sequence[Dict]] = None,
    channels_last: bool = False,
    image_store_dtype=None,
    stats_reduce=None,
) -> BakedDataset:
    """Load + preprocess + normalize a dataset split into device arrays.

    Mirrors GeneralDataset's constructor contract (general_dataset.py:12-14);
    `preloaded` lets tests/synthetic pipelines pass dicts directly.

    channels_last stores NHWC (see BakedDataset). image_store_dtype (e.g.
    jnp.bfloat16) casts the stored TACTILE images after f32 statistics and
    normalization — halving their HBM footprint and per-step gather
    traffic; depth targets always stay f32 (they are the loss targets, and
    only a quarter of the image bytes).

    stats_reduce((tactile_raw, depth_raw) -> (depth_params, image_params)):
    replaces the local statistics computation when normalization params are
    not supplied — the hook for per-host SHARDED baking, where each process
    holds only its shard and the statistics must be reduced over all
    processes (parallel.multihost.global_dataset_stats).
    """
    rng = np.random.RandomState(seed)

    def _load_all(dir_, files):
        """Parallel multi-file load: IO fans out over a thread pool (each
        load_pt additionally bulk-reads its payloads through the native
        C++ reader when built). The reference's equivalent path is a
        sequential loop with its thread pool permanently disabled
        (general_dataset.py:18,139-163)."""
        paths = [os.path.join(dir_, f) for f in files]
        if len(paths) <= 1:
            return [load_pt(p) for p in paths]
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(min(8, len(paths))) as ex:
            return list(ex.map(load_pt, paths))

    sources: List[Tuple[Dict, int]] = []
    if preloaded is not None:
        sources += [(d, i) for i, d in enumerate(preloaded)]
    elif pt_file_list:
        assert directory and os.path.exists(directory), f"Dataset path {directory} does not exist"
        sources += [(d, i) for i, d in enumerate(_load_all(directory, pt_file_list))]
    if extra_preloaded is not None:
        sources += [(d, i) for i, d in enumerate(extra_preloaded)]
    elif extra_pt_list and extra_directory:
        sources += [(d, i) for i, d in enumerate(_load_all(extra_directory, extra_pt_list))]
    if not sources:
        raise ValueError("no data sources given")

    first_img = np.asarray(sources[0][0]["tactile_image"])
    target_size = (
        int(first_img.shape[2] * downsample_factor),
        int(first_img.shape[3] * downsample_factor),
    )

    imgs, depths, obj_idx = [], [], []
    for data, index in sources:
        img, depth = _preprocess_object(
            data,
            use_difference_image=use_difference_image,
            separate_fingers=separate_fingers,
            target_size=target_size,
            depth_image_blur_kernel=depth_image_blur_kernel,
            interp_method=interp_method,
        )
        if max_datapoints_per_object is not None and img.shape[0] > max_datapoints_per_object:
            sel = rng.permutation(img.shape[0])[:max_datapoints_per_object]
            img, depth = img[sel], depth[sel]
        imgs.append(img)
        depths.append(depth)
        obj_idx.append(np.full((img.shape[0],), index, np.int32))

    tactile = np.concatenate(imgs, axis=0)
    depth = np.concatenate(depths, axis=0)
    object_index = np.concatenate(obj_idx, axis=0)

    if stats_reduce is not None and (
        depth_normalization_parameters is None or image_normalization_parameters is None
    ):
        reduced_depth, reduced_image = stats_reduce(tactile, depth)
        if depth_normalization_parameters is None:
            depth_normalization_parameters = reduced_depth
        if image_normalization_parameters is None:
            image_normalization_parameters = reduced_image
    if depth_normalization_parameters is None:
        depth_normalization_parameters = (
            float(depth.min()), float(depth.max()), float(depth.mean(dtype=np.float64)), _unbiased_std(depth),
        )
    if image_normalization_parameters is None:
        c = tactile.shape[1]
        image_normalization_parameters = (
            [float(tactile[:, i].min()) for i in range(c)],
            [float(tactile[:, i].max()) for i in range(c)],
            [float(tactile[:, i].mean(dtype=np.float64)) for i in range(c)],
            [_unbiased_std(tactile[:, i]) for i in range(c)],
        )

    # one vectorized normalization pass on the host (same folded-affine
    # coefficients as ops.normalize_*), then a single device_put of the
    # finished arrays
    from gelslim_depth_tpu.ops.normalize import depth_norm_coeffs, image_norm_coeffs

    s, b, d = image_norm_coeffs(
        image_normalization_method, norm_scale, image_normalization_parameters, tactile.shape[1]
    )
    mult = (s / d).astype(np.float32).reshape(1, -1, 1, 1)
    add = (-b * s / d).astype(np.float32).reshape(1, -1, 1, 1)
    tactile_n = tactile * mult + add
    ds_, db_, dd_ = depth_norm_coeffs(depth_normalization_method, norm_scale, depth_normalization_parameters)
    depth_n = depth * np.float32(ds_ / dd_) + np.float32(-db_ * ds_ / dd_)
    if channels_last:
        tactile_n = np.ascontiguousarray(tactile_n.transpose(0, 2, 3, 1))
        depth_n = np.ascontiguousarray(depth_n.transpose(0, 2, 3, 1))
    if image_store_dtype is not None:
        tactile_n = tactile_n.astype(jnp.dtype(image_store_dtype))
    tactile_n = jax.device_put(tactile_n, device)
    depth_n = jax.device_put(depth_n, device)

    return BakedDataset(
        tactile_image=tactile_n,
        depth_image=depth_n,
        object_index=jnp.asarray(object_index),
        depth_normalization_parameters=tuple(depth_normalization_parameters),
        image_normalization_parameters=tuple(image_normalization_parameters),
        input_tactile_image_size=target_size,
        channels_last=channels_last,
    )


class BatchIterator:
    """Shuffled epoch iterator over a BakedDataset: device-side gathers,
    host-side permutation only (the DataLoader equivalent; shuffle=True,
    drop_last=False like ref train_unet.py:229-233)."""

    def __init__(self, dataset: BakedDataset, batch_size: int, *, shuffle: bool = True, seed: int = 0):
        self.ds = dataset
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self._rng = np.random.RandomState(seed)

    def __len__(self) -> int:
        return -(-len(self.ds) // self.batch_size)

    def epoch(self):
        n = len(self.ds)
        order = self._rng.permutation(n) if self.shuffle else np.arange(n)
        for start in range(0, n, self.batch_size):
            sel = jnp.asarray(order[start : start + self.batch_size])
            yield (
                jnp.take(self.ds.tactile_image, sel, axis=0),
                jnp.take(self.ds.depth_image, sel, axis=0),
                jnp.take(self.ds.object_index, sel, axis=0),
            )

    def padded_epoch_indices(self, pad_to_multiple_of: Optional[int] = None):
        """One epoch's shuffled sample indices as stacked static-shape
        arrays: (perm (n_batches, bs) int32, masks (n_batches, bs) bool).
        Feeds the scan-epoch programs (train/steps.py make_train_epoch_fn);
        the ragged tail pads by repeating sample 0 with mask False."""
        n = len(self.ds)
        bs = self.batch_size
        if pad_to_multiple_of:
            bs = -(-bs // pad_to_multiple_of) * pad_to_multiple_of
        order = self._rng.permutation(n) if self.shuffle else np.arange(n)
        n_batches = -(-n // self.batch_size)
        perm = np.zeros((n_batches, bs), np.int32)
        masks = np.zeros((n_batches, bs), bool)
        for b in range(n_batches):
            chunk = order[b * self.batch_size : (b + 1) * self.batch_size]
            perm[b, : len(chunk)] = chunk
            masks[b, : len(chunk)] = True
        return perm, masks

    def padded_epoch(self, pad_to_multiple_of: Optional[int] = None):
        """Epoch with every batch padded to the full batch size (and
        optionally a device-count multiple) so jit sees ONE batch shape all
        epoch — no recompiles for the ragged tail. Yields
        (images, targets, valid_mask)."""
        n = len(self.ds)
        bs = self.batch_size
        if pad_to_multiple_of:
            bs = -(-bs // pad_to_multiple_of) * pad_to_multiple_of
        order = self._rng.permutation(n) if self.shuffle else np.arange(n)
        for start in range(0, n, self.batch_size):
            chunk = order[start : start + self.batch_size]
            valid = np.zeros((bs,), bool)
            valid[: len(chunk)] = True
            padded = np.concatenate([chunk, np.zeros(bs - len(chunk), chunk.dtype)])
            sel = jnp.asarray(padded)
            yield (
                jnp.take(self.ds.tactile_image, sel, axis=0),
                jnp.take(self.ds.depth_image, sel, axis=0),
                jnp.asarray(valid),
            )
