"""Vectorized mesh -> per-finger contact-depth rendering.

Capability-equivalent to the reference's generate_depth_image
(ref depth_from_mesh.py:80-231) with the one sanctioned algorithm change
(SURVEY.md section 2.2): the reference pushes each sample's transformed
point cloud through CPU Qhull Delaunay + scipy.interpolate.griddata twice
per sample — minutes per object. Here the scattered-interpolation is
replaced by a regular-grid *min-splat rasterization with iterative hole
fill*, which is embarrassingly parallel, jit/vmap-able across all samples
of an object at once, and physically cleaner (per-pixel deepest
penetration instead of Delaunay-mixing front/back sheets of non-convex
surfaces). Output contract preserved: (image_size) maps of penetration
depth in mm, <= 0, 0 where no contact, floored at the cloud's min depth,
holes/outside -> 0 (the reference's NaN->0, :193-218).

Geometry pipeline (identical to the reference):
1. center the cloud along the out-of-plane axis (:153-154);
2. SE(2) transform in the gelslim plane: rotation by `angle` about the
   out-of-plane axis + translations (meters -> mm via x1000) (:156,233-248);
3. split into right/left half-clouds at the midplane, clamp each to its
   gel plane at +-width/2, re-express as penetration depth (:158-164);
4. mirror the left image's unaligned axis (:166);
5. resample onto the pixel grid with mm_per_pixel = image_height_mm/H,
   rows <-> the unaligned axis, cols <-> the aligned axis (:12,169-190).

The 48-way `gelslim_plane` string dispatch (:85-151) is reproduced as a
closed-form rule table in plane_spec().
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp


class PlaneSpec(NamedTuple):
    perp: int        # out-of-plane axis index
    aligned: int     # axis mapped to image columns
    unaligned: int   # axis mapped to image rows (mirrored for the left finger)
    multiplier: int  # +1/-1: sign of the right finger's out-of-plane direction


def plane_spec(gelslim_plane: str) -> PlaneSpec:
    """Decode a plane string like '+y+z' (ref :85-151's case table)."""
    axes = [c for c in gelslim_plane if c.isalpha()]
    signs = [c for c in gelslim_plane if c in "+-"]
    if len(axes) != 2 or len(signs) != 2 or axes[0] == axes[1]:
        raise ValueError(f"Invalid gelslim_plane {gelslim_plane!r}")
    ax = {"x": 0, "y": 1, "z": 2}
    pair = frozenset(axes)
    same = signs[0] == signs[1]
    # (pair, first_axis) -> (aligned, unaligned, dir_if_same_signs)
    table = {
        (frozenset("xy"), "x"): (1, 0, +1),
        (frozenset("xy"), "y"): (0, 1, -1),
        (frozenset("xz"), "x"): (2, 0, -1),
        (frozenset("xz"), "z"): (0, 2, +1),
        (frozenset("yz"), "y"): (2, 1, +1),
        (frozenset("yz"), "z"): (1, 2, -1),
    }
    aligned, unaligned, dir_same = table[(pair, axes[0])]
    perp = 3 - ax[axes[0]] - ax[axes[1]]
    return PlaneSpec(perp, aligned, unaligned, dir_same if same else -dir_same)


def affine2d_points(
    pc: jnp.ndarray, perp_axis: int, t1: jnp.ndarray, t2: jnp.ndarray, angle: jnp.ndarray,
    invert: bool = False,
) -> jnp.ndarray:
    """SE(2) on the two in-plane coordinates (ref affine2D_pc, :233-248).
    The in-plane axes are the sorted non-perp indices; translations are in
    the same units as pc."""
    idx = [i for i in range(3) if i != perp_axis]
    c, s = jnp.cos(angle), jnp.sin(angle)
    if invert:
        # inverse of [[c,-s,t1],[s,c,t2]]: R^T, -R^T t
        c2, s2 = c, -s
        t1, t2 = -(c * t1 + s * t2), -(-s * t1 + c * t2)
        c, s = c2, s2
    u = pc[:, idx[0]]
    v = pc[:, idx[1]]
    nu = c * u - s * v + t1
    nv = s * u + c * v + t2
    return pc.at[:, idx[0]].set(nu).at[:, idx[1]].set(nv)


def _fill_holes(grid: jnp.ndarray, fill_iters: int) -> jnp.ndarray:
    """Iterative occupied-3x3-average hole fill of a min-splat grid
    (inf = unoccupied); untouched pixels come out 0 (no contact)."""
    occupied = jnp.isfinite(grid)
    vals = jnp.where(occupied, grid, 0.0)

    # hole fill: average of occupied 3x3 neighbors, only into empty pixels
    def fill(state, _):
        vals, occ = state
        occ_f = occ.astype(jnp.float32)
        ksum = _box3(vals * occ_f)
        kcnt = _box3(occ_f)
        neigh = ksum / jnp.maximum(kcnt, 1.0)
        newly = jnp.logical_and(jnp.logical_not(occ), kcnt > 0)
        vals = jnp.where(newly, neigh, vals)
        occ = jnp.logical_or(occ, newly)
        return (vals, occ), None

    (vals, occupied), _ = jax.lax.scan(fill, (vals, occupied), None, length=fill_iters)
    return jnp.where(occupied, vals, 0.0)


def _box3(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 box sum via two separable shifts (VPU-friendly, no conv setup)."""
    z = jnp.zeros_like(x[:1])
    xv = x + jnp.concatenate([z, x[:-1]], 0) + jnp.concatenate([x[1:], z], 0)
    zc = jnp.zeros_like(xv[:, :1])
    return xv + jnp.concatenate([zc, xv[:, :-1]], 1) + jnp.concatenate([xv[:, 1:], zc], 1)


@functools.partial(
    jax.jit, static_argnames=("spec", "image_size", "mm_per_pixel", "fill_iters", "invert_affine")
)
def render_depth_pair(
    pc: jnp.ndarray,             # (P, 3) mm, output of surface sampling * pc_scale
    translation1: jnp.ndarray,   # meters (x1000 inside, ref :156)
    translation2: jnp.ndarray,
    angle: jnp.ndarray,          # radians
    inter_gelslim_distance: jnp.ndarray,  # mm
    *,
    spec: PlaneSpec,
    image_size: Tuple[int, int] = (320, 427),
    mm_per_pixel: float = 12.0 / 320.0,
    fill_iters: int = 6,
    invert_affine: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One sample's (right, left) contact-depth images."""
    h, w = image_size
    m = float(spec.multiplier)
    pc = pc.astype(jnp.float32)

    # 1. center along the out-of-plane axis
    perp = pc[:, spec.perp]
    mid = 0.5 * (jnp.max(perp) + jnp.min(perp))
    pc = pc.at[:, spec.perp].add(-mid)

    # 2. SE(2) in-plane
    pc = affine2d_points(pc, spec.perp, translation1 * 1000.0, translation2 * 1000.0, angle, invert_affine)

    perp = pc[:, spec.perp]
    half = inter_gelslim_distance / 2.0
    signed = m * perp  # distance toward the right gel

    # 3. per-finger penetration depth (<= 0); clamp-to-plane == max(..., 0) -> negated
    right_depth = -jnp.maximum(signed - half, 0.0)
    left_depth = -jnp.maximum(-signed - half, 0.0)
    right_valid = signed > 0
    left_valid = signed < 0

    min_depth_r = jnp.min(jnp.where(right_valid, right_depth, jnp.inf))
    min_depth_l = jnp.min(jnp.where(left_valid, left_depth, jnp.inf))

    # 5. project to pixels: rows <-> unaligned, cols <-> aligned
    una = pc[:, spec.unaligned]
    ali = pc[:, spec.aligned]
    rows_r = jnp.round(una / mm_per_pixel + h / 2.0).astype(jnp.int32)
    cols = jnp.round(ali / mm_per_pixel + w / 2.0).astype(jnp.int32)
    # 4. the left image mirrors the unaligned axis (ref :166)
    rows_l = jnp.round(-una / mm_per_pixel + h / 2.0).astype(jnp.int32)

    def in_range(r, c):
        return (r >= 0) & (r < h) & (c >= 0) & (c < w)

    # COMBINED splat: every point belongs to exactly one finger, so both
    # finger grids are one (2, h, w) scatter-min — halving the update
    # count of two per-finger scatters. On TPU the scatter runs at a
    # fixed ~6 ns per update attempted (dropped or not), and is ~95% of
    # render time (docs/PERFORMANCE.md meshgen decomposition), so this is
    # a direct 2x on the dominant term. Scatter-free reformulations all
    # measured SLOWER (sort+unique-set 0.8x, searchsorted/binary-search
    # gathers 5-60x worse — TPU random-access gathers hit the same wall).
    is_left = jnp.logical_not(right_valid)
    rows = jnp.where(is_left, rows_l, rows_r)
    depth = jnp.where(is_left, left_depth, right_depth)
    valid = (right_valid | left_valid) & in_range(rows, cols)
    fidx = jnp.where(valid, is_left.astype(jnp.int32), 2)  # 2 -> dropped
    grid = jnp.full((2, h, w), jnp.inf, jnp.float32)
    grid = grid.at[fidx, rows, cols].min(depth, mode="drop")

    right = _fill_holes(grid[0], fill_iters)
    left = _fill_holes(grid[1], fill_iters)
    right = jnp.maximum(right, jnp.where(jnp.isfinite(min_depth_r), min_depth_r, 0.0))
    left = jnp.maximum(left, jnp.where(jnp.isfinite(min_depth_l), min_depth_l, 0.0))
    return right, left


@functools.partial(
    jax.jit, static_argnames=("spec", "image_size", "mm_per_pixel", "fill_iters", "invert_affine", "lr_flip")
)
def render_depth_batch(
    pc: jnp.ndarray,        # (P, 3) mm — one object's sampled surface
    poses: jnp.ndarray,     # (B, 3) in_hand_pose rows (t1, t2, angle)
    widths: jnp.ndarray,    # (B,) grasp widths, mm
    *,
    spec: PlaneSpec,
    image_size: Tuple[int, int] = (320, 427),
    mm_per_pixel: float = 12.0 / 320.0,
    fill_iters: int = 6,
    invert_affine: bool = False,
    lr_flip: bool = False,
) -> jnp.ndarray:
    """All samples of an object in one vmapped program -> (B, 2, H, W),
    channel order (left, right), or (right, left) when lr_flip
    (ref :73-76). This replaces the reference's per-sample tqdm loop over
    CPU Delaunay calls (:60-77)."""

    def one(pose, width):
        r, l = render_depth_pair(
            pc, pose[0], pose[1], pose[2], width,
            spec=spec, image_size=image_size, mm_per_pixel=mm_per_pixel,
            fill_iters=fill_iters, invert_affine=invert_affine,
        )
        return jnp.stack([r, l] if lr_flip else [l, r], axis=0)

    return jax.vmap(one)(poses.astype(jnp.float32), widths.astype(jnp.float32))
