"""GT-generator parity against the reference's ACTUAL DepthImageGenerator.

tests/test_meshgen.py cross-checks the min-splat rasterizer against a
*transcribed* scipy-griddata formulation; this file removes the
transcription from the loop: the reference's own
`DepthImageGenerator.generate_depth_image` (/root/reference/gelslim_depth/
mesh_utils/depth_from_mesh.py:80-231) runs on the identical point cloud and
pose, and both finger images must agree within the rasterizer tolerance.

open3d (C++ mesh IO, absent here) is only used by the reference's
mesh-loading driver, not by generate_depth_image itself — a module stub
lets the class import; the point cloud is fed directly. The reference's
always-on debug block writes depth_images.png to cwd (its quirk,
depth_from_mesh.py:221-229), so the test chdirs into tmp_path.
"""

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

from gelslim_depth_tpu.meshgen import render_depth_pair, plane_spec  # noqa: E402
from tests.test_meshgen import sphere_triangles  # noqa: E402
from gelslim_depth_tpu.meshgen import sample_surface_points  # noqa: E402


@pytest.mark.parametrize("pose", [(0.002, -0.001, 0.3), (0.0, 0.0, 0.0)])
def test_depth_pair_matches_reference_generator(tmp_path, monkeypatch, pose):
    monkeypatch.chdir(tmp_path)  # reference debug block saves a PNG to cwd
    t1, t2, angle = pose
    image_size, width = (160, 214), 12.0

    tri = sphere_triangles(8.0, 4000, seed=3)
    pts = sample_surface_points(tri, 100_000, seed=4)

    gen = DepthImageGenerator(
        mesh_dir=str(tmp_path), object_list=[], pc_scale=1000,
        dataset_dir=str(tmp_path), grasp_widths_file=None,
        gelslim_plane="+y+z", image_size=image_size,
        image_height_mm=12.0, device="cpu",
    )
    # reference mutates pc in place — give it its own copy
    ref_right, ref_left = gen.generate_depth_image(
        torch.from_numpy(np.array(pts, np.float32)),
        torch.tensor(t1), torch.tensor(t2), torch.tensor(angle),
        torch.tensor(width),
    )

    got_right, got_left = render_depth_pair(
        jnp.asarray(pts), jnp.float32(t1), jnp.float32(t2), jnp.float32(angle),
        jnp.float32(width), spec=plane_spec("+y+z"), image_size=image_size,
        mm_per_pixel=12.0 / image_size[0], fill_iters=6,
    )

    for name, got, want in (
        ("right", got_right, ref_right), ("left", got_left, ref_left),
    ):
        got = np.asarray(got)
        want = want.numpy()
        rmse = float(np.sqrt(np.mean((got - want) ** 2)))
        assert rmse < 0.05, f"{name} finger rmse vs reference generator: {rmse}"
