"""Mesh -> depth ground-truth generation tests.

The renderer replaces scipy-griddata scattered interpolation with a
min-splat rasterizer (sanctioned algorithm change, SURVEY.md 2.2), so the
gates here are (a) analytic geometry (sphere penetration depth), (b) a
whole-image cross-check against the reference's own griddata formulation,
(c) reference semantics: plane dispatch, SE(2) affine, mirroring, channel
order, per-sample grasp widths, and the dataset round-trip.
"""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from gelslim_depth_tpu.meshgen import (
    DepthImageGenerator,
    affine2d_points,
    load_stl,
    plane_spec,
    render_depth_batch,
    render_depth_pair,
    sample_surface_points,
    save_stl_binary,
)
from gelslim_depth_tpu.meshgen.depth_render import PlaneSpec


def cube_triangles(size=(10.0, 10.0, 10.0), center=(0, 0, 0)):
    sx, sy, sz = [s / 2 for s in size]
    cx, cy, cz = center
    v = np.array(
        [[x, y, z] for x in (-sx, sx) for y in (-sy, sy) for z in (-sz, sz)], np.float32
    ) + np.array([cx, cy, cz], np.float32)
    faces = [
        (0, 1, 3), (0, 3, 2), (4, 6, 7), (4, 7, 5),  # x faces
        (0, 4, 5), (0, 5, 1), (2, 3, 7), (2, 7, 6),  # y faces
        (0, 2, 6), (0, 6, 4), (1, 5, 7), (1, 7, 3),  # z faces
    ]
    return np.stack([v[list(f)] for f in faces])


def sphere_triangles(radius=8.0, n=2000, seed=0):
    from scipy.spatial import ConvexHull

    rng = np.random.RandomState(seed)
    p = rng.normal(size=(n, 3))
    p = radius * p / np.linalg.norm(p, axis=1, keepdims=True)
    hull = ConvexHull(p)
    return p[hull.simplices].astype(np.float32)


class TestSTL:
    def test_binary_roundtrip(self, tmp_path):
        tri = cube_triangles()
        p = str(tmp_path / "cube.stl")
        save_stl_binary(p, tri)
        back = load_stl(p)
        np.testing.assert_allclose(back, tri, atol=1e-6)

    def test_ascii_parse(self, tmp_path):
        tri = cube_triangles()[:2]
        lines = ["solid cube"]
        for t in tri:
            lines.append(" facet normal 0 0 0\n  outer loop")
            for v in t:
                lines.append(f"   vertex {v[0]} {v[1]} {v[2]}")
            lines.append("  endloop\n endfacet")
        lines.append("endsolid cube")
        p = str(tmp_path / "a.stl")
        open(p, "w").write("\n".join(lines))
        np.testing.assert_allclose(load_stl(p), tri, atol=1e-5)


class TestSampling:
    def test_points_on_cube_surface(self):
        tri = cube_triangles(size=(4, 4, 4))
        pts = sample_surface_points(tri, 5000, seed=1)
        # every point sits on one of the six faces
        on_face = np.isclose(np.abs(pts), 2.0, atol=1e-5).any(axis=1)
        assert on_face.all()
        assert (np.abs(pts) <= 2.0 + 1e-5).all()

    def test_area_weighting(self):
        # elongated box: 20x2x2 -> x-faces have area 4, y/z faces 40 each
        tri = cube_triangles(size=(20, 2, 2))
        pts = sample_surface_points(tri, 20000, seed=2)
        frac_x_faces = np.isclose(np.abs(pts[:, 0]), 10.0, atol=1e-5).mean()
        assert abs(frac_x_faces - 8.0 / 168.0) < 0.01  # 2*4 / (2*4+4*40)


class TestPlaneSpec:
    def reference_dispatch(self, plane):
        """Direct transcription of the reference's case rules (:85-151)."""
        axes = [c for c in plane if c.isalpha()]
        signs = [c for c in plane if c in "+-"]
        same = signs[0] == signs[1]
        key = (axes[0], axes[1]) if axes[0] < axes[1] else (axes[1], axes[0])
        if set(axes) == {"x", "y"}:
            perp = 2
            if axes[0] == "x":
                d, a, u = ("+z" if same else "-z"), 1, 0
            else:
                d, a, u = ("-z" if same else "+z"), 0, 1
        elif set(axes) == {"x", "z"}:
            perp = 1
            if axes[0] == "x":
                d, a, u = ("-y" if same else "+y"), 2, 0
            else:
                d, a, u = ("+y" if same else "-y"), 0, 2
        else:
            perp = 0
            if axes[0] == "y":
                d, a, u = ("+x" if same else "-x"), 2, 1
            else:
                d, a, u = ("-x" if same else "+x"), 1, 2
        return PlaneSpec(perp, a, u, 1 if "+" in d else -1)

    @pytest.mark.parametrize("first", ["x", "y", "z"])
    def test_all_plane_strings(self, first):
        for second in "xyz":
            if second == first:
                continue
            for s1 in "+-":
                for s2 in "+-":
                    plane = f"{s1}{first}{s2}{second}"
                    assert plane_spec(plane) == self.reference_dispatch(plane), plane

    def test_invalid(self):
        with pytest.raises(ValueError):
            plane_spec("+x+x")


class TestAffine:
    def test_rotation_translation(self):
        pc = jnp.asarray(np.array([[0.0, 1.0, 0.0], [0.0, 0.0, 2.0]], np.float32))
        # perp axis x(0): in-plane axes are (y, z); rotate 90deg: y->z
        out = np.asarray(affine2d_points(pc, 0, jnp.float32(5.0), jnp.float32(-1.0), jnp.float32(np.pi / 2)))
        np.testing.assert_allclose(out[0], [0.0, 5.0, 0.0], atol=1e-6)
        np.testing.assert_allclose(out[1], [0.0, 3.0, -1.0], atol=1e-6)

    def test_invert_roundtrip(self):
        rng = np.random.RandomState(0)
        pc = jnp.asarray(rng.randn(50, 3).astype(np.float32))
        t1, t2, ang = jnp.float32(3.0), jnp.float32(-2.0), jnp.float32(0.7)
        fwd = affine2d_points(pc, 1, t1, t2, ang)
        back = affine2d_points(fwd, 1, t1, t2, ang, invert=True)
        np.testing.assert_allclose(np.asarray(back), np.asarray(pc), atol=1e-5)


SPEC_YZ = plane_spec("+y+z")  # perp=x, aligned=z(cols), unaligned=y(rows), mult=+1


class TestRender:
    def test_sphere_analytic_depth(self):
        """Sphere R=8 gripped at width 12: penetration depth at in-plane
        radius r is -(sqrt(R^2-r^2) - w/2) where positive."""
        R, w = 8.0, 12.0
        tri = sphere_triangles(R, 4000)
        pc = jnp.asarray(sample_surface_points(tri, 200_000, seed=0))
        right, left = render_depth_pair(
            pc, jnp.float32(0), jnp.float32(0), jnp.float32(0), jnp.float32(w),
            spec=SPEC_YZ, image_size=(320, 427), mm_per_pixel=12.0 / 320.0, fill_iters=6,
        )
        right = np.asarray(right)
        h, ww = right.shape
        mm = 12.0 / 320.0
        ys = mm * (np.arange(h) - h / 2.0)
        zs = mm * (np.arange(ww) - ww / 2.0)
        rr = np.sqrt(ys[:, None] ** 2 + zs[None, :] ** 2)
        x_surf = np.sqrt(np.maximum(R**2 - rr**2, 0.0))
        want = -np.maximum(x_surf - w / 2.0, 0.0)
        # compare away from the contact rim (slope blows up there)
        interior = rr < np.sqrt(R**2 - (w / 2) ** 2) - 0.3
        err = right - want
        rmse_interior = np.sqrt(np.mean(err[interior] ** 2))
        assert rmse_interior < 0.02, f"interior rmse {rmse_interior}"
        # symmetric grip: left tracks right (different hemispheres' samples,
        # so compare in RMSE, not pointwise)
        lr_rmse = np.sqrt(np.mean((np.asarray(left)[interior] - right[interior]) ** 2))
        assert lr_rmse < 0.03, f"left/right asymmetry rmse {lr_rmse}"
        # no contact outside the rim
        outside = rr > np.sqrt(R**2 - (w / 2) ** 2) + 0.5
        assert np.abs(right[outside]).max() < 1e-6

    def test_griddata_crosscheck(self):
        """Whole-image agreement with the reference's own scipy-griddata
        formulation on a convex mesh."""
        import scipy.interpolate as interp

        R, w = 8.0, 12.0
        tri = sphere_triangles(R, 4000, seed=3)
        pts = sample_surface_points(tri, 100_000, seed=4) * 1.0
        image_size, mm = (160, 214), 12.0 / 160.0

        got = np.asarray(
            render_depth_pair(
                jnp.asarray(pts), jnp.float32(0.002), jnp.float32(-0.001), jnp.float32(0.3),
                jnp.float32(w), spec=SPEC_YZ, image_size=image_size, mm_per_pixel=mm, fill_iters=6,
            )[0]
        )

        # reference formulation (transcribed math, numpy/scipy):
        pc = pts.copy()
        perp, ali, una = SPEC_YZ.perp, SPEC_YZ.aligned, SPEC_YZ.unaligned
        pc[:, perp] -= (pc[:, perp].max() + pc[:, perp].min()) / 2
        c, s = np.cos(0.3), np.sin(0.3)
        y, z = pc[:, 1].copy(), pc[:, 2].copy()
        pc[:, 1] = c * y - s * z + 0.002 * 1000
        pc[:, 2] = s * y + c * z - 0.001 * 1000
        right = pc[pc[:, perp] > 0].copy()
        right[right[:, perp] < w / 2, perp] = w / 2
        right[:, perp] = -(right[:, perp] - w / 2)
        h, ww = image_size
        gy = mm * (np.arange(h) - h / 2.0)
        gz = mm * (np.arange(ww) - ww / 2.0)
        g = np.stack(np.meshgrid(gy, gz, indexing="ij"), -1).reshape(-1, 2)
        want = interp.griddata(right[:, [una, ali]], right[:, perp], g, method="linear")
        want = want.reshape(image_size)
        want[np.isnan(want)] = 0.0
        want[want > 0] = 0.0

        rmse = np.sqrt(np.mean((got - want) ** 2))
        assert rmse < 0.05, f"griddata cross-check rmse {rmse}"

    def test_batch_channel_order_and_widths(self):
        tri = cube_triangles(size=(16, 6, 6))
        pc = jnp.asarray(sample_surface_points(tri, 50_000, seed=0))
        poses = jnp.zeros((2, 3), jnp.float32)
        widths = jnp.asarray([10.0, 14.0], jnp.float32)
        out = np.asarray(
            render_depth_batch(pc, poses, widths, spec=SPEC_YZ, image_size=(64, 86),
                               mm_per_pixel=20.0 / 64.0, fill_iters=4)
        )
        assert out.shape == (2, 2, 64, 86)
        # cube half-width along x is 8 -> penetration = -(8 - w/2)
        assert abs(out[0, 1].min() - (-(8 - 5.0))) < 0.1
        assert abs(out[1, 1].min() - (-(8 - 7.0))) < 0.1
        # wider grip -> shallower penetration
        assert out[1].min() > out[0].min()
        # default channel order (left, right); lr_flip swaps
        flipped = np.asarray(
            render_depth_batch(pc, poses, widths, spec=SPEC_YZ, image_size=(64, 86),
                               mm_per_pixel=20.0 / 64.0, fill_iters=4, lr_flip=True)
        )
        np.testing.assert_allclose(flipped[:, 0], out[:, 1], atol=1e-6)
        np.testing.assert_allclose(flipped[:, 1], out[:, 0], atol=1e-6)

    def test_mirror_left_unaligned_axis(self):
        """An off-center feature must appear mirrored across rows in the
        left image (ref :166)."""
        tri = cube_triangles(size=(12, 3, 3), center=(0, 4.0, 0))  # offset along y (unaligned)
        pc = jnp.asarray(sample_surface_points(tri, 60_000, seed=1))
        r, l = render_depth_pair(
            pc, jnp.float32(0), jnp.float32(0), jnp.float32(0), jnp.float32(8.0),
            spec=SPEC_YZ, image_size=(64, 86), mm_per_pixel=24.0 / 64.0, fill_iters=4,
        )
        r, l = np.asarray(r), np.asarray(l)
        rows_r = np.nonzero((r < -0.5).any(axis=1))[0]
        rows_l = np.nonzero((l < -0.5).any(axis=1))[0]
        assert rows_r.mean() > 32 and rows_l.mean() < 32  # mirrored halves


class TestGenerator:
    def test_end_to_end_dataset(self, tmp_path):
        from gelslim_depth_tpu.data.pt_io import load_pt, save_pt

        mesh_dir = tmp_path / "mesh"
        data_dir = tmp_path / "data"
        os.makedirs(mesh_dir)
        os.makedirs(data_dir)
        save_stl_binary(str(mesh_dir / "rod.stl"), cube_triangles(size=(0.012, 0.004, 0.004)))
        n = 3
        save_pt(
            {
                "tactile_image": np.zeros((n, 6, 32, 43), np.float32),
                "in_hand_pose": np.zeros((n, 3), np.float32),
                "grasp_widths": np.full((n,), 10.0, np.float32),
            },
            str(data_dir / "rod_train.pt"),
        )
        with open(tmp_path / "grasp_widths.txt", "w") as f:
            f.write("rod: None\n")  # None -> per-sample widths from the .pt

        gen = DepthImageGenerator(
            mesh_dir=str(mesh_dir), object_list=["rod"], pc_scale=1000,
            dataset_dir=str(data_dir), grasp_widths_file=str(tmp_path / "grasp_widths.txt"),
            gelslim_plane="+y+z", image_size=(32, 43), image_height_mm=12,
            pc_sampling=30_000,
        )
        gen.generate_depth_images_v1()
        out = load_pt(str(data_dir / "rod_train.pt"))
        assert out["depth_image"].shape == (n, 2, 32, 43)
        d = out["depth_image"]
        assert (d <= 1e-6).all()
        # 12mm-long rod gripped at 10mm -> 1mm penetration per side
        assert abs(d.min() - (-1.0)) < 0.1

    def test_fixed_width_from_file(self, tmp_path):
        from gelslim_depth_tpu.data.pt_io import load_pt, save_pt

        mesh_dir = tmp_path / "mesh"
        data_dir = tmp_path / "data"
        os.makedirs(mesh_dir)
        os.makedirs(data_dir)
        save_stl_binary(str(mesh_dir / "cube.stl"), cube_triangles(size=(0.012, 0.004, 0.004)))
        save_pt(
            {"tactile_image": np.zeros((2, 6, 32, 43), np.float32),
             "in_hand_pose": np.zeros((2, 3), np.float32)},
            str(data_dir / "cube.pt"),
        )
        with open(tmp_path / "gw.txt", "w") as f:
            f.write("cube: 11.0\n")
        gen = DepthImageGenerator(
            mesh_dir=str(mesh_dir), object_list=["cube"], pc_scale=1000,
            dataset_dir=str(data_dir), grasp_widths_file=str(tmp_path / "gw.txt"),
            image_size=(32, 43), image_height_mm=12, pc_sampling=30_000,
        )
        gen.generate_depth_images_v1()
        d = load_pt(str(data_dir / "cube.pt"))["depth_image"]
        assert abs(d.min() - (-0.5)) < 0.1  # (12-11)/2


class TestNativeRenderer:
    """The C++ CPU renderer (native/meshrender.cpp) must reproduce the JAX
    renderer's output — same algorithm, same f32 arithmetic; the only
    tolerated differences are rounding-boundary pixels where libm and XLA
    cos/sin differ by ULPs, flipping a point's pixel assignment."""

    def test_parity_vs_jax_renderer(self):
        from gelslim_depth_tpu.meshgen.native_render import (
            native_renderer_available,
            render_depth_batch_native,
        )

        if not native_renderer_available():
            pytest.skip("no C++ toolchain for the native renderer")
        rng = np.random.RandomState(3)
        tri = sphere_triangles(8.0, 3000, seed=3)
        pts = sample_surface_points(tri, 60_000, seed=4)
        poses = rng.uniform(-0.003, 0.003, (6, 3)).astype(np.float32)
        widths = rng.uniform(11, 14, (6,)).astype(np.float32)
        for lr_flip in (False, True):
            kw = dict(
                spec=plane_spec("+y+z"), image_size=(320, 427),
                mm_per_pixel=12.0 / 320.0, fill_iters=6, lr_flip=lr_flip,
            )
            want = np.asarray(render_depth_batch(
                jnp.asarray(pts), jnp.asarray(poses), jnp.asarray(widths), **kw
            ))
            got = render_depth_batch_native(pts, poses, widths, **kw)
            diff = np.abs(got - want)
            assert float(np.sqrt((diff**2).mean())) < 0.005
            assert (diff > 1e-4).mean() < 1e-4  # only rounding-boundary pixels

    def test_generator_native_backend(self, tmp_path):
        from gelslim_depth_tpu.data.pt_io import load_pt, save_pt
        from gelslim_depth_tpu.meshgen.native_render import native_renderer_available

        if not native_renderer_available():
            pytest.skip("no C++ toolchain for the native renderer")
        mesh_dir, data_dir = tmp_path / "mesh", tmp_path / "data"
        os.makedirs(mesh_dir)
        os.makedirs(data_dir)
        save_stl_binary(str(mesh_dir / "rod.stl"), cube_triangles(size=(0.012, 0.004, 0.004)))
        save_pt(
            {
                "tactile_image": np.zeros((3, 6, 32, 43), np.float32),
                "in_hand_pose": np.zeros((3, 3), np.float32),
                "grasp_widths": np.full((3,), 10.0, np.float32),
            },
            str(data_dir / "rod_train.pt"),
        )
        with open(tmp_path / "grasp_widths.txt", "w") as f:
            f.write("rod: None\n")
        gen = DepthImageGenerator(
            mesh_dir=str(mesh_dir), object_list=["rod"], pc_scale=1000,
            dataset_dir=str(data_dir), grasp_widths_file=str(tmp_path / "grasp_widths.txt"),
            gelslim_plane="+y+z", image_size=(32, 43), image_height_mm=12,
            pc_sampling=30_000, backend="native",
        )
        assert gen.backend == "native"
        gen.generate_depth_images_v1()
        d = load_pt(str(data_dir / "rod_train.pt"))["depth_image"]
        assert d.shape == (3, 2, 32, 43) and (d <= 1e-6).all()
        assert abs(d.min() - (-1.0)) < 0.1


def test_dp_renderer_matches_single():
    """GT rendering sharded over the pose batch (parallel.make_dp_renderer)
    equals the unsharded renderer — the point cloud replicates, each device
    splats its pose slice, zero collectives."""
    import jax

    from gelslim_depth_tpu.parallel import make_dp_renderer, make_mesh, replicate, shard_batch

    n = 8
    if len(jax.devices()) < n:
        pytest.skip("needs the 8-virtual-device CPU mesh (tests/conftest.py)")
    mesh = make_mesh(n)
    tri = cube_triangles(size=(16, 6, 6))
    pc = jnp.asarray(sample_surface_points(tri, 20_000, seed=3))
    rng = np.random.RandomState(5)
    poses = jnp.asarray(rng.uniform(-0.002, 0.002, (2 * n, 3)).astype(np.float32))
    widths = jnp.asarray(rng.uniform(10, 14, (2 * n,)).astype(np.float32))
    kw = dict(image_size=(64, 86), mm_per_pixel=20.0 / 64.0, fill_iters=4)

    want = np.asarray(render_depth_batch(pc, poses, widths, spec=SPEC_YZ, **kw))
    render = make_dp_renderer(mesh, spec=SPEC_YZ, **kw)
    got = render(replicate(mesh, pc), shard_batch(mesh, poses), shard_batch(mesh, widths))
    assert len(got.sharding.device_set) == n
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)
