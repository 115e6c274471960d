"""Data layer tests: torch-free .pt IO and GeneralDataset-semantics bake."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from gelslim_depth_tpu.data.pt_io import load_pt, save_pt, _save_pt_torchfree
from gelslim_depth_tpu.data.dataset import bake_dataset, BatchIterator
from gelslim_depth_tpu.data.synthetic import make_synthetic_object, write_synthetic_dataset_tree


class TestPtIO:
    def test_roundtrip_via_torch_save(self, tmp_path, rng):
        d = {
            "tactile_image": rng.uniform(0, 255, (3, 6, 8, 9)).astype(np.float32),
            "in_hand_pose": rng.randn(3, 3).astype(np.float32),
            "idx": np.arange(3, dtype=np.int64),
            "mask": np.array([True, False, True]),
        }
        p = str(tmp_path / "x.pt")
        torch.save({k: torch.from_numpy(v) for k, v in d.items()}, p)
        got = load_pt(p)
        for k in d:
            np.testing.assert_array_equal(got[k], d[k])
            assert got[k].dtype == d[k].dtype

    def test_noncontiguous_tensor(self, tmp_path, rng):
        t = torch.from_numpy(rng.randn(6, 8).astype(np.float32)).t()
        p = str(tmp_path / "y.pt")
        torch.save({"a": t}, p)
        np.testing.assert_array_equal(load_pt(p)["a"], t.numpy())

    def test_torchfree_writer_torch_readable(self, tmp_path, rng):
        d = {"a": rng.randn(2, 3, 4).astype(np.float32), "b": np.arange(5, dtype=np.int64)}
        p = str(tmp_path / "z.pt")
        _save_pt_torchfree(d, p)
        back = torch.load(p, weights_only=False)
        for k in d:
            np.testing.assert_array_equal(back[k].numpy(), d[k])
        got = load_pt(p)
        for k in d:
            np.testing.assert_array_equal(got[k], d[k])

    def test_save_pt_default_path(self, tmp_path, rng):
        d = {"a": rng.randn(4, 4).astype(np.float32)}
        p = str(tmp_path / "w.pt")
        save_pt(d, p)
        np.testing.assert_array_equal(load_pt(p)["a"], d["a"])

    @pytest.mark.parametrize("writer", [save_pt, _save_pt_torchfree])
    def test_bfloat16_roundtrip(self, tmp_path, rng, writer):
        """bf16 arrays (an NHWC/bf16-baked pipeline's artifact dtype)
        survive both writers bit-exactly and stay torch-loadable."""
        import ml_dtypes

        bf16 = np.dtype(ml_dtypes.bfloat16)
        d = {"x": rng.randn(3, 5, 7).astype(np.float32).astype(bf16)}
        p = str(tmp_path / f"bf16_{writer.__name__}.pt")
        writer(d, p)
        got = load_pt(p)
        assert got["x"].dtype == bf16
        np.testing.assert_array_equal(
            got["x"].view(np.uint16), d["x"].view(np.uint16)
        )
        back = torch.load(p, weights_only=False)["x"]
        assert back.dtype == torch.bfloat16
        np.testing.assert_array_equal(
            back.view(torch.uint16).numpy(), d["x"].view(np.uint16)
        )


def reference_bake_torch(objs, use_diff, target_size, image_params=None, depth_params=None):
    """GeneralDataset preprocessing semantics composed with torch primitives
    (load -> diff -> finger split -> area resize -> stats -> normalize with
    0_255_to_0_1 / min_max_to_0_-1, norm_scale 0.9)."""
    imgs, depths = [], []
    for data in objs:
        img = torch.from_numpy(data["tactile_image"])
        if use_diff:
            base = torch.from_numpy(data["base_tactile_image"])
            img = ((img - base) + 255.0) / 2.0
        img = torch.cat([img[:, 0:3], img[:, 3:6]], dim=0)
        img = F.interpolate(img, size=target_size, mode="area")
        dep = torch.from_numpy(data["depth_image"])
        dep = torch.cat([dep[:, 0:1], dep[:, 1:2]], dim=0)
        dep = F.interpolate(dep, size=target_size, mode="area")
        imgs.append(img)
        depths.append(dep)
    img = torch.cat(imgs, 0)
    dep = torch.cat(depths, 0)
    if depth_params is None:
        depth_params = (dep.min().item(), dep.max().item(), dep.mean().item(), dep.std().item())
    img_n = img / 255.0
    mn, mx = depth_params[0], depth_params[1]
    dep_n = -0.9 * (dep - mn) / (mx - mn)
    return img_n.numpy(), dep_n.numpy(), depth_params


class TestBake:
    @pytest.fixture(scope="class")
    def objs(self):
        rng = np.random.RandomState(3)
        return [make_synthetic_object(rng, n=4, image_size=(32, 43)) for _ in range(2)]

    def test_bake_matches_reference_semantics(self, objs):
        ds = bake_dataset(
            preloaded=objs,
            use_difference_image=True,
            image_normalization_method="0_255_to_0_1",
            depth_normalization_method="min_max_to_0_-1",
            norm_scale=0.9,
            downsample_factor=0.5,
        )
        assert ds.input_tactile_image_size == (16, 21)
        want_img, want_dep, want_params = reference_bake_torch(objs, True, (16, 21))
        np.testing.assert_allclose(np.asarray(ds.tactile_image), want_img, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(ds.depth_image), want_dep, rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(ds.depth_normalization_parameters, want_params, rtol=1e-4)
        # fingers doubled: 2 objects x 4 samples x 2 fingers
        assert len(ds) == 16
        # object_index: first object's 8 samples tag 0, second's tag 1
        np.testing.assert_array_equal(np.asarray(ds.object_index), [0] * 8 + [1] * 8)

    def test_external_norm_params_respected(self, objs):
        ds = bake_dataset(
            preloaded=objs,
            use_difference_image=False,
            image_normalization_method="0_255_to_0_1",
            depth_normalization_method="min_max_to_0_-1",
            norm_scale=0.9,
            depth_normalization_parameters=(-2.0, 0.0, -0.5, 0.4),
        )
        assert ds.depth_normalization_parameters == (-2.0, 0.0, -0.5, 0.4)

    def test_max_datapoints_per_object(self, objs):
        ds = bake_dataset(preloaded=objs, max_datapoints_per_object=3, norm_scale=0.9,
                          image_normalization_method="0_255_to_0_1")
        assert len(ds) == 6  # 3 per object after the finger-doubling split

    def test_depth_images_key_alias(self, objs):
        renamed = [{**{k: v for k, v in o.items() if k != "depth_image"}, "depth_images": o["depth_image"]} for o in objs]
        ds = bake_dataset(preloaded=renamed, norm_scale=0.9, image_normalization_method="0_255_to_0_1")
        assert len(ds) == 16

    def test_extra_objects_restart_indexing(self, objs):
        ds = bake_dataset(preloaded=objs[:1], extra_preloaded=objs[1:], norm_scale=0.9,
                          image_normalization_method="0_255_to_0_1")
        np.testing.assert_array_equal(np.asarray(ds.object_index), [0] * 8 + [0] * 8)

    def test_batch_iterator(self, objs):
        ds = bake_dataset(preloaded=objs, norm_scale=0.9, image_normalization_method="0_255_to_0_1")
        it = BatchIterator(ds, batch_size=5, seed=1)
        assert len(it) == 4  # ceil(16/5)
        batches = list(it.epoch())
        assert len(batches) == 4
        sizes = [b[0].shape[0] for b in batches]
        assert sizes == [5, 5, 5, 1]
        # every sample visited exactly once per epoch
        all_imgs = np.concatenate([np.asarray(b[0]) for b in batches])
        assert all_imgs.shape[0] == 16

    def test_padded_epoch_static_shapes(self, objs):
        ds = bake_dataset(preloaded=objs, norm_scale=0.9, image_normalization_method="0_255_to_0_1")
        it = BatchIterator(ds, batch_size=5, seed=1)
        shapes, n_valid = set(), 0
        for img, dep, valid in it.padded_epoch(pad_to_multiple_of=None):
            shapes.add(img.shape)
            n_valid += int(np.asarray(valid).sum())
        assert len(shapes) == 1  # one compile shape for the whole epoch
        assert n_valid == 16

    def test_from_disk_tree(self, tmp_path):
        write_synthetic_dataset_tree(str(tmp_path), n_per_object=3, image_size=(16, 22))
        ds = bake_dataset(
            directory=str(tmp_path / "train_data"),
            pt_file_list=["pattern_31_rod_train.pt", "peg1_train.pt"],
            extra_directory=str(tmp_path / "real_data"),
            extra_pt_list=["button.pt"],
            use_difference_image=True,
            norm_scale=0.9,
            image_normalization_method="0_255_to_0_1",
        )
        assert len(ds) == 18  # (2 objects + 1 real) x 3 samples x 2 fingers
        assert ds.input_tactile_image_size == (8, 11)


class TestNativeLoader:
    def test_native_library_builds(self):
        from gelslim_depth_tpu.native import load_library

        lib = load_library("ptloader")
        if lib is None:
            pytest.skip("no C++ toolchain available")
        assert lib.ptl_version() == 1

    def test_native_load_matches_python(self, tmp_path, rng):
        from gelslim_depth_tpu.native import native_available

        if not native_available():
            pytest.skip("no C++ toolchain available")
        d = {
            "tactile_image": rng.uniform(0, 255, (4, 6, 20, 27)).astype(np.float32),
            "depth_image": rng.uniform(-2, 0, (4, 2, 20, 27)).astype(np.float32),
            "idx": np.arange(4, dtype=np.int64),
        }
        p = str(tmp_path / "n.pt")
        torch.save({k: torch.from_numpy(v) for k, v in d.items()}, p)
        nat = load_pt(p, native=True)
        pure = load_pt(p, native=False)
        for k in d:
            np.testing.assert_array_equal(nat[k], d[k])
            np.testing.assert_array_equal(pure[k], d[k])


class TestGeneralDatasetFacade:
    def test_reference_constructor_and_getitem(self, tmp_path, rng):
        from gelslim_depth_tpu.data import GeneralDataset

        write_synthetic_dataset_tree(str(tmp_path), n_per_object=3, image_size=(16, 22))
        ds = GeneralDataset(
            directory=str(tmp_path / "train_data"),
            pt_file_list=["pattern_31_rod_train.pt", "peg1_train.pt"],
            use_difference_image=True,
            depth_normalization_method="min_max_to_0_-1",
            image_normalization_method="0_255_to_0_1",
            separate_fingers=True,
            downsample_factor=0.5,
            norm_scale=0.9,
        )
        assert len(ds) == 12
        sample = ds[3]
        assert set(sample) == {"tactile_image", "depth_image", "object_index"}
        assert sample["tactile_image"].shape == (3, 8, 11)
        assert sample["depth_image"].shape == (1, 8, 11)
        assert ds.input_tactile_image_size == (8, 11)
        assert len(ds.depth_normalization_parameters) == 4


class TestMeshContactObject:
    """make_mesh_contact_object: reference-schema corpus whose depth maps
    come from the package's own meshgen on a REAL reference STL."""

    def test_schema_and_penetration_bound(self):
        from gelslim_depth_tpu.data.synthetic import make_mesh_contact_object

        rng = np.random.RandomState(3)
        obj = make_mesh_contact_object(
            rng, "/root/reference/mesh/hex_key.stl", n=3,
            n_points=20_000, image_size=(40, 53),
            penetration_mm=(0.4, 1.2),
        )
        assert obj["tactile_image"].shape == (3, 6, 40, 53)
        assert obj["base_tactile_image"].shape == (3, 6, 40, 53)
        assert obj["depth_image"].shape == (3, 2, 40, 53)
        assert obj["in_hand_pose"].shape == (3, 3)
        assert obj["grasp_widths"].shape == (3,)
        d = obj["depth_image"]
        assert float(d.max()) == 0.0
        # width = extent - 2*pen pins max penetration within the sampled
        # range (splat rounding can add <= one pixel's slack)
        per_sample_min = d.reshape(3, -1).min(axis=1)
        assert (per_sample_min < -0.2).all(), per_sample_min
        assert (per_sample_min > -1.35).all(), per_sample_min
        # tactile responds where (and only near) contact exists
        t, b = obj["tactile_image"], obj["base_tactile_image"]
        resp = np.abs(t - b)
        contact = (d < -1e-3)
        r_chan = resp[:, 0][contact[:, 0]]
        assert float(r_chan.mean()) > 3.0  # 35/mm response, >=0.4 mm pen
        assert (t >= 0).all() and (t <= 255).all()

    def test_bakes_into_training_dataset(self):
        from gelslim_depth_tpu.data.synthetic import make_mesh_contact_object

        rng = np.random.RandomState(4)
        objs = [
            make_mesh_contact_object(
                rng, f"/root/reference/mesh/{stem}.stl", n=2,
                n_points=10_000, image_size=(32, 43),
            )
            for stem in ("pattern_15_circle", "marble")
        ]
        ds = bake_dataset(
            preloaded=objs,
            use_difference_image=True,
            image_normalization_method="0_255_to_0_1",
            depth_normalization_method="min_max_to_0_-1",
            norm_scale=0.9,
            downsample_factor=1.0,
        )
        assert len(ds) == 8  # 2 objects x 2 duals x 2 fingers
        assert ds.tactile_image.shape == (8, 3, 32, 43)
        assert float(jnp.max(ds.depth_image)) <= 1e-6
        assert float(jnp.min(ds.depth_image)) >= -0.91  # normalized to [-0.9, 0]
