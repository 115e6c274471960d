"""End-to-end CLI pipeline test on a synthetic dataset tree:
split-data -> generate-depth -> train -> test -> view, all through the
dispatcher — the full reference workflow (README.md:100-128) in miniature.
"""

import os

import numpy as np
import pytest

from gelslim_depth_tpu.cli import main as cli_main
from gelslim_depth_tpu.data.pt_io import load_pt, save_pt
from gelslim_depth_tpu.data.synthetic import make_synthetic_object
from gelslim_depth_tpu.meshgen.stl import save_stl_binary
from tests.test_meshgen import cube_triangles


@pytest.fixture(scope="module")
def pipeline_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("pipeline")
    data = root / "data"
    os.makedirs(data)
    rng = np.random.RandomState(0)
    for name in ("rodA", "rodB"):
        obj = make_synthetic_object(rng, n=10, image_size=(32, 43))
        del obj["depth_image"]  # depth comes from generate-depth below
        save_pt(obj, str(data / f"{name}.pt"))
    os.makedirs(root / "mesh")
    for name in ("rodA", "rodB"):
        save_stl_binary(str(root / "mesh" / f"{name}.stl"),
                        cube_triangles(size=(0.030, 0.006, 0.006)))
    with open(data / "grasp_widths.txt", "w") as f:
        f.write("rodA: 28.0\nrodB: None\n")
    os.makedirs(data / "real_data")
    open(data / "real_data" / "train_real_objects.txt", "w").close()
    return root


def test_full_pipeline(pipeline_dir, monkeypatch):
    root = pipeline_dir
    data = str(root / "data")
    monkeypatch.chdir(root)

    # 1. split loose .pt files 0.8/0.1/0.1
    assert cli_main(["split-data", "cpu", "--data_path", data]) == 0
    assert not os.path.exists(os.path.join(data, "rodA.pt"))  # originals removed
    tr = load_pt(os.path.join(data, "train_data", "rodA_train.pt"))
    va = load_pt(os.path.join(data, "validation_data", "rodA_val.pt"))
    te = load_pt(os.path.join(data, "test_data", "rodA_test.pt"))
    assert tr["tactile_image"].shape[0] == 8
    assert va["tactile_image"].shape[0] == 1
    assert te["tactile_image"].shape[0] == 1
    assert "base_tactile_image" in tr and "in_hand_pose" in tr

    # 2. generate ground-truth depth for every split dir
    for sub in ("train_data", "validation_data", "test_data"):
        assert cli_main([
            "generate-depth", "--mesh_dir", str(root / "mesh"),
            "--dataset_dir", os.path.join(data, sub),
            "--grasp_widths_file", os.path.join(data, "grasp_widths.txt"),
            "--image_size", "32", "43", "--pc_sampling", "20000",
        ]) == 0
    tr = load_pt(os.path.join(data, "train_data", "rodA_train.pt"))
    assert tr["depth_image"].shape == (8, 2, 32, 43)
    assert tr["depth_image"].min() < -0.5  # 30mm rod at 28mm grip -> 1mm

    # 3. train a tiny model for 2 epochs
    assert cli_main([
        "train", "pipeline_test", "0", "--data_path", data,
        "--use_difference_image", "--max_epochs", "2",
        "--dims", "4", "8", "--batch_size", "8",
    ]) == 0
    wdir = os.path.join(str(root), "train_output", "weights")
    assert os.path.exists(os.path.join(wdir, "pipeline_test.npz"))
    assert os.path.exists(os.path.join(wdir, "config_pipeline_test.py"))

    # 4. test harness produces the prediction grid + numeric RMSE
    assert cli_main([
        "test", "pipeline_test", "0", "test_data", "--data_path", data,
        "--weights_dir", wdir,
    ]) == 0
    assert os.path.exists(os.path.join(str(root), "test_output", "depth_predictions.png"))

    # 5. viewer
    assert cli_main(["view", "train_data", "rodA", "--data_path", data]) == 0
    assert os.path.exists(os.path.join(str(root), "pt_images", "rodA.png"))


def test_assemble_object_lists(tmp_path):
    from gelslim_depth_tpu.cli.train_cmd import assemble_object_lists

    data = tmp_path
    os.makedirs(data / "train_data")
    for n in ("a", "b", "c"):
        open(data / "train_data" / f"{n}_train.pt", "w").close()
    with open(data / "validation_objects.txt", "w") as f:
        f.write("b\n")  # 'b' is excluded from train and test lists
    train, val, test, *_ = assemble_object_lists(str(data))
    assert train == ["a_train.pt", "c_train.pt"]
    assert val == ["a_val.pt", "b_val.pt", "c_val.pt"]
    assert test == ["a_test.pt", "c_test.pt"]
    # substring exclusion
    train2, _, _, *_ = assemble_object_lists(str(data), exclude_objects=["a"])
    assert train2 == ["c_train.pt"]


def test_cli_reference_artifact_migration(tmp_path, monkeypatch):
    """test command consuming a reference-style config .py + torch .pth —
    the zero-conversion migration path for existing reference users."""
    import torch

    from gelslim_depth_tpu.config import GelslimConfig
    from tests.torch_fixture import make_state_dict

    monkeypatch.chdir(tmp_path)
    rng = np.random.RandomState(0)
    dims = (4, 8)
    cfg = GelslimConfig(
        weights_name="mig", CNN_dimensions=dims, input_tactile_image_size=(8, 11),
        depth_normalization_parameters=(-1.9, 0.0), use_difference_image=True,
        image_normalization_method="0_255_to_0_1", norm_scale=0.9,
    )
    cfg.emit_python_config(str(tmp_path / "config_mig.py"))
    sd = make_state_dict(rng, dims)
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, str(tmp_path / "mig.pth"))

    data = tmp_path / "data" / "test_data"
    os.makedirs(data)
    obj = make_synthetic_object(rng, n=6, image_size=(16, 22))
    save_pt(obj, str(data / "thing_test.pt"))

    assert cli_main([
        "test", "mig", "0", "test_data", "--data_path", str(tmp_path / "data"),
        "--config_module", str(tmp_path / "config_mig.py"),
        "--torch_pth", str(tmp_path / "mig.pth"),
    ]) == 0
    assert os.path.exists(tmp_path / "test_output" / "depth_predictions.png")


def test_cli_quantize_command(tmp_path, monkeypatch):
    """quantize command: checkpoint + dataset dir in -> <name>_int8.npz
    out, loadable by QuantizedPredictor.from_checkpoint."""
    import jax

    from gelslim_depth_tpu.config import GelslimConfig
    from gelslim_depth_tpu.inference import QuantizedPredictor
    from gelslim_depth_tpu.models.unet import init_unet
    from gelslim_depth_tpu.train.checkpoint import save_weights

    monkeypatch.chdir(tmp_path)
    cfg = GelslimConfig(
        weights_name="qcli", CNN_dimensions=(4, 8),
        input_tactile_image_size=(16, 21),
        image_normalization_method="0_255_to_0_1",
        depth_normalization_method="min_max_to_0_-1",
        depth_normalization_parameters=(-1.9, 0.0), norm_scale=0.9,
        use_difference_image=True,
    )
    params, stats = init_unet(jax.random.PRNGKey(0), cfg.unet_config())
    wdir = str(tmp_path / "weights")
    save_weights(wdir, cfg, params, stats, emit_torch_pth=False)

    data = tmp_path / "data" / "train_data"
    os.makedirs(data)
    rng = np.random.RandomState(0)
    save_pt(make_synthetic_object(rng, n=6, image_size=(32, 43)), str(data / "obj_train.pt"))

    assert cli_main([
        "quantize", "qcli", "0", "--weights_dir", wdir,
        "--data_path", str(tmp_path / "data"), "--calib_frames", "4",
    ]) == 0
    assert os.path.exists(os.path.join(wdir, "qcli_int8.npz"))
    qpred = QuantizedPredictor.from_checkpoint(wdir)
    assert qpred.delta_mm < 0.05

    # the evaluation harness consumes the artifact via --int8
    assert cli_main([
        "test", "qcli", "0", "train_data", "--data_path", str(tmp_path / "data"),
        "--weights_dir", wdir, "--int8",
    ]) == 0
    assert os.path.exists(tmp_path / "test_output" / "depth_predictions.png")


def test_cli_export_command(tmp_path, monkeypatch):
    """export command: checkpoint in -> .gsx AOT artifact out, self-checked
    against the live predictor and loadable by ExportedPredictor."""
    import jax

    from gelslim_depth_tpu.config import GelslimConfig
    from gelslim_depth_tpu.export import ExportedPredictor
    from gelslim_depth_tpu.models.unet import init_unet
    from gelslim_depth_tpu.train.checkpoint import save_weights

    monkeypatch.chdir(tmp_path)
    cfg = GelslimConfig(
        weights_name="xcli", CNN_dimensions=(4, 8),
        input_tactile_image_size=(16, 21),
        image_normalization_method="0_255_to_0_1",
        depth_normalization_method="min_max_to_0_-1",
        depth_normalization_parameters=(-1.9, 0.0), norm_scale=0.9,
        use_difference_image=True,
    )
    params, stats = init_unet(jax.random.PRNGKey(0), cfg.unet_config())
    wdir = str(tmp_path / "weights")
    save_weights(wdir, cfg, params, stats, emit_torch_pth=False)

    assert cli_main([
        "export", "xcli", "0", "--weights_dir", wdir, "--f32",
        "--batch_sizes", "2", "--output_size", "32", "43",
        "--frame_size", "32", "43", "--check",
    ]) == 0
    path = os.path.join(wdir, "xcli.gsx")
    assert os.path.exists(path)
    served = ExportedPredictor.load(path)
    rng = np.random.RandomState(1)
    out = served(
        rng.uniform(0, 255, (2, 6, 32, 43)).astype(np.float32),
        rng.uniform(0, 255, (6, 32, 43)).astype(np.float32),
    )
    assert np.asarray(out).shape == (2, 2, 32, 43)


def test_cli_quantize_refuses_missing_base_for_diff_config(tmp_path, monkeypatch):
    """A difference-image config must not silently calibrate on raw frames
    when the dataset carries no base_tactile_image."""
    import jax
    import pytest as _pytest

    from gelslim_depth_tpu.config import GelslimConfig
    from gelslim_depth_tpu.models.unet import init_unet
    from gelslim_depth_tpu.train.checkpoint import save_weights

    monkeypatch.chdir(tmp_path)
    cfg = GelslimConfig(
        weights_name="qnb", CNN_dimensions=(4, 8),
        input_tactile_image_size=(16, 21),
        image_normalization_method="0_255_to_0_1",
        depth_normalization_method="min_max_to_0_-1",
        depth_normalization_parameters=(-1.9, 0.0), norm_scale=0.9,
        use_difference_image=True,
    )
    params, stats = init_unet(jax.random.PRNGKey(0), cfg.unet_config())
    wdir = str(tmp_path / "weights")
    save_weights(wdir, cfg, params, stats, emit_torch_pth=False)

    data = tmp_path / "data" / "train_data"
    os.makedirs(data)
    rng = np.random.RandomState(0)
    obj = make_synthetic_object(rng, n=6, image_size=(32, 43))
    del obj["base_tactile_image"]
    save_pt(obj, str(data / "obj_train.pt"))

    with _pytest.raises(FileNotFoundError, match="base_tactile_image"):
        cli_main([
            "quantize", "qnb", "0", "--weights_dir", wdir,
            "--data_path", str(tmp_path / "data"), "--calib_frames", "4",
        ])


def test_cli_test_int8_rejects_conflicting_flags(tmp_path):
    with pytest.raises(SystemExit):
        cli_main([
            "test", "w", "0", "sub", "--int8",
            "--torch_pth", str(tmp_path / "x.pth"),
        ])
