"""Trainer loop tests: learning on synthetic data, checkpoint policy,
log format, early stopping, resume, and the DP loop."""

import os
import re

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gelslim_depth_tpu.config import GelslimConfig
from gelslim_depth_tpu.data.dataset import bake_dataset
from gelslim_depth_tpu.data.synthetic import make_synthetic_object
from gelslim_depth_tpu.train import Trainer, load_checkpoint, load_train_state, save_train_state
from gelslim_depth_tpu.inference import Predictor

DIMS = (8, 16)


def small_cfg(**kw):
    defaults = dict(
        weights_name="tiny",
        CNN_dimensions=DIMS,
        batch_size=8,
        input_tactile_image_size=(16, 21),
        image_normalization_method="0_255_to_0_1",
        depth_normalization_method="min_max_to_0_-1",
        norm_scale=0.9,
        use_difference_image=True,
        # NB: the reference's zero-initialized SMA window means the upward
        # counter trips at epoch threshold+1 regardless of the losses (see
        # train/loop.py docstring), so short learning tests need a high
        # threshold or train_indefinitely
        val_loss_SMA_window=3,
        validation_loss_count_threshold=20,
    )
    defaults.update(kw)
    return GelslimConfig(**defaults)


@pytest.fixture(scope="module")
def datasets():
    rng = np.random.RandomState(0)
    objs = [make_synthetic_object(rng, n=8, image_size=(32, 43)) for _ in range(2)]
    train = bake_dataset(
        preloaded=objs, use_difference_image=True,
        image_normalization_method="0_255_to_0_1", norm_scale=0.9,
    )
    val_objs = [make_synthetic_object(rng, n=4, image_size=(32, 43))]
    val = bake_dataset(
        preloaded=val_objs, use_difference_image=True,
        image_normalization_method="0_255_to_0_1", norm_scale=0.9,
        depth_normalization_parameters=train.depth_normalization_parameters,
        image_normalization_parameters=train.image_normalization_parameters,
    )
    return train, val


def test_trainer_learns_and_checkpoints(tmp_path, datasets):
    train, val = datasets
    cfg = small_cfg(training_learning_rate=3e-3)
    tr = Trainer(cfg, train, val, val, output_dir=str(tmp_path), enable_plots=False, seed=0)
    hist = tr.fit(max_epochs=20)
    assert len(hist["train_loss"]) == 20
    # learns: synthetic blobs are easy, loss must drop substantially
    assert hist["train_loss"][-1] < 0.5 * hist["train_loss"][0]

    # best-val checkpoint exists and reloads into a working Predictor
    wdir = os.path.join(str(tmp_path), "weights")
    assert os.path.exists(os.path.join(wdir, "tiny.npz"))
    assert os.path.exists(os.path.join(wdir, "tiny.json"))
    assert os.path.exists(os.path.join(wdir, "config_tiny.py"))
    cfg2, params, stats = load_checkpoint(wdir, "tiny")
    assert cfg2.CNN_dimensions == DIMS
    pred = Predictor(cfg2, params, stats)
    out = pred.predict_depth_from_RGB(np.full((1, 3, 32, 43), 127.0, np.float32), (32, 43))
    assert np.isfinite(np.asarray(out)).all()

    # torch-loadable .pth was also emitted
    import torch

    sd = torch.load(os.path.join(wdir, "tiny.pth"), weights_only=False)
    assert "inc.double_conv.0.weight" in sd

    # loss log uses the reference line format
    log = open(os.path.join(str(tmp_path), "loss_values", "tiny.txt")).read()
    assert re.search(r"\[INFO\] EPOCH: 1\n", log)
    assert re.search(r"Train loss: \d+\.\d{6},  Validation loss: \d+\.\d{6}, Test loss: \d+\.\d{6}", log)
    assert "Validation loss is at a minimum. Saving the model" in log
    assert "Time for epoch:" in log
    assert "Training complete" in log


def test_early_stop_counter(tmp_path, datasets):
    """Force the stop path: a model with lr=0 never improves, so the SMA
    rises as the window fills and the upward counter trips."""
    train, val = datasets
    cfg = small_cfg(training_learning_rate=0.0, val_loss_SMA_window=2, validation_loss_count_threshold=1)
    tr = Trainer(cfg, train, val, val, output_dir=str(tmp_path), enable_plots=False)
    assert tr.early_stop_tripped is False
    hist = tr.fit(max_epochs=30)
    assert len(hist["train_loss"]) < 30  # stopped early
    # the actual stop condition is recorded on the trainer (artifact
    # writers read this instead of inferring a stop from epoch counts)
    assert tr.early_stop_tripped is True


def test_train_indefinitely_does_not_stop(tmp_path, datasets):
    train, val = datasets
    cfg = small_cfg(training_learning_rate=0.0, val_loss_SMA_window=2,
                    validation_loss_count_threshold=1, train_indefinitely=True,
                    save_at_epochs=[3])
    tr = Trainer(cfg, train, val, val, output_dir=str(tmp_path), enable_plots=False)
    hist = tr.fit(max_epochs=6)
    assert len(hist["train_loss"]) == 6
    log = open(os.path.join(str(tmp_path), "loss_values", "tiny.txt")).read()
    assert "Validation loss stopped decreasing at epoch" in log
    # the rule fired (and is recorded) even though indefinite mode kept going
    assert tr.early_stop_tripped is True
    # epoch-pinned snapshot
    assert os.path.exists(os.path.join(str(tmp_path), "weights", "tiny_epoch3.npz"))


def test_resume_roundtrip(tmp_path, datasets):
    train, val = datasets
    cfg = small_cfg()
    tr = Trainer(cfg, train, val, val, output_dir=str(tmp_path), enable_plots=False, seed=3)
    tr.fit(max_epochs=2)
    path = tr.save_resume_state()
    assert os.path.exists(path)
    state_before = jax.device_get(tr.state)

    tr2 = Trainer(cfg, train, val, val, output_dir=str(tmp_path), enable_plots=False, seed=99)
    tr2.load_resume_state()
    state_after = jax.device_get(tr2.state)
    for a, b in zip(jax.tree_util.tree_leaves(state_before), jax.tree_util.tree_leaves(state_after)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(state_after.ema.num_updates) == int(state_before.ema.num_updates)


def test_resume_continues_the_exact_trajectory(tmp_path, datasets):
    """The preemption contract: train 2 epochs -> save -> NEW process ->
    load -> 2 more epochs must equal 4 uninterrupted epochs, loss for
    loss and leaf for leaf. This needs the loop bookkeeping sidecar
    (epoch counter -> per-epoch shuffle/eval seeds, early-stop window,
    best-val min, history), not just the device state — without it the
    resumed run replays the epoch-0 batch order and re-saves a spurious
    'best'."""
    train, val = datasets
    cfg = small_cfg()
    straight = Trainer(cfg, train, val, val, output_dir=str(tmp_path / "a"),
                       enable_plots=False, seed=3)
    hist_straight = straight.fit(max_epochs=4)

    first = Trainer(cfg, train, val, val, output_dir=str(tmp_path / "b"),
                    enable_plots=False, seed=3)
    first.fit(max_epochs=2)
    first.save_resume_state()

    second = Trainer(cfg, train, val, val, output_dir=str(tmp_path / "b"),
                     enable_plots=False, seed=3)
    second.load_resume_state()
    assert second.epoch == 2
    assert second.min_validation_loss == first.min_validation_loss
    hist_resumed = second.fit(max_epochs=4)

    assert len(hist_resumed["train_loss"]) == 4  # history carried over
    np.testing.assert_allclose(
        hist_resumed["train_loss"], hist_straight["train_loss"], rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(
        hist_resumed["validation_loss"], hist_straight["validation_loss"],
        rtol=1e-5, atol=1e-7,
    )
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(straight.state)),
                    jax.tree_util.tree_leaves(jax.device_get(second.state))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)

    # resuming AT the cap runs zero epochs (no off-by-one extra epoch)
    hist_noop = second.fit(max_epochs=4)
    assert len(hist_noop["train_loss"]) == 4 and second.epoch == 4


def test_resume_degraded_pairs_warn(tmp_path, datasets):
    """A missing or torn (out-of-sync) loop sidecar must not crash or
    silently diverge: the load warns loudly and resets the bookkeeping."""
    import json as _json

    train, val = datasets
    cfg = small_cfg()
    tr = Trainer(cfg, train, val, val, output_dir=str(tmp_path), enable_plots=False, seed=3)
    tr.fit(max_epochs=2)
    tr.save_resume_state()
    sidecar = os.path.join(tr.weights_dir, "train_state_loop.json")
    assert os.path.exists(sidecar)

    # torn pair: sidecar step out of sync with the npz
    with open(sidecar) as f:
        loop = _json.load(f)
    loop["step"] = loop["step"] + 1
    with open(sidecar, "w") as f:
        _json.dump(loop, f)
    tr2 = Trainer(cfg, train, val, val, output_dir=str(tmp_path), enable_plots=False, seed=3)
    with pytest.warns(UserWarning, match="torn checkpoint"):
        tr2.load_resume_state()
    assert tr2.epoch == 0  # bookkeeping reset, weights still loaded
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(tr2.state.params["inc"]["conv1_w"])),
        np.asarray(jax.device_get(tr.state.params["inc"]["conv1_w"])),
    )

    # degraded sidecar: no 'step' key -> cannot be cross-checked against
    # the npz, must be treated like a torn pair (warn + reset), not trusted
    stripped = {k: v for k, v in loop.items() if k != "step"}
    with open(sidecar, "w") as f:
        _json.dump(stripped, f)
    tr2b = Trainer(cfg, train, val, val, output_dir=str(tmp_path), enable_plots=False, seed=3)
    with pytest.warns(UserWarning, match="no 'step' key"):
        tr2b.load_resume_state()
    assert tr2b.epoch == 0

    # missing sidecar: pre-round-4 artifact shape
    os.remove(sidecar)
    tr3 = Trainer(cfg, train, val, val, output_dir=str(tmp_path), enable_plots=False, seed=3)
    with pytest.warns(UserWarning, match="NOT reproduce"):
        tr3.load_resume_state()
    assert tr3.epoch == 0


def test_fine_tune_starting_weights(tmp_path, datasets):
    train, val = datasets
    cfg = small_cfg()
    from gelslim_depth_tpu.models.unet import init_unet

    params, stats = init_unet(jax.random.PRNGKey(7), cfg.unet_config())
    tr = Trainer(cfg, train, val, val, output_dir=str(tmp_path), enable_plots=False,
                 starting_weights=(params, stats))
    np.testing.assert_array_equal(
        np.asarray(tr.state.params["inc"]["conv1_w"]), np.asarray(params["inc"]["conv1_w"])
    )


def test_dp_trainer(tmp_path, datasets):
    from gelslim_depth_tpu.parallel import make_mesh

    train, val = datasets
    cfg = small_cfg(batch_size=8)
    mesh = make_mesh(4)
    tr = Trainer(cfg, train, val, val, output_dir=str(tmp_path), enable_plots=False, mesh=mesh)
    assert tr.scan_epochs  # single-process DP defaults to scan epochs
    hist = tr.fit(max_epochs=3)
    assert len(hist["train_loss"]) == 3
    assert np.isfinite(hist["train_loss"]).all()
    assert hist["train_loss"][-1] < hist["train_loss"][0]

    # the scan-epoch DP path must match the per-batch DP loop
    tr2 = Trainer(cfg, train, val, val, output_dir=str(tmp_path / "loop"),
                  enable_plots=False, mesh=mesh, scan_epochs=False)
    assert not tr2.scan_epochs
    hist2 = tr2.fit(max_epochs=3)
    np.testing.assert_allclose(hist["train_loss"], hist2["train_loss"], rtol=1e-4)
    np.testing.assert_allclose(hist["validation_loss"], hist2["validation_loss"], rtol=1e-4)


def test_plots_emitted(tmp_path, datasets):
    train, val = datasets
    cfg = small_cfg(num_images_to_display_live=2)
    tr = Trainer(cfg, train, val, val, output_dir=str(tmp_path), enable_plots=True)
    tr.fit(max_epochs=1)
    assert os.path.exists(os.path.join(str(tmp_path), "loss_curves", "tiny.png"))
    assert os.path.exists(os.path.join(str(tmp_path), "live_display", "tiny_validation_images.png"))


def test_periodic_resume_checkpoints(tmp_path, datasets):
    train, val = datasets
    cfg = small_cfg()
    tr = Trainer(cfg, train, val, val, output_dir=str(tmp_path), enable_plots=False,
                 resume_every_epochs=2)
    tr.fit(max_epochs=4)
    assert os.path.exists(os.path.join(str(tmp_path), "weights", "train_state.npz"))


def test_scan_epochs_match_per_step_loop(tmp_path, datasets):
    """Epoch-as-one-scan must be loss-for-loss identical to the per-step
    dispatch loop (same seeds -> same permutations -> same math)."""
    train, val = datasets
    losses = {}
    for scan in (False, True):
        cfg = small_cfg(training_learning_rate=3e-3)
        tr = Trainer(cfg, train, val, val, output_dir=str(tmp_path / f"s{scan}"),
                     enable_plots=False, seed=0, scan_epochs=scan)
        losses[scan] = tr.fit(max_epochs=3)["train_loss"]
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-5, atol=1e-6)


def test_channels_last_training_matches_nchw(tmp_path):
    """An NHWC-baked run (no per-step layout transpose in the hot loop)
    must be numerically equivalent to the NCHW default — the transpose at
    bake time is exact and the traced model graph beyond the boundary is
    identical."""
    rng = np.random.RandomState(3)
    objs = [make_synthetic_object(rng, n=8, image_size=(32, 43)) for _ in range(2)]
    val_objs = [make_synthetic_object(rng, n=4, image_size=(32, 43))]
    losses = {}
    for cl in (False, True):
        train = bake_dataset(
            preloaded=objs, use_difference_image=True,
            image_normalization_method="0_255_to_0_1", norm_scale=0.9,
            channels_last=cl,
        )
        val = bake_dataset(
            preloaded=val_objs, use_difference_image=True,
            image_normalization_method="0_255_to_0_1", norm_scale=0.9,
            depth_normalization_parameters=train.depth_normalization_parameters,
            image_normalization_parameters=train.image_normalization_parameters,
            channels_last=cl,
        )
        assert train.tactile_image.shape[-1 if cl else 1] == 3
        cfg = small_cfg(training_learning_rate=3e-3)
        tr = Trainer(cfg, train, val, val, output_dir=str(tmp_path / f"cl{cl}"),
                     enable_plots=False, seed=0)
        losses[cl] = tr.fit(max_epochs=3)
    np.testing.assert_allclose(
        losses[True]["train_loss"], losses[False]["train_loss"], rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(
        losses[True]["validation_loss"], losses[False]["validation_loss"], rtol=1e-5, atol=1e-7
    )


def test_channels_last_layout_mismatch_rejected(tmp_path):
    rng = np.random.RandomState(4)
    objs = [make_synthetic_object(rng, n=4, image_size=(32, 43))]
    a = bake_dataset(preloaded=objs, norm_scale=0.9, channels_last=True)
    b = bake_dataset(preloaded=objs, norm_scale=0.9, channels_last=False)
    with pytest.raises(ValueError, match="layout"):
        Trainer(small_cfg(), a, b, b, output_dir=str(tmp_path), enable_plots=False)


def test_bf16_stored_images_train(tmp_path):
    """bf16-stored tactile images (image_store_dtype) keep stats/targets in
    f32 and still train to a falling loss."""
    rng = np.random.RandomState(5)
    objs = [make_synthetic_object(rng, n=8, image_size=(32, 43)) for _ in range(2)]
    train = bake_dataset(
        preloaded=objs, use_difference_image=True,
        image_normalization_method="0_255_to_0_1", norm_scale=0.9,
        channels_last=True, image_store_dtype=jnp.bfloat16,
    )
    assert train.tactile_image.dtype == jnp.bfloat16
    assert train.depth_image.dtype == jnp.float32
    assert all(np.isfinite(np.asarray(p)).all() for p in train.image_normalization_parameters)
    cfg = small_cfg(training_learning_rate=3e-3)
    tr = Trainer(cfg, train, train, train, output_dir=str(tmp_path),
                 enable_plots=False, seed=0)
    hist = tr.fit(max_epochs=10)
    assert np.isfinite(hist["train_loss"]).all()
    assert hist["train_loss"][-1] < 0.5 * hist["train_loss"][0]


def test_primed_early_stop_semantics(tmp_path, datasets):
    """early_stop_mode='primed' seeds the SMA window with the first val
    loss: flat or decreasing losses never trip the counter (the reference
    zero-window quirk trips at threshold+1 unconditionally, covered by
    test_early_stop_counter), while a genuine sustained rise still stops."""
    train, val = datasets

    def run_sim(mode, losses, window=3, threshold=2):
        cfg = small_cfg(val_loss_SMA_window=window,
                        validation_loss_count_threshold=threshold,
                        early_stop_mode=mode)
        tr = Trainer(cfg, train, val, val, output_dir=str(tmp_path), enable_plots=False)
        for e, L in enumerate(losses):
            tr.epoch = e
            if tr._early_stop_update(L):
                return e  # epoch at which it would stop
        return None

    flat = [0.5] * 20
    falling = [1.0 / (1 + e) for e in range(20)]
    rising = [0.1] * 3 + [0.1 * 1.5 ** e for e in range(17)]

    # reference mode: trips on ANY positive flat/falling loss as the
    # zero-initialized window fills
    assert run_sim("reference", flat) is not None
    # primed mode: no spurious stop on flat or falling loss...
    assert run_sim("primed", flat) is None
    assert run_sim("primed", falling) is None
    # ...but a genuine sustained rise still stops
    assert run_sim("primed", rising) is not None


def test_from_checkpoint_after_epoch_snapshots(tmp_path, datasets):
    """Predictor.from_checkpoint(dir) must resolve the best-val weights in a
    directory that also holds epoch-pinned snapshots (train_indefinitely
    past a save_at_epochs point) — round-1 regression."""
    train, val = datasets
    cfg = small_cfg(train_indefinitely=True, save_at_epochs=[1])
    tr = Trainer(cfg, train, val, val, output_dir=str(tmp_path), enable_plots=False)
    tr.fit(max_epochs=3)
    wdir = os.path.join(str(tmp_path), "weights")
    assert os.path.exists(os.path.join(wdir, "tiny_epoch1.npz"))  # snapshot present
    pred = Predictor.from_checkpoint(wdir)  # formerly: assert len(cands)==1 crash
    assert pred.config.weights_name == "tiny"
    out = pred.predict_depth_from_RGB(np.full((1, 3, 32, 43), 127.0, np.float32), (32, 43))
    assert np.isfinite(np.asarray(out)).all()


def test_checkpoint_name_resolution_rules(tmp_path):
    from gelslim_depth_tpu.train.checkpoint import _resolve_checkpoint_name

    d = str(tmp_path)

    def touch(name):
        open(os.path.join(d, name), "w").write("{}")

    touch("model.json")
    assert _resolve_checkpoint_name(d) == "model"
    touch("model_epoch200.json")
    touch("model_epoch400.json")
    assert _resolve_checkpoint_name(d) == "model"  # bare name wins
    os.remove(os.path.join(d, "model.json"))
    assert _resolve_checkpoint_name(d) == "model_epoch400"  # latest epoch
    touch("other.json")
    import pytest

    with pytest.raises(ValueError, match="ambiguous"):
        _resolve_checkpoint_name(d)


def test_plot_inputs_denormalized_with_frozen_recipe(tmp_path):
    """The live-display input panel must invert the FROZEN normalization
    recipe (VERDICT r3 item 7: the round-3 code rendered img*255, which is
    only correct for 0_255_to_0_1 — a mean_std run saved garbage)."""
    rng = np.random.RandomState(5)
    objs = [make_synthetic_object(rng, n=8, image_size=(32, 43))]
    for method in ("0_255_to_0_1", "mean_std"):
        train = bake_dataset(
            preloaded=objs, use_difference_image=True,
            image_normalization_method=method, norm_scale=0.9,
        )
        cfg = small_cfg(image_normalization_method=method)
        cfg.image_normalization_parameters = train.image_normalization_parameters
        cfg.depth_normalization_parameters = train.depth_normalization_parameters
        tr = Trainer(cfg, train, train, train, output_dir=str(tmp_path / method),
                     enable_plots=False)
        img = np.asarray(train.tactile_image[:2], np.float32)  # normalized NCHW
        shown = tr._display_inputs(img)
        assert shown.dtype == np.uint8
        # inverting the recipe must recover the raw 0-255 tactile values:
        # a mid-gray-ish mean with real spread, not all-black / saturated
        assert 60 < float(shown.mean()) < 200, (method, shown.mean())
        assert float(shown.std()) > 5, (method, shown.std())
