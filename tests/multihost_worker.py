"""Worker process for the 2-process jax.distributed trainer test.

Each worker pins a 2-virtual-device CPU backend with gloo cross-process
collectives, joins the coordination service through
parallel.multihost.initialize (the guard under test: it must run BEFORE
any backend-touching call or the process is stuck single-process), builds
the same deterministic synthetic datasets as the single-process baseline,
and trains the DP Trainer over the 4-device global mesh for 2 epochs.

Also importable by the test itself for the dataset/config builders so the
baseline and the workers share one definition.
"""

import json
import os
import sys


DIMS = (8, 16)
IMAGE_SIZE = (32, 43)
MAX_EPOCHS = 2


def build_config():
    from gelslim_depth_tpu.config import GelslimConfig

    return GelslimConfig(
        weights_name="mh",
        CNN_dimensions=DIMS,
        batch_size=8,
        input_tactile_image_size=(16, 21),
        image_normalization_method="0_255_to_0_1",
        depth_normalization_method="min_max_to_0_-1",
        norm_scale=0.9,
        use_difference_image=True,
        val_loss_SMA_window=3,
        validation_loss_count_threshold=20,
    )


def make_all_objects():
    """The canonical object list every path shares. DELIBERATELY uneven
    sample counts (9 / 5 / 9 / 7) so round-robin sharding gives the two
    processes different shard sizes, exercising the sharded trainer's
    cross-process step-count sync and masked tail padding."""
    import numpy as np

    from gelslim_depth_tpu.data.synthetic import make_synthetic_object

    rng = np.random.RandomState(7)
    return [
        make_synthetic_object(rng, n=n, image_size=IMAGE_SIZE)
        for n in (9, 5, 9, 7)
    ], [make_synthetic_object(rng, n=n, image_size=IMAGE_SIZE) for n in (5, 4)]


def build_datasets(shard=None):
    """shard=(process_index, process_count) bakes ONLY that process's
    round-robin slice of the objects, with globally-reduced statistics
    (the per-host sharded-dataset mode); None bakes everything
    (replicated mode)."""
    from gelslim_depth_tpu.data.dataset import bake_dataset

    objs, val_objs = make_all_objects()
    kw = {}
    if shard is not None:
        pi, pc = shard
        objs = objs[pi::pc]
        val_objs = val_objs[pi::pc]
        from gelslim_depth_tpu.parallel.multihost import global_dataset_stats

        kw["stats_reduce"] = global_dataset_stats
        # the sharded run also exercises the NHWC bake: buffers/steps are
        # layout-threaded, so this doubles as the multihost channels_last
        # proof at zero extra test cost
        kw["channels_last"] = True
    train = bake_dataset(
        preloaded=objs, use_difference_image=True,
        image_normalization_method="0_255_to_0_1", norm_scale=0.9, **kw,
    )
    val = bake_dataset(
        preloaded=val_objs, use_difference_image=True,
        image_normalization_method="0_255_to_0_1", norm_scale=0.9,
        depth_normalization_parameters=train.depth_normalization_parameters,
        image_normalization_parameters=train.image_normalization_parameters,
        channels_last=kw.get("channels_last", False),
    )
    return train, val


def run_trainer(mesh, output_dir, sharded=False):
    import jax

    from gelslim_depth_tpu.train import Trainer

    shard = (jax.process_index(), jax.process_count()) if sharded else None
    train_ds, val_ds = build_datasets(shard=shard)
    trainer = Trainer(
        build_config(), train_ds, val_ds, val_ds,
        output_dir=output_dir, mesh=mesh, enable_plots=False,
        dataset_sharding="sharded" if sharded else "replicated",
    )
    history = trainer.fit(max_epochs=MAX_EPOCHS)
    return trainer, history


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = int(sys.argv[3])
    out_json = sys.argv[4]
    workdir = sys.argv[5]
    sharded = len(sys.argv) > 6 and sys.argv[6] == "sharded"

    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    # the env var alone is not honored when the axon TPU plugin is
    # installed (tests/conftest.py:8-18) — pin through jax.config too
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from gelslim_depth_tpu.parallel import make_mesh, multihost

    assert not multihost.is_initialized()
    multihost.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert multihost.is_initialized()
    # a second call must be a no-op, not a crash
    multihost.initialize(coordinator_address=f"localhost:{port}")

    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 2 * nproc
    assert len(jax.local_devices()) == 2

    mesh = make_mesh()
    assert mesh.devices.size == 2 * nproc

    trainer, history = run_trainer(mesh, os.path.join(workdir, f"proc{pid}"), sharded=sharded)
    assert trainer.multihost
    assert trainer.is_main == (pid == 0)
    if sharded:
        assert trainer.sharded and trainer.scan_epochs
        history = dict(history)
        # the frozen statistics must be the GLOBAL (union) moments,
        # identical on every process — record them for the test to check
        history["depth_norm_params"] = list(trainer.config.depth_normalization_parameters)
        history["n_local"] = len(trainer.train_ds)

    with open(out_json, "w") as f:
        json.dump(history, f)


if __name__ == "__main__":
    main()
