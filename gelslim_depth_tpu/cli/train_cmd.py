"""`train` command — flag-compatible rebuild of train_utils/train_unet.py.

Replicates the reference's object-list assembly (ref :110-192):
- train objects = listdir(train_data/), minus names listed in
  validation_objects.txt and test_objects.txt (those files EXCLUDE from
  the train list and from each other's lists);
- real_data inclusion lists ({train,validation,test}_real_objects.txt);
- --exclude_objects substring filtering (implemented as a proper filter,
  not the reference's mutate-while-iterating loop);
- the reference's `limit_object_lists = 1` debug leftover (:68,186-192) —
  which silently truncates every split to one object — is NOT replicated;
  use --limit_objects N explicitly for that behavior.
"""

from __future__ import annotations

import argparse
import os


def parse_args(argv):
    p = argparse.ArgumentParser(prog="gelslim-depth-tpu train",
                                description="Train a tactile depth estimation U-Net on TPU.")
    p.add_argument("weights_name", type=str, help="Name for the weights")
    p.add_argument("gpu", type=str, nargs="?", default="0",
                   help="Reference-compatible device string: 'cpu'/'tpu' pin "
                        "the platform; CUDA ordinals are ignored on TPU")
    p.add_argument("--exclude_objects", nargs="+", help="List of objects to exclude")
    p.add_argument("--activation_func", type=str, default="relu", choices=["relu", "tanh", "mish"])
    p.add_argument("--train_indefinitely", action="store_true")
    p.add_argument("--use_difference_image", action="store_true")
    p.add_argument("--max_datapoints_per_object", type=int)
    p.add_argument("--starting_weights", type=str, help="Fine-tune from this weights name")
    p.add_argument("--data_path", type=str, default=None, help="Override GELSLIM_DATA_PATH")
    p.add_argument("--output_dir", type=str, default="train_output")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--learning_rate", type=float, default=1e-3)
    p.add_argument("--max_epochs", type=int, default=None)
    p.add_argument("--limit_objects", type=int, default=None,
                   help="Debug: truncate every object list to N entries")
    p.add_argument("--data_parallel", action="store_true",
                   help="Shard training over all devices (all chips of the "
                        "pod slice when launched multi-process)")
    p.add_argument("--coordinator_address", type=str, default=None,
                   help="Multi-host: <host0>:<port> of process 0 "
                        "(jax.distributed coordinator). On Cloud TPU pod "
                        "slices this can be omitted — autodetected.")
    p.add_argument("--num_processes", type=int, default=None,
                   help="Multi-host: total number of processes (hosts)")
    p.add_argument("--process_id", type=int, default=None,
                   help="Multi-host: this host's process index")
    p.add_argument("--bf16", action="store_true", help="bfloat16 compute")
    p.add_argument("--shard_dataset", action="store_true",
                   help="Multi-host: each process bakes only its shard of "
                        "the object files (round-robin) instead of "
                        "replicating the dataset on every host; "
                        "normalization statistics are reduced globally. "
                        "Batch composition becomes process-local shuffle.")
    p.add_argument("--channels_last", action="store_true",
                   help="Bake the datasets NHWC (TPU conv layout) so the "
                        "hot loop pays no per-step layout transpose; "
                        "numerically equivalent to the NCHW default")
    p.add_argument("--bf16_data", action="store_true",
                   help="Store baked tactile images as bfloat16 (halves "
                        "their HBM footprint and gather traffic); "
                        "statistics and depth targets stay float32")
    p.add_argument("--plots", action="store_true",
                   help="live matplotlib triptychs + loss curves per epoch "
                        "(the reference's always-on behavior; costs an extra "
                        "compiled program shape)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize DoubleConv blocks (jax.checkpoint) "
                        "for larger batches")
    p.add_argument("--resume", action="store_true",
                   help="continue from <output_dir>/weights/train_state.npz")
    p.add_argument("--dims", type=int, nargs="+", default=[64, 128, 256, 512, 1024])
    p.add_argument("--downsample_factor", type=float, default=0.5)
    p.add_argument("--early_stop_mode", choices=["reference", "primed"], default="reference",
                   help="'reference' keeps the reference's zero-initialized "
                        "SMA window (stops after ~threshold+1 epochs unless "
                        "--train_indefinitely); 'primed' seeds the window "
                        "with the first validation loss so early stop fires "
                        "only on a real upward trend")
    return p.parse_args(argv)


def _read_list(path, suffix=".pt"):
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [line + suffix for line in f.read().splitlines() if line.strip()]


def assemble_object_lists(dataset_path: str, exclude_objects=None, limit=None):
    """(train, val, test, real_train, real_val, real_test) file lists with
    the reference's exclusion/suffix rules."""
    train = [f.replace("_train.pt", ".pt") for f in sorted(os.listdir(os.path.join(dataset_path, "train_data")))]
    val_excl = _read_list(os.path.join(dataset_path, "validation_objects.txt"))
    test_excl = _read_list(os.path.join(dataset_path, "test_objects.txt"))
    val = [f for f in train if f not in test_excl]
    test = [f for f in train if f not in val_excl]
    train = [f for f in train if f not in val_excl and f not in test_excl]
    if exclude_objects:
        def keep(lst):
            return [f for f in lst if not any(name in f for name in exclude_objects)]

        train, val, test = keep(train), keep(val), keep(test)
    train = [f[:-3] + "_train.pt" for f in train]
    val = [f[:-3] + "_val.pt" for f in val]
    test = [f[:-3] + "_test.pt" for f in test]
    rd = os.path.join(dataset_path, "real_data")
    real_train = _read_list(os.path.join(rd, "train_real_objects.txt"))
    real_val = _read_list(os.path.join(rd, "validation_real_objects.txt"))
    real_test = _read_list(os.path.join(rd, "test_real_objects.txt"))
    lists = [train, val, test, real_train, real_val, real_test]
    if limit:
        lists = [lst[:limit] for lst in lists]
    return tuple(lists)


def run(argv):
    args = parse_args(argv)
    from gelslim_depth_tpu.utils import pin_platform

    pin_platform(args.gpu)  # 'cpu' keeps the run off the accelerator
    # multi-host init must precede ANY backend-touching JAX call
    # (parallel/multihost.py contract; SURVEY.md section 5.8)
    from gelslim_depth_tpu.parallel import multihost

    multihost.initialize(
        coordinator_address=args.coordinator_address,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    import jax
    import jax.numpy as jnp

    from gelslim_depth_tpu.config import GelslimConfig
    from gelslim_depth_tpu.data.dataset import bake_dataset
    from gelslim_depth_tpu.train import Trainer, load_checkpoint

    dataset_path = args.data_path
    if dataset_path is None:
        from gelslim_depth_tpu import main_config

        dataset_path = main_config.DATA_PATH

    train_o, val_o, test_o, rtrain_o, rval_o, rtest_o = assemble_object_lists(
        dataset_path, args.exclude_objects, args.limit_objects
    )
    config = GelslimConfig(
        weights_name=args.weights_name,
        dataset_path=dataset_path + "/",
        exclude_objects=args.exclude_objects or [],
        batch_size=args.batch_size,
        training_learning_rate=args.learning_rate,
        train_indefinitely=args.train_indefinitely,
        early_stop_mode=args.early_stop_mode,
        use_difference_image=args.use_difference_image,
        activation_func=args.activation_func,
        CNN_dimensions=tuple(args.dims),
        downsample_factor=args.downsample_factor,
        image_normalization_method="0_255_to_0_1",
        depth_normalization_method="min_max_to_0_-1",
        norm_scale=0.9,
        train_objects=train_o,
        validation_objects=val_o,
        test_objects=test_o,
        real_train_objects=rtrain_o,
        real_validation_objects=rval_o,
        real_test_objects=rtest_o,
    )

    common = dict(
        use_difference_image=args.use_difference_image,
        image_normalization_method=config.image_normalization_method,
        depth_normalization_method=config.depth_normalization_method,
        norm_scale=config.norm_scale,
        downsample_factor=args.downsample_factor,
        depth_image_blur_kernel=config.depth_image_blur_kernel,
        max_datapoints_per_object=args.max_datapoints_per_object,
        interp_method=config.interp_method,
        channels_last=args.channels_last,
        image_store_dtype=jnp.bfloat16 if args.bf16_data else None,
    )
    sharded = False
    if args.shard_dataset:
        pc, pi = jax.process_count(), jax.process_index()
        if pc > 1:
            sharded = True
            shard = lambda lst: lst[pi::pc]
            if not shard(train_o) and not shard(rtrain_o):
                raise SystemExit(
                    f"--shard_dataset: process {pi} of {pc} would receive no "
                    f"train files ({len(train_o)} objects total); use the "
                    f"replicated default for datasets this small"
                )
            train_o, val_o, test_o = shard(train_o), shard(val_o), shard(test_o)
            rtrain_o, rval_o, rtest_o = shard(rtrain_o), shard(rval_o), shard(rtest_o)
            from gelslim_depth_tpu.parallel.multihost import global_dataset_stats

            common["stats_reduce"] = global_dataset_stats
        else:
            print("--shard_dataset ignored: single process")
    print(f"Baking train set ({len(train_o)} objects + {len(rtrain_o)} real)...")
    train_ds = bake_dataset(
        os.path.join(dataset_path, "train_data"), train_o,
        os.path.join(dataset_path, "real_data"), rtrain_o, **common,
    )
    print(f"Found {len(train_ds)} training points")
    norm = dict(
        depth_normalization_parameters=train_ds.depth_normalization_parameters,
        image_normalization_parameters=train_ds.image_normalization_parameters,
    )
    val_ds = bake_dataset(
        os.path.join(dataset_path, "validation_data"), val_o,
        os.path.join(dataset_path, "real_data"), rval_o, **common, **norm,
    )
    print(f"Found {len(val_ds)} validation points")
    test_ds = bake_dataset(
        os.path.join(dataset_path, "test_data"), test_o,
        os.path.join(dataset_path, "real_data"), rtest_o, **common, **norm,
    )
    print(f"Found {len(test_ds)} test points")

    starting = None
    if args.starting_weights:
        _, params, stats = load_checkpoint(
            os.path.join(args.output_dir, "weights"), args.starting_weights
        )
        starting = (params, stats)

    mesh = None
    if args.data_parallel:
        from gelslim_depth_tpu.parallel import make_mesh

        mesh = make_mesh()
        print(f"Data-parallel over {mesh.devices.size} devices")

    trainer = Trainer(
        config, train_ds, val_ds, test_ds,
        output_dir=args.output_dir,
        mesh=mesh,
        compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        starting_weights=starting,
        enable_plots=args.plots,
        remat=args.remat,
        dataset_sharding="sharded" if sharded else "replicated",
    )
    if args.resume:
        trainer.load_resume_state()
        print(f"resumed from step {int(trainer.state.step)} (epoch {trainer.epoch})")
    trainer.fit(max_epochs=args.max_epochs)
    trainer.save_resume_state()
    return 0
