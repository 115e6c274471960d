"""Multi-host (multi-process) execution: pod-slice data-parallel training.

The reference is strictly single-process (SURVEY.md section 5.8, ref
train_utils/train_unet.py:194 — one CUDA device string, no torch.distributed
anywhere). On TPU pod slices JAX's runtime contract is: one process per
host, `jax.distributed.initialize()` BEFORE any backend touch, each host
feeds only its local shard of the global batch, and globally-sharded
jax.Arrays are assembled from process-local data. These helpers implement
that contract; `train/loop.py` consumes them automatically whenever
`jax.process_count() > 1` (see Trainer._global_batches), and the train CLI
exposes `--coordinator_address/--num_processes/--process_id`.

Launch recipe (one command per host of the slice; on Cloud TPU the three
flags can be omitted — jax.distributed autodetects from the metadata
server):

    gelslim-depth-tpu train <name> 0 --data_parallel \
        --coordinator_address <host0>:8476 \
        --num_processes <n_hosts> --process_id <this_host>

Collectives (gradient psum, global batch-norm reductions) ride ICI within
the slice — they are inserted by XLA from the NamedSharding annotations in
parallel/mesh.py; there is nothing NCCL-like to configure.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def is_initialized() -> bool:
    """True when jax.distributed has been initialized in this process.

    Reads the distributed client state — deliberately NOT via
    jax.process_count(), which would *initialize the backend* as a side
    effect and thereby make a later jax.distributed.initialize impossible
    (the round-1 bug in this module's guard). Prefers the public
    jax.distributed.is_initialized with a private-state fallback for
    older releases."""
    fn = getattr(jax.distributed, "is_initialized", None)
    if fn is not None:
        return bool(fn())
    from jax._src import distributed

    return distributed.global_state.client is not None


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    **kw,
) -> None:
    """jax.distributed.initialize, tolerant of single-process runs.

    Must be called before any JAX backend use (device queries, jit, ...).
    With no arguments it still calls jax.distributed.initialize when the
    environment carries coordination config — JAX_COORDINATOR_ADDRESS,
    SLURM, or a Cloud TPU pod-slice worker env (TPU_WORKER_HOSTNAMES /
    TPU_WORKER_ID, where jax autodetects the rest from the metadata
    server); with neither arguments nor any of those markers it is a
    no-op, which is what single-process tests and the single-chip CLI
    paths exercise. Passing num_processes/process_id WITHOUT a
    coordinator_address is an error rather than a silent drop: the
    degraded alternative is N independent single-host runs that
    double-write checkpoints."""
    if is_initialized():
        return
    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            **kw,
        )
        return
    if num_processes is not None or process_id is not None:
        raise ValueError(
            "multihost.initialize: num_processes/process_id were given "
            "without coordinator_address — refusing to silently fall back "
            "to single-process mode. Pass coordinator_address=<host0>:<port> "
            "(or rely on Cloud TPU/SLURM autodetection with no arguments)."
        )
    import os

    markers = (
        "JAX_COORDINATOR_ADDRESS",
        "SLURM_JOB_ID",
        "TPU_WORKER_HOSTNAMES",
        "TPU_WORKER_ID",
    )
    if any(v in os.environ for v in markers):
        # best-effort: the markers are hints, not proof of a pod slice
        # (single-host TPU terminals also set TPU_WORKER_*). Swallow ONLY
        # the two benign outcomes — autodetection cannot assemble a
        # coordinator from the env (ValueError), or the backend is already
        # up in this process (the specific 'must be called before'
        # RuntimeError from library use after jax started). Genuine
        # cluster-init failures (coordinator unreachable, barrier timeout)
        # re-raise: silently degrading a real pod slice to N independent
        # trainings corrupts the run.
        # TPU_WORKER_HOSTNAMES listing SEVERAL hosts is proof of a real
        # pod slice, not a hint: degrading there would yield N independent
        # trainings all believing they are process 0 (double-writing
        # checkpoints). Only single-host/SLURM-ambiguous environments get
        # the warn-and-continue treatment.
        hostnames = [
            h for h in os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",") if h.strip()
        ]
        definitely_multihost = len(hostnames) > 1

        def _warn(e):
            if definitely_multihost:
                raise RuntimeError(
                    f"multihost.initialize: TPU_WORKER_HOSTNAMES names "
                    f"{len(hostnames)} workers but jax.distributed did not "
                    f"initialize ({e}); refusing to run this pod slice as "
                    f"independent single-process trainings. Pass "
                    f"coordinator_address explicitly."
                ) from e
            import warnings

            warnings.warn(
                f"multihost.initialize: environment suggests a cluster "
                f"({[v for v in markers if v in os.environ]}) but "
                f"jax.distributed autodetection did not engage ({e}); "
                f"continuing single-process. Pass coordinator_address "
                f"explicitly for pod-slice runs."
            )

        try:
            jax.distributed.initialize(**kw)
        except ValueError as e:
            _warn(e)
        except RuntimeError as e:
            if "must be called before" in str(e):
                _warn(e)
            else:
                raise


def process_local_indices(n_global: int, *, process_index: Optional[int] = None) -> np.ndarray:
    """Contiguous per-process slice of range(n_global) (last process takes
    the remainder). For per-host dataset sharding when the dataset is too
    large to replicate host-side; the Trainer's default multi-host path
    replicates the baked dataset instead (a few GB) so that global batch
    composition — and therefore training math — is bit-identical to the
    single-process run."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count()
    per = n_global // pc
    start = pi * per
    end = n_global if pi == pc - 1 else start + per
    return np.arange(start, end)


def process_local_rows(
    global_batch_size: int,
    *,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> slice:
    """The contiguous row-slice of a global batch that THIS process feeds.

    jax.devices() orders devices by process index, and parallel/mesh.py
    builds its 1-D mesh in that order, so the global batch's leading axis
    is laid out process 0's rows first. Requires the global batch to divide
    evenly across processes (the Trainer pads batches to a multiple of the
    global device count, and the process count divides the device count)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    if global_batch_size % pc:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by {pc} processes"
        )
    per = global_batch_size // pc
    return slice(pi * per, (pi + 1) * per)


def global_dataset_stats(tactile_local: np.ndarray, depth_local: np.ndarray):
    """Dataset-GLOBAL normalization statistics from per-process shards.

    Each process passes its raw (pre-normalization) baked arrays
    (tactile (n_local, C, h, w) or NHWC, depth (n_local, 1, h, w) likewise);
    partial moments (count, sum, sum-of-squares, min, max) are allgathered
    over jax.distributed and combined, so every process freezes IDENTICAL
    statistics equal to the moments of the union dataset. Matches
    bake_dataset's conventions: depth (min, max, mean, unbiased std) over
    all values, image per-channel lists. The unbiased std comes from the
    two-pass-equivalent moment formula in float64 — equal to numpy's
    ddof=1 result up to f64 rounding (not bit-identical to a single-host
    np.std, which uses a different summation order).

    Single-process: degenerates to local statistics (no collectives).
    For per-host sharded baking (the dataset too large to replicate),
    pass the result into bake_dataset via stats_reduce."""
    # channel axis: detect layout by which of dims 1/3 is smallest (bake
    # stores NCHW or NHWC); tactile has 3 channels, depth 1
    def chan_axis(arr):
        return 1 if arr.shape[1] <= arr.shape[-1] else arr.ndim - 1

    ct = chan_axis(tactile_local)
    c = tactile_local.shape[ct]
    tac = np.moveaxis(tactile_local, ct, 1).astype(np.float64)
    dep = depth_local.astype(np.float64)

    parts = []
    for i in range(c):
        x = tac[:, i]
        parts.append([x.size, x.sum(), np.square(x).sum(), x.min(), x.max()])
    parts.append([dep.size, dep.sum(), np.square(dep).sum(), dep.min(), dep.max()])
    local = np.asarray(parts, np.float64)  # (c+1, 5)

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        gathered = np.asarray(multihost_utils.process_allgather(local))  # (P, c+1, 5)
    else:
        gathered = local[None]

    def combine(rows):  # rows: (P, 5) -> (min, max, mean, unbiased std)
        n = rows[:, 0].sum()
        s = rows[:, 1].sum()
        sq = rows[:, 2].sum()
        mean = s / n
        var = (sq - n * mean * mean) / (n - 1)
        return float(rows[:, 3].min()), float(rows[:, 4].max()), float(mean), float(np.sqrt(max(var, 0.0)))

    img = [combine(gathered[:, i]) for i in range(c)]
    dmin, dmax, dmean, dstd = combine(gathered[:, c])
    image_params = (
        [v[0] for v in img], [v[1] for v in img], [v[2] for v in img], [v[3] for v in img],
    )
    return (dmin, dmax, dmean, dstd), image_params


def global_batch_from_local(mesh: Mesh, local_batch, axis_name: str = "data"):
    """Assemble a globally batch-sharded jax.Array from each process's
    local shard (jax.make_array_from_process_local_data). Each process
    passes ONLY its own rows; the result behaves like one (global_bs, ...)
    array sharded over the mesh's data axis."""
    sharding = NamedSharding(mesh, P(axis_name, *([None] * (np.ndim(local_batch) - 1))))
    return jax.make_array_from_process_local_data(sharding, np.asarray(local_batch))
