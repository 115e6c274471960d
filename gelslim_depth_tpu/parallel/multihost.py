"""Multi-host (multi-process) utilities.

The reference is strictly single-process (SURVEY.md section 5.8). For pod
slices, JAX's runtime contract is: one process per host, each host feeds
its local shard of the global batch, and globally-sharded jax.Arrays are
assembled from process-local data. These helpers wrap that contract:

- initialize(): jax.distributed.initialize() guarded so single-process
  (and test) runs are no-ops.
- global_batch_from_local(mesh, local_batch): wraps
  jax.make_array_from_process_local_data — each process passes only its
  own samples; the result is one global array sharded over the mesh's
  'data' axis with collectives riding ICI.
- process_local_indices(n, batch): the deterministic split of a global
  index range across processes, for per-host dataset sharding.

Single-process behavior degrades to plain shard_batch, which is what the
tests (8 virtual devices, 1 process) exercise; multi-host execution uses
the same code path with process_count > 1.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None, **kw) -> None:
    """jax.distributed.initialize, tolerant of single-process runs."""
    if jax.process_count() > 1:
        return  # already initialized
    if coordinator_address is None:
        return  # single process: nothing to do
    jax.distributed.initialize(coordinator_address=coordinator_address, **kw)


def process_local_indices(n_global: int, *, process_index: Optional[int] = None) -> np.ndarray:
    """Contiguous per-process slice of range(n_global) (last process takes
    the remainder)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count()
    per = n_global // pc
    start = pi * per
    end = n_global if pi == pc - 1 else start + per
    return np.arange(start, end)


def global_batch_from_local(mesh: Mesh, local_batch, axis_name: str = "data"):
    """Assemble a globally batch-sharded jax.Array from each process's
    local shard (jax.make_array_from_process_local_data)."""
    sharding = NamedSharding(mesh, P(axis_name, *([None] * (np.ndim(local_batch) - 1))))
    return jax.make_array_from_process_local_data(sharding, np.asarray(local_batch))
