from gelslim_depth_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_batch,
    make_dp_train_step,
    make_dp_eval_step,
    make_dp_predict,
    make_dp_fused_predictor,
    make_dp_fused_predictor_int8,
    make_dp_renderer,
    make_spatial_predictor,
    make_spatial_predictor_int8,
)

__all__ = [
    "make_mesh",
    "replicate",
    "shard_batch",
    "make_dp_train_step",
    "make_dp_eval_step",
    "make_dp_predict",
    "make_dp_fused_predictor",
    "make_dp_fused_predictor_int8",
    "make_dp_renderer",
    "make_spatial_predictor",
    "make_spatial_predictor_int8",
]

from gelslim_depth_tpu.parallel.multihost import (
    initialize,
    is_initialized,
    process_local_indices,
    process_local_rows,
    global_batch_from_local,
)

__all__ += [
    "initialize",
    "is_initialized",
    "process_local_indices",
    "process_local_rows",
    "global_batch_from_local",
]
