from .mesh import (DATA_AXIS, DCN_AXIS, ICI_AXIS, MODEL_AXIS, SPATIAL_AXIS,
                   ambient_mesh,
                   constrain_batch, constrain_spatial, data_sharding,
                   fsdp_sharding, fsdp_shardings,
                   fsdp_tp_sharding, fsdp_tp_shardings, local_mesh,
                   make_hier_mesh, make_mesh, make_sp_mesh, make_tp_mesh,
                   mesh_data_axes,
                   pad_shard_batch, replicate,
                   replicated, shard_batch, shard_tree_fsdp, shard_tree_tp,
                   tp_sharding, tp_shardings)
from .spmd_guard import (SpmdDegradationError, capture_stderr_fd,
                         spmd_degradation_check)
from .dist import (dispatch_num_samples_for_process, gather_objects,
                   host_copy_tree,
                   init_distributed, is_primary, process_count, process_index,
                   process_shard_indices, sync_global_devices)

__all__ = [
    "DATA_AXIS", "DCN_AXIS", "ICI_AXIS", "MODEL_AXIS", "SPATIAL_AXIS",
    "ambient_mesh",
    "constrain_batch", "constrain_spatial", "data_sharding",
    "fsdp_sharding",
    "fsdp_shardings", "fsdp_tp_sharding", "fsdp_tp_shardings", "local_mesh", "make_hier_mesh", "make_mesh",
    "make_sp_mesh", "make_tp_mesh",
    "mesh_data_axes", "pad_shard_batch", "replicate", "replicated",
    "shard_batch", "shard_tree_fsdp", "shard_tree_tp", "tp_sharding",
    "tp_shardings",
    "dispatch_num_samples_for_process", "gather_objects",
    "host_copy_tree",
    "init_distributed", "is_primary", "process_count", "process_index",
    "process_shard_indices", "sync_global_devices",
    "SpmdDegradationError", "capture_stderr_fd", "spmd_degradation_check",
]
