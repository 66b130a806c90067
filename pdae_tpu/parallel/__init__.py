from .mesh import (DATA_AXIS, data_sharding, local_mesh, make_mesh,
                   pad_shard_batch, replicate, replicated, shard_batch)
from .dist import (dispatch_num_samples_for_process, gather_objects,
                   init_distributed, is_primary, process_count, process_index,
                   process_shard_indices, sync_global_devices)

__all__ = [
    "DATA_AXIS", "data_sharding", "local_mesh", "make_mesh",
    "pad_shard_batch", "replicate", "replicated", "shard_batch",
    "dispatch_num_samples_for_process", "gather_objects",
    "init_distributed", "is_primary", "process_count", "process_index",
    "process_shard_indices", "sync_global_devices",
]
