from .cache import cpu_cache_dir, host_cpu_fingerprint
from .config import (apply_overrides, load_json, load_pickle, load_yaml,
                     overlay_eval_dataset_config, parse_adam_betas, save_json,
                     save_pickle, save_yaml)
from .checkpoint import (checkpoint_paths, load_checkpoint, merge_partial,
                         restore_into, save_checkpoint, snapshot_path)
from .sharded_checkpoint import (extract_local_shards, is_sharded_checkpoint,
                                 load_sharded_checkpoint, manifest_skeleton,
                                 save_sharded_checkpoint, write_manifest,
                                 write_shard_file)
from .image import (from_uint8, make_grid, paste_rows, save_image_grid,
                    to_uint8, x0_from_transfer)
from .rng import BASE_SEED, init_key, process_key, step_key

__all__ = [
    "cpu_cache_dir", "host_cpu_fingerprint",
    "apply_overrides", "load_json", "load_pickle", "load_yaml",
    "overlay_eval_dataset_config",
    "parse_adam_betas", "save_json", "save_pickle", "save_yaml",
    "checkpoint_paths", "load_checkpoint", "merge_partial", "restore_into",
    "save_checkpoint", "snapshot_path",
    "extract_local_shards", "is_sharded_checkpoint",
    "load_sharded_checkpoint", "manifest_skeleton",
    "save_sharded_checkpoint", "write_manifest", "write_shard_file",
    "from_uint8", "make_grid",
    "paste_rows", "save_image_grid", "to_uint8", "x0_from_transfer",
    "BASE_SEED", "init_key",
    "process_key", "step_key",
]
