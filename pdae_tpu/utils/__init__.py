from .config import (load_json, load_pickle, load_yaml,
                     overlay_eval_dataset_config, parse_adam_betas, save_json,
                     save_pickle, save_yaml)
from .checkpoint import (checkpoint_paths, load_checkpoint, merge_partial,
                         restore_into, save_checkpoint, snapshot_path)
from .image import (from_uint8, make_grid, paste_rows, save_image_grid,
                    to_uint8)
from .rng import BASE_SEED, init_key, process_key, step_key

__all__ = [
    "load_json", "load_pickle", "load_yaml", "overlay_eval_dataset_config",
    "parse_adam_betas", "save_json", "save_pickle", "save_yaml",
    "checkpoint_paths", "load_checkpoint", "merge_partial", "restore_into",
    "save_checkpoint", "snapshot_path", "from_uint8", "make_grid",
    "paste_rows", "save_image_grid", "to_uint8", "BASE_SEED", "init_key",
    "process_key", "step_key",
]
