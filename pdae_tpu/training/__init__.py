from .base import BaseTrainer, Logger, Meters
from .partition import merge_params, split_params, split_shift_unet
from .regular import RegularDiffusionTrainer
from .state import TrainState, ema_update, make_optimizer, maybe_ema_update

__all__ = [
    "BaseTrainer", "Logger", "Meters", "merge_params", "split_params",
    "split_shift_unet", "RegularDiffusionTrainer", "TrainState", "ema_update",
    "make_optimizer", "maybe_ema_update",
]
