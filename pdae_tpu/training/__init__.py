from .base import BaseTrainer, Logger, Meters
from .latent import LatentDiffusionTrainer
from .manipulation import ManipulationTrainer
from .partition import merge_params, split_params, split_shift_unet
from .regular import RegularDiffusionTrainer
from .representation import RepresentationLearningTrainer
from .state import TrainState, ema_update, make_optimizer, maybe_ema_update

__all__ = [
    "BaseTrainer", "Logger", "Meters", "merge_params", "split_params",
    "split_shift_unet", "RegularDiffusionTrainer",
    "RepresentationLearningTrainer", "LatentDiffusionTrainer",
    "ManipulationTrainer", "TrainState", "ema_update", "make_optimizer",
    "maybe_ema_update",
]
