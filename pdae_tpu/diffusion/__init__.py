from .schedules import (DDIMSchedule, Schedule, ddim_steps_from_style, extract,
                        make_betas, make_ddim_schedule, make_schedule, respace)
from .gaussian import GaussianDiffusion
from . import ddim

__all__ = [
    "DDIMSchedule", "Schedule", "GaussianDiffusion", "ddim",
    "ddim_steps_from_style", "extract", "make_betas", "make_ddim_schedule",
    "make_schedule", "respace",
]
