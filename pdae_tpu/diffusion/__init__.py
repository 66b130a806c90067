from .schedules import (DDIMSchedule, Schedule, ddim_steps_from_style, extract,
                        make_betas, make_ddim_schedule, make_schedule, respace)
from .gaussian import GaussianDiffusion
from . import ddim
from . import dpm_solver

__all__ = [
    "DDIMSchedule", "Schedule", "GaussianDiffusion", "ddim", "dpm_solver",
    "ddim_steps_from_style", "extract", "make_betas", "make_ddim_schedule",
    "make_schedule", "respace",
]
