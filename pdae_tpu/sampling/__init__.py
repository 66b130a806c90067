from .context import SamplerContext
from .samplers import (SAMPLERS, AutoencodingEval, AutoencodingExample,
                       BaseSampler, DenoiseOneStep, GapMeasure, InferLatents,
                       Interpolation, Manipulation, TestDPMs,
                       UnconditionalSample)

__all__ = [
    "SamplerContext", "SAMPLERS", "AutoencodingEval", "AutoencodingExample",
    "BaseSampler", "DenoiseOneStep", "GapMeasure", "InferLatents",
    "Interpolation", "Manipulation", "TestDPMs", "UnconditionalSample",
]
