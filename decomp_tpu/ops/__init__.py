"""Compute building blocks: solver loop, proximal ops, spectral estimates,
masked/Pallas kernels (SURVEY.md §1 layers L1.5'/L2')."""

from decomp_tpu.ops.complex_split import SplitComplex
from decomp_tpu.ops.loop import IterationResult, run_iterations
from decomp_tpu.ops.soft_threshold import soft_threshold
from decomp_tpu.ops.spectral import lipschitz_gram, spectral_norm_psd

__all__ = [
    "SplitComplex",
    "run_iterations",
    "IterationResult",
    "soft_threshold",
    "spectral_norm_psd",
    "lipschitz_gram",
]
