"""Shared utilities: input validation, dtype helpers, normalisation, results.

Replaces the reference's ``decomp/utils/`` package (SURVEY.md §2a rows 5–9).
The reference's ``cp_compat.py`` numpy/cupy dispatch shim has NO equivalent
here by design — the single backend is jax.numpy (BASELINE.json:5).
"""

from decomp_tpu.utils import assertion, checkpoint, dtypes, normalize
from decomp_tpu.utils.checkpoint import CheckpointManager, checkpointed_solve
from decomp_tpu.utils.exceptions import DecompError, ShapeError
from decomp_tpu.utils.result import (
    DictionaryLearningResult,
    LassoResult,
    NMFResult,
)

__all__ = [
    "assertion",
    "checkpoint",
    "CheckpointManager",
    "checkpointed_solve",
    "dtypes",
    "normalize",
    "DecompError",
    "ShapeError",
    "LassoResult",
    "NMFResult",
    "DictionaryLearningResult",
]
