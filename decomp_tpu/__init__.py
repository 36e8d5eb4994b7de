"""decomp_tpu — TPU-native matrix decomposition library.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of fujii-team/deComP
(reference structure documented in SURVEY.md §1–§3; binding capability spec in
BASELINE.json:5):

- ``decomp_tpu.lasso``                — L1-regularised least squares (ISTA /
  FISTA / accelerated ISTA / coordinate descent), real & complex dtypes,
  batched over rows, optional missing-value mask.
- ``decomp_tpu.nmf``                  — non-negative matrix factorisation via
  multiplicative updates (L2 and KL), masked and minibatch variants.
- ``decomp_tpu.dictionary_learning``  — alternating sparse-code / dictionary
  updates with unit-norm atoms, masked and minibatch (online) variants.
- ``decomp_tpu.parallel``             — mesh-sharded solvers (``shard_map``
  over a TPU mesh, ICI-allreduced Gram terms; SURVEY.md §2b N5/N6).

Design notes (SURVEY.md §1 "Layer map of the REBUILD"): there is no backend
dispatch layer — everything is ``jax.numpy``; solver iteration loops are
``jax.lax.while_loop`` bodies with on-device convergence predicates (no host
sync per iteration); masked hot paths have fused Pallas TPU kernels.
"""

from decomp_tpu.models import dictionary_learning, lasso, nmf
from decomp_tpu import parallel
from decomp_tpu.ops.complex_split import SplitComplex
from decomp_tpu.utils.result import (
    DictionaryLearningResult,
    LassoResult,
    NMFResult,
)

__version__ = "0.4.0"

__all__ = [
    "lasso",
    "nmf",
    "dictionary_learning",
    "parallel",
    "SplitComplex",
    "LassoResult",
    "NMFResult",
    "DictionaryLearningResult",
]
