"""Solver result pytrees (SURVEY.md §5 "Metrics / logging / observability").

The reference returns bare arrays from ``solve()``; the rebuild returns a
small NamedTuple pytree carrying the factors plus on-device diagnostics
(iteration count, convergence flag, optional per-iteration objective curve).
NamedTuples are native JAX pytrees, so results flow through jit / vmap /
shard_map unchanged.
"""

from typing import Any, NamedTuple, Optional

import jax


class LassoResult(NamedTuple):
    """Result of ``decomp_tpu.lasso.solve``."""

    x: jax.Array          # sparse codes, shape (..., n_features)
    niter: jax.Array      # int32: iterations actually run — scalar, or
                          # per-row (n_samples,) with per_problem=True
    converged: jax.Array  # bool: tol reached before maxiter — scalar, or
                          # per-row (n_samples,) with per_problem=True
    objective: jax.Array  # per-iteration objective, shape (maxiter,) if
                          # record_objective else (0,); padded with NaN
    aux: Optional[Any] = None  # with return_state=True on momentum
                          # methods: {"z": extrapolation point, "t":
                          # per-row momentum scalars} — pass back via
                          # momentum_state= for exact chunked resume


class NMFResult(NamedTuple):
    """Result of ``decomp_tpu.nmf.solve``."""

    x: jax.Array          # activations, shape (n_samples, rank)
    d: jax.Array          # dictionary / basis, shape (rank, n_channels)
    niter: jax.Array
    converged: jax.Array
    objective: jax.Array
    aux: Optional[Any] = None  # stop='heldout': {"heldout_rel_err":
                          # scalar} — the final relative reconstruction
                          # error on the reserved validation entries


class DictionaryLearningResult(NamedTuple):
    """Result of ``decomp_tpu.dictionary_learning.solve``."""

    x: jax.Array          # sparse codes, shape (n_samples, n_atoms)
    d: jax.Array          # dictionary with unit-norm atoms, (n_atoms, n_channels)
    niter: jax.Array
    converged: jax.Array
    objective: jax.Array
    aux: Optional[Any] = None  # stop='heldout': {"heldout_rel_err": ...}
