"""Out-of-core batch lasso: more problems than device memory.

Rows of ``y`` are independent problems sharing the dictionary (SURVEY.md
§2a row 2), so a larger-than-HBM batch streams exactly: the Gram matrix
and Lipschitz constant are computed once, then each row chunk is solved
independently on device with a shared, pre-supplied ``lipschitz`` (so
every chunk runs the identical iteration the full-batch solver would).

Host-driven loop by necessity; one jit-cached solve per chunk. Convergence
is per chunk (each chunk stops at its own iteration count — strictly no
worse than the full batch, whose global criterion follows the slowest
row).
"""

from typing import Optional

import jax.numpy as jnp
import numpy as np

from decomp_tpu.models import lasso as _lasso
from decomp_tpu.ops.spectral import lipschitz_gram
from decomp_tpu.utils import assertion
from decomp_tpu.utils.exceptions import DecompError
from decomp_tpu.utils.result import LassoResult


def solve_streaming(
    y,
    a,
    alpha,
    x=None,
    *,
    tol=1e-5,
    maxiter: int = 1000,
    method: str = "fista",
    mask=None,
    chunk_rows: int = 65536,
    precision: str = "highest",
    per_problem: bool = False,
) -> LassoResult:
    """Out-of-core ``decomp_tpu.lasso.solve`` over host-resident ``y``.

    Parameters as in ``lasso.solve`` except ``y``/``x``/``mask`` are host
    arrays (ndarray/memmap) streamed in ``chunk_rows`` row blocks; the
    returned ``x`` is a host numpy array. ``niter`` is the maximum chunk
    iteration count; ``converged`` is True only if every chunk converged.
    With ``per_problem=True`` each chunk solves per-row and the returned
    ``niter``/``converged`` are host arrays of shape (n_samples,) —
    identical to the in-core per-problem semantics, since rows are
    independent. Complex inputs follow lasso.solve's complex_split
    handling per chunk. On TPU with ``per_problem=True`` each chunk
    automatically runs the whole-solve Pallas kernel (lasso.solve's
    ``use_pallas='auto'``), so an out-of-core batch streams through
    VMEM-resident whole solves.
    """
    y = np.asarray(y)
    a_np = np.asarray(a)
    assertion.assert_ndim("y", y, 2)
    assertion.assert_ndim("a", a_np, 2)
    assertion.assert_axis_size("a", a_np, 1, y.shape[1], "n_channels")
    if mask is not None:
        mask = np.asarray(mask)
        assertion.assert_same_shape("mask", mask, "y", y)
    if x is not None:
        x = np.asarray(x)
        assertion.assert_axis_size("x", x, 0, y.shape[0], "n_samples")
        assertion.assert_axis_size("x", x, 1, a_np.shape[0], "n_features")
    chunk_rows = int(chunk_rows)
    if chunk_rows < 1:
        raise DecompError("chunk_rows must be >= 1")
    # Per-sample (2-D) alpha weights are row-shaped like y/x/mask and must
    # be sliced per chunk; scalar / per-feature alpha is shared.
    alpha_np = np.asarray(alpha)
    if alpha_np.ndim == 2:
        if alpha_np.shape[0] != y.shape[0]:
            raise DecompError(
                f"2-D alpha must have n_samples={y.shape[0]} rows, got "
                f"{alpha_np.shape}")
        alpha_rows = alpha_np
    else:
        alpha_rows = None

    # One Lipschitz estimate for every chunk: identical iterations to the
    # full-batch solver (which also computes it from `a` alone).
    if np.iscomplexobj(a_np) or np.iscomplexobj(y):
        lip = None  # complex path estimates it per chunk (split form)
    else:
        lip = float(lipschitz_gram(jnp.asarray(a_np)))

    n = y.shape[0]
    out = np.empty((n, a_np.shape[0]),
                   dtype=np.result_type(y.dtype, a_np.dtype))
    niter_max, all_converged = 0, True
    if per_problem:
        niter_rows = np.zeros((n,), np.int32)
        conv_rows = np.zeros((n,), bool)
    for lo in range(0, n, chunk_rows):
        hi = min(lo + chunk_rows, n)
        res = _lasso.solve(
            y[lo:hi], a_np,
            alpha if alpha_rows is None else alpha_rows[lo:hi],
            None if x is None else x[lo:hi],
            tol=tol, maxiter=maxiter, method=method,
            mask=None if mask is None else mask[lo:hi],
            lipschitz=lip, precision=precision, per_problem=per_problem)
        out[lo:hi] = np.asarray(res.x)
        if per_problem:
            niter_rows[lo:hi] = np.asarray(res.niter)
            conv_rows[lo:hi] = np.asarray(res.converged)
        else:
            niter_max = max(niter_max, int(res.niter))
            all_converged = all_converged and bool(res.converged)

    if per_problem:
        return LassoResult(x=out, niter=niter_rows, converged=conv_rows,
                           objective=jnp.zeros((0,), jnp.float32))
    return LassoResult(
        x=out, niter=jnp.asarray(niter_max, jnp.int32),
        converged=jnp.asarray(all_converged),
        objective=jnp.zeros((0,), jnp.float32),
    )
