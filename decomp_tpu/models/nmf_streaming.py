"""Out-of-core ("serial") NMF: data larger than device memory.

Capability parity: the reference's serial/minibatch variants exist because
matrices can exceed one device pass (SURVEY.md §2a row 3). The TPU-native
answer for the deterministic "serial" case: keep ``y`` (and ``x``) in host
memory, stream fixed-size row chunks through the device each iteration, and
accumulate the d-update sufficient statistics on device. The x update is
row-local, so chunking is EXACT: the streamed trajectory equals the
full-batch trajectory bit-for-bit up to matmul reduction order (tested).

This is a host-driven loop by necessity (host<->device transfers cannot
live inside one jit), so unlike ``nmf.solve`` there is one device sync per
chunk. Use it when y does not fit HBM (e.g. the 1M x 10k f32 pod config on
a single 16 GB chip); otherwise ``nmf.solve`` is strictly faster.
"""

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from decomp_tpu.models.nmf import (
    _update_x,
    _update_x_kl,
    _update_x_mixed,
)
from decomp_tpu.utils import assertion
from decomp_tpu.utils.exceptions import DecompError
from decomp_tpu.utils.result import NMFResult


def solve_streaming(
    y,
    d=None,
    *,
    rank: Optional[int] = None,
    x=None,
    tol=1e-4,
    maxiter: int = 100,
    method: str = "mu",
    mask=None,
    chunk_rows: int = 65536,
    random_seed: int = 0,
    eps: float = 1e-15,
    precision: str = "highest",
    factor_dtype=None,
    callback: Optional[Callable] = None,
) -> NMFResult:
    """Out-of-core ``y ≈ x @ d`` with nonnegative factors.

    Parameters are as in ``decomp_tpu.nmf.solve`` except:

    y : host array (numpy ndarray / memmap), shape (n_samples, n_channels).
        Never materialised on device; streamed in ``chunk_rows`` blocks.
    x : optional host-side warm start; the returned ``x`` is likewise a
        host (numpy) array.
    chunk_rows : rows per device pass. Pick so that
        chunk_rows * n_channels * itemsize fits comfortably in HBM.
    factor_dtype : as in ``nmf.solve`` — keep the x/d iterates in this
        wider dtype (e.g. f32 over streamed bf16 chunks) while the MXU
        contracts in y's dtype; method='mu' only.
    callback : optional ``callback(it, diff)`` called once per outer
        iteration (host-side observability hook; replaces
        record_objective, which would need a second data pass).

    Returns NMFResult with ``x`` as a host numpy array and ``d`` on device.
    """
    if method not in ("mu", "kl-mu"):
        raise DecompError(f"method must be 'mu' or 'kl-mu', got {method!r}")
    y = np.asarray(y)
    assertion.assert_ndim("y", y, 2)
    assertion.assert_inexact("y", y)
    if np.iscomplexobj(y):
        from decomp_tpu.utils.exceptions import DtypeError
        raise DtypeError("y must be real-valued for NMF")
    n_samples, n_channels = y.shape
    if factor_dtype is not None:
        factor_dtype = jnp.dtype(factor_dtype)
        if factor_dtype == y.dtype:
            factor_dtype = None
    if factor_dtype is not None:
        if method != "mu":
            raise DecompError("factor_dtype currently supports "
                              "method='mu' only")
        if jnp.finfo(factor_dtype).bits < jnp.finfo(jnp.dtype(y.dtype)).bits:
            raise DecompError("factor_dtype must be at least as wide as "
                              "y's dtype")
    fdt = y.dtype if factor_dtype is None else factor_dtype
    if d is None and rank is None:
        raise DecompError("provide an initial dictionary `d` or a `rank`")
    rng = np.random.default_rng(random_seed)

    def _init_scale(k):
        # Mean over OBSERVED entries of the leading rows: missing entries
        # may hold arbitrary finite values (same contract as nmf.solve).
        head = y[: min(n_samples, 4096)]
        if mask is not None:
            mh = np.asarray(mask)[: min(n_samples, 4096)]
            total = float((head * mh).sum())
            count = max(float(np.asarray(mh, np.float64).sum()), 1.0)
            mean_y = max(total / count, 1e-30)
        else:
            mean_y = max(float(head.mean()), 1e-30)
        return np.sqrt(2.0 * mean_y / k)

    if d is None:
        scale = _init_scale(rank)
        d = (scale * rng.uniform(size=(rank, n_channels))).astype(fdt)
    d = jnp.asarray(d, fdt)
    rank = d.shape[0]
    if x is None:
        scale = _init_scale(rank)
        x = (scale * rng.uniform(size=(n_samples, rank))).astype(fdt)
    else:
        x = np.array(x, dtype=fdt, copy=True)
        assertion.assert_axis_size("x", x, 0, n_samples, "n_samples")
        assertion.assert_axis_size("x", x, 1, rank, "rank")
    if mask is not None:
        mask = np.asarray(mask)
        assertion.assert_same_shape("mask", mask, "y", y)
    chunk_rows = int(chunk_rows)
    if chunk_rows < 1:
        raise DecompError("chunk_rows must be >= 1")

    # Pre-masked host copy avoided: mask applied chunk-wise on device.
    bounds = list(range(0, n_samples, chunk_rows))
    eps_f = float(eps)
    tol_f = float(tol)

    # Accumulate statistics at >= f32 precision, and at f64 when the data
    # itself is f64 so the streamed trajectory matches full-batch exactly.
    acc_dt = np.promote_types(np.float32, y.dtype)
    niter, converged, diff = 0, False, np.inf
    with jax.default_matmul_precision(precision):
        for it in range(1, maxiter + 1):
            d_old = d
            num = jnp.zeros((rank, n_channels), acc_dt)
            den = (jnp.zeros((rank, rank), acc_dt) if mask is None
                   and method == "mu"
                   else jnp.zeros((rank, n_channels), acc_dt))
            for lo in bounds:
                hi = min(lo + chunk_rows, n_samples)
                yc = jnp.asarray(y[lo:hi])
                mc = None if mask is None else jnp.asarray(
                    mask[lo:hi], yc.dtype)
                xc = jnp.asarray(x[lo:hi])
                xc, num_c, den_c = _chunk_step(
                    yc, xc, d, mc, eps_f, method=method,
                    masked=mask is not None,
                    mixed=factor_dtype is not None)
                x[lo:hi] = np.asarray(xc)
                num = num + num_c
                den = den + den_c
            d = _d_from_stats(d, num, den, eps_f, method=method,
                              masked=mask is not None,
                              mixed=factor_dtype is not None)
            # One scalar sync per outer iteration (not per chunk).
            diff = float(_rel_diff(d_old, d))
            niter = it
            if callback is not None:
                callback(it, diff)
            if diff < tol_f:
                converged = True
                break

    return NMFResult(
        x=x, d=d, niter=jnp.asarray(niter, jnp.int32),
        converged=jnp.asarray(converged),
        objective=jnp.zeros((0,), jnp.float32),
    )


@functools.partial(jax.jit,
                   static_argnames=("method", "masked", "mixed"))
def _chunk_step(yc, xc, d, mc, eps, *, method, masked, mixed=False):
    """x update for one row chunk + its d-update statistic contributions.

    For 'mu':    num += x_new.T @ (mask*y);
                 den += x_new.T @ x_new (unmasked, K x K Gram)
                     or x_new.T @ (mask*(x_new @ d)) (masked, K x N)
    For 'kl-mu': num += x_new.T @ (mask*y / (x_new @ d + eps));
                 den += column-sum/mask statistics (K x N broadcastable)
    mixed: factor iterates are wider than the data — MXU operands cast to
    the data's dtype (see models.nmf._update_x_mixed).
    """
    acc_dt = jnp.promote_types(jnp.float32, yc.dtype)
    eps = jnp.asarray(eps, acc_dt if mixed else yc.dtype)
    myc = yc if mc is None else mc * yc
    if mixed:
        upd = _update_x_mixed
    else:
        upd = _update_x if method == "mu" else _update_x_kl
    xc = upd(myc, xc, d, mc, eps)
    cdt = yc.dtype
    xc_c = xc.astype(cdt)
    if method == "mu":
        num = jax.lax.dot_general(xc_c, myc, (((0,), (0,)), ((), ())),
                                  preferred_element_type=acc_dt)
        if not masked:
            den = jax.lax.dot_general(xc_c, xc_c, (((0,), (0,)), ((), ())),
                                      preferred_element_type=acc_dt)
        else:
            recon = (mc.astype(acc_dt)
                     * jax.lax.dot_general(
                         xc_c, d.astype(cdt), (((1,), (0,)), ((), ())),
                         preferred_element_type=acc_dt)).astype(cdt)
            den = jax.lax.dot_general(xc_c, recon, (((0,), (0,)), ((), ())),
                                      preferred_element_type=acc_dt)
    else:
        r = xc @ d + eps
        num = jax.lax.dot_general(xc, myc / r, (((0,), (0,)), ((), ())),
                                  preferred_element_type=acc_dt)
        if not masked:
            den = jnp.broadcast_to(
                jnp.sum(xc, axis=0, dtype=acc_dt)[:, None],
                (xc.shape[1], d.shape[1]))
        else:
            den = jax.lax.dot_general(xc, mc, (((0,), (0,)), ((), ())),
                                      preferred_element_type=acc_dt)
    return xc, num, den


@functools.partial(jax.jit, static_argnames=("method", "masked", "mixed"))
def _d_from_stats(d, num, den, eps, *, method, masked, mixed=False):
    acc_dt = num.dtype
    eps = jnp.asarray(eps, acc_dt)
    d_acc = d.astype(acc_dt)
    if method == "mu" and not masked:
        if mixed:
            # exact-f32 epilogue, matching _update_d_mixed / the kernels
            den_full = jax.lax.dot_general(
                den, d_acc, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=acc_dt)
        else:
            den_full = den @ d_acc    # (K,K) Gram @ d, ambient precision
    else:
        den_full = den
    return (d_acc * num / (den_full + eps)).astype(d.dtype)


@jax.jit
def _rel_diff(d_old, d_new):
    acc_dt = jnp.promote_types(jnp.float32, d_old.dtype)
    num = jnp.linalg.norm((d_new - d_old).astype(acc_dt))
    den = jnp.maximum(jnp.linalg.norm(d_old.astype(acc_dt)),
                      jnp.asarray(jnp.finfo(acc_dt).tiny, acc_dt))
    return num / den
