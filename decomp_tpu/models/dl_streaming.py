"""Out-of-core dictionary learning: data larger than device memory.

Same pattern as ``nmf.solve_streaming``: per outer iteration, each host
row chunk is sparse-coded on device against the current dictionary (rows
are independent given d), the BCD sufficient statistics A += x_c^H x_c and
B += x_c^H y_c accumulate on device, and the dictionary is updated once
per outer iteration from the full-data statistics — exactly the
full-batch alternation. Chunked trajectories match full-batch ones up to
matmul reduction order when the inner lasso runs its full budget
(lasso_tol=0); with inner early stopping the stop criterion is evaluated
per chunk rather than globally (tested).

Masked problems stream the same way: the projected-gradient dictionary
step's ingredients — the Gram x^H x and the gradient
x^H (mask*(x@d) - my) — are both sums over row chunks, so they
accumulate on device exactly like the BCD statistics.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from decomp_tpu.models import lasso as _lasso
from decomp_tpu.models.dictionary_learning import _bcd_dict_update
from decomp_tpu.ops.loop import run_iterations
from decomp_tpu.ops.spectral import spectral_norm_psd
from decomp_tpu.utils import assertion
from decomp_tpu.utils.dtypes import real_dtype
from decomp_tpu.utils.exceptions import DecompError
from decomp_tpu.utils.normalize import l2_normalize
from decomp_tpu.utils.result import DictionaryLearningResult


def solve_streaming(
    y,
    d,
    alpha,
    x=None,
    *,
    tol=1e-4,
    maxiter: int = 100,
    lasso_method: str = "fista",
    lasso_iter: int = 10,
    lasso_tol=1e-6,
    mask=None,
    chunk_rows: int = 65536,
    precision: str = "highest",
    callback=None,
    stop: str = "rel_change",
    heldout_frac: float = 0.05,
    check_every: int = 5,
    random_seed: int = 0,
) -> DictionaryLearningResult:
    """Out-of-core ``decomp_tpu.dictionary_learning.solve``.

    ``y``/``x``/``mask`` are host arrays streamed in ``chunk_rows``
    blocks; the returned ``x`` is a host numpy array. ``callback(it,
    diff)`` fires once per outer iteration. Masked problems use the
    projected-gradient dictionary step from chunk-accumulated Gram and
    gradient statistics (identical to the in-core masked update).

    stop : 'rel_change' (default) or 'heldout' (masked real problems):
        as in ``dictionary_learning.solve`` — a ``heldout_frac``
        fraction of each chunk's observed entries is reserved (drawn
        deterministically per chunk from ``random_seed``, so every
        epoch sees the same validation set), sparse coding and the
        dictionary step train on the remainder, and iteration stops
        when the validation error plateaus: its relative improvement
        between CHECK epochs (every ``check_every``-th) drops below
        ``tol``. ``aux['heldout_rel_err']`` carries the final
        validation error. This is the usable stopping rule for
        out-of-core masked completion, where the rel-change floor can
        fire too early (BASELINE.md).
    """
    y = np.asarray(y)
    assertion.assert_ndim("y", y, 2)
    d = jnp.asarray(d)
    assertion.assert_ndim("d", d, 2)
    assertion.assert_axis_size("d", d, 1, y.shape[1], "n_channels")
    assertion.assert_nonnegative("alpha", alpha)
    if lasso_method == "cd":
        raise DecompError("lasso_method 'cd' is not supported inside "
                          "dictionary learning; use 'fista'/'parallel_cd'")
    if stop not in ("rel_change", "heldout"):
        raise DecompError(f"stop must be 'rel_change' or 'heldout', "
                          f"got {stop!r}")
    chunk_rows = int(chunk_rows)
    if chunk_rows < 1:
        raise DecompError("chunk_rows must be >= 1")
    if mask is not None:
        mask = np.asarray(mask)
        assertion.assert_same_shape("mask", mask, "y", y)
    heldout = stop == "heldout"
    if heldout:
        if mask is None:
            raise DecompError("stop='heldout' requires a mask")
        if np.iscomplexobj(y):
            raise DecompError("stop='heldout' supports real dtypes only")
        if not 0.0 < float(heldout_frac) < 1.0:
            raise DecompError("heldout_frac must be in (0, 1)")
    n_samples = y.shape[0]
    n_atoms = d.shape[0]
    dtype = np.result_type(y.dtype, np.asarray(d).dtype)
    if x is None:
        x = np.zeros((n_samples, n_atoms), dtype=dtype)
    else:
        x = np.array(x, dtype=dtype, copy=True)
        assertion.assert_axis_size("x", x, 0, n_samples, "n_samples")
        assertion.assert_axis_size("x", x, 1, n_atoms, "n_atoms")

    rdt = real_dtype(jnp.result_type(dtype))
    alpha_j = jnp.asarray(np.asarray(alpha).real.astype(rdt))
    lasso_tol_j = jnp.asarray(lasso_tol, rdt)
    d = l2_normalize(d.astype(dtype), axis=1)

    hd_key = None
    if heldout:
        # same derivation root as the in-core solvers:
        # fold_in(PRNGKey(seed), 2); per-chunk keys fold in the chunk
        # offset so every epoch reserves the SAME entries
        hd_key = jax.random.fold_in(
            jax.random.PRNGKey(np.uint32(random_seed)), 2)
        hd_frac = jnp.float32(heldout_frac)
    ce = max(1, int(check_every))
    prev_e, last_e, checks = None, None, 0
    niter, converged, diff = 0, False, np.inf
    with jax.default_matmul_precision(precision):
        for it in range(1, maxiter + 1):
            d_old = d
            is_check = heldout and it % ce == 0
            stats_a = jnp.zeros((n_atoms, n_atoms), dtype)
            stats_b = jnp.zeros((n_atoms, y.shape[1]), dtype)
            verr = vnorm = jnp.zeros((), jnp.float32)
            for lo in range(0, n_samples, chunk_rows):
                hi = min(lo + chunk_rows, n_samples)
                yc = jnp.asarray(y[lo:hi])
                xc = jnp.asarray(x[lo:hi])
                mc = (None if mask is None
                      else jnp.asarray(mask[lo:hi], real_dtype(yc.dtype)))
                if heldout:
                    val_c = _chunk_val_mask(hd_key, lo, mc, hd_frac)
                    mc_t = mc - val_c       # train on the remainder
                else:
                    mc_t = mc
                xc, a_c, b_c = _chunk_code_and_stats(
                    yc, d, xc, alpha_j, lasso_tol_j, mc_t,
                    lasso_method=lasso_method, lasso_iter=lasso_iter,
                    masked=mask is not None)
                if is_check:
                    # validation error with the freshly-coded xc against
                    # the pre-update d (matching nmf.solve_streaming's
                    # convention)
                    ve, vn = _val_err_chunk(yc, val_c, xc, d)
                    verr = verr + ve
                    vnorm = vnorm + vn
                x[lo:hi] = np.asarray(xc)
                stats_a = stats_a + a_c
                stats_b = stats_b + b_c
            if mask is None:
                d = _bcd_dict_update(stats_a, stats_b, d)
            else:
                # projected-gradient step from the accumulated Gram
                # (stats_a) and gradient (stats_b) — the in-core
                # _masked_grad_dict_update from full-data statistics
                d = _masked_d_step(stats_a, stats_b, d)
            diff = float(_rel_diff(d_old, d))
            niter = it
            if callback is not None:
                callback(it, diff)
            if heldout:
                if is_check:
                    e = float(verr) / max(float(vnorm), 1e-300)
                    last_e = e
                    checks += 1
                    # warm-up: no plateau verdict before the 3rd check
                    if prev_e is not None and checks >= 3 and (
                            (prev_e - e) / max(prev_e, 1e-300)
                            < float(tol)):
                        converged = True  # validation plateaued
                        break
                    prev_e = e
            elif diff < float(tol):
                converged = True
                break

    aux = (None if last_e is None
           else {"heldout_rel_err": jnp.asarray(np.sqrt(last_e),
                                                jnp.float32)})
    return DictionaryLearningResult(
        x=x, d=d, niter=jnp.asarray(niter, jnp.int32),
        converged=jnp.asarray(converged),
        objective=jnp.zeros((0,), jnp.float32),
        aux=aux,
    )


@functools.partial(jax.jit, static_argnames=("lasso_method", "lasso_iter",
                                              "masked"))
def _chunk_code_and_stats(yc, d, xc, alpha, lasso_tol, mc=None, *,
                          lasso_method, lasso_iter, masked=False):
    """Sparse-code one row chunk and return its dictionary-update
    statistic partials: (x^H x, x^H my) for the unmasked BCD step, or
    (x^H x, x^H (mask*(x@d) - my)) for the masked projected-gradient
    step."""
    step, init, diff_fn, obj_fn = _lasso.build_solver(
        yc, d, alpha, xc, mc, None, method=lasso_method)
    res = run_iterations(step, init, tol=lasso_tol, maxiter=lasso_iter,
                         diff_fn=diff_fn, objective_fn=obj_fn,
                         record_objective=False)
    xc = res.state[0]
    gram = xc.conj().T @ xc
    if not masked:
        return xc, gram, xc.conj().T @ yc
    myc = mc * yc
    resid = mc * (xc @ d) - myc
    return xc, gram, xc.conj().T @ resid


@jax.jit
def _chunk_val_mask(key, lo, mc, frac):
    """Per-chunk validation mask: deterministic (keyed by the chunk
    offset only, so every epoch reserves the same entries) and <= mc
    elementwise."""
    kv = jax.random.fold_in(key, lo)
    bern = (jax.random.uniform(kv, mc.shape) < frac).astype(mc.dtype)
    return bern * mc


@jax.jit
def _val_err_chunk(yc, val_c, xc, d):
    """Chunk contribution to (sum val*(y - x@d)^2, sum (val*y)^2)."""
    acc = jnp.promote_types(jnp.float32, real_dtype(yc.dtype))
    recon = (xc @ d).astype(acc)
    yv = (val_c * yc).astype(acc)
    r = yv - val_c.astype(acc) * recon
    return (jnp.sum(r * r).astype(jnp.float32),
            jnp.sum(yv * yv).astype(jnp.float32))


@jax.jit
def _masked_d_step(gram, grad, d):
    """Projected-gradient dictionary step from accumulated statistics
    (mirrors models.dictionary_learning._masked_grad_dict_update)."""
    rdt = real_dtype(d.dtype)
    lip = jnp.maximum(spectral_norm_psd(gram),
                      jnp.asarray(jnp.finfo(rdt).tiny, rdt))
    return l2_normalize(d - grad / lip.astype(d.dtype), axis=1)


@jax.jit
def _rel_diff(d_old, d_new):
    acc_dt = jnp.promote_types(jnp.float32, real_dtype(d_old.dtype))
    num = jnp.linalg.norm((d_new - d_old).astype(
        jnp.promote_types(acc_dt, d_old.dtype)))
    den = jnp.maximum(
        jnp.linalg.norm(d_old.astype(jnp.promote_types(acc_dt,
                                                       d_old.dtype))),
        jnp.asarray(jnp.finfo(acc_dt).tiny, acc_dt))
    return jnp.real(num) / den
