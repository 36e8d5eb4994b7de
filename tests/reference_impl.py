"""Pure-NumPy reference implementations — the executable ground truth.

The reference repo mount is empty (SURVEY.md §0), so per SURVEY.md §4 item 1
this module is the in-tree stand-in for fujii-team/deComP's solvers: plain
NumPy, host-side loops, written to mirror decomp_tpu's update formulas
EXACTLY (same operation order, same convergence criteria, same deterministic
power-iteration Lipschitz estimate) so that float64 trajectories of the JAX
implementation can be compared against it to tight tolerances.

Intentionally simple and slow; used only by tests.
"""

import numpy as np

TINY64 = np.finfo(np.float64).tiny


# ---------------------------------------------------------------- utilities

def soft_threshold(x, t):
    if np.iscomplexobj(x):
        mag = np.abs(x)
        shrunk = np.maximum(mag - t, 0)
        safe = np.where(mag > 0, mag, 1)
        return x * (shrunk / safe)
    return np.sign(x) * np.maximum(np.abs(x) - t, 0)


def spectral_norm_psd(gram, iters=60, safety=1.02):
    """Mirror of decomp_tpu.ops.spectral.spectral_norm_psd (power method
    with matvec lower bound, certified inf-norm cap, and non-convergence
    fallback)."""
    n = gram.shape[-1]
    rdt = np.float64
    ramp = np.linspace(1.0, 2.0, n).astype(rdt)
    v = (ramp / np.linalg.norm(ramp)).astype(gram.dtype)
    for _ in range(iters):
        w = gram @ v
        v = w / max(np.linalg.norm(w), TINY64)
    w = gram @ v
    vv = max(np.real(np.vdot(v, v)), TINY64)
    rayleigh = np.real(np.vdot(v, w)) / vv
    mv = np.linalg.norm(w) / np.sqrt(vv)
    ub = max(np.max(np.sum(np.abs(gram), axis=-1)).real, TINY64)
    if (mv - rayleigh) > 0.01 * max(rayleigh, TINY64):
        lam = ub
    else:
        lam = min(mv * safety, ub)
    return max(lam, TINY64)


def l2_norm(x):
    return np.sqrt(np.sum(np.real(x * np.conj(x))))


def l2_normalize_rows(d):
    norms = np.sqrt(np.sum(np.real(d * np.conj(d)), axis=1, keepdims=True))
    return d / np.maximum(norms, TINY64)


# -------------------------------------------------------------------- lasso

def lasso(y, a, alpha, x=None, *, tol=1e-5, maxiter=1000, method="fista",
          mask=None, lipschitz=None):
    """Mirror of decomp_tpu.lasso.solve for methods ista/fista/acc_ista/cd.

    Returns (x, niter, converged, objectives list).
    """
    y = np.atleast_2d(np.asarray(y))
    a = np.asarray(a)
    ah = a.conj().T
    gram = a @ ah
    my = y if mask is None else mask * y
    yah = my @ ah
    if x is None:
        x = np.zeros((y.shape[0], a.shape[0]), dtype=np.result_type(y, a))
    else:
        x = np.array(x, dtype=np.result_type(y, a), copy=True)

    def grad(x_):
        if mask is None:
            return x_ @ gram - yah
        return (mask * (x_ @ a) - my) @ ah

    def objective(x_):
        recon = x_ @ a
        resid = (my - recon) if mask is None else (my - mask * recon)
        return 0.5 * np.sum(np.real(resid * np.conj(resid))) + np.sum(
            alpha * np.abs(x_))

    objs = []

    def rel_change(x_old, x_new):
        return l2_norm(x_new - x_old) / max(l2_norm(x_new), TINY64)

    if method in ("ista", "fista", "acc_ista"):
        lip = spectral_norm_psd(gram) if lipschitz is None else lipschitz
        inv_l = 1.0 / lip
        thresh = alpha * inv_l
        # Per-row momentum scalar; the acc_ista adaptive restart is
        # ROW-LOCAL (each batch row is an independent problem), mirroring
        # decomp_tpu.models.lasso.build_solver.
        z, t = x.copy(), np.ones(y.shape[0])
        converged, it = False, 0
        for it in range(1, maxiter + 1):
            if method == "ista":
                x_new = soft_threshold(x - inv_l * grad(x), thresh)
            else:
                x_new = soft_threshold(z - inv_l * grad(z), thresh)
                t_new = 0.5 * (1.0 + np.sqrt(1.0 + 4.0 * t * t))
                z_new = x_new + ((t - 1.0) / t_new)[:, None] * (x_new - x)
                if method == "acc_ista":
                    do = np.real(np.sum(np.conj(z - x_new) * (x_new - x),
                                        axis=1)) > 0
                    t_new = np.where(do, 1.0, t_new)
                    z_new = np.where(do[:, None], x_new, z_new)
                z, t = z_new, t_new
            diff = rel_change(x, x_new)
            x = x_new
            objs.append(objective(x))
            if diff < tol:
                converged = True
                break
        return x, it, converged, objs

    if method == "parallel_cd":
        diag = np.maximum(np.real(np.diagonal(gram)), TINY64)
        scale = 1.0 / np.sqrt(diag)
        ngram = scale[:, None] * gram * scale[None, :]
        theta = 1.0 / spectral_norm_psd(ngram)
        inv_diag = theta / diag
        converged, it = False, 0
        for it in range(1, maxiter + 1):
            x_new = soft_threshold(x - inv_diag * grad(x),
                                   alpha * inv_diag)
            diff = rel_change(x, x_new)
            x = x_new
            objs.append(objective(x))
            if diff < tol:
                converged = True
                break
        return x, it, converged, objs

    if method == "cd":
        diag = np.maximum(np.real(np.diagonal(gram)), TINY64)
        c = x @ gram
        converged, it = False, 0
        for it in range(1, maxiter + 1):
            x_old = x.copy()
            for j in range(a.shape[0]):
                r = yah[:, j] - c[:, j] + x[:, j] * diag[j]
                xj = soft_threshold(r, alpha) / diag[j]
                delta = xj - x[:, j]
                c = c + delta[:, None] * gram[j][None, :]
                x[:, j] = xj
            diff = rel_change(x_old, x)
            objs.append(objective(x))
            if diff < tol:
                converged = True
                break
        return x, it, converged, objs

    raise ValueError(method)


# ---------------------------------------------------------------------- NMF

def nmf(y, x, d, *, tol=1e-4, maxiter=1000, mask=None, eps=1e-15,
        method="mu", inner_iter=1):
    """Mirror of decomp_tpu.nmf.solve (full-batch 'mu' L2 / 'kl-mu' KL).

    Returns (x, d, niter, converged, objectives list).
    """
    y = np.asarray(y, dtype=np.float64)
    x = np.array(x, dtype=np.float64, copy=True)
    d = np.array(d, dtype=np.float64, copy=True)
    my = y if mask is None else mask * y

    def objective(x_, d_):
        recon = x_ @ d_
        if method in ("mu", "hals"):
            resid = (my - recon) if mask is None else (my - mask * recon)
            return 0.5 * np.sum(resid * resid)
        r = recon + eps
        if mask is not None:
            r = mask * r
        with np.errstate(divide="ignore", invalid="ignore"):
            ylogy = np.where(my > 0, my * np.log(my / (r + eps)), 0.0)
        return np.sum(ylogy - my + r)

    objs = []
    converged, it = False, 0
    for it in range(1, maxiter + 1):
        d_old = d.copy()
        if method == "mu":
            for _ in range(inner_iter):
                num = my @ d.T
                den = (x @ (d @ d.T) if mask is None
                       else (mask * (x @ d)) @ d.T)
                x = x * num / (den + eps)
            num = x.T @ my
            den = (x.T @ x) @ d if mask is None else x.T @ (mask * (x @ d))
            d = d * num / (den + eps)
        elif method == "hals":
            a = d @ d.T
            b = my @ d.T
            floor = np.finfo(np.float64).eps * max(np.trace(a), TINY64)
            for k in range(d.shape[0]):
                if a[k, k] > floor:
                    xk = x[:, k] + (b[:, k] - x @ a[:, k]) / max(a[k, k],
                                                                 floor)
                    x[:, k] = np.maximum(xk, 0)
            c = x.T @ x
            e = x.T @ my
            floor = np.finfo(np.float64).eps * max(np.trace(c), TINY64)
            for k in range(d.shape[0]):
                if c[k, k] > floor:
                    dk = d[k] + (e[k] - c[k] @ d) / max(c[k, k], floor)
                    d[k] = np.maximum(dk, 0)
        else:  # kl-mu
            r = x @ d + eps
            num = (my / r) @ d.T
            den = d.sum(axis=1) if mask is None else mask @ d.T
            x = x * num / (den + eps)
            r = x @ d + eps
            num = x.T @ (my / r)
            den = x.sum(axis=0)[:, None] if mask is None else x.T @ mask
            d = d * num / (den + eps)
        objs.append(objective(x, d))
        diff = l2_norm(d - d_old) / max(l2_norm(d_old), TINY64)
        if diff < tol:
            converged = True
            break
    return x, d, it, converged, objs


# ---------------------------------------------- dictionary learning

def bcd_dict_update(stats_a, stats_b, d):
    """Mirror of decomp_tpu.models.dictionary_learning._bcd_dict_update."""
    d = np.array(d, copy=True)
    for k in range(d.shape[0]):
        a_row = stats_a[k]
        u = stats_b[k] - a_row @ d + np.real(a_row[k]) * d[k]
        norm = l2_norm(u)
        if norm > TINY64:
            d[k] = u / max(norm, TINY64)
    return d


def masked_grad_dict_update(my, x, d, mask):
    gram = x.conj().T @ x
    lip = max(spectral_norm_psd(gram), TINY64)
    resid = mask * (x @ d) - my
    grad = x.conj().T @ resid
    return l2_normalize_rows(d - grad / lip)


def dictionary_learning(y, d, alpha, x=None, *, tol=1e-4, maxiter=100,
                        lasso_method="fista", lasso_iter=10, lasso_tol=1e-6,
                        mask=None):
    """Mirror of decomp_tpu.dictionary_learning.solve (full-batch)."""
    y = np.asarray(y)
    d = l2_normalize_rows(np.asarray(d))
    dtype = np.result_type(y, d)
    if x is None:
        x = np.zeros((y.shape[0], d.shape[0]), dtype=dtype)
    my = y if mask is None else mask * y

    def objective(x_, d_):
        recon = x_ @ d_
        resid = (my - recon) if mask is None else (my - mask * recon)
        return 0.5 * np.sum(np.real(resid * np.conj(resid))) + np.sum(
            alpha * np.abs(x_))

    objs = []
    converged, it = False, 0
    for it in range(1, maxiter + 1):
        d_old = d.copy()
        x, _, _, _ = lasso(y, d, alpha, x, tol=lasso_tol, maxiter=lasso_iter,
                           method=lasso_method, mask=mask)
        if mask is None:
            stats_a = x.conj().T @ x
            stats_b = x.conj().T @ my
            d = bcd_dict_update(stats_a, stats_b, d)
        else:
            d = masked_grad_dict_update(my, x, d, mask)
        objs.append(objective(x, d))
        diff = l2_norm(d - d_old) / max(l2_norm(d_old), TINY64)
        if diff < tol:
            converged = True
            break
    return x, d, it, converged, objs
