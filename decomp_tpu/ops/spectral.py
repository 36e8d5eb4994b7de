"""Spectral-norm / Lipschitz-constant estimation (SURVEY.md §2a row 8).

ISTA/FISTA need L = lambda_max(A A^H). The reference computes it with a
dense eigendecomposition; on TPU we default to power iteration — pure
matmuls, MXU-friendly, complex-safe — with a small safety margin so the
1/L step size is always valid even if the estimate is slightly low.
A dense ``eigvalsh`` path is kept as an option for exactness.
"""

import jax
import jax.numpy as jnp

from decomp_tpu.utils.dtypes import real_dtype


def spectral_norm_psd(gram, *, iters: int = 60, method: str = "power",
                      safety: float = 1.02):
    """Largest eigenvalue of a Hermitian PSD matrix ``gram`` (n, n).

    method='power': ``iters`` power-iteration steps from a deterministic
    dense start vector, then the ||gram v||/||v|| bound (tighter than the
    Rayleigh quotient), scaled by ``safety`` (>1 compensates the estimate
    being a lower bound) and capped by the certified Hermitian inf-norm
    upper bound; if the Rayleigh/matvec gap shows the iteration has not
    converged, the certified upper bound is returned instead.
    method='eigh': exact ``jnp.linalg.eigvalsh`` (no safety factor).

    CAVEAT: for an adversarial gram whose top eigenvector is exactly
    orthogonal (to machine precision) to the start vector AND whose
    second eigenvalue cluster converges the iteration, the estimate can
    still undershoot undetected — pass an explicit ``lipschitz=`` to the
    solvers or use method='eigh' for such matrices.

    Returns a real scalar of the real dtype of ``gram``.
    """
    rdt = real_dtype(gram.dtype)
    if method == "eigh":
        return jnp.linalg.eigvalsh(gram)[-1].astype(rdt)
    if method != "power":
        raise ValueError(f"unknown spectral-norm method {method!r}")

    n = gram.shape[-1]
    # Deterministic, dense, non-symmetric start vector: overlaps every
    # eigenvector with overwhelming probability (a pure ones-vector could be
    # orthogonal to the top eigenvector of structured matrices).
    ramp = jnp.linspace(1.0, 2.0, n, dtype=rdt)
    v = (ramp / jnp.linalg.norm(ramp)).astype(gram.dtype)

    def body(_, v):
        w = gram @ v
        return w / jnp.maximum(
            jnp.linalg.norm(w), jnp.asarray(jnp.finfo(rdt).tiny, rdt)
        ).astype(rdt)

    v = jax.lax.fori_loop(0, iters, body, v)
    # Guard denominators: an (effectively) zero gram drives v to 0 and 0/0
    # would poison the solver with NaN instead of the harmless L=tiny.
    tiny = jnp.asarray(jnp.finfo(rdt).tiny, rdt)
    w = gram @ v
    vv = jnp.maximum(jnp.real(jnp.vdot(v, v)), tiny)
    # Two lower bounds on lambda_max from the final iterate: the Rayleigh
    # quotient and ||gram v||/||v|| (>= Rayleigh by Cauchy-Schwarz, equal
    # iff v is an eigenvector). Their relative gap is a convergence
    # certificate for the power iteration itself.
    rayleigh = jnp.real(jnp.vdot(v, w)) / vv
    matvec = jnp.linalg.norm(w).real.astype(rdt) / jnp.sqrt(vv)
    # Certified upper bound (Hermitian inf-norm / Gershgorin): lambda_max
    # <= max_i sum_j |gram_ij|. Used (a) as the fallback when the power
    # iteration has visibly not converged — e.g. a start vector nearly
    # orthogonal to the top eigenvector with a large spectral gap, where a
    # safety-scaled lower bound could still undershoot and make the 1/L
    # step divergent — and (b) as a cap so the safety margin never
    # overshoots the certificate.
    ub = jnp.maximum(jnp.max(jnp.sum(jnp.abs(gram), axis=-1)).astype(rdt),
                     tiny)
    not_converged = (matvec - rayleigh) > 0.01 * jnp.maximum(rayleigh, tiny)
    lam = jnp.where(not_converged, ub,
                    jnp.minimum(matvec * safety, ub))
    return jnp.maximum(lam, tiny).astype(rdt)


def lipschitz_gram(a, *, iters: int = 60, method: str = "power",
                   safety: float = 1.02):
    """L = lambda_max(A A^H) for a dictionary ``a`` of shape (n_feat, n_ch).

    This is the Lipschitz constant of x -> grad of 1/2 ||y - xA||^2
    (SURVEY.md §3.1 "Lipschitz const from largest eigenvalue of AA^H").
    """
    gram = a @ a.conj().T
    return spectral_norm_psd(gram, iters=iters, method=method, safety=safety)
