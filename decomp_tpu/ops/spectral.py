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
    dense start vector, then a Rayleigh quotient, scaled by ``safety``
    (>1 compensates the estimate being a lower bound).
    method='eigh': exact ``jnp.linalg.eigvalsh`` (no safety factor).

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
    # Rayleigh quotient; real for Hermitian gram. Guard the denominator:
    # an (effectively) zero gram drives v to 0 and 0/0 would poison the
    # solver with NaN instead of the harmless L=tiny.
    tiny = jnp.asarray(jnp.finfo(rdt).tiny, rdt)
    lam = jnp.real(jnp.vdot(v, gram @ v)) / jnp.maximum(
        jnp.real(jnp.vdot(v, v)), tiny)
    return jnp.maximum(lam * safety, tiny).astype(rdt)


def lipschitz_gram(a, *, iters: int = 60, method: str = "power",
                   safety: float = 1.02):
    """L = lambda_max(A A^H) for a dictionary ``a`` of shape (n_feat, n_ch).

    This is the Lipschitz constant of x -> grad of 1/2 ||y - xA||^2
    (SURVEY.md §3.1 "Lipschitz const from largest eigenvalue of AA^H").
    """
    gram = a @ a.conj().T
    return spectral_norm_psd(gram, iters=iters, method=method, safety=safety)
