"""Split-complex arithmetic: complex linear algebra over (real, imag) pairs.

TPU backends have limited/no complex-dtype support (this environment's
backend rejects every complex64 op at runtime; SURVEY.md §7 hard part 5
anticipated exactly this: "complex matmul support is limited — may need
explicit (re,im) decomposition"). This module represents complex matrices
as a ``SplitComplex(re, im)`` pytree of two real arrays and implements the
operations the lasso family needs; each complex matmul lowers to four real
MXU matmuls.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SplitComplex(NamedTuple):
    re: jax.Array
    im: jax.Array

    @property
    def dtype(self):
        return self.re.dtype

    @property
    def shape(self):
        return self.re.shape


def from_numpy(z) -> SplitComplex:
    """Host-side decomposition (use numpy so no complex array ever reaches
    a device)."""
    import numpy as np

    z = np.asarray(z)
    rdt = np.finfo(z.dtype).dtype if np.iscomplexobj(z) else z.dtype
    return SplitComplex(jnp.asarray(np.real(z).astype(rdt)),
                        jnp.asarray(np.imag(z).astype(rdt)))


def to_numpy(z: SplitComplex):
    """Host-side recombination (device->host transfers are real-only)."""
    import numpy as np

    re = np.asarray(z.re)
    im = np.asarray(z.im)
    return re + 1j * im


def zeros_like(z: SplitComplex) -> SplitComplex:
    return SplitComplex(jnp.zeros_like(z.re), jnp.zeros_like(z.im))


def add(a: SplitComplex, b: SplitComplex) -> SplitComplex:
    return SplitComplex(a.re + b.re, a.im + b.im)


def sub(a: SplitComplex, b: SplitComplex) -> SplitComplex:
    return SplitComplex(a.re - b.re, a.im - b.im)


def scale(a: SplitComplex, s) -> SplitComplex:
    """Multiply by a real scalar/array."""
    return SplitComplex(a.re * s, a.im * s)


def conj_t(a: SplitComplex) -> SplitComplex:
    """Conjugate transpose a^H."""
    return SplitComplex(a.re.T, -a.im.T)


def matmul(a: SplitComplex, b: SplitComplex) -> SplitComplex:
    """(a @ b) — four real matmuls."""
    return SplitComplex(a.re @ b.re - a.im @ b.im,
                        a.re @ b.im + a.im @ b.re)


def abs2(a: SplitComplex):
    return a.re * a.re + a.im * a.im


def sum_abs2(a: SplitComplex):
    return jnp.sum(abs2(a))


def real_vdot(a: SplitComplex, b: SplitComplex):
    """Re(<a, b>) = sum(a.re*b.re + a.im*b.im)."""
    return jnp.sum(a.re * b.re + a.im * b.im)


def row_real_vdot(a: SplitComplex, b: SplitComplex):
    """Re(<a_row, b_row>) per leading-axis row."""
    return jnp.sum(a.re * b.re + a.im * b.im, axis=-1)


def row_sum_abs2(a: SplitComplex):
    return jnp.sum(abs2(a), axis=-1)


def l2_normalize_rows(a: SplitComplex, tiny=None) -> SplitComplex:
    """Unit-L2 rows (complex magnitude); zero rows stay zero (mirrors
    utils.normalize.l2_normalize semantics for dictionary atoms)."""
    rdt = a.re.dtype
    if tiny is None:
        tiny = jnp.asarray(jnp.finfo(rdt).tiny, rdt)
    norms = jnp.sqrt(jnp.sum(abs2(a), axis=1, keepdims=True))
    inv = 1.0 / jnp.maximum(norms, tiny)
    return SplitComplex(a.re * inv, a.im * inv)


def soft_threshold(z: SplitComplex, thresh) -> SplitComplex:
    """Magnitude shrinkage keeping phase (mirrors
    decomp_tpu.ops.soft_threshold for complex inputs)."""
    mag = jnp.sqrt(abs2(z))
    shrunk = jnp.maximum(mag - thresh, 0)
    factor = shrunk / jnp.where(mag > 0, mag, 1)
    return SplitComplex(z.re * factor, z.im * factor)


def spectral_norm_hermitian(g: SplitComplex, *, iters: int = 60,
                            safety: float = 1.02):
    """lambda_max of a Hermitian PSD split-complex matrix via power
    iteration (mirrors decomp_tpu.ops.spectral.spectral_norm_psd)."""
    rdt = g.re.dtype
    n = g.re.shape[-1]
    ramp = jnp.linspace(1.0, 2.0, n, dtype=rdt)
    v0 = SplitComplex(ramp / jnp.linalg.norm(ramp), jnp.zeros_like(ramp))
    tiny = jnp.asarray(jnp.finfo(rdt).tiny, rdt)

    def matvec(m, v):
        return SplitComplex(m.re @ v.re - m.im @ v.im,
                            m.re @ v.im + m.im @ v.re)

    def body(_, v):
        w = matvec(g, v)
        nrm = jnp.maximum(jnp.sqrt(sum_abs2(w)), tiny)
        return SplitComplex(w.re / nrm, w.im / nrm)

    v = jax.lax.fori_loop(0, iters, body, v0)
    # Mirrors ops.spectral.spectral_norm_psd: matvec lower bound capped by
    # the certified Hermitian inf-norm upper bound, with the upper bound as
    # fallback when the power iteration visibly has not converged.
    w = matvec(g, v)
    vv = jnp.maximum(sum_abs2(v), tiny)
    rayleigh = real_vdot(v, w) / vv
    mv = jnp.sqrt(sum_abs2(w)) / jnp.sqrt(vv)
    ub = jnp.maximum(jnp.max(jnp.sum(jnp.sqrt(abs2(g)), axis=-1)), tiny)
    not_converged = (mv - rayleigh) > 0.01 * jnp.maximum(rayleigh, tiny)
    lam = jnp.where(not_converged, ub, jnp.minimum(mv * safety, ub))
    return jnp.maximum(lam, tiny)
