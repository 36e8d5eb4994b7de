"""Normalisation helpers (SURVEY.md §2a row 8, ``decomp/utils/normalize.py``)."""

import jax.numpy as jnp

from decomp_tpu.utils.dtypes import real_dtype


def l2_norm(x, axis=None, keepdims=False):
    """Real L2 norm, complex-safe (sums |x|^2, returns real dtype)."""
    sq = jnp.real(x * jnp.conj(x)) if jnp.iscomplexobj(x) else x * x
    return jnp.sqrt(jnp.sum(sq, axis=axis, keepdims=keepdims))


def l2_normalize(x, axis=-1, eps=None):
    """Scale ``x`` to unit L2 norm along ``axis`` (zero-safe).

    Used for dictionary atom renormalisation after each D update
    (SURVEY.md §3.3). Rows with zero norm are left unchanged.
    """
    rdt = real_dtype(x.dtype)
    if eps is None:
        eps = jnp.asarray(jnp.finfo(rdt).tiny, rdt)
    norms = l2_norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norms, eps).astype(rdt)
