"""Dtype helpers (SURVEY.md §2a row 7, reference ``decomp/utils/dtype.py``).

All helpers operate on dtype-like objects and never force 64-bit types, so
the library behaves identically with and without ``jax_enable_x64``.
"""

import jax.numpy as jnp
import numpy as np


def real_dtype(dtype) -> np.dtype:
    """The real dtype underlying ``dtype`` (complex64 -> float32, etc.).

    Used for thresholds, norms, and convergence tolerances, which are real
    quantities even for complex problems.
    """
    return np.dtype(jnp.finfo(dtype).dtype) if _is_inexact(dtype) else np.dtype(dtype)


def _is_inexact(dtype) -> bool:
    return np.issubdtype(np.dtype(dtype), np.inexact)


def is_complex(x_or_dtype) -> bool:
    dtype = getattr(x_or_dtype, "dtype", x_or_dtype)
    return np.issubdtype(np.dtype(dtype), np.complexfloating)


def result_real_dtype(*arrays) -> np.dtype:
    """Common real dtype for scalar results derived from ``arrays``."""
    dtype = jnp.result_type(*arrays)
    return real_dtype(dtype)


def eps_for(dtype, scale: float = 1.0):
    """A small positive constant of the right real dtype."""
    rdt = real_dtype(dtype)
    return np.asarray(np.finfo(rdt).eps * scale, dtype=rdt)
