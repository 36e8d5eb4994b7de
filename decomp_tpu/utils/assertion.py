"""Host-side input validation (SURVEY.md §2a row 6, ``decomp/utils/assertion.py``).

These run before tracing/jit, so they can raise rich Python exceptions with
the offending shapes/dtypes in the message.
"""

import jax.numpy as jnp
import numpy as np

from decomp_tpu.utils.exceptions import DtypeError, ShapeError


def assert_ndim(name: str, arr, ndims) -> None:
    if isinstance(ndims, int):
        ndims = (ndims,)
    if np.ndim(arr) not in ndims:
        raise ShapeError(
            f"{name} must have ndim in {tuple(ndims)}, got ndim={np.ndim(arr)} "
            f"(shape {np.shape(arr)})"
        )


def assert_axis_size(name: str, arr, axis: int, size: int, size_name: str) -> None:
    actual = np.shape(arr)[axis]
    if actual != size:
        raise ShapeError(
            f"{name}.shape[{axis}] must equal {size_name}={size}, got {actual} "
            f"(shape {np.shape(arr)})"
        )


def assert_same_shape(name_a: str, a, name_b: str, b) -> None:
    if np.shape(a) != np.shape(b):
        raise ShapeError(
            f"{name_a} (shape {np.shape(a)}) and {name_b} (shape {np.shape(b)}) "
            "must have identical shapes"
        )


def assert_inexact(name: str, arr) -> None:
    dtype = np.asarray(arr).dtype if not hasattr(arr, "dtype") else arr.dtype
    # jnp.issubdtype (unlike np's) also recognises extension float types
    # such as bfloat16.
    if not jnp.issubdtype(dtype, jnp.inexact):
        raise DtypeError(f"{name} must be floating or complex, got dtype {dtype}")


def assert_real(name: str, arr) -> None:
    dtype = arr.dtype
    if np.issubdtype(dtype, np.complexfloating):
        raise DtypeError(f"{name} must be real-valued, got dtype {dtype}")


def assert_nonnegative(name: str, value) -> None:
    """Check value (scalar or array) is >= 0. Skipped for abstract tracers
    (e.g. under vmap), where the value cannot be inspected host-side."""
    try:
        ok = bool(np.all(np.asarray(value) >= 0))
    except Exception:
        return  # traced value: cannot validate host-side
    if not ok:
        raise DtypeError(f"{name} must be >= 0, got {value}")
