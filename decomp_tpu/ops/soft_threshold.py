"""Complex-aware soft-thresholding (proximal operator of the L1 norm).

Reference behaviour (SURVEY.md §2a row 2): shrinks the magnitude and keeps
the phase for complex inputs; classic sign-shrinkage for real inputs.
"""

import jax.numpy as jnp


def soft_threshold(x, thresh):
    """prox_{thresh * ||.||_1}(x), elementwise.

    For real x:    sign(x) * max(|x| - thresh, 0)
    For complex x: (x / |x|) * max(|x| - thresh, 0)   (0 at x == 0)

    ``thresh`` is a nonnegative real scalar or array broadcastable to ``x``.
    """
    if jnp.iscomplexobj(x):
        mag = jnp.abs(x)
        shrunk = jnp.maximum(mag - thresh, 0)
        # x / mag is the unit phase; guard the 0/0 at x == 0 (shrunk is 0 there).
        safe_mag = jnp.where(mag > 0, mag, 1)
        return x * (shrunk / safe_mag).astype(mag.dtype)
    return jnp.sign(x) * jnp.maximum(jnp.abs(x) - thresh, 0)
