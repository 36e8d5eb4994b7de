"""Jitted solver iteration loop (SURVEY.md §1 layer L2', §3.5).

The reference runs every solver as a host-side Python ``for`` loop with a
device->host sync per iteration for the convergence check (SURVEY.md §3.1,
"key inefficiency"). Here the whole loop is a single ``jax.lax.while_loop``
with an on-device convergence predicate: exactly one host<->device round
trip per ``solve()`` call.

``run_iterations`` is shared by every solver family (lasso, NMF, dictionary
learning); each supplies a ``step`` function over its own state pytree, a
``diff_fn`` measuring relative change (the convergence quantity), and an
optional ``objective_fn`` for curve recording.
"""

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class IterationResult(NamedTuple):
    state: Any            # final solver state pytree
    niter: jax.Array      # int32: iterations actually executed
    converged: jax.Array  # bool: diff < tol reached before maxiter
    objective: jax.Array  # (maxiter,) objective curve (NaN-padded) or (0,)


def run_iterations(
    step: Callable[[Any, jax.Array], Any],
    init_state: Any,
    *,
    tol,
    maxiter: int,
    diff_fn: Callable[[Any, Any], jax.Array],
    objective_fn: Optional[Callable[[Any], jax.Array]] = None,
    record_objective: bool = False,
    objective_dtype=None,
    check_every: int = 1,
    verbose: bool = False,
    min_iter: int = 0,
) -> IterationResult:
    """Run ``state <- step(state, it)`` until converged or ``maxiter``.

    step:          (state, iteration_index int32) -> new state. The index is
                   for stochastic variants that fold it into an RNG key.
    tol:           convergence threshold on ``diff_fn(old, new)``; pass 0 to
                   always run ``maxiter`` iterations.
    diff_fn:       (old_state, new_state) -> real scalar (e.g. relative
                   factor change). Compared against ``tol`` on device.
    objective_fn:  state -> real scalar; evaluated per iteration only when
                   ``record_objective`` (it usually costs an extra matmul).
    min_iter:      suppress the convergence verdict before this many
                   iterations have run (the loop still executes and
                   ``diff_fn`` is still evaluated). Plateau-style criteria
                   (held-out validation) need this: at a cold start the
                   first steps can show no improvement YET, which is not
                   "no improvement ANYMORE".
    check_every:   evaluate the convergence criterion only every this many
                   iterations (amortises the diff norms when they are a
                   visible fraction of the step cost). ``diff_fn`` then
                   measures the change across the whole block, so tol
                   semantics coarsen accordingly; ``niter`` stays exact.
                   Requires record_objective=False unless 1 (the objective
                   is recorded per iteration).
    verbose:       print iteration index and convergence diff from the
                   device at every check (jax.debug.print; the solver's
                   async execution is unaffected). Requires a runtime with
                   host-callback support — some experimental TPU runtimes
                   (e.g. the 'axon' tunnel) reject all host callbacks
                   with UNIMPLEMENTED; use record_objective there instead.

    Everything here traces into one XLA while loop; no host syncs.
    """
    if maxiter < 1:
        raise ValueError(f"maxiter must be >= 1, got {maxiter}")
    if record_objective and objective_fn is None:
        raise ValueError("record_objective=True requires objective_fn")
    check_every = int(check_every)
    if check_every < 1:
        raise ValueError(f"check_every must be >= 1, got {check_every}")
    if check_every > 1 and record_objective:
        raise ValueError("check_every > 1 is incompatible with "
                         "record_objective")

    if objective_dtype is not None:
        obj_dtype = objective_dtype
    elif objective_fn is not None:
        # Record at the objective's own precision (f64 under x64 parity
        # tests, f32/bf16-real on TPU) — a fixed f32 buffer would cap the
        # accuracy of convergence-curve comparisons (SURVEY.md §4.2).
        obj_dtype = jax.eval_shape(objective_fn, init_state).dtype
    else:
        obj_dtype = jnp.float32
    if record_objective:
        obj0 = jnp.full((maxiter,), jnp.nan, dtype=obj_dtype)
    else:
        obj0 = jnp.zeros((0,), dtype=obj_dtype)

    tol = jnp.asarray(tol)

    def cond(carry):
        it, converged, _, _ = carry
        return jnp.logical_and(it < maxiter, jnp.logical_not(converged))

    def body(carry):
        it, _, state, obj = carry
        if check_every == 1:
            new_state = step(state, it)
            steps_done = 1
        else:
            # Run a block of steps, then one convergence evaluation across
            # the block. The inner trip count shrinks near maxiter so
            # niter stays exact.
            n_steps = jnp.minimum(check_every, maxiter - it)

            def inner(j, s):
                return step(s, it + j)

            new_state = jax.lax.fori_loop(0, n_steps, inner, state)
            steps_done = n_steps
        diff = diff_fn(state, new_state)
        converged = diff < tol.astype(diff.dtype)
        if min_iter > 0:
            converged = jnp.logical_and(converged,
                                        it + steps_done >= min_iter)
        if verbose:
            jax.debug.print("iter {it}: diff={diff}", it=it + steps_done,
                            diff=diff, ordered=False)
        if record_objective:
            obj = obj.at[it].set(objective_fn(new_state).astype(obj_dtype))
        return (it + steps_done, converged, new_state, obj)

    it0 = jnp.asarray(0, jnp.int32)
    conv0 = jnp.asarray(False)
    it, converged, state, obj = jax.lax.while_loop(
        cond, body, (it0, conv0, init_state, obj0)
    )
    return IterationResult(state=state, niter=it, converged=converged,
                           objective=obj)
