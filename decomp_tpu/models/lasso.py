"""L1-regularised least squares (lasso) solvers.

Capability parity target: reference ``decomp/lasso.py`` (SURVEY.md §2a row 2,
§3.1): minimise  0.5 * ||y - x @ a||^2 + alpha * ||x||_1  over a batch of row
problems (each row of ``y`` is an independent problem sharing the dictionary
``a``), for real and complex dtypes, with an optional missing-value mask.

Methods
-------
- 'ista'        proximal gradient with step 1/L, L = lambda_max(a @ a^H)
- 'fista'       ISTA + Nesterov momentum (Beck & Teboulle)
- 'acc_ista'    FISTA + adaptive gradient restart (O'Donoghue & Candes) —
                monotone-safe acceleration
- 'cd'          cyclic coordinate descent. Exact per-coordinate minimisation;
                sequential over features, so TPU-hostile — kept as a
                correctness reference (SURVEY.md §7 M2 note). Unmasked only.
- 'parallel_cd' all-coordinates-at-once CD: a diagonally preconditioned
                proximal step in the metric diag(gram)/theta with
                theta = 1/lambda_max(D^-1/2 gram D^-1/2), which is the
                TPU-friendly (fully vectorised) replacement for sequential
                CD and provably converges (majorisation argument).

TPU-native design (SURVEY.md §3.5): one jitted ``lax.while_loop`` per solve;
Gram-form iterations (x @ (a a^H) - y a^H) so the per-iteration hot op is a
single (n_samples, n_feat) x (n_feat, n_feat) MXU matmul; on-device
convergence predicate; momentum state carried on device.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from decomp_tpu.ops.loop import run_iterations
from decomp_tpu.ops.soft_threshold import soft_threshold
from decomp_tpu.ops.spectral import spectral_norm_psd
from decomp_tpu.utils import assertion
from decomp_tpu.utils.dtypes import real_dtype
from decomp_tpu.utils.exceptions import DecompError

from decomp_tpu.utils.result import LassoResult

_METHODS = ("ista", "fista", "acc_ista", "cd", "parallel_cd")


def solve(
    y,
    a,
    alpha,
    x=None,
    *,
    tol=1e-5,
    maxiter: int = 1000,
    method: str = "fista",
    mask=None,
    lipschitz=None,
    record_objective: bool = False,
    precision: str = "highest",
    complex_split="auto",
    check_every: int = 1,
    per_problem: bool = False,
    use_pallas="auto",
    pallas_block_rows=None,
    _pallas_interpret: bool = False,
    return_state: bool = False,
    momentum_state=None,
    state=None,
) -> LassoResult:
    """Solve  min_x 0.5*||mask*(y - x@a)||^2 + alpha*||x||_1.

    Parameters
    ----------
    y : (n_channels,) or (n_samples, n_channels), real or complex. Each row
        is an independent problem (the batch axis; SURVEY.md §2a row 2).
    a : (n_features, n_channels) dictionary, same dtype family as y.
    alpha : nonnegative regularisation weight; scalar or broadcastable to
        the solution shape (per-feature / per-sample weights). 'cd'
        requires a scalar.
    x : optional warm start, shape (..., n_features).
    tol : stop when ||x_new - x_old|| / max(||x_new||, tiny) < tol.
    method : one of 'ista', 'fista', 'acc_ista', 'cd', 'parallel_cd'.
    mask : broadcastable to y; 1 = observed, 0 = missing. Unsupported for
        'cd'.
    lipschitz : optional user-supplied L >= lambda_max(a @ a^H); skips the
        on-device power-iteration estimate.
    record_objective : record the objective per iteration (extra matmul).
    precision : matmul precision on TPU for f32 data. 'highest' (default,
        f32-exact passes); 'high' (bf16x3) converges in the same number of
        iterations with ~1e-4 solution agreement at ~2x the speed
        (measured); 'default' (single bf16 pass) can SILENTLY DIVERGE for
        momentum methods — the rel-change criterion may still trigger while
        the iterates blow up. Only use 'default' with bf16-tolerant
        problems and external validation.
    complex_split : True / False / 'auto'. TPU backends have limited or no
        complex-dtype support (SURVEY.md §7 hard part 5); with split mode
        the solver runs complex problems as (real, imag) pairs — each
        complex matmul becomes four real MXU matmuls — and reassembles the
        complex solution on the CPU device. 'auto' enables it for complex
        inputs when the default backend is TPU. Unsupported for method
        'cd' and requires concrete (non-traced) inputs.
    per_problem : every row converges independently (SURVEY.md §7 hard
        part 4): converged rows freeze at their own stopping iteration
        (output rows match per-row single solves), the loop runs until all
        rows are done or maxiter, and ``niter``/``converged`` come back as
        per-row arrays of shape (n_samples,). Methods ista / fista /
        acc_ista / parallel_cd. Default False = reference-parity global
        criterion (every row runs until the slowest converges).
    use_pallas : True / False / 'auto'. Two fused Pallas TPU paths exist:
        - MASKED problems: compute the gradient (mask*(x@a) - my) @ a^T
          with a fused kernel that keeps the M x N masked reconstruction
          VMEM-resident instead of materialising it in HBM each iteration
          (BASELINE.json:5).
        - UNMASKED + ``per_problem=True``: the WHOLE solve runs inside
          one kernel (ops.pallas_fista): the F x F Gram stays VMEM-
          resident, each stripe of independent rows iterates entirely in
          VMEM with per-row stopping, and HBM sees each row exactly once
          — versus one small matmul plus a full pass over the iterates
          per iteration in the jnp while_loop (VERDICT.md round-2 #1).
          Requires real float32, a gradient method, scalar or per-feature
          alpha, record_objective=False and precision 'highest' or 'high'
          ('high' runs the gradient as three single-pass bf16 matmuls —
          the manual bf16x3 decomposition — at ~3x the f32 rate).
        Inputs are zero-padded once to the kernels' 128-alignment (a
        fixed point of the iteration) and the solution sliced back.
        'auto' enables either path on calibrated TPU generations for
        large problems.
    return_state : momentum methods (fista / acc_ista) additionally return
        ``aux={"z": ..., "t": ...}`` — the Nesterov extrapolation point and
        per-row momentum scalars. Passing these back via ``momentum_state=
        (z, t)`` together with ``x=`` resumes the EXACT trajectory, so a
        chunked run (utils.checkpoint.checkpointed_solve) reproduces the
        uninterrupted one bit-for-bit. Works with ``per_problem=True``
        too: combine with the result's per-row ``converged``/``niter``
        (the ``state`` dict below) so resumed rows stay frozen and row
        iteration counts accumulate across chunks.
    momentum_state : optional (z, t) from a previous result's ``aux``;
        requires a warm start ``x`` and a momentum method.
    state : optional dict resume form (supersedes ``momentum_state``):
        keys among {"z", "t", "done", "niter"}. "z"/"t" are the momentum
        pair (as in ``momentum_state``); "done"/"niter" are the per-row
        converged mask and iteration counts from a previous
        ``per_problem=True`` result (pass ``result.converged`` /
        ``result.niter``) — resumed done rows never move again and the
        returned per-row ``niter`` is cumulative, so a chunked
        per-problem run reproduces the uninterrupted one exactly
        (VERDICT.md round-2 Missing #5).

    Returns
    -------
    LassoResult(x, niter, converged, objective). ``x`` has y's leading
    shape + (n_features,); ``niter``/``converged`` are scalars, or
    per-row (n_samples,) arrays when ``per_problem``.
    """
    if method not in _METHODS:
        raise DecompError(f"method must be one of {_METHODS}, got {method!r}")
    if int(maxiter) < 1:
        # uniform across paths (the jnp loop raises this inside
        # run_iterations; the whole-solve kernel path bypasses it)
        raise ValueError(f"maxiter must be >= 1, got {maxiter}")
    if per_problem and method == "cd":
        raise DecompError("per_problem convergence does not support "
                          "method 'cd'")
    pp_state = None
    if state is not None:
        if momentum_state is not None:
            raise DecompError("pass either state= or momentum_state=, "
                              "not both")
        if not isinstance(state, dict):
            raise DecompError("state must be a dict with keys among "
                              "{'z', 't', 'done', 'niter'}")
        unknown = set(state) - {"z", "t", "done", "niter"}
        if unknown:
            raise DecompError(f"unknown state keys {sorted(unknown)}")
        if ("z" in state) != ("t" in state):
            raise DecompError("state 'z' and 't' come as a pair (a "
                              "momentum result's aux)")
        if ("done" in state) != ("niter" in state):
            raise DecompError("state 'done' and 'niter' come as a pair "
                              "(a per_problem result's converged/niter)")
        if "z" in state:
            momentum_state = (state["z"], state["t"])
        if "done" in state:
            if not per_problem:
                raise DecompError("state done/niter resume requires "
                                  "per_problem=True")
            pp_state = (state["done"], state["niter"])
    if momentum_state is not None:
        if method not in ("fista", "acc_ista"):
            raise DecompError("momentum_state applies to momentum methods "
                              "(fista / acc_ista) only")
        if x is None:
            raise DecompError("momentum_state requires the warm start x "
                              "(the FISTA state is (x, z, t))")

    if complex_split == "auto":
        complex_split = (_is_complex_concrete(y, a)
                         and jax.default_backend() == "tpu")
    if complex_split and _is_complex_concrete(y, a):
        # Split path: never materialise a complex array on the device.
        if method == "cd":
            raise DecompError("complex_split does not support method 'cd'")
        return _solve_complex_split(
            y, a, alpha, x, mask, lipschitz, tol=tol, method=method,
            maxiter=int(maxiter),
            record_objective=bool(record_objective), precision=precision,
            check_every=int(check_every), per_problem=bool(per_problem),
            return_state=bool(return_state), momentum_state=momentum_state,
            per_problem_state=pp_state, use_pallas=use_pallas,
            pallas_block_rows=pallas_block_rows,
            _pallas_interpret=bool(_pallas_interpret))

    y = jnp.asarray(y)
    a = jnp.asarray(a)
    assertion.assert_inexact("y", y)
    assertion.assert_ndim("y", y, (1, 2))
    assertion.assert_ndim("a", a, 2)
    squeeze = y.ndim == 1
    if squeeze:
        y = y[None, :]
    assertion.assert_axis_size("a", a, 1, y.shape[1], "n_channels")
    n_features = a.shape[0]

    dtype = jnp.result_type(y.dtype, a.dtype)
    y = y.astype(dtype)
    a = a.astype(dtype)
    if x is not None:
        x = jnp.asarray(x, dtype)
        if squeeze and x.ndim == 1:
            x = x[None, :]
        assertion.assert_ndim("x", x, 2)
        assertion.assert_axis_size("x", x, 0, y.shape[0], "n_samples")
        assertion.assert_axis_size("x", x, 1, n_features, "n_features")
    if mask is not None:
        mask = jnp.asarray(mask)
        if squeeze and mask.ndim == 1:
            mask = mask[None, :]
        assertion.assert_same_shape("mask", mask, "y", y)
        mask = mask.astype(real_dtype(dtype))
        if method == "cd":
            raise DecompError("method 'cd' does not support mask; use "
                              "'parallel_cd' or 'fista'")

    rdt = real_dtype(dtype)
    assertion.assert_nonnegative("alpha", alpha)
    alpha = jnp.asarray(alpha, rdt)
    if method == "cd" and alpha.ndim != 0:
        raise DecompError("method 'cd' requires a scalar alpha")
    lip = None if lipschitz is None else jnp.asarray(lipschitz, rdt)

    mstate = None
    if momentum_state is not None:
        z0 = jnp.asarray(momentum_state[0], dtype)
        if squeeze and z0.ndim == 1:
            z0 = z0[None, :]
        assertion.assert_ndim("momentum_state z", z0, 2)
        assertion.assert_axis_size("momentum_state z", z0, 0, y.shape[0],
                                   "n_samples")
        assertion.assert_axis_size("momentum_state z", z0, 1, n_features,
                                   "n_features")
        t0 = jnp.broadcast_to(jnp.asarray(momentum_state[1], rdt),
                              (y.shape[0],))
        mstate = (z0, t0)

    ppstate = None
    if pp_state is not None:
        done0 = jnp.asarray(pp_state[0])
        nit0 = jnp.asarray(pp_state[1])
        if squeeze:
            if done0.ndim == 0:
                done0 = done0[None]
            if nit0.ndim == 0:
                nit0 = nit0[None]
        assertion.assert_ndim("state done", done0, 1)
        assertion.assert_axis_size("state done", done0, 0, y.shape[0],
                                   "n_samples")
        assertion.assert_ndim("state niter", nit0, 1)
        assertion.assert_axis_size("state niter", nit0, 0, y.shape[0],
                                   "n_samples")
        ppstate = (done0.astype(bool), nit0.astype(jnp.int32))

    from decomp_tpu.ops import pallas_fista, pallas_lasso
    from decomp_tpu.ops.pallas_mu import calibrated_tpu as _calibrated_tpu

    grad_methods = ("ista", "fista", "acc_ista", "parallel_cd")
    is_complex = jnp.issubdtype(dtype, jnp.complexfloating)
    f_pad128 = -(-n_features // 128) * 128
    pallas_mode = None
    if use_pallas == "auto":
        if (mask is not None
                and _calibrated_tpu()
                and method in grad_methods
                and not is_complex
                and y.shape[0] * y.shape[1] >= (1 << 20)
                and pallas_lasso.auto_wins(-(-y.shape[1] // 128) * 128,
                                           f_pad128, dtype.itemsize,
                                           pallas_block_rows)):
            pallas_mode = "masked"
        elif (mask is None
                and per_problem
                and _calibrated_tpu()
                and method in grad_methods
                and dtype == jnp.float32
                and not record_objective
                and precision in ("highest", "high")
                and alpha.ndim <= 1
                and y.shape[0] * n_features >= (1 << 18)
                and pallas_fista.fits_vmem(
                    f_pad128, method in ("fista", "acc_ista"),
                    precision == "high",
                    block_rows=pallas_block_rows)):
            pallas_mode = "whole"
    elif use_pallas:
        if method not in grad_methods:
            raise DecompError(
                "use_pallas=True requires a gradient method "
                f"{grad_methods}, got {method!r}")
        if is_complex:
            raise DecompError("use_pallas=True does not support complex "
                              "dtypes (use complex_split)")
        if mask is not None:
            pallas_mode = "masked"
        else:
            # Whole-solve kernel: per-row stopping is intrinsic to its
            # stripe-resident design (a global lock-step criterion cannot
            # couple independently-retiring stripes).
            if not per_problem:
                raise DecompError(
                    "use_pallas=True on unmasked problems runs the whole-"
                    "solve kernel, which requires per_problem=True (each "
                    "stripe of rows stops on its own; there is no global "
                    "lock-step criterion). The unmasked global-criterion "
                    "gradient is already a single Gram matmul.")
            if dtype != jnp.float32:
                raise DecompError("the whole-solve kernel requires "
                                  f"float32 inputs, got {dtype}")
            if record_objective:
                raise DecompError("the whole-solve kernel cannot record "
                                  "per-iteration objectives (iterations "
                                  "never leave VMEM); use use_pallas="
                                  "False for objective curves")
            if precision not in ("highest", "high"):
                raise DecompError("the whole-solve kernel supports "
                                  "precision 'highest' or 'high' only")
            if alpha.ndim > 1:
                raise DecompError("the whole-solve kernel supports scalar "
                                  "or per-feature alpha (per-sample "
                                  "weights take the jnp path)")
            pallas_mode = "whole"

    if pallas_mode == "whole":
        res = _solve_whole(
            y, a, alpha, x, lip, jnp.asarray(tol, rdt),
            None if mstate is None else mstate[0],
            None if mstate is None else mstate[1],
            None if ppstate is None else ppstate[0],
            None if ppstate is None else ppstate[1],
            method=method, maxiter=int(maxiter),
            hi_lo=(precision == "high"),
            block_rows=pallas_block_rows,
            interpret=bool(_pallas_interpret),
            return_state=bool(return_state),
            fixed=_static_nonpositive(tol))
        if squeeze:
            res = res._replace(x=res.x[0], niter=res.niter[0],
                               converged=res.converged[0])
            if res.aux is not None:
                res = res._replace(aux={"z": res.aux["z"][0],
                                        "t": res.aux["t"][0]})
        return res

    use_pallas = pallas_mode == "masked"
    orig_m, orig_f = y.shape[0], n_features
    if use_pallas:
        # Zero-pad once to the kernel's alignment; zero rows/features/
        # channels are a fixed point of the proximal iteration (zero
        # gradient, zero threshold result), so trajectories on the real
        # coordinates are unchanged and we slice the padding back off.
        m_pad, n_pad, f_pad, br = pallas_lasso.kernel_alignment(
            orig_m, y.shape[1], n_features, dtype.itemsize,
            pallas_block_rows)
        pallas_block_rows = br
        y = pallas_lasso.pad2(y, m_pad, n_pad)
        mask = pallas_lasso.pad2(mask, m_pad, n_pad)
        a = pallas_lasso.pad2(a, f_pad, n_pad)
        if x is not None:
            x = pallas_lasso.pad2(x, m_pad, f_pad)
        alpha = pallas_lasso.pad_alpha(alpha, m_pad, f_pad)
        if mstate is not None:
            mstate = (pallas_lasso.pad2(mstate[0], m_pad, f_pad),
                      jnp.pad(mstate[1], (0, m_pad - orig_m),
                              constant_values=1.0))
        if ppstate is not None:
            # Padded rows resume "done" so they never iterate.
            ppstate = (jnp.pad(ppstate[0], (0, m_pad - orig_m),
                               constant_values=True),
                       jnp.pad(ppstate[1], (0, m_pad - orig_m)))

    # 'highest' matmul precision: TPU's default bf16 MXU passes put a ~1e-3
    # noise floor under iterative convergence (see nmf.solve for details).
    if (precision == "default" and jax.default_backend() == "tpu"
            and not jnp.issubdtype(dtype, jnp.complexfloating)
            and jnp.finfo(dtype).bits >= 32):
        import warnings

        warnings.warn(
            "lasso with precision='default' on TPU runs single-pass bf16 "
            "matmuls and has been observed to diverge silently (the "
            "rel-change stop can trigger on garbage iterates); use "
            "precision='high' for a ~2x speedup that tracks 'highest'.",
            RuntimeWarning, stacklevel=2)
    with jax.default_matmul_precision(precision):
        res = _solve(
            y, a, alpha, x, mask, lip, jnp.asarray(tol, rdt),
            method=method, maxiter=int(maxiter),
            record_objective=bool(record_objective),
            check_every=int(check_every), per_problem=bool(per_problem),
            use_pallas=use_pallas,
            pallas_block_rows=pallas_block_rows if use_pallas else None,
            pallas_interpret=bool(_pallas_interpret),
            return_state=bool(return_state), momentum_state=mstate,
            per_problem_state=ppstate,
        )
    if use_pallas:  # slice the alignment padding back off
        res = res._replace(x=res.x[:orig_m, :orig_f])
        if per_problem:
            res = res._replace(niter=res.niter[:orig_m],
                               converged=res.converged[:orig_m])
        if res.aux is not None:
            res = res._replace(aux={"z": res.aux["z"][:orig_m, :orig_f],
                                    "t": res.aux["t"][:orig_m]})
    if squeeze:
        res = res._replace(x=res.x[0])
        if per_problem:
            res = res._replace(niter=res.niter[0],
                               converged=res.converged[0])
        if res.aux is not None:
            res = res._replace(aux={"z": res.aux["z"][0],
                                    "t": res.aux["t"][0]})
    return res


def build_solver(y, a, alpha, x, mask, lipschitz, *, method,
                 reduce_sum=None, per_problem=False, tol=None,
                 vary_rows=None, use_pallas=False, pallas_block_rows=None,
                 pallas_interpret=False, pallas_vma=None,
                 momentum_init=None, per_problem_init=None):
    """Construct the iteration machinery for one lasso method.

    Returns ``(step, init, diff_fn, obj_fn)`` for ``run_iterations``. All
    cross-sample scalar reductions (convergence norms, objective) go
    through ``reduce_sum``, so the same machinery runs single-device
    (``reduce_sum=None`` -> identity) and row-sharded under ``shard_map``
    (``reduce_sum=partial(lax.psum, axis_name=...)``; SURVEY.md §2b N5).
    ``y``/``x``/``mask`` are then the device-local row blocks while ``a``
    is replicated. The acc_ista adaptive restart is ROW-LOCAL (each
    problem restarts its own momentum; O'Donoghue & Candes restart is per
    convex problem, and the batch rows are independent problems), so it
    needs no cross-device reduction.

    per_problem=True (methods ista/fista/acc_ista/parallel_cd; requires
    ``tol``): every row of the batch converges independently (SURVEY.md §7
    hard part 4). The state carries a per-row ``done`` mask and per-row
    iteration counts; converged rows FREEZE (their x/z/t stop updating, so
    each row's output is bit-identical to stopping that row's solve at its
    own convergence iteration), and the while_loop exits when every row is
    done. ``diff_fn`` then returns the (reduce_sum'd) count of unconverged
    rows, which ``run_iterations`` compares against tol (count==0 <=>
    converged). State layout gains ``(..., done, niter_rows)`` at the end.

    vary_rows: shard_map callers must pass ``lambda v: jax.lax.pcast(v,
    axis, to="varying")`` — the freshly created row-shaped carry inits
    (per-row momentum t, done mask, iteration counts) are device-unvarying
    until marked, and while_loop requires loop-invariant carry types.
    """
    red = (lambda s: s) if reduce_sum is None else reduce_sum
    vrows = (lambda v: v) if vary_rows is None else vary_rows
    dtype = y.dtype
    rdt = real_dtype(dtype)
    ah = a.conj().T
    gram = a @ ah                        # (n_feat, n_feat), Hermitian PSD
    my = y if mask is None else mask * y
    yah = my @ ah                        # (n_samples, n_feat)

    if x is None:
        x = jnp.zeros((y.shape[0], a.shape[0]), dtype)

    if mask is None:
        def grad(x_):
            return x_ @ gram - yah
    elif use_pallas:
        # Fused masked gradient: the M x N reconstruction stays in VMEM
        # (BASELINE.json:5). Caller pre-pads to the kernel alignment.
        from decomp_tpu.ops import pallas_lasso

        def grad(x_):
            return pallas_lasso.masked_grad_rows(
                my, mask, x_, a, block_rows=pallas_block_rows,
                interpret=pallas_interpret, vma=pallas_vma)
    else:
        def grad(x_):
            return (mask * (x_ @ a) - my) @ ah

    def sumsq(v):
        return red(jnp.sum(jnp.real(v * jnp.conj(v))))

    def objective(x_):
        resid = (my - x_ @ a) if mask is None else (my - mask * (x_ @ a))
        return 0.5 * sumsq(resid) + red(jnp.sum(alpha * jnp.abs(x_)))

    tiny = jnp.asarray(jnp.finfo(rdt).tiny, rdt)

    def rel_change(x_old, x_new):
        return jnp.sqrt(sumsq(x_new - x_old)) / jnp.maximum(
            jnp.sqrt(sumsq(x_new)), tiny)

    if per_problem and method not in ("ista", "fista", "acc_ista",
                                      "parallel_cd"):
        raise DecompError(
            f"per_problem convergence is not supported for method "
            f"{method!r} (sequential 'cd' sweeps cannot freeze rows)")
    if per_problem and tol is None:
        raise ValueError("per_problem=True requires tol")

    if method in ("ista", "fista", "acc_ista", "parallel_cd"):
        if method == "parallel_cd":
            diag = jnp.maximum(jnp.real(jnp.diagonal(gram)), tiny)
            # theta = 1 / lambda_max(D^-1/2 gram D^-1/2): largest step for
            # which the diagonal metric D/theta majorises the quadratic, so
            # the simultaneous per-coordinate prox step converges.
            scale = 1.0 / jnp.sqrt(diag)
            ngram = (scale[:, None] * gram
                     * scale[None, :]).astype(gram.dtype)
            theta = (1.0 / spectral_norm_psd(ngram)).astype(rdt)
            stepsz = (theta / diag).astype(rdt)
        else:
            lip_ = (spectral_norm_psd(gram) if lipschitz is None
                    else lipschitz)
            stepsz = (1.0 / lip_).astype(rdt)
        thresh = alpha * stepsz

        def prox(v):
            return soft_threshold(v - stepsz * grad(v), thresh)

        momentum = method in ("fista", "acc_ista")
        restart = method == "acc_ista"
        n_rows = y.shape[0]
        ones_t = jnp.ones((n_rows,), rdt)

        def row_real_vdot(u, v):
            return jnp.sum(jnp.real(jnp.conj(u) * v), axis=-1)

        def row_sumsq(v):
            return jnp.sum(jnp.real(v * jnp.conj(v)), axis=-1)

        def momentum_step(x_, z, t):
            """One FISTA step from extrapolation point z with per-row
            momentum; row-local adaptive gradient restart (O'Donoghue &
            Candes 2015) when the momentum direction opposes the last
            proximal step of that row."""
            x_new = prox(z)
            t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
            z_new = x_new + (((t - 1.0) / t_new)
                             .astype(rdt)[:, None]) * (x_new - x_)
            if restart:
                do = row_real_vdot(z - x_new, x_new - x_) > 0
                t_new = jnp.where(do, ones_t, t_new)
                z_new = jnp.where(do[:, None], x_new, z_new)
            return x_new, z_new, t_new

        if not per_problem:
            if momentum:
                def step(state, it):
                    del it
                    return momentum_step(*state)

                if momentum_init is not None:
                    # Exact chunked resume: (z, t) from a previous run's
                    # aux continue the trajectory bit-for-bit.
                    init = (x, momentum_init[0], momentum_init[1])
                else:
                    init = (x, x, vrows(ones_t))
            else:
                def step(state, it):
                    del it
                    return (prox(state[0]),)

                init = (x,)

            def diff_fn(old, new):
                return rel_change(old[0], new[0])

        else:
            tol_r = jnp.asarray(tol).astype(rdt)
            if per_problem_init is not None:
                # Exact chunked resume (VERDICT.md round-2 Missing #5):
                # previously-converged rows stay frozen and per-row
                # counts accumulate, so a chunked run equals the
                # uninterrupted one row-for-row. Single-device resume
                # only (no vrows marking needed on caller inputs).
                done0 = per_problem_init[0].astype(bool)
                nit0 = per_problem_init[1].astype(jnp.int32)
            else:
                done0 = vrows(jnp.zeros((n_rows,), bool))
                nit0 = vrows(jnp.zeros((n_rows,), jnp.int32))

            def row_done(x_old, x_cand):
                # Per-row mirror of rel_change(...) < tol: the row freezes
                # at exactly the iteration its own single-problem solve
                # would stop at. Division form, NOT `num < tol * den`:
                # for an exactly-zero row den clamps to f32-tiny and
                # tol*tiny is subnormal — TPUs flush subnormals to zero,
                # so the product form compares 0 < 0 and the row would
                # never mark done (found in round-2 self-review).
                num = jnp.sqrt(row_sumsq(x_cand - x_old))
                den = jnp.maximum(jnp.sqrt(row_sumsq(x_cand)), tiny)
                return num / den < tol_r

            if momentum:
                def step(state, it):
                    del it
                    x_, z, t, done, nit = state
                    x_cand, z_cand, t_cand = momentum_step(x_, z, t)
                    keep = done[:, None]
                    x_new = jnp.where(keep, x_, x_cand)
                    z_new = jnp.where(keep, z, z_cand)
                    t_new = jnp.where(done, t, t_cand)
                    done_new = jnp.logical_or(done, row_done(x_, x_cand))
                    nit_new = nit + jnp.logical_not(done).astype(jnp.int32)
                    return (x_new, z_new, t_new, done_new, nit_new)

                if momentum_init is not None:
                    init = (x, momentum_init[0], momentum_init[1],
                            done0, nit0)
                else:
                    init = (x, x, vrows(ones_t), done0, nit0)
            else:
                def step(state, it):
                    del it
                    x_, done, nit = state
                    x_cand = prox(x_)
                    x_new = jnp.where(done[:, None], x_, x_cand)
                    done_new = jnp.logical_or(done, row_done(x_, x_cand))
                    nit_new = nit + jnp.logical_not(done).astype(jnp.int32)
                    return (x_new, done_new, nit_new)

                init = (x, done0, nit0)

            def diff_fn(old, new):
                del old
                # Count of rows still iterating, reduced across the mesh
                # in the sharded path. Callers compare it against a FIXED
                # loop threshold of 0.5 (count < 0.5 <=> count == 0), not
                # the user tol — a degenerate tol > 1 must not stop the
                # loop with unconverged rows (ADVICE round-2 #4).
                return red(jnp.sum(jnp.logical_not(new[-2]).astype(rdt)))

        def obj_fn(state):
            return objective(state[0])

    elif method == "cd":
        diag = jnp.maximum(jnp.real(jnp.diagonal(gram)), tiny)
        n_feat = a.shape[0]

        def sweep(state, it):
            del it
            x_, c = state  # c = x @ gram, maintained by rank-1 updates

            def one_coord(j, carry):
                x_c, c_c = carry
                g_row = jax.lax.dynamic_slice_in_dim(gram, j, 1, axis=0)[0]
                g_jj = diag[j]
                r = yah[:, j] - c_c[:, j] + x_c[:, j] * g_jj.astype(dtype)
                xj = soft_threshold(r, alpha) / g_jj.astype(dtype)
                delta = xj - x_c[:, j]
                c_c = c_c + delta[:, None] * g_row[None, :]
                x_c = x_c.at[:, j].set(xj)
                return (x_c, c_c)

            return jax.lax.fori_loop(0, n_feat, one_coord, (x_, c))

        init = (x, x @ gram)

        def diff_fn(old, new):
            return rel_change(old[0], new[0])

        def obj_fn(state):
            return objective(state[0])

        step = sweep
    else:  # pragma: no cover - guarded in solve()
        raise AssertionError(method)

    return step, init, diff_fn, obj_fn


@functools.partial(
    jax.jit, static_argnames=("method", "maxiter", "record_objective",
                              "check_every", "per_problem", "use_pallas",
                              "pallas_block_rows", "pallas_interpret",
                              "return_state")
)
def _solve(y, a, alpha, x, mask, lipschitz, tol, *, method, maxiter,
           record_objective, check_every=1, per_problem=False,
           use_pallas=False, pallas_block_rows=None,
           pallas_interpret=False, return_state=False,
           momentum_state=None, per_problem_state=None):
    step, init, diff_fn, obj_fn = build_solver(
        y, a, alpha, x, mask, lipschitz, method=method,
        per_problem=per_problem, tol=tol, use_pallas=use_pallas,
        pallas_block_rows=pallas_block_rows,
        pallas_interpret=pallas_interpret, momentum_init=momentum_state,
        per_problem_init=per_problem_state)
    # per_problem's diff_fn returns the COUNT of unconverged rows; the
    # loop threshold is then the fixed 0.5 (count == 0), never the user
    # tol (ADVICE round-2 #4: tol > 1 must not stop early).
    loop_tol = (jnp.asarray(0.5, real_dtype(y.dtype)) if per_problem
                else tol)
    res = run_iterations(
        step, init, tol=loop_tol, maxiter=maxiter, diff_fn=diff_fn,
        objective_fn=obj_fn, record_objective=record_objective,
        check_every=check_every,
    )
    aux = None
    if return_state and method in ("fista", "acc_ista"):
        aux = {"z": res.state[1], "t": res.state[2]}
    if per_problem:
        return LassoResult(x=res.state[0], niter=res.state[-1],
                           converged=res.state[-2],
                           objective=res.objective, aux=aux)
    return LassoResult(x=res.state[0], niter=res.niter,
                       converged=res.converged, objective=res.objective,
                       aux=aux)


def _static_nonpositive(tol) -> bool:
    """True when ``tol``'s value is known at Python time and <= 0. Used
    to engage the whole-solve kernel's FIXED-BUDGET mode (at tol <= 0 no
    row can stop before maxiter, so the kernel statically elides its
    per-iteration freeze/stopping lattice — bit-identical results, see
    ops.pallas_fista._kernel). A traced tol conservatively returns False:
    semantics are unchanged either way, only the elision is skipped."""
    if isinstance(tol, jax.core.Tracer):
        return False
    try:
        return float(tol) <= 0.0
    except (TypeError, ValueError):
        return False


@functools.partial(
    jax.jit, static_argnames=("method", "maxiter", "hi_lo", "block_rows",
                              "interpret", "return_state", "fixed")
)
def _solve_whole(y, a, alpha, x, lipschitz, tol, z0, t0, done0, nit0, *,
                 method, maxiter, hi_lo, block_rows, interpret,
                 return_state, fixed=False):
    """jit entry for :func:`_whole_core` (kept separate so dictionary
    learning can trace the core inside its own outer while_loop)."""
    return _whole_core(y, a, alpha, x, lipschitz, tol, z0, t0, done0,
                       nit0, method=method, maxiter=maxiter, hi_lo=hi_lo,
                       block_rows=block_rows, interpret=interpret,
                       return_state=return_state, fixed=fixed)


def _whole_core(y, a, alpha, x, lipschitz, tol, z0, t0, done0, nit0, *,
                method, maxiter, hi_lo, block_rows, interpret,
                return_state, fixed=False):
    """Whole-solve Pallas path (unmasked batch, per-problem stopping):
    the ENTIRE batched proximal-gradient solve runs inside
    ``ops.pallas_fista.solve_rows`` (VERDICT.md round-2 Next #1). The
    Gram/projection/step-size precompute always runs at 'highest' (it is
    one-off and sets the fixed point); the iteration precision is the
    static ``hi_lo`` flag (False = f32-exact dots, True = manual bf16x3).
    """
    from decomp_tpu.ops import pallas_fista

    f32 = jnp.float32
    m = y.shape[0]
    f = a.shape[0]
    tiny = jnp.asarray(jnp.finfo(f32).tiny, f32)
    with jax.default_matmul_precision("highest"):
        ah = a.T
        gram = a @ ah
        yah = y @ ah
        feat_vecs = (method == "parallel_cd"
                     or jnp.asarray(alpha).ndim == 1)
        if method == "parallel_cd":
            # Same diagonally-preconditioned step as build_solver.
            diag = jnp.maximum(jnp.diagonal(gram), tiny)
            scale = 1.0 / jnp.sqrt(diag)
            ngram = (scale[:, None] * gram * scale[None, :]).astype(f32)
            theta = 1.0 / spectral_norm_psd(ngram)
            stepsz = (theta / diag).astype(f32)                    # (f,)
        else:
            lip = (spectral_norm_psd(gram) if lipschitz is None
                   else lipschitz)
            stepsz = (1.0 / lip).astype(f32)                     # scalar
            if feat_vecs:
                stepsz = jnp.broadcast_to(stepsz, (f,))
    thresh = jnp.asarray(alpha, f32) * stepsz      # scalar or (f,)

    momentum = method in ("fista", "acc_ista")
    f_pad = -(-f // 128) * 128
    br = block_rows or pallas_fista.default_block_rows(f_pad, momentum,
                                                       hi_lo)
    br = min(br, -(-m // 16) * 16)
    m_pad = -(-m // br) * br

    def pad(v, rows, cols):
        return jnp.pad(v, ((0, rows - v.shape[0]),
                           (0, cols - v.shape[1])))

    # Zero padding is a fixed point: padded features carry zero Gram
    # rows/cols, zero step and zero threshold (so they stay exactly 0);
    # padded rows carry zero data and START done, so they never iterate
    # and never hold a stripe open.
    gram_p = pad(gram.astype(f32), f_pad, f_pad)
    yah_p = pad(yah.astype(f32), m_pad, f_pad)
    x0 = jnp.zeros((m, f), f32) if x is None else x.astype(f32)
    x0_p = pad(x0, m_pad, f_pad)
    z0_p = x0_p if z0 is None else pad(z0.astype(f32), m_pad, f_pad)
    t0_v = (jnp.ones((m, 1), f32) if t0 is None
            else t0.reshape(m, 1).astype(f32))
    d0_v = (jnp.zeros((m, 1), f32) if done0 is None
            else done0.reshape(m, 1).astype(f32))
    n0_v = (jnp.zeros((m, 1), f32) if nit0 is None
            else nit0.reshape(m, 1).astype(f32))
    t0_p = jnp.pad(t0_v, ((0, m_pad - m), (0, 0)), constant_values=1.0)
    d0_p = jnp.pad(d0_v, ((0, m_pad - m), (0, 0)), constant_values=1.0)
    n0_p = jnp.pad(n0_v, ((0, m_pad - m), (0, 0)))
    if feat_vecs:
        # Padded features carry zero step/threshold (and zero Gram/yah),
        # so they stay exactly 0.
        step_p = jnp.pad(stepsz, (0, f_pad - f))[None, :]
        thr_p = jnp.pad(thresh, (0, f_pad - f))[None, :]
    else:
        # Scalar fast path (SMEM): padded features see the real scalar
        # step/threshold, but their gradient is identically zero (zero
        # Gram rows, zero yah) so soft-thresholding keeps them at 0.
        step_p, thr_p = stepsz, thresh

    x_out, z_out, t_out, done, nit = pallas_fista.solve_rows(
        yah_p, gram_p, x0_p, z0_p, t0_p, d0_p, n0_p, step_p, thr_p,
        jnp.asarray(tol, f32), momentum=momentum,
        restart=(method == "acc_ista"), maxiter=maxiter, block_rows=br,
        hi_lo=hi_lo, interpret=interpret, fixed=fixed)

    aux = None
    if return_state and momentum:
        aux = {"z": z_out[:m, :f], "t": t_out[:m, 0]}
    return LassoResult(
        x=x_out[:m, :f], niter=nit[:m, 0],
        converged=done[:m, 0] > 0.5,
        objective=jnp.zeros((0,), f32), aux=aux)


@functools.partial(
    jax.jit, static_argnames=("method", "maxiter", "hi_lo", "block_rows",
                              "interpret", "return_state", "fixed")
)
def _solve_whole_split(ys, a_s, alpha, xs, lipschitz, tol, z0s, t0,
                       done0, nit0, *, method, maxiter, hi_lo,
                       block_rows, interpret, return_state, fixed=False):
    """Whole-solve Pallas path for SPLIT-COMPLEX batches (round 4,
    VERDICT round-3 Missing #4): the complex batch runs through
    ``ops.pallas_fista.solve_rows``'s ``group_fc`` mode — columns hold
    [re | im] blocks, the Gram is the real 2Fc x 2Fc embedding
    [[Gre, Gim], [-Gim, Gre]] of the complex Gram (so v @ G2 computes
    the split complex product v @ Gc), and the prox is the
    paired-magnitude soft-threshold. Everything else (per-row stopping,
    momentum/restart state, exact resume) is the real path verbatim.
    """
    from decomp_tpu.ops import complex_split as cs
    from decomp_tpu.ops import pallas_fista

    f32 = jnp.float32
    m = ys.re.shape[0]
    f = a_s.re.shape[0]
    tiny = jnp.asarray(jnp.finfo(f32).tiny, f32)
    with jax.default_matmul_precision("highest"):
        ah = cs.conj_t(a_s)
        gram = cs.matmul(a_s, ah)        # split Hermitian PSD
        yah = cs.matmul(ys, ah)
        feat_vecs = (method == "parallel_cd"
                     or jnp.asarray(alpha).ndim == 1)
        if method == "parallel_cd":
            diag = jnp.maximum(jnp.diagonal(gram.re), tiny)
            scale = 1.0 / jnp.sqrt(diag)
            ngram = cs.SplitComplex(
                scale[:, None] * gram.re * scale[None, :],
                scale[:, None] * gram.im * scale[None, :])
            theta = 1.0 / cs.spectral_norm_hermitian(ngram)
            stepsz = (theta / diag).astype(f32)                  # (f,)
        else:
            lip = (cs.spectral_norm_hermitian(gram) if lipschitz is None
                   else lipschitz)
            stepsz = (1.0 / lip).astype(f32)
            if feat_vecs:
                stepsz = jnp.broadcast_to(stepsz, (f,))
    thresh = jnp.asarray(alpha, f32) * stepsz

    momentum = method in ("fista", "acc_ista")
    f_pad = -(-f // 128) * 128
    f2 = 2 * f_pad
    br = block_rows or pallas_fista.default_block_rows(f2, momentum,
                                                       hi_lo, group=True)
    br = min(br, -(-m // 16) * 16)
    m_pad = -(-m // br) * br

    def pad(v, rows, cols):
        return jnp.pad(v, ((0, rows - v.shape[0]),
                           (0, cols - v.shape[1])))

    def split2(s):
        """(m, f) SplitComplex -> padded (m_pad, 2 f_pad) [re | im]."""
        return jnp.concatenate(
            [pad(s.re.astype(f32), m_pad, f_pad),
             pad(s.im.astype(f32), m_pad, f_pad)], axis=1)

    gre = pad(gram.re.astype(f32), f_pad, f_pad)
    gim = pad(gram.im.astype(f32), f_pad, f_pad)
    g2 = jnp.concatenate(
        [jnp.concatenate([gre, gim], axis=1),
         jnp.concatenate([-gim, gre], axis=1)], axis=0)
    yah2 = split2(yah)
    if xs is None:
        zeros = jnp.zeros((m, f), f32)
        xs = type(yah)(zeros, zeros)
    x0_p = split2(xs)
    z0_p = x0_p if z0s is None else split2(z0s)
    t0_v = (jnp.ones((m, 1), f32) if t0 is None
            else t0.reshape(m, 1).astype(f32))
    d0_v = (jnp.zeros((m, 1), f32) if done0 is None
            else done0.reshape(m, 1).astype(f32))
    n0_v = (jnp.zeros((m, 1), f32) if nit0 is None
            else nit0.reshape(m, 1).astype(f32))
    t0_p = jnp.pad(t0_v, ((0, m_pad - m), (0, 0)), constant_values=1.0)
    d0_p = jnp.pad(d0_v, ((0, m_pad - m), (0, 0)), constant_values=1.0)
    n0_p = jnp.pad(n0_v, ((0, m_pad - m), (0, 0)))
    if feat_vecs:
        # Per-COMPLEX-feature vectors, repeated identically across the
        # re/im halves (the kernel's group prox reads the first half).
        step_h = jnp.pad(stepsz, (0, f_pad - f))
        thr_h = jnp.pad(thresh, (0, f_pad - f))
        step_p = jnp.concatenate([step_h, step_h])[None, :]
        thr_p = jnp.concatenate([thr_h, thr_h])[None, :]
    else:
        step_p, thr_p = stepsz, thresh

    x_out, z_out, t_out, done, nit = pallas_fista.solve_rows(
        yah2, g2, x0_p, z0_p, t0_p, d0_p, n0_p, step_p, thr_p,
        jnp.asarray(tol, f32), momentum=momentum,
        restart=(method == "acc_ista"), maxiter=maxiter, block_rows=br,
        hi_lo=hi_lo, interpret=interpret, group_fc=f_pad, fixed=fixed)

    from decomp_tpu.ops.complex_split import SplitComplex

    def unsplit(v):
        return SplitComplex(v[:m, :f], v[:m, f_pad:f_pad + f])

    aux = None
    if return_state and momentum:
        aux = {"z": unsplit(z_out), "t": t_out[:m, 0]}
    return LassoResult(
        x=unsplit(x_out), niter=nit[:m, 0],
        converged=done[:m, 0] > 0.5,
        objective=jnp.zeros((0,), f32), aux=aux)


def solve_split(y, a, alpha, x=None, *, tol=1e-5, maxiter: int = 1000,
                method: str = "fista", mask=None, lipschitz=None,
                record_objective: bool = False, precision: str = "highest",
                check_every: int = 1, per_problem: bool = False,
                return_state: bool = False,
                momentum_state=None, state=None,
                use_pallas="auto", pallas_block_rows=None,
                _pallas_interpret: bool = False) -> LassoResult:
    """Split-complex lasso over EXPLICIT (re, im) pairs — composes under
    ``jit`` / ``vmap`` (VERDICT.md round-2 Weak #5 / Next #8).

    ``solve(..., complex_split=True)`` decomposes complex ndarrays on the
    HOST, so it needs concrete inputs: under an outer ``jit`` the inputs
    are tracers and the solver silently falls back to native complex —
    exactly the path TPU backends without complex lowering reject. This
    entry takes the decomposition as data instead: ``y``, ``a`` (and the
    optional ``x`` warm start / ``momentum_state`` z) are
    ``decomp_tpu.ops.complex_split.SplitComplex`` pytrees or plain
    ``(re, im)`` tuples of real arrays, and the returned ``x`` (and aux
    ``z``) are SplitComplex — no complex dtype ever exists on either
    side of the boundary, so the whole call is traceable.

    ``alpha``/``mask``/``tol`` are real, as in ``solve``. Methods: the
    gradient family (ista / fista / acc_ista / parallel_cd). 2-D inputs
    only (one row per problem). Use ``ops.complex_split.from_numpy`` /
    ``to_numpy`` at the host boundary when starting from complex arrays.

    use_pallas : True / False / 'auto' — run the whole-solve batched
        kernel in its split-complex ``group_fc`` mode (round 4): the
        [re | im] iterate block solves against the real 2Fc x 2Fc
        embedding of the complex Gram, with the paired-magnitude
        soft-threshold as the prox (measured 1.51x the jnp split path
        at the config-2-complex scale). Same contract as the real
        kernel path: unmasked, ``per_problem=True``, f32 parts, no
        ``record_objective``, precision 'highest' or 'high' (the bf16x3
        Gram split), scalar or per-feature alpha; 'auto' enables it on
        calibrated TPU generations for large batches when those hold
        (exactly like ``lasso.solve``'s whole-kernel gate). Exact
        per-row ``state=`` resume composes as on the jnp path.
    """
    from decomp_tpu.ops import complex_split as cs

    if method not in ("ista", "fista", "acc_ista", "parallel_cd"):
        raise DecompError("solve_split supports the gradient methods "
                          "(ista / fista / acc_ista / parallel_cd), got "
                          f"{method!r}")

    def as_split(v, name):
        if isinstance(v, cs.SplitComplex):
            return cs.SplitComplex(jnp.asarray(v.re), jnp.asarray(v.im))
        if isinstance(v, (tuple, list)) and len(v) == 2:
            return cs.SplitComplex(jnp.asarray(v[0]), jnp.asarray(v[1]))
        raise DecompError(f"{name} must be a SplitComplex or a (re, im) "
                          "pair of real arrays")

    pp_state = None
    if state is not None:
        if momentum_state is not None:
            raise DecompError("pass either state= or momentum_state=, "
                              "not both")
        if not isinstance(state, dict) or (
                set(state) - {"z", "t", "done", "niter"}):
            raise DecompError("state must be a dict with keys among "
                              "{'z', 't', 'done', 'niter'}")
        if ("z" in state) != ("t" in state):
            raise DecompError("state 'z' and 't' come as a pair")
        if ("done" in state) != ("niter" in state):
            raise DecompError("state 'done' and 'niter' come as a pair")
        if "z" in state:
            momentum_state = (state["z"], state["t"])
        if "done" in state:
            if not per_problem:
                raise DecompError("state done/niter resume requires "
                                  "per_problem=True")
            pp_state = (state["done"], state["niter"])

    ys = as_split(y, "y")
    a_s = as_split(a, "a")
    assertion.assert_ndim("y", ys.re, 2)
    assertion.assert_ndim("a", a_s.re, 2)
    assertion.assert_same_shape("y.im", ys.im, "y.re", ys.re)
    assertion.assert_same_shape("a.im", a_s.im, "a.re", a_s.re)
    assertion.assert_axis_size("a", a_s.re, 1, ys.re.shape[1],
                               "n_channels")
    rdt = real_dtype(jnp.result_type(ys.re.dtype, a_s.re.dtype))
    xs = None
    if x is not None:
        xs = as_split(x, "x")
        assertion.assert_axis_size("x", xs.re, 0, ys.re.shape[0],
                                   "n_samples")
        assertion.assert_axis_size("x", xs.re, 1, a_s.re.shape[0],
                                   "n_features")
    if mask is not None:
        mask = jnp.asarray(mask, rdt)
        assertion.assert_same_shape("mask", mask, "y", ys.re)
    assertion.assert_nonnegative("alpha", alpha)
    alpha = jnp.asarray(alpha, rdt)
    lip = None if lipschitz is None else jnp.asarray(lipschitz, rdt)
    mstate = None
    if momentum_state is not None:
        if method not in ("fista", "acc_ista"):
            raise DecompError("momentum_state applies to momentum "
                              "methods only")
        if xs is None:
            raise DecompError("momentum_state requires the warm start x")
        z0 = as_split(momentum_state[0], "momentum_state z")
        t0 = jnp.broadcast_to(jnp.asarray(momentum_state[1], rdt),
                              (ys.re.shape[0],))
        mstate = (z0, t0)

    ppstate = None
    if pp_state is not None:
        ppstate = (jnp.asarray(pp_state[0]).astype(bool),
                   jnp.asarray(pp_state[1]).astype(jnp.int32))
    if use_pallas == "auto":
        from decomp_tpu.ops import pallas_fista
        from decomp_tpu.ops.pallas_mu import calibrated_tpu

        f_pad128 = -(-a_s.re.shape[0] // 128) * 128
        # Work threshold on the 2Fc REAL embedding the kernel actually
        # solves (not Fc complex features) — the same batch*features
        # scale as lasso.solve's whole-kernel gate. The method check is
        # already enforced at entry (solve_split is gradient-methods
        # only), so it does not reappear here.
        use_pallas = (
            mask is None
            and per_problem
            and calibrated_tpu()
            and rdt == jnp.float32
            and not record_objective
            and precision in ("highest", "high")
            and jnp.asarray(alpha).ndim <= 1
            and ys.re.shape[0] * 2 * a_s.re.shape[0] >= (1 << 18)
            and pallas_fista.fits_vmem(
                2 * f_pad128, method in ("fista", "acc_ista"),
                precision == "high", block_rows=pallas_block_rows,
                group=True))
    if use_pallas:
        if mask is not None:
            raise DecompError("use_pallas=True (whole-solve kernel) "
                              "supports unmasked problems only")
        if not per_problem:
            raise DecompError("use_pallas=True runs the whole-solve "
                              "kernel, which requires per_problem=True")
        if record_objective:
            raise DecompError("the whole-solve kernel cannot record "
                              "per-iteration objectives")
        if precision not in ("highest", "high"):
            raise DecompError("the whole-solve kernel supports "
                              "precision 'highest' or 'high' only")
        if rdt != jnp.float32:
            raise DecompError("the whole-solve kernel requires float32 "
                              f"(re, im) parts, got {rdt}")
        if jnp.asarray(alpha).ndim > 1:
            raise DecompError("the whole-solve kernel supports scalar "
                              "or per-feature alpha")
        z0s = t0v = d0v = n0v = None
        if mstate is not None:
            z0s, t0v = mstate
        if ppstate is not None:
            d0v = ppstate[0].astype(jnp.float32)
            n0v = ppstate[1].astype(jnp.float32)
        return _solve_whole_split(
            ys, a_s, alpha, xs, lip, jnp.asarray(tol, rdt), z0s, t0v,
            d0v, n0v, method=method, maxiter=int(maxiter),
            hi_lo=(precision == "high"),
            block_rows=pallas_block_rows,
            interpret=bool(_pallas_interpret),
            return_state=bool(return_state),
            fixed=_static_nonpositive(tol))
    with jax.default_matmul_precision(precision):
        xr, xi, niter, converged, objective, aux_split = _solve_split(
            ys, a_s, alpha, xs, mask, lip, jnp.asarray(tol, rdt),
            method=method, maxiter=int(maxiter),
            record_objective=bool(record_objective),
            check_every=int(check_every), per_problem=bool(per_problem),
            return_state=bool(return_state), momentum_state=mstate,
            per_problem_state=ppstate)
    aux = None
    if aux_split is not None:
        aux = {"z": aux_split["z"], "t": aux_split["t"]}
    return LassoResult(x=cs.SplitComplex(xr, xi), niter=niter,
                       converged=converged, objective=objective, aux=aux)


def _is_complex_concrete(y, a) -> bool:
    """True when inputs are concrete (non-traced) and complex-dtyped."""
    if isinstance(y, jax.core.Tracer) or isinstance(a, jax.core.Tracer):
        return False

    def dt(v):
        d = getattr(v, "dtype", None)
        return d if d is not None else np.asarray(v).dtype

    return bool(np.issubdtype(dt(y), np.complexfloating)
                or np.issubdtype(dt(a), np.complexfloating))


def _solve_complex_split(y, a, alpha, x, mask, lipschitz, *, tol, method,
                         maxiter, record_objective, precision,
                         check_every=1, per_problem=False,
                         return_state=False, momentum_state=None,
                         per_problem_state=None, use_pallas="auto",
                         pallas_block_rows=None, _pallas_interpret=False):
    """Host-level driver of the split-complex path: decompose on the host,
    solve over (re, im) real pairs on the accelerator via ``solve_split``
    (which owns the jnp/whole-kernel routing, so ``use_pallas`` composes
    here exactly as on the real path), reassemble the complex solution on
    the CPU device (complex arrays never touch the accelerator —
    SURVEY.md §7 hard part 5)."""
    from decomp_tpu.ops import complex_split as cs

    y_np = np.asarray(y)
    a_np = np.asarray(a)
    squeeze = y_np.ndim == 1
    if squeeze:
        y_np = y_np[None, :]
    assertion.assert_ndim("y", y_np, 2)
    assertion.assert_ndim("a", a_np, 2)
    assertion.assert_axis_size("a", a_np, 1, y_np.shape[1], "n_channels")
    cdtype = np.result_type(y_np.dtype, a_np.dtype, np.complex64)
    rdt = np.finfo(cdtype).dtype
    ys = cs.from_numpy(y_np.astype(cdtype))
    a_s = cs.from_numpy(a_np.astype(cdtype))
    xs = None
    if x is not None:
        x_np = np.asarray(x)
        if squeeze and x_np.ndim == 1:
            x_np = x_np[None, :]
        assertion.assert_axis_size("x", x_np, 0, y_np.shape[0], "n_samples")
        assertion.assert_axis_size("x", x_np, 1, a_np.shape[0],
                                   "n_features")
        xs = cs.from_numpy(x_np.astype(cdtype))
    if mask is not None:
        mask_np = np.asarray(mask)
        if squeeze and mask_np.ndim == 1:
            mask_np = mask_np[None, :]
        assertion.assert_same_shape("mask", mask_np, "y", y_np)
        mask = jnp.asarray(mask_np.real.astype(rdt))
    assertion.assert_nonnegative("alpha", alpha)
    alpha = jnp.asarray(np.asarray(alpha).real.astype(rdt))
    lip = None if lipschitz is None else jnp.asarray(lipschitz, rdt)

    mstate = None
    if momentum_state is not None:
        z_np = np.asarray(momentum_state[0])
        if squeeze and z_np.ndim == 1:
            z_np = z_np[None, :]
        assertion.assert_axis_size("momentum_state z", z_np, 0,
                                   y_np.shape[0], "n_samples")
        t_np = np.broadcast_to(np.asarray(momentum_state[1]).real,
                               (y_np.shape[0],)).astype(rdt)
        mstate = (cs.from_numpy(z_np.astype(cdtype)), jnp.asarray(t_np))
    ppstate = None
    if per_problem_state is not None:
        done0 = np.asarray(per_problem_state[0])
        nit0 = np.asarray(per_problem_state[1])
        if squeeze:
            done0 = np.atleast_1d(done0)
            nit0 = np.atleast_1d(nit0)
        ppstate = (jnp.asarray(done0.astype(bool)),
                   jnp.asarray(nit0.astype(np.int32)))

    st = None
    if mstate is not None or ppstate is not None:
        st = {}
        if mstate is not None:
            st["z"], st["t"] = mstate
        if ppstate is not None:
            st["done"], st["niter"] = ppstate
    res_s = solve_split(
        ys, a_s, alpha, x=xs, tol=tol, maxiter=maxiter, method=method,
        mask=mask, lipschitz=lip, record_objective=record_objective,
        precision=precision, check_every=check_every,
        per_problem=per_problem, return_state=return_state, state=st,
        use_pallas=use_pallas, pallas_block_rows=pallas_block_rows,
        _pallas_interpret=_pallas_interpret)
    niter, converged, objective = (res_s.niter, res_s.converged,
                                   res_s.objective)
    aux_split = res_s.aux
    x_c = (np.asarray(res_s.x.re).astype(rdt)
           + 1j * np.asarray(res_s.x.im).astype(rdt))
    x_c = x_c.astype(cdtype)
    aux = None
    if aux_split is not None:
        z_c = (np.asarray(aux_split["z"].re).astype(rdt)
               + 1j * np.asarray(aux_split["z"].im).astype(rdt)
               ).astype(cdtype)
        aux = {"z": z_c, "t": np.asarray(aux_split["t"])}
    if squeeze:
        x_c = x_c[0]
        if per_problem:
            niter = niter[0]
            converged = converged[0]
        if aux is not None:
            aux = {"z": aux["z"][0], "t": aux["t"][0]}
    cpu = jax.devices("cpu")[0]
    return LassoResult(x=jax.device_put(x_c, cpu), niter=niter,
                       converged=converged, objective=objective, aux=aux)


@functools.partial(
    jax.jit, static_argnames=("method", "maxiter", "record_objective",
                              "check_every", "per_problem", "return_state")
)
def _solve_split(y, a, alpha, x, mask, lipschitz, tol, *, method, maxiter,
                 record_objective, check_every=1, per_problem=False,
                 return_state=False, momentum_state=None,
                 per_problem_state=None):
    """Split-complex mirror of ``build_solver`` + ``run_iterations`` for
    methods ista / fista / acc_ista / parallel_cd."""
    from decomp_tpu.ops import complex_split as cs

    rdt = y.re.dtype
    ah = cs.conj_t(a)
    gram = cs.matmul(a, ah)          # Hermitian PSD, split form
    my = y if mask is None else cs.scale(y, mask)
    yah = cs.matmul(my, ah)
    if x is None:
        zeros = jnp.zeros((y.re.shape[0], a.re.shape[0]), rdt)
        x = cs.SplitComplex(zeros, zeros)

    if mask is None:
        def grad(x_):
            return cs.sub(cs.matmul(x_, gram), yah)
    else:
        def grad(x_):
            return cs.matmul(
                cs.sub(cs.scale(cs.matmul(x_, a), mask), my), ah)

    def objective(x_):
        recon = cs.matmul(x_, a)
        resid = (cs.sub(my, recon) if mask is None
                 else cs.sub(my, cs.scale(recon, mask)))
        return (0.5 * cs.sum_abs2(resid)
                + jnp.sum(alpha * jnp.sqrt(cs.abs2(x_))))

    tiny = jnp.asarray(jnp.finfo(rdt).tiny, rdt)

    def rel_change(x_old, x_new):
        num = jnp.sqrt(cs.sum_abs2(cs.sub(x_new, x_old)))
        return num / jnp.maximum(jnp.sqrt(cs.sum_abs2(x_new)), tiny)

    def select_rows(do, a_, b_):
        m = do[:, None]
        return cs.SplitComplex(jnp.where(m, a_.re, b_.re),
                               jnp.where(m, a_.im, b_.im))

    if method in ("ista", "fista", "acc_ista", "parallel_cd"):
        if method == "parallel_cd":
            diag = jnp.maximum(jnp.diagonal(gram.re), tiny)
            scale_v = 1.0 / jnp.sqrt(diag)
            ngram = cs.SplitComplex(
                scale_v[:, None] * gram.re * scale_v[None, :],
                scale_v[:, None] * gram.im * scale_v[None, :])
            theta = (1.0 / cs.spectral_norm_hermitian(ngram)).astype(rdt)
            stepsz = (theta / diag).astype(rdt)
        else:
            lip_ = (cs.spectral_norm_hermitian(gram) if lipschitz is None
                    else lipschitz)
            stepsz = (1.0 / lip_).astype(rdt)
        thresh = alpha * stepsz

        def prox(v):
            return cs.soft_threshold(
                cs.sub(v, cs.scale(grad(v), stepsz)), thresh)

        momentum = method in ("fista", "acc_ista")
        restart = method == "acc_ista"
        n_rows = y.re.shape[0]
        ones_t = jnp.ones((n_rows,), rdt)

        def momentum_step(x_, z, t):
            # Row-local adaptive restart — mirrors the real-dtype
            # build_solver (each batch row is an independent problem).
            x_new = prox(z)
            t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
            z_new = cs.add(x_new, cs.scale(
                cs.sub(x_new, x_),
                ((t - 1.0) / t_new).astype(rdt)[:, None]))
            if restart:
                do = cs.row_real_vdot(cs.sub(z, x_new),
                                      cs.sub(x_new, x_)) > 0
                t_new = jnp.where(do, ones_t, t_new)
                z_new = select_rows(do, x_new, z_new)
            return x_new, z_new, t_new

        if not per_problem:
            if momentum:
                def step(state, it):
                    del it
                    return momentum_step(*state)

                if momentum_state is not None:
                    init = (x, momentum_state[0], momentum_state[1])
                else:
                    init = (x, x, ones_t)
            else:
                def step(state, it):
                    del it
                    return (prox(state[0]),)

                init = (x,)

            def diff_fn(old, new):
                return rel_change(old[0], new[0])

        else:
            tol_r = jnp.asarray(tol).astype(rdt)
            if per_problem_state is not None:
                # Exact chunked per-problem resume, split-complex mirror
                # of build_solver (VERDICT.md round-2 Missing #5).
                done0 = per_problem_state[0].astype(bool)
                nit0 = per_problem_state[1].astype(jnp.int32)
            else:
                done0 = jnp.zeros((n_rows,), bool)
                nit0 = jnp.zeros((n_rows,), jnp.int32)

            def row_done(x_old, x_cand):
                # division form: see the real-path row_done (TPU
                # flush-to-zero on tol*tiny for exactly-zero rows)
                num = jnp.sqrt(cs.row_sum_abs2(cs.sub(x_cand, x_old)))
                den = jnp.maximum(jnp.sqrt(cs.row_sum_abs2(x_cand)), tiny)
                return num / den < tol_r

            if momentum:
                def step(state, it):
                    del it
                    x_, z, t, done, nit = state
                    x_cand, z_cand, t_cand = momentum_step(x_, z, t)
                    x_new = select_rows(done, x_, x_cand)
                    z_new = select_rows(done, z, z_cand)
                    t_new = jnp.where(done, t, t_cand)
                    done_new = jnp.logical_or(done, row_done(x_, x_cand))
                    nit_new = nit + jnp.logical_not(done).astype(jnp.int32)
                    return (x_new, z_new, t_new, done_new, nit_new)

                if momentum_state is not None:
                    init = (x, momentum_state[0], momentum_state[1],
                            done0, nit0)
                else:
                    init = (x, x, ones_t, done0, nit0)
            else:
                def step(state, it):
                    del it
                    x_, done, nit = state
                    x_cand = prox(x_)
                    x_new = select_rows(done, x_, x_cand)
                    done_new = jnp.logical_or(done, row_done(x_, x_cand))
                    nit_new = nit + jnp.logical_not(done).astype(jnp.int32)
                    return (x_new, done_new, nit_new)

                init = (x, done0, nit0)
    else:  # pragma: no cover - guarded in solve()
        raise AssertionError(method)

    if per_problem:
        def diff_fn(old, new):  # noqa: F811 - per-problem replaces rel diff
            del old
            return jnp.sum(jnp.logical_not(new[-2]).astype(rdt))

    # Fixed 0.5 loop threshold for the per-problem count (ADVICE r2 #4).
    loop_tol = jnp.asarray(0.5, rdt) if per_problem else tol
    res = run_iterations(
        step, init, tol=loop_tol, maxiter=maxiter, diff_fn=diff_fn,
        objective_fn=lambda s: objective(s[0]),
        record_objective=record_objective, check_every=check_every,
    )
    aux = None
    if return_state and method in ("fista", "acc_ista"):
        aux = {"z": res.state[1], "t": res.state[2]}
    if per_problem:
        return (res.state[0].re, res.state[0].im, res.state[-1],
                res.state[-2], res.objective, aux)
    return (res.state[0].re, res.state[0].im, res.niter, res.converged,
            res.objective, aux)


# Out-of-core variant (host-streamed row chunks) — import at end of module
# because lasso_streaming reuses this module's solver.
from decomp_tpu.models.lasso_streaming import solve_streaming  # noqa: E402,F401
