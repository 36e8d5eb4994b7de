"""Mesh-sharded batch lasso (SURVEY.md §2b N4/N5; BASELINE.json:8 at scale).

Each row of ``y`` is an independent problem sharing the dictionary ``a``
(SURVEY.md §2a row 2), so the sample axis shards embarrassingly: ``a`` and
its Gram matrix are replicated, every device iterates on its own row block,
and the ONLY cross-device traffic is the allreduced scalar of the global
stopping decision (the acc_ista restart is row-local, hence device-local) —
a few bytes per iteration over ICI. Reuses the exact single-device method
machinery via ``decomp_tpu.models.lasso.build_solver``.
"""

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from decomp_tpu.models import lasso as _lasso
from decomp_tpu.ops.loop import run_iterations
from decomp_tpu.parallel import mesh as _mesh
from decomp_tpu.utils import assertion
from decomp_tpu.utils.dtypes import real_dtype
from decomp_tpu.utils.exceptions import DecompError
from decomp_tpu.utils.result import LassoResult


def solve(
    y,
    a,
    alpha,
    x=None,
    *,
    mesh: Mesh,
    axis: str = "rows",
    tol=1e-5,
    maxiter: int = 1000,
    method: str = "fista",
    mask=None,
    lipschitz=None,
    record_objective: bool = False,
    precision: str = "highest",
    per_problem: bool = False,
    use_pallas="auto",
    pallas_block_rows=None,
    _pallas_interpret: bool = False,
) -> LassoResult:
    """Row-sharded ``decomp_tpu.lasso.solve`` over ``mesh[axis]``.

    Same contract and methods as the single-device solver; ``y`` (and
    ``mask``/``x``) shard on the sample axis, which must divide the mesh
    axis size. Results are numerically identical to the single-device
    solver up to matmul reduction order.

    per_problem: as in the single-device solver — rows converge and freeze
    independently (device-locally); only the all-rows-done stopping
    decision is allreduced. ``niter``/``converged`` come back as global
    (n_samples,) row-sharded arrays.

    use_pallas: as in the single-device solver (MASKED problems, gradient
    methods) — each device runs the fused masked-gradient kernel on its
    local row block; the iteration is fully row-local so nothing about
    the collective structure changes. Local blocks are zero-padded to the
    kernel alignment inside the shard_map body and sliced back.
    """
    y = jnp.asarray(y)
    a = jnp.asarray(a)
    assertion.assert_ndim("y", y, 2)
    assertion.assert_ndim("a", a, 2)
    assertion.assert_axis_size("a", a, 1, y.shape[1], "n_channels")
    if method not in _lasso._METHODS:
        raise DecompError(
            f"method must be one of {_lasso._METHODS}, got {method!r}")
    if method == "cd" and mask is not None:
        raise DecompError("method 'cd' does not support mask")
    if method == "cd" and jnp.asarray(alpha).ndim != 0:
        # Mirror the single-device guard: a per-feature alpha would
        # silently broadcast into wrong per-coordinate thresholds.
        raise DecompError("method 'cd' requires a scalar alpha")
    if per_problem and method == "cd":
        raise DecompError("per_problem convergence does not support "
                          "method 'cd'")
    if not isinstance(axis, str):
        axis = _mesh.axis_tuple(axis)  # hashable for the jit static arg
    n_dev = _mesh.validate_axis(mesh, axis, "axis")
    if y.shape[0] % n_dev:
        raise DecompError(
            f"n_samples={y.shape[0]} not divisible by mesh axis "
            f"{axis!r} of size {n_dev}")

    dtype = jnp.result_type(y.dtype, a.dtype)
    y = y.astype(dtype)
    a = a.astype(dtype)
    rdt = real_dtype(dtype)
    assertion.assert_nonnegative("alpha", alpha)
    alpha = jnp.asarray(alpha, rdt)
    if x is not None:
        x = jnp.asarray(x, dtype)
        assertion.assert_ndim("x", x, 2)
        assertion.assert_axis_size("x", x, 0, y.shape[0], "n_samples")
        assertion.assert_axis_size("x", x, 1, a.shape[0], "n_features")
    if mask is not None:
        assertion.assert_same_shape("mask", mask, "y", y)
        mask = jnp.asarray(mask, rdt)
    lip = None if lipschitz is None else jnp.asarray(lipschitz, rdt)

    from decomp_tpu.ops import pallas_fista, pallas_lasso
    from decomp_tpu.ops.pallas_mu import calibrated_tpu as _calibrated_tpu

    grad_methods = ("ista", "fista", "acc_ista", "parallel_cd")
    is_complex = jnp.issubdtype(dtype, jnp.complexfloating)
    n_dev_rows = n_dev
    f_pad128 = -(-a.shape[0] // 128) * 128
    pallas_mode = None
    if use_pallas == "auto":
        if (mask is not None
                and _calibrated_tpu()
                and method in grad_methods
                and not is_complex
                and (y.shape[0] // n_dev_rows) * y.shape[1] >= (1 << 20)
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
                and (y.shape[0] // n_dev_rows) * a.shape[0] >= (1 << 18)
                and pallas_fista.fits_vmem(
                    f_pad128, method in ("fista", "acc_ista"),
                    precision == "high",
                    block_rows=pallas_block_rows)):
            # Whole-solve kernel per device: the rows of an unmasked
            # per-problem batch are INDEPENDENT, so each device runs its
            # local block's whole solve in VMEM with NO collectives at
            # all — not even the stopping allreduce.
            pallas_mode = "whole"
    elif use_pallas:
        if method not in grad_methods:
            raise DecompError("use_pallas=True requires a gradient method "
                              f"{grad_methods}, got {method!r}")
        if is_complex:
            raise DecompError("use_pallas=True does not support complex "
                              "dtypes")
        if mask is not None:
            pallas_mode = "masked"
        else:
            if not per_problem:
                raise DecompError(
                    "use_pallas=True on unmasked problems runs the whole-"
                    "solve kernel, which requires per_problem=True (see "
                    "decomp_tpu.lasso.solve)")
            if dtype != jnp.float32:
                raise DecompError("the whole-solve kernel requires "
                                  f"float32 inputs, got {dtype}")
            if record_objective:
                raise DecompError("the whole-solve kernel cannot record "
                                  "objectives")
            if precision not in ("highest", "high"):
                raise DecompError("the whole-solve kernel supports "
                                  "precision 'highest' or 'high' only")
            if alpha.ndim > 1:
                raise DecompError("the whole-solve kernel supports scalar "
                                  "or per-feature alpha")
            pallas_mode = "whole"
    use_pallas = pallas_mode == "masked"

    if pallas_mode == "whole":
        return _solve_sharded_whole(
            y, a, alpha, x, lip, jnp.asarray(tol, rdt), method=method,
            maxiter=int(maxiter), mesh=mesh, axis=axis,
            hi_lo=(precision == "high"),
            block_rows=pallas_block_rows,
            interpret=bool(_pallas_interpret),
            fixed=_lasso._static_nonpositive(tol))
    with jax.default_matmul_precision(precision):
        return _solve_sharded(
            y, a, alpha, x, mask, lip, jnp.asarray(tol, rdt),
            method=method, maxiter=int(maxiter), mesh=mesh, axis=axis,
            record_objective=bool(record_objective),
            per_problem=bool(per_problem), use_pallas=use_pallas,
            pallas_block_rows=pallas_block_rows,
            pallas_interpret=bool(_pallas_interpret),
        )


@functools.partial(
    jax.jit,
    static_argnames=("method", "maxiter", "mesh", "axis",
                     "record_objective", "per_problem", "use_pallas",
                     "pallas_block_rows", "pallas_interpret"),
)
def _solve_sharded(y, a, alpha, x, mask, lipschitz, tol, *, method, maxiter,
                   mesh, axis, record_objective, per_problem=False,
                   use_pallas=False, pallas_block_rows=None,
                   pallas_interpret=False):
    row_spec = P(axis, None)
    # alpha may be scalar, per-feature (n_feat,) -> replicated, or
    # per-sample 2D -> row-sharded alongside x.
    alpha_spec = (row_spec if alpha.ndim == 2
                  else P(None) if alpha.ndim == 1 else P())

    def body(y_l, a_r, alpha_, x_l, mask_l, lip_, tol_):
        dtype = jnp.result_type(y_l, a_r)
        m_l, n_l = y_l.shape
        f_l = a_r.shape[0]
        br = None
        if use_pallas:
            # Per-device padding to the kernel alignment (zero padding is
            # a fixed point of the iteration; see models.lasso).
            from decomp_tpu.ops import pallas_lasso as _pl

            m_pad, n_pad, f_pad, br = _pl.kernel_alignment(
                m_l, n_l, f_l, dtype.itemsize, pallas_block_rows)
            y_l = _pl.pad2(y_l, m_pad, n_pad)
            mask_l = _pl.pad2(mask_l, m_pad, n_pad)
            a_r = _pl.pad2(a_r, f_pad, n_pad)
            if x_l is not None:
                x_l = _pl.pad2(x_l, m_pad, f_pad)
            alpha_ = _pl.pad_alpha(alpha_, m_pad, f_pad)
        if x_l is None:
            # A plain zeros init would be device-UNvarying, but the
            # while_loop carry becomes row-varying after one step and
            # shard_map requires carry types to be loop-invariant: mark the
            # init as varying over the row axis up front.
            x_l = jax.lax.pcast(
                jnp.zeros((y_l.shape[0], a_r.shape[0]), dtype),
                axis, to="varying")
        step, init, diff_fn, obj_fn = _lasso.build_solver(
            y_l, a_r, alpha_, x_l, mask_l, lip_, method=method,
            reduce_sum=functools.partial(jax.lax.psum, axis_name=axis),
            per_problem=per_problem, tol=tol_,
            vary_rows=lambda v: jax.lax.pcast(v, axis, to="varying"),
            use_pallas=use_pallas, pallas_block_rows=br,
            pallas_interpret=pallas_interpret,
            pallas_vma=(frozenset(_mesh.axis_tuple(axis))
                        if use_pallas else None),
        )
        # per_problem's diff_fn is the unconverged-row count: compare it
        # against the fixed 0.5 (count == 0), not the user tol
        # (ADVICE round-2 #4).
        loop_tol = (jnp.asarray(0.5, real_dtype(dtype)) if per_problem
                    else tol_)
        res = run_iterations(
            step, init, tol=loop_tol, maxiter=maxiter, diff_fn=diff_fn,
            objective_fn=obj_fn, record_objective=record_objective,
        )
        x_out = res.state[0]
        if use_pallas:  # slice the alignment padding back off
            x_out = x_out[:m_l, :f_l]
        if per_problem:
            # Per-row niter/converged are device-local row blocks.
            nit, conv = res.state[-1], res.state[-2]
            if use_pallas:
                nit, conv = nit[:m_l], conv[:m_l]
            return x_out, nit, conv, res.objective
        return x_out, res.niter, res.converged, res.objective

    in_specs = (row_spec, P(None, None), alpha_spec,
                None if x is None else row_spec,
                None if mask is None else row_spec,
                None if lipschitz is None else P(),
                P())
    counts_spec = P(axis) if per_problem else P()
    out_specs = (row_spec, counts_spec, counts_spec, P())
    # check_vma off for the Pallas branch: the varying-manual-axes checker
    # cannot propagate vma through pallas_call internals (see parallel.nmf).
    x_g, niter, converged, objective = jax.shard_map(
        body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=not use_pallas,
    )(y, a, alpha, x, mask, lipschitz, tol)
    return LassoResult(x=x_g, niter=niter, converged=converged,
                       objective=objective)


@functools.partial(
    jax.jit,
    static_argnames=("method", "maxiter", "mesh", "axis", "hi_lo",
                     "block_rows", "interpret", "fixed"),
)
def _solve_sharded_whole(y, a, alpha, x, lipschitz, tol, *, method,
                         maxiter, mesh, axis, hi_lo, block_rows,
                         interpret, fixed=False):
    """Row-sharded whole-solve kernel path: each device runs
    models.lasso._whole_core on its local row block — the rows are
    independent problems and per-problem stopping is device-local, so
    the shard_map body contains ZERO collectives (each device's kernel
    grid even exits early on its own stripes)."""
    row_spec = P(axis, None)
    alpha_spec = P(None) if jnp.asarray(alpha).ndim == 1 else P()

    def body(y_l, a_r, alpha_, x_l, lip_, tol_):
        res = _lasso._whole_core(
            y_l, a_r, alpha_, x_l, lip_, tol_, None, None, None, None,
            method=method, maxiter=maxiter, hi_lo=hi_lo,
            block_rows=block_rows, interpret=interpret,
            return_state=False, fixed=fixed)
        return res.x, res.niter, res.converged

    x_g, niter, converged = jax.shard_map(
        body, mesh=mesh,
        in_specs=(row_spec, P(None, None), alpha_spec,
                  None if x is None else row_spec,
                  None if lipschitz is None else P(), P()),
        out_specs=(row_spec, P(axis), P(axis)),
        check_vma=False,  # vma does not propagate through pallas_call
    )(y, a, alpha, x, lipschitz, tol)
    return LassoResult(x=x_g, niter=niter, converged=converged,
                       objective=jnp.zeros((0,), jnp.float32))


def solve_streaming(
    y,
    a,
    alpha,
    x=None,
    *,
    mesh: Mesh,
    axis: str = "rows",
    tol=1e-5,
    maxiter: int = 1000,
    method: str = "fista",
    mask=None,
    chunk_rows: int = 65536,
    precision: str = "highest",
    per_problem: bool = False,
    use_pallas="auto",
) -> LassoResult:
    """Out-of-core SHARDED batch lasso (round 4): a larger-than-mesh-HBM
    problem batch streams in ``chunk_rows`` row blocks, and each block
    solves through ``parallel.lasso.solve`` — row-sharded over
    ``mesh[axis]`` with the per-device whole-solve kernel when
    ``per_problem=True`` (zero collectives: the batch rows are
    independent problems, so sharding is pure partitioning; SURVEY.md
    §2a row 2). The Gram/Lipschitz precompute is shared across chunks,
    so every chunk runs the identical iteration the in-core sharded
    solver would.

    Host-driven chunk loop (host arrays cannot stream inside one jit);
    parameters otherwise as in ``parallel.lasso.solve``. Returns host
    ``x`` with in-core per-problem semantics when ``per_problem=True``
    (rows are independent, so per-chunk solves ARE the global solve).
    """
    import numpy as np

    y = np.asarray(y)
    a_np = np.asarray(a)
    assertion.assert_ndim("y", y, 2)
    assertion.assert_ndim("a", a_np, 2)
    assertion.assert_axis_size("a", a_np, 1, y.shape[1], "n_channels")
    if mask is not None:
        mask = np.asarray(mask)
        assertion.assert_same_shape("mask", mask, "y", y)
    if x is not None:
        x = np.asarray(x)
        assertion.assert_axis_size("x", x, 0, y.shape[0], "n_samples")
        assertion.assert_axis_size("x", x, 1, a_np.shape[0],
                                   "n_features")
    chunk_rows = int(chunk_rows)
    if chunk_rows < 1:
        raise DecompError("chunk_rows must be >= 1")
    if not isinstance(axis, str):
        axis = _mesh.axis_tuple(axis)
    n_dev = _mesh.validate_axis(mesh, axis, "axis")
    if chunk_rows % n_dev:
        raise DecompError(
            f"chunk_rows={chunk_rows} must divide evenly over "
            f"mesh[{axis!r}]={n_dev} (each chunk row-shards)")
    alpha_np = np.asarray(alpha)
    if alpha_np.ndim == 2:
        if alpha_np.shape[0] != y.shape[0]:
            raise DecompError(
                f"2-D alpha must have n_samples={y.shape[0]} rows, got "
                f"{alpha_np.shape}")
        alpha_rows = alpha_np
    else:
        alpha_rows = None

    from decomp_tpu.ops.spectral import lipschitz_gram

    lip = float(lipschitz_gram(jnp.asarray(a_np)))
    n = y.shape[0]
    out = np.empty((n, a_np.shape[0]),
                   dtype=np.result_type(y.dtype, a_np.dtype))
    niter_max, all_converged = 0, True
    if per_problem:
        niter_rows = np.zeros((n,), np.int32)
        conv_rows = np.zeros((n,), bool)
    for lo in range(0, n, chunk_rows):
        hi = min(lo + chunk_rows, n)
        rows = hi - lo
        # the final ragged chunk zero-pads to a mesh multiple (zero
        # rows solve to x=0 immediately and are sliced back off)
        pad = (-rows) % n_dev

        def padded(v, fill=0.0):
            if v is None or pad == 0:
                return v
            return np.concatenate(
                [v, np.full((pad,) + v.shape[1:], fill, v.dtype)])

        res = solve(
            padded(y[lo:hi]), a_np,
            alpha if alpha_rows is None else padded(alpha_rows[lo:hi]),
            None if x is None else padded(x[lo:hi]),
            mesh=mesh, axis=axis, tol=tol, maxiter=maxiter,
            method=method,
            mask=None if mask is None else padded(mask[lo:hi]),
            lipschitz=lip, precision=precision,
            per_problem=per_problem, use_pallas=use_pallas)
        out[lo:hi] = np.asarray(res.x)[:rows]
        if per_problem:
            niter_rows[lo:hi] = np.asarray(res.niter)[:rows]
            conv_rows[lo:hi] = np.asarray(res.converged)[:rows]
        else:
            niter_max = max(niter_max, int(res.niter))
            all_converged = all_converged and bool(res.converged)

    if per_problem:
        return LassoResult(x=out, niter=niter_rows, converged=conv_rows,
                           objective=jnp.zeros((0,), jnp.float32))
    return LassoResult(
        x=out, niter=jnp.asarray(niter_max, jnp.int32),
        converged=jnp.asarray(all_converged),
        objective=jnp.zeros((0,), jnp.float32))
