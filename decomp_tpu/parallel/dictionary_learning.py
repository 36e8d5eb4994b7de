"""Mesh-sharded dictionary learning (SURVEY.md §2b N5 applied to family 3).

Row-shards the sample axis: each device sparse-codes its own row block
(the dictionary and its Gram are replicated, so the inner lasso is local
except for the allreduced convergence scalars), and the dictionary update
runs identically on every device from the psum'd K x K / K x N sufficient
statistics — the same ICI-allreduce-of-Grams pattern as sharded NMF
(BASELINE.json:11). Full-batch only (the minibatch/online variant is a
single-device feature; shard the batch instead).
"""

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from decomp_tpu.models import lasso as _lasso
from decomp_tpu.models.dictionary_learning import (
    _bcd_dict_update,
    _masked_grad_dict_update,
    _validate_lasso_method,
)
from decomp_tpu.ops.loop import run_iterations
from decomp_tpu.parallel import mesh as _mesh
from decomp_tpu.utils import assertion
from decomp_tpu.utils.dtypes import real_dtype
from decomp_tpu.utils.exceptions import DecompError
from decomp_tpu.utils.normalize import l2_norm, l2_normalize
from decomp_tpu.utils.result import DictionaryLearningResult


def solve(
    y,
    d,
    alpha,
    x=None,
    *,
    mesh: Mesh,
    axis: str = "rows",
    tol=1e-4,
    maxiter: int = 100,
    lasso_method: str = "fista",
    lasso_iter: int = 10,
    lasso_tol=1e-6,
    mask=None,
    record_objective: bool = False,
    precision: str = "highest",
    use_pallas="auto",
    pallas_block_rows=None,
    _pallas_interpret: bool = False,
    _bcd_pallas=None,
    stop: str = "rel_change",
    heldout_frac: float = 0.05,
    random_seed: int = 0,
) -> DictionaryLearningResult:
    """Row-sharded ``decomp_tpu.dictionary_learning.solve`` over
    ``mesh[axis]``. Same contract as the single-device solver; the sample
    count must divide the mesh axis size.

    use_pallas: as in the single-device solver — MASKED problems run both
    the inner sparse-coding gradient and the projected-gradient dictionary
    step through the fused per-device kernels, with local blocks padded
    inside the shard_map body.

    stop='heldout' mirrors the single-device rule in LOCKSTEP: the
    validation reserve is drawn from the GLOBAL entry grid with the same
    salted derivation (so sharded and single-device runs hold out the
    identical entries), the validation error allreduces over the mesh,
    and the run stops at the same outer iteration as the single-device
    solver. ``aux["heldout_rel_err"]`` as in the single-device API."""
    y = jnp.asarray(y)
    assertion.assert_ndim("y", y, 2)
    d = jnp.asarray(d)
    assertion.assert_ndim("d", d, 2)
    assertion.assert_axis_size("d", d, 1, y.shape[1], "n_channels")
    dtype = jnp.result_type(y.dtype, d.dtype)
    y = y.astype(dtype)
    d = d.astype(dtype)
    if x is not None:
        x = jnp.asarray(x, dtype)
        assertion.assert_axis_size("x", x, 0, y.shape[0], "n_samples")
        assertion.assert_axis_size("x", x, 1, d.shape[0], "n_atoms")
    if mask is not None:
        assertion.assert_same_shape("mask", mask, "y", y)
        mask = jnp.asarray(mask, real_dtype(dtype))
    _validate_lasso_method(lasso_method)
    assertion.assert_nonnegative("alpha", alpha)
    if not isinstance(axis, str):
        axis = _mesh.axis_tuple(axis)  # hashable for the jit static arg
    n_dev = _mesh.validate_axis(mesh, axis, "axis")
    if y.shape[0] % n_dev:
        raise DecompError(
            f"n_samples={y.shape[0]} not divisible by mesh axis "
            f"{axis!r} of size {n_dev}")

    rdt = real_dtype(dtype)

    from decomp_tpu.ops import pallas_lasso
    from decomp_tpu.ops.pallas_mu import calibrated_tpu as _calibrated_tpu

    is_complex = jnp.issubdtype(dtype, jnp.complexfloating)
    n_dev_rows = n_dev
    user_use_pallas = use_pallas   # _resolve_bcd needs the un-rebound value
    if use_pallas == "auto":
        use_pallas = (
            _calibrated_tpu()
            and mask is not None
            and not is_complex
            and (y.shape[0] // n_dev_rows) * y.shape[1] >= (1 << 20)
            and pallas_lasso.auto_wins(-(-y.shape[1] // 128) * 128,
                                       -(-d.shape[0] // 128) * 128,
                                       dtype.itemsize, pallas_block_rows)
        )
    use_pallas = bool(use_pallas)
    if use_pallas:
        if mask is None:
            raise DecompError("use_pallas=True applies to masked problems "
                              "only")
        if is_complex:
            raise DecompError("use_pallas=True does not support complex "
                              "dtypes")

    if stop not in ("rel_change", "heldout"):
        raise DecompError(f"stop must be 'rel_change' or 'heldout', "
                          f"got {stop!r}")
    hd_global = None
    if stop == "heldout":
        # SAME derivation + arithmetic as models.dictionary_learning.solve
        # (global draw, data-dtype yv/val, >= f32 vnorm), so the sharded
        # run reserves the identical entries and stops in lockstep.
        if mask is None:
            raise DecompError("stop='heldout' requires a mask")
        if is_complex:
            raise DecompError("stop='heldout' supports real dtypes only")
        if not 0.0 < float(heldout_frac) < 1.0:
            raise DecompError("heldout_frac must be in (0, 1)")
        from decomp_tpu.models.nmf import _HELDOUT_SALT
        kv = jax.random.fold_in(
            jax.random.PRNGKey(jnp.asarray(random_seed, jnp.uint32)),
            _HELDOUT_SALT)
        acc_h = jnp.promote_types(jnp.float32, rdt)
        val = ((jax.random.uniform(kv, y.shape) < float(heldout_frac))
               .astype(rdt) * mask)
        mask = mask - val
        yv = val * y
        yv_acc = yv.astype(acc_h)
        vnorm = jnp.maximum(jnp.sum(yv_acc * yv_acc),
                            jnp.asarray(jnp.finfo(acc_h).tiny, acc_h))
        hd_global = (yv, val, vnorm)

    from decomp_tpu.models.dictionary_learning import _resolve_bcd

    bcd_mode = _resolve_bcd(_bcd_pallas, user_use_pallas, dtype,
                            d.shape[0], y.shape[1],
                            masked=mask is not None)
    with jax.default_matmul_precision(precision):
        return _solve_sharded(
            y, d, x, mask,
            jnp.asarray(alpha, rdt), jnp.asarray(tol, rdt),
            jnp.asarray(lasso_tol, rdt),
            maxiter=int(maxiter), lasso_method=lasso_method,
            lasso_iter=int(lasso_iter), mesh=mesh, axis=axis,
            record_objective=bool(record_objective),
            use_pallas=use_pallas, pallas_block_rows=pallas_block_rows,
            pallas_interpret=bool(_pallas_interpret), hd=hd_global,
            bcd_mode=bcd_mode,
        )


@functools.partial(
    jax.jit,
    static_argnames=("maxiter", "lasso_method", "lasso_iter", "mesh",
                     "axis", "record_objective", "use_pallas",
                     "pallas_block_rows", "pallas_interpret", "bcd_mode"),
)
def _solve_sharded(y, d, x, mask, alpha, tol, lasso_tol, *, maxiter,
                   lasso_method, lasso_iter, mesh, axis, record_objective,
                   use_pallas=False, pallas_block_rows=None,
                   pallas_interpret=False, hd=None, bcd_mode="off"):
    dtype = y.dtype
    rdt = real_dtype(dtype)
    row_spec = P(axis, None)
    psum = functools.partial(jax.lax.psum, axis_name=axis)
    vma = frozenset(_mesh.axis_tuple(axis)) if use_pallas else None

    def body(y_l, d_r, x_l, mask_l, yv_l, val_l, vnorm_, alpha_, tol_,
             lasso_tol_):
        tiny = jnp.asarray(jnp.finfo(rdt).tiny, rdt)
        m_l, n_l = y_l.shape
        k_l = d_r.shape[0]
        br = None
        if use_pallas:
            # Per-device padding to the kernel alignment (zero padding is
            # a fixed point of both updates; see models.dictionary_learning)
            from decomp_tpu.ops import pallas_lasso as _pl

            m_pad, n_pad, k_pad, br = _pl.kernel_alignment(
                m_l, n_l, k_l, dtype.itemsize, pallas_block_rows)
            y_l = _pl.pad2(y_l, m_pad, n_pad)
            mask_l = _pl.pad2(mask_l, m_pad, n_pad)
            if yv_l is not None:
                yv_l = _pl.pad2(yv_l, m_pad, n_pad)
                val_l = _pl.pad2(val_l, m_pad, n_pad)
            d_r = _pl.pad2(d_r, k_pad, n_pad)
            if x_l is not None:
                x_l = _pl.pad2(x_l, m_pad, k_pad)
            alpha_ = _pl.pad_alpha(alpha_, m_pad, k_pad)
        d_r = l2_normalize(d_r, axis=1)
        if x_l is None:
            x_l = jax.lax.pcast(
                jnp.zeros((y_l.shape[0], d_r.shape[0]), dtype),
                axis, to="varying")
        my_l = y_l if mask_l is None else mask_l * y_l

        def sparse_code(d_, x_):
            step, init, diff_fn, obj_fn = _lasso.build_solver(
                y_l, d_, alpha_, x_, mask_l, None, method=lasso_method,
                reduce_sum=psum,
                vary_rows=lambda v: jax.lax.pcast(v, axis, to="varying"),
                use_pallas=use_pallas, pallas_block_rows=br,
                pallas_interpret=pallas_interpret, pallas_vma=vma)
            res = run_iterations(
                step, init, tol=lasso_tol_, maxiter=lasso_iter,
                diff_fn=diff_fn, objective_fn=obj_fn,
                record_objective=False)
            return res.state[0]

        def step(state, it):
            del it
            x_, d_ = state
            with jax.named_scope("dl_sparse_code"):
                x_ = sparse_code(d_, x_)
            with jax.named_scope("dl_dict_update"):
                if mask_l is None:
                    stats_a = psum(x_.conj().T @ x_)
                    stats_b = psum(x_.conj().T @ my_l)
                    # BCD inputs are psum'd / replicated -> the kernel's
                    # output is mesh-invariant (vma = empty set)
                    d_ = _bcd_dict_update(
                        stats_a, stats_b, d_, bcd_mode=bcd_mode,
                        vma=(frozenset() if bcd_mode != "off" else None))
                else:
                    d_ = _masked_grad_dict_update(
                        my_l, x_, d_, mask_l, reduce_sum=psum,
                        use_pallas=use_pallas, pallas_block_rows=br,
                        pallas_interpret=pallas_interpret, pallas_vma=vma)
            return (x_, d_)

        def diff_fn(old, new):
            # d is replicated (derived from psum'd statistics).
            return l2_norm(new[1] - old[1]) / jnp.maximum(
                l2_norm(old[1]), tiny)

        val_sqerr = None
        if yv_l is not None:
            # Held-out stopping: allreduced validation error — every
            # device sees the same scalar, so the stop stays in lockstep
            # (same arithmetic as models.dictionary_learning._solve).
            acc_h = vnorm_.dtype
            tiny_h = jnp.asarray(jnp.finfo(acc_h).tiny, acc_h)

            def val_sqerr(state):  # noqa: F811
                recon = (state[0] @ state[1]).astype(acc_h)
                r = yv_l.astype(acc_h) - val_l.astype(acc_h) * recon
                return psum(jnp.sum(r * r)) / vnorm_

            def diff_fn(old, new):  # noqa: F811
                e_old = val_sqerr(old)
                e_new = val_sqerr(new)
                return (e_old - e_new) / jnp.maximum(e_old, tiny_h)

        def objective(state):
            x_, d_ = state
            recon = x_ @ d_
            resid = (my_l - recon) if mask_l is None else (
                my_l - mask_l * recon)
            data = 0.5 * psum(jnp.sum(jnp.real(resid * jnp.conj(resid))))
            return data + psum(jnp.sum(alpha_ * jnp.abs(x_)))

        res = run_iterations(
            step, (x_l, d_r), tol=tol_, maxiter=maxiter, diff_fn=diff_fn,
            objective_fn=objective, record_objective=record_objective,
            # same held-out warm-up floor as the single-device solver
            min_iter=(min(10, max(int(maxiter) - 1, 0))
                      if yv_l is not None else 0))
        x_out, d_out = res.state[0], res.state[1]
        ho_err = (jnp.sqrt(val_sqerr(res.state)) if val_sqerr is not None
                  else jnp.zeros((), rdt))
        if use_pallas:  # slice the alignment padding back off
            x_out = x_out[:m_l, :k_l]
            d_out = d_out[:k_l, :n_l]
        return (x_out, d_out, res.niter, res.converged, res.objective,
                ho_err)

    yv_g, val_g, vnorm_g = (None, None, None) if hd is None else hd
    in_specs = (row_spec, P(None, None),
                None if x is None else row_spec,
                None if mask is None else row_spec,
                None if yv_g is None else row_spec,
                None if val_g is None else row_spec,
                None if vnorm_g is None else P(),
                P() if alpha.ndim == 0 else P(None), P(), P())
    out_specs = (row_spec, P(None, None), P(), P(), P(), P())
    # check_vma off for the Pallas branch (see parallel.nmf). The BCD
    # sweep kernel is fine under the checker: its inputs are psum'd /
    # replicated and its out_shape carries vma=frozenset() (invariant).
    x_g, d_g, niter, converged, objective, ho_err = jax.shard_map(
        body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=not use_pallas,
    )(y, d, x, mask, yv_g, val_g, vnorm_g, alpha, tol, lasso_tol)
    aux = None if hd is None else {"heldout_rel_err": ho_err}
    return DictionaryLearningResult(x=x_g, d=d_g, niter=niter,
                                    converged=converged,
                                    objective=objective, aux=aux)


def solve_streaming(
    y,
    d,
    alpha,
    x=None,
    *,
    mesh,
    row_axis: str = "rows",
    tol=1e-4,
    maxiter: int = 100,
    lasso_method: str = "fista",
    lasso_iter: int = 10,
    lasso_tol=1e-6,
    mask=None,
    chunk_rows: int = 65536,
    precision: str = "highest",
    callback=None,
    stop: str = "rel_change",
    heldout_frac: float = 0.05,
    check_every: int = 5,
    random_seed: int = 0,
    n_samples=None,
    n_channels=None,
    dtype=None,
    record_objective: bool = False,
    _bcd_pallas=None,
):
    """Sharded out-of-core dictionary learning (round 4): the sample
    axis shards over ``mesh[row_axis]`` AND each device streams its
    global row range in chunks through the fused DL epoch — per-chunk
    sparse coding against the replicated dictionary, psum'd A/B (or
    masked projected-gradient) statistics, replicated dictionary update.
    One dispatched call per outer iteration.

    ``y`` MUST be a jit-traceable callable ``(lo, hi) -> chunk`` taking
    GLOBAL row offsets (``mask`` likewise); pass explicit
    ``n_samples``/``n_channels``/``dtype``. Ragged ``n_samples``,
    ``stop='heldout'`` (lockstep with the single-device fused streamer),
    ``check_every`` amortisation and ``record_objective`` (the psum'd
    full objective per epoch, same convention as the single-device
    streamer) follow ``models.dl_streaming._solve_streaming_fused``.
    Returns a DictionaryLearningResult with a row-sharded global ``x``.
    """
    from decomp_tpu.models.dl_streaming import _solve_streaming_fused
    from decomp_tpu.utils.exceptions import DecompError

    if not callable(y):
        raise DecompError("the sharded streaming DL solver requires a "
                          "callable y loader")
    if not isinstance(row_axis, str):
        # hashable for the epoch compile-cache key / jit static arg
        row_axis = _mesh.axis_tuple(row_axis)
    _mesh.validate_axis(mesh, row_axis, "row_axis")
    return _solve_streaming_fused(
        y, d, alpha, x, tol=tol, maxiter=maxiter,
        lasso_method=lasso_method, lasso_iter=lasso_iter,
        lasso_tol=lasso_tol, mask_loader=mask, chunk_rows=chunk_rows,
        precision=precision, callback=callback, stop=stop,
        heldout_frac=heldout_frac, check_every=check_every,
        random_seed=random_seed, n_samples=n_samples,
        n_channels=n_channels, dtype=dtype,
        record_objective=record_objective, mesh=mesh,
        row_axis=row_axis, _bcd_pallas=_bcd_pallas)
