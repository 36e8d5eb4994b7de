"""Mesh-sharded NMF (BASELINE.json:11, SURVEY.md §2b N5/N6).

Pod-scale factorisation of a tall matrix Y (e.g. 1M x 10k, rank 100): the
sample (row) axis of Y and X is sharded over the mesh's ``row_axis``, the
channel (column) axis of Y and D optionally over ``col_axis``. Per
multiplicative update the only cross-device traffic is the allreduce of the
Gram sufficient statistics:

    x-update:  psum_cols(Y_loc @ D_loc^T)  (M_loc, K)   and
               psum_cols(D_loc @ D_loc^T)  (K, K)
    d-update:  psum_rows(X_loc^T @ Y_loc)  (K, N_loc)   and
               psum_rows(X_loc^T @ X_loc)  (K, K)

— K-sized messages over ICI while the O(M N K) matmul FLOPs stay local,
exactly the shard-the-tall-axis recipe of SURVEY.md §5 ('Long-context' row).
The entire while_loop runs inside one ``shard_map``: the convergence
predicate is itself an allreduced scalar, so every device exits the loop on
the same iteration and there is still no host sync (SURVEY.md §3.5).
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from decomp_tpu.ops import pallas_mu
from decomp_tpu.ops.pallas_mu import calibrated_tpu as _calibrated_tpu
from decomp_tpu.parallel import mesh as _mesh

from decomp_tpu.models.nmf import (
    _kl_objective,
    _update_d,
    _update_d_hals,
    _update_d_kl,
    _update_d_mixed,
    _update_x,
    _update_x_hals,
    _update_x_kl,
    _update_x_mixed,
)
from decomp_tpu.ops.loop import run_iterations
from decomp_tpu.utils import assertion
from decomp_tpu.utils.dtypes import real_dtype
from decomp_tpu.utils.exceptions import DecompError
from decomp_tpu.utils.result import NMFResult


def solve(
    y,
    d=None,
    *,
    rank: Optional[int] = None,
    x=None,
    mesh: Mesh,
    row_axis: str = "rows",
    col_axis: Optional[str] = None,
    tol=1e-4,
    maxiter: int = 1000,
    method: str = "mu",
    mask=None,
    random_seed: int = 0,
    eps: float = 1e-15,
    record_objective: bool = False,
    precision: str = "highest",
    factor_dtype=None,
    use_pallas="auto",
    pallas_block_rows: Optional[int] = None,
    check_every: int = 1,
    stop: str = "rel_change",
    heldout_frac: float = 0.05,
    _pallas_interpret: bool = False,
) -> NMFResult:
    """Sharded ``y ≈ x @ d`` with nonnegative factors.

    Same contract as ``decomp_tpu.nmf.solve`` (full-batch 'mu' method), but
    computed SPMD over ``mesh``: ``y``/``mask`` sharded (row_axis,
    col_axis), ``x`` sharded (row_axis, None), ``d`` sharded (None,
    col_axis). Inputs may be ordinary host arrays (jit will shard them) or
    pre-placed global arrays (e.g. via ``parallel.shard_rows``). Global
    row/column counts must divide the respective mesh axis sizes.

    ``row_axis``/``col_axis`` may each also be a TUPLE of mesh axis
    names for hierarchical (multi-slice) sharding, e.g.
    ``row_axis=('slice', 'rows')`` on a DCN x ICI mesh: the sample axis
    shards over the combined extent and the statistic psums name both
    axes, which XLA lowers as slice-local ICI reductions plus a small
    cross-slice DCN exchange (see ``parallel.mesh``).

    use_pallas: as in ``decomp_tpu.nmf.solve`` — for row-only sharding
    (col_axis=None, method='mu') each device runs the fused single-pass
    Pallas kernel on its local row block and only the K-sized sufficient
    statistics are psum'd; with a column axis the x update itself needs a
    mid-iteration collective, so the jnp path is used.

    factor_dtype: as in ``decomp_tpu.nmf.solve`` — f32 factor iterates
    over bf16 data, the converging high-throughput operating point for
    pod-scale bf16 runs (method='mu' only).

    stop='heldout' (masked problems): the GLOBAL validation mask is drawn
    exactly as in the single-device solver (same seed derivation), then
    row/column-sharded like the data; the validation error is an
    allreduced scalar, so the sharded held-out run equals the
    single-device one and all devices stop in lockstep. ``check_every``
    amortises the two extra reconstructions per check (defaults to 25 in
    this mode).
    """
    assertion.assert_ndim("y", y, 2)
    y = jnp.asarray(y)
    assertion.assert_real("y", y)
    n_samples, n_channels = y.shape
    if method not in ("mu", "kl-mu", "hals"):
        raise DecompError(
            f"method must be 'mu', 'kl-mu' or 'hals', got {method!r}")
    if method == "hals" and mask is not None:
        raise DecompError("method 'hals' does not support mask; use 'mu'")

    row_axis = _mesh.axis_tuple(row_axis) if not isinstance(
        row_axis, str) else row_axis  # hashable for the jit static arg
    if col_axis is not None and not isinstance(col_axis, str):
        col_axis = _mesh.axis_tuple(col_axis)
    n_rows = _mesh.validate_axis(mesh, row_axis, "row_axis")
    n_cols = (_mesh.validate_axis(mesh, col_axis, "col_axis")
              if col_axis is not None else 1)
    if (col_axis is not None
            and set(_mesh.axis_tuple(row_axis))
            & set(_mesh.axis_tuple(col_axis))):
        raise DecompError(f"row_axis {row_axis!r} and col_axis "
                          f"{col_axis!r} share a mesh axis")
    if n_samples % n_rows:
        raise DecompError(
            f"n_samples={n_samples} not divisible by mesh axis "
            f"{row_axis!r} of size {n_rows}")
    if n_channels % n_cols:
        raise DecompError(
            f"n_channels={n_channels} not divisible by mesh axis "
            f"{col_axis!r} of size {n_cols}")

    if factor_dtype is not None:
        factor_dtype = jnp.dtype(factor_dtype)
        if factor_dtype == y.dtype:
            factor_dtype = None  # no-op request
    if factor_dtype is not None:
        if not jnp.issubdtype(factor_dtype, jnp.floating):
            raise DecompError("factor_dtype must be a float dtype")
        if jnp.finfo(factor_dtype).bits < jnp.finfo(y.dtype).bits:
            raise DecompError(
                "factor_dtype must be at least as wide as y's dtype "
                f"(got {factor_dtype} factors for {y.dtype} data)")
        if method != "mu":
            raise DecompError("factor_dtype currently supports "
                              "method='mu' only")
    fdt = y.dtype if factor_dtype is None else factor_dtype

    if d is None and rank is None:
        raise DecompError("provide an initial dictionary `d` or a `rank`")
    if d is not None:
        d = jnp.asarray(d, fdt)
        assertion.assert_ndim("d", d, 2)
        assertion.assert_axis_size("d", d, 1, n_channels, "n_channels")
        if rank is not None and d.shape[0] != rank:
            raise DecompError(
                f"rank={rank} inconsistent with d.shape[0]={d.shape[0]}")
        rank = d.shape[0]
    if x is not None:
        x = jnp.asarray(x, fdt)
        assertion.assert_axis_size("x", x, 0, n_samples, "n_samples")
        assertion.assert_axis_size("x", x, 1, rank, "rank")
    if mask is not None:
        assertion.assert_same_shape("mask", mask, "y", y)
        mask = jnp.asarray(mask, y.dtype)

    pallas_mu.validate_block_rows(pallas_block_rows)
    if use_pallas == "auto":
        kl_like = method in ("kl-mu", "hals") or mask is not None
        use_pallas = (
            _calibrated_tpu()
            and method in ("mu", "kl-mu")
            and col_axis is None
            and (method == "mu" or factor_dtype is None)
            and (n_samples // n_rows) * n_channels >= (1 << 20)
            and pallas_mu.fits_vmem(-(-n_channels // 128) * 128,
                                    -(-rank // 128) * 128,
                                    y.dtype.itemsize, kl_like,
                                    kl_masked=(method == "kl-mu"
                                               and mask is not None),
                                    kl_dense=(method == "kl-mu"
                                              and mask is None),
                                    **({"block_rows": pallas_block_rows}
                                       if pallas_block_rows else {}))
        )
    use_pallas = bool(use_pallas)
    if use_pallas and (method not in ("mu", "kl-mu")
                       or col_axis is not None):
        raise DecompError("use_pallas=True requires method 'mu'/'kl-mu' "
                          "and col_axis=None (row-only sharding); the "
                          "fused HALS kernel was removed (see "
                          "ops.pallas_mu)")
    if use_pallas and method != "mu" and factor_dtype is not None:
        raise DecompError(f"use_pallas=True with method={method!r} does "
                          "not support factor_dtype")

    if stop not in ("rel_change", "heldout"):
        raise DecompError(f"stop must be 'rel_change' or 'heldout', "
                          f"got {stop!r}")
    hd_global = None
    if stop == "heldout":
        if mask is None:
            raise DecompError("stop='heldout' requires a mask")
        if method not in ("mu", "kl-mu"):
            raise DecompError("stop='heldout' supports methods "
                              "'mu'/'kl-mu'")
        if record_objective:
            raise DecompError("stop='heldout' is incompatible with "
                              "record_objective")
        if not 0.0 < float(heldout_frac) < 1.0:
            raise DecompError("heldout_frac must be in (0, 1)")
        if check_every == 1:
            check_every = 25
        # The validation reserve itself (SAME derivation as
        # models.nmf._solve) is drawn INSIDE the jitted _solve_sharded
        # under a sharding constraint: drawing it here eagerly would
        # materialise a full-size unsharded uniform (and full-size
        # eager val/yv products) on the default device — an OOM at pod
        # scale even when every shard fits (code-review round 4).
        hd_frac = float(heldout_frac)
    else:
        hd_frac = None

    seed = jnp.asarray(random_seed, jnp.uint32)
    with jax.default_matmul_precision(precision):
        return _solve_sharded(
            y, d, x, mask, seed, jnp.asarray(tol), jnp.asarray(eps),
            rank=rank, maxiter=int(maxiter), method=method, mesh=mesh,
            row_axis=row_axis, col_axis=col_axis,
            record_objective=bool(record_objective),
            check_every=int(check_every), heldout_frac=hd_frac,
            factor_dtype=factor_dtype,
            use_pallas=use_pallas, pallas_block_rows=pallas_block_rows,
            pallas_interpret=bool(_pallas_interpret),
        )


@functools.partial(
    jax.jit,
    static_argnames=("rank", "maxiter", "method", "mesh", "row_axis",
                     "col_axis", "record_objective", "check_every",
                     "heldout_frac", "factor_dtype", "use_pallas",
                     "pallas_block_rows", "pallas_interpret"),
)
def _solve_sharded(y, d, x, mask, seed, tol, eps, *, rank, maxiter,
                   method, mesh, row_axis, col_axis, record_objective,
                   check_every=1, heldout_frac=None, factor_dtype=None,
                   use_pallas=False, pallas_block_rows=None,
                   pallas_interpret=False):
    rdt = real_dtype(y.dtype)
    fdt = y.dtype if factor_dtype is None else factor_dtype
    # eps guards the FACTOR-dtype denominators (f32 in mixed mode) — same
    # contract as the single-device _solve. Re-casting it to the DATA
    # dtype inside the body (the old code) rounded it to bf16's 8-bit
    # mantissa in mixed mode: an ulp-level denominator deviation from the
    # single-device mixed path.
    erdt = real_dtype(fdt)
    eps = eps.astype(erdt)

    data_spec = P(row_axis, col_axis)
    x_spec = P(row_axis, None)
    d_spec = P(None, col_axis)
    scalar_spec = P()

    def psum_c(v):
        return jax.lax.psum(v, col_axis) if col_axis is not None else v

    def psum_r(v):
        return jax.lax.psum(v, row_axis)

    def psum_all(v):
        axes = _mesh.axis_tuple(row_axis) + (
            _mesh.axis_tuple(col_axis) if col_axis is not None else ())
        return jax.lax.psum(v, axes)

    def body(y_l, d_l, x_l, mask_l, yv_l, val_l, vnorm_, seed_, tol_,
             eps_):
        tol, eps = tol_, eps_.astype(erdt)  # shadow: locals, spec P()
        # Device-local row/column blocks; K (rank) axis fully local.
        my_l = y_l if mask_l is None else mask_l * y_l

        if d_l is None or x_l is None:
            # Per-shard init: fold the shard coordinates into the key so
            # every device draws its own block of the (virtual) global
            # factor; scale from the global observed mean.
            key = jax.random.PRNGKey(seed_)
            row_i = jax.lax.axis_index(row_axis)
            col_i = (jax.lax.axis_index(col_axis)
                     if col_axis is not None else 0)
            n_total = y.shape[0] * y.shape[1]  # global count (static)
            gmean = psum_all(jnp.sum(my_l.astype(
                jnp.promote_types(jnp.float32, rdt)))) / n_total
            scale = jnp.sqrt(
                2.0 * jnp.maximum(gmean, jnp.finfo(rdt).tiny) / rank
            ).astype(fdt)
            if d_l is None:
                kd = jax.random.fold_in(jax.random.fold_in(key, 0), col_i)
                d_l = scale * jax.random.uniform(
                    kd, (rank, y_l.shape[1]), dtype=fdt)
            if x_l is None:
                kx = jax.random.fold_in(jax.random.fold_in(key, 1), row_i)
                x_l = scale * jax.random.uniform(
                    kx, (y_l.shape[0], rank), dtype=fdt)

        m_l, n_l = my_l.shape
        if use_pallas:
            # Fused per-device kernels on local row blocks; only the
            # K x N / K x K sufficient statistics cross devices.
            n_pad = -(-n_l // 128) * 128
            k_pad = -(-rank // 128) * 128
            br = pallas_block_rows or pallas_mu.default_block_rows(
                n_pad, k_pad, my_l.dtype.itemsize,
                mask_l is not None or method in ("kl-mu", "hals"))
            br = min(br, -(-m_l // 8) * 8)
            m_pad = -(-m_l // br) * br
            my_l = jnp.pad(my_l, ((0, m_pad - m_l), (0, n_pad - n_l)))
            d_l = jnp.pad(d_l, ((0, k_pad - rank), (0, n_pad - n_l)))
            x_l = jnp.pad(x_l, ((0, m_pad - m_l), (0, k_pad - rank)))
            if mask_l is not None:
                mask_l = jnp.pad(mask_l,
                                 ((0, m_pad - m_l), (0, n_pad - n_l)))
            if yv_l is not None:
                yv_l = jnp.pad(yv_l, ((0, m_pad - m_l), (0, n_pad - n_l)))
                val_l = jnp.pad(val_l,
                                ((0, m_pad - m_l), (0, n_pad - n_l)))

            vma = frozenset(_mesh.axis_tuple(row_axis))
            cdt = my_l.dtype
            if method == "kl-mu":
                if mask_l is None:
                    def step(state, it):
                        del it
                        return pallas_mu.kl_update_dense(
                            my_l, state[0], state[1], eps, block_rows=br,
                            interpret=pallas_interpret, psum=psum_r,
                            vma=vma)
                else:
                    def step(state, it):
                        del it
                        return pallas_mu.kl_update_masked(
                            my_l, mask_l, state[0], state[1], eps,
                            block_rows=br, interpret=pallas_interpret,
                            psum=psum_r, vma=vma)
            elif mask_l is None:
                def step(state, it):
                    del it
                    x_, d_ = state
                    return pallas_mu.mu_update_dense(
                        my_l, x_, d_.astype(cdt), eps, block_rows=br,
                        interpret=pallas_interpret, psum=psum_r, vma=vma,
                        d_master=d_)
            else:
                def step(state, it):
                    del it
                    x_, d_ = state
                    return pallas_mu.mu_update_masked(
                        my_l, mask_l, x_, d_.astype(cdt), eps,
                        block_rows=br, interpret=pallas_interpret,
                        psum=psum_r, vma=vma, d_master=d_)
        else:
            if factor_dtype is not None:
                upd_x, upd_d = _update_x_mixed, _update_d_mixed
            else:
                upd_x = {"mu": _update_x, "kl-mu": _update_x_kl,
                         "hals": _update_x_hals}[method]
                upd_d = {"mu": _update_d, "kl-mu": _update_d_kl,
                         "hals": _update_d_hals}[method]

            def step(state, it):
                del it
                x_, d_ = state
                x_ = upd_x(my_l, x_, d_, mask_l, eps, psum_c)
                d_ = upd_d(my_l, x_, d_, mask_l, eps, psum_r)
                return (x_, d_)

        # >= f32 accumulation for norms/objective (see models.nmf._solve:
        # bf16 sums over headline-scale matrices are rounding noise).
        acc_dt = jnp.promote_types(jnp.float32, rdt)
        tiny = jnp.asarray(jnp.finfo(acc_dt).tiny, acc_dt)

        def diff_fn(old, new):
            # d is replicated over row_axis, sharded over col_axis: the
            # global norm needs a column-axis allreduce only.
            d_old = old[1].astype(acc_dt)
            d_new = new[1].astype(acc_dt)
            num = jnp.sqrt(psum_c(jnp.sum((d_new - d_old) ** 2)))
            den = jnp.sqrt(psum_c(jnp.sum(d_old ** 2)))
            return num / jnp.maximum(den, tiny)

        val_sqerr = None
        if yv_l is not None:
            # Held-out stopping: allreduced validation error — every
            # device sees the same scalar, so the stop stays in lockstep.
            cdt_v = y_l.dtype

            def val_sqerr(state):  # noqa: F811
                recon = jax.lax.dot_general(
                    state[0].astype(cdt_v), state[1].astype(cdt_v),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=acc_dt)
                r = yv_l.astype(acc_dt) - val_l.astype(acc_dt) * recon
                return psum_all(jnp.sum(r * r)) / vnorm_

            def diff_fn(old, new):  # noqa: F811
                e_old = val_sqerr(old)
                e_new = val_sqerr(new)
                return (e_old - e_new) / jnp.maximum(e_old, tiny)

        def objective(state):
            if method == "kl-mu":
                return psum_all(
                    _kl_objective(my_l, state[0], state[1], mask_l, eps))
            recon = (state[0] @ state[1]).astype(acc_dt)
            my_a = my_l.astype(acc_dt)
            resid = (my_a - recon) if mask_l is None else (
                my_a - mask_l.astype(acc_dt) * recon)
            return 0.5 * psum_all(jnp.sum(resid * resid))

        res = run_iterations(
            step, (x_l, d_l), tol=tol, maxiter=maxiter, diff_fn=diff_fn,
            objective_fn=objective, record_objective=record_objective,
            check_every=check_every,
            # warm-up floor clamped to the budget: with
            # maxiter < 3*check_every the unclamped floor
            # could never fire (ADVICE round-3 #3's clamp)
            min_iter=(min(2 * check_every, max(maxiter - check_every, 0))
                      if yv_l is not None else 0),
        )
        x_out, d_out = res.state[0], res.state[1]
        ho_err = (jnp.sqrt(val_sqerr(res.state)).astype(jnp.float32)
                  if val_sqerr is not None
                  else jnp.zeros((), jnp.float32))
        if use_pallas:  # slice the alignment padding back off
            x_out = x_out[:m_l, :rank]
            d_out = d_out[:rank, :n_l]
        return (x_out, d_out, res.niter, res.converged, res.objective,
                ho_err)

    yv_g, val_g, vnorm_g = None, None, None
    if heldout_frac is not None:
        # SAME derivation as models.nmf._solve (identical validation
        # set — exact lockstep parity, tested). Drawn HERE, inside the
        # jit, under the data sharding constraint: the partitionable
        # threefry generates each shard locally with values identical
        # to the unpartitioned draw, so nothing full-size ever
        # materialises on one device (code-review round 4; the old
        # eager entry-level draw OOM'd device 0 at pod scale).
        from decomp_tpu.models.nmf import _HELDOUT_SALT
        from jax.sharding import NamedSharding

        constrain = functools.partial(
            jax.lax.with_sharding_constraint,
            shardings=NamedSharding(mesh, data_spec))
        kv = jax.random.fold_in(jax.random.PRNGKey(seed), _HELDOUT_SALT)
        acc_h = jnp.promote_types(jnp.float32, rdt)
        u = constrain(jax.random.uniform(kv, y.shape))
        val_g = constrain((u < heldout_frac).astype(y.dtype) * mask)
        mask = constrain(mask - val_g)
        # yv/val stay in the data dtype (val is 0/1 — exact); the
        # machinery casts into its f32 reductions per check. See
        # models.nmf._solve.
        yv_g = constrain(val_g * y)
        yv_acc = yv_g.astype(acc_h)
        vnorm_g = jnp.maximum(jnp.sum(yv_acc * yv_acc),
                              jnp.asarray(jnp.finfo(acc_h).tiny, acc_h))
    in_specs = (data_spec,
                None if d is None else d_spec,
                None if x is None else x_spec,
                None if mask is None else data_spec,
                None if yv_g is None else data_spec,
                None if val_g is None else data_spec,
                None if vnorm_g is None else scalar_spec,
                scalar_spec, scalar_spec, scalar_spec)
    out_specs = (x_spec, d_spec, scalar_spec, scalar_spec, scalar_spec,
                 scalar_spec)

    # check_vma must be off for the Pallas branch: the varying-manual-axes
    # checker cannot propagate vma through pallas_call internals
    # (dot_general inside the kernel sees mixed {row_axis}/{} operands).
    # Correctness of that branch is pinned by the equivalence tests against
    # the vma-checked jnp path (tests/test_sharded.py).
    x_g, d_g, niter, converged, objective, ho_err = jax.shard_map(
        body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=not use_pallas,
    )(y, d, x, mask, yv_g, val_g, vnorm_g, seed, tol, eps)
    aux = (None if heldout_frac is None
           else {"heldout_rel_err": ho_err})
    return NMFResult(x=x_g, d=d_g, niter=niter, converged=converged,
                     objective=objective, aux=aux)


# Sharded out-of-core variant — import at end of module (it reuses the
# chunk machinery of models.nmf_streaming).
from decomp_tpu.parallel.nmf_streaming import solve_streaming  # noqa: E402,F401
