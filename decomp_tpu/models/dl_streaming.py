"""Out-of-core dictionary learning: data larger than device memory.

Same pattern as ``nmf.solve_streaming``: per outer iteration, each host
row chunk is sparse-coded on device against the current dictionary (rows
are independent given d), the BCD sufficient statistics A += x_c^H x_c and
B += x_c^H y_c accumulate on device, and the dictionary is updated once
per outer iteration from the full-data statistics — exactly the
full-batch alternation. Chunked trajectories match full-batch ones up to
matmul reduction order when the inner lasso runs its full budget
(lasso_tol=0); with inner early stopping the stop criterion is evaluated
per chunk rather than globally (tested).

Masked problems stream the same way: the projected-gradient dictionary
step's ingredients — the Gram x^H x and the gradient
x^H (mask*(x@d) - my) — are both sums over row chunks, so they
accumulate on device exactly like the BCD statistics.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from decomp_tpu.models import lasso as _lasso
from decomp_tpu.models.dictionary_learning import (_bcd_dict_update,
                                                   _resolve_bcd,
                                                   _validate_lasso_method)
from decomp_tpu.utils.weakcache import LoaderKeyedCache
from decomp_tpu.ops.loop import run_iterations
from decomp_tpu.ops.spectral import spectral_norm_psd
from decomp_tpu.utils import assertion
from decomp_tpu.utils.dtypes import real_dtype
from decomp_tpu.utils.exceptions import DecompError
from decomp_tpu.utils.normalize import l2_normalize
from decomp_tpu.utils.result import DictionaryLearningResult


def solve_streaming(
    y,
    d,
    alpha,
    x=None,
    *,
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
    n_samples: Optional[int] = None,
    n_channels: Optional[int] = None,
    dtype=None,
    jit_loader: bool = False,
    record_objective: bool = False,
    _bcd_pallas=None,
) -> DictionaryLearningResult:
    """Out-of-core ``decomp_tpu.dictionary_learning.solve``.

    ``y``/``x``/``mask`` are host arrays streamed in ``chunk_rows``
    blocks; the returned ``x`` is a host numpy array. ``callback(it,
    diff)`` fires once per outer iteration. Masked problems use the
    projected-gradient dictionary step from chunk-accumulated Gram and
    gradient statistics (identical to the in-core masked update).

    FUSED MODE (round 4): pass a jit-traceable CALLABLE loader
    ``y(lo, hi) -> chunk`` with ``jit_loader=True`` (plus explicit
    ``n_samples``/``n_channels``/``dtype``; ``mask`` likewise callable)
    and the whole epoch — per-chunk sparse coding, statistic
    accumulation, dictionary update — compiles into ONE dispatched call
    per outer iteration, with x device-resident; ragged ``n_samples``
    is handled by the clamped-trailing-window scheme of
    ``nmf.solve_streaming`` and convergence reads amortise over
    ``check_every``. The returned ``x`` is then a device array. The
    compiled epoch is cached per LOADER IDENTITY — pass the same
    callable across calls (``epoch_cache_info()`` debugs this).

    stop : 'rel_change' (default) or 'heldout' (masked real problems):
        as in ``dictionary_learning.solve`` — a ``heldout_frac``
        fraction of each chunk's observed entries is reserved (drawn
        deterministically per chunk from ``random_seed``, so every
        epoch sees the same validation set), sparse coding and the
        dictionary step train on the remainder, and iteration stops
        when the validation error plateaus: its relative improvement
        between CHECK epochs (every ``check_every``-th) drops below
        ``tol``. ``aux['heldout_rel_err']`` carries the final
        validation error. This is the usable stopping rule for
        out-of-core masked completion, where the rel-change floor can
        fire too early (BASELINE.md).
    record_objective : record the full DL objective
        ``0.5*||mask*(y - x@d)||^2 + alpha*||x||_1`` per outer
        iteration, evaluated chunk-wise with the freshly-coded x
        against the PRE-update d (the streaming convention of
        ``nmf.solve_streaming``; one extra reconstruction matmul per
        chunk). Returned in ``DictionaryLearningResult.objective``;
        incompatible with ``stop='heldout'``.

    There is deliberately no ``hbm_cache_chunks`` here: the DL epoch's
    ``lasso_iter`` coding steps dilute loader cost ~10× relative to the
    MU epoch, capping the cache's best case below its own slice-copy
    overhead (docs/DESIGN.md, round-4 cache section).
    """
    if callable(y):
        if not jit_loader:
            raise DecompError("a callable y requires jit_loader=True "
                              "(host-array DL streaming slices arrays)")
        return _solve_streaming_fused(
            y, d, alpha, x, tol=tol, maxiter=maxiter,
            lasso_method=lasso_method, lasso_iter=lasso_iter,
            lasso_tol=lasso_tol, mask_loader=mask,
            chunk_rows=chunk_rows, precision=precision,
            callback=callback, stop=stop, heldout_frac=heldout_frac,
            check_every=check_every, random_seed=random_seed,
            n_samples=n_samples, n_channels=n_channels, dtype=dtype,
            record_objective=record_objective, _bcd_pallas=_bcd_pallas)
    if jit_loader:
        raise DecompError("jit_loader=True requires a callable y loader")
    y = np.asarray(y)
    assertion.assert_ndim("y", y, 2)
    d = jnp.asarray(d)
    assertion.assert_ndim("d", d, 2)
    assertion.assert_axis_size("d", d, 1, y.shape[1], "n_channels")
    assertion.assert_nonnegative("alpha", alpha)
    _validate_lasso_method(lasso_method)
    if stop not in ("rel_change", "heldout"):
        raise DecompError(f"stop must be 'rel_change' or 'heldout', "
                          f"got {stop!r}")
    chunk_rows = int(chunk_rows)
    if chunk_rows < 1:
        raise DecompError("chunk_rows must be >= 1")
    if mask is not None:
        mask = np.asarray(mask)
        assertion.assert_same_shape("mask", mask, "y", y)
    heldout = stop == "heldout"
    record_objective = bool(record_objective)
    if heldout:
        if mask is None:
            raise DecompError("stop='heldout' requires a mask")
        if np.iscomplexobj(y):
            raise DecompError("stop='heldout' supports real dtypes only")
        if record_objective:
            raise DecompError("stop='heldout' is incompatible with "
                              "record_objective")
        if not 0.0 < float(heldout_frac) < 1.0:
            raise DecompError("heldout_frac must be in (0, 1)")
    n_samples = y.shape[0]
    n_atoms = d.shape[0]
    dtype = np.result_type(y.dtype, np.asarray(d).dtype)
    if x is None:
        x = np.zeros((n_samples, n_atoms), dtype=dtype)
    else:
        x = np.array(x, dtype=dtype, copy=True)
        assertion.assert_axis_size("x", x, 0, n_samples, "n_samples")
        assertion.assert_axis_size("x", x, 1, n_atoms, "n_atoms")

    rdt = real_dtype(jnp.result_type(dtype))
    alpha_j = jnp.asarray(np.asarray(alpha).real.astype(rdt))
    lasso_tol_j = jnp.asarray(lasso_tol, rdt)
    d = l2_normalize(d.astype(dtype), axis=1)
    bcd_mode = _resolve_bcd(_bcd_pallas, None, jnp.result_type(dtype),
                            n_atoms, y.shape[1], masked=mask is not None)

    hd_key = None
    if heldout:
        # same derivation root as the in-core solvers:
        # fold_in(PRNGKey(seed), _HELDOUT_SALT); per-chunk keys fold in
        # the chunk offset so every epoch reserves the SAME entries
        from decomp_tpu.models.nmf import _HELDOUT_SALT
        hd_key = jax.random.fold_in(
            jax.random.PRNGKey(np.uint32(random_seed)), _HELDOUT_SALT)
        hd_frac = jnp.float32(heldout_frac)
    ce = max(1, int(check_every))
    # warm-up floor clamped to the budget: with maxiter < 3
    # check blocks the fixed 'checks >= 3' could never fire
    # (ADVICE round-3 #3's clamp, applied to the streaming
    # drivers — code-review round-4 finding #4); two checks
    # is the minimum that can compare a validation pair
    _warmup = min(3, max(2, int(maxiter) // ce))
    obj_curve = (np.full((int(maxiter),), np.nan, np.float64)
                 if record_objective else None)
    acc_np = np.promote_types(np.float32, np.empty(0, dtype).real.dtype)
    prev_e, last_e, checks = None, None, 0
    niter, converged, diff = 0, False, np.inf
    with jax.default_matmul_precision(precision):
        for it in range(1, maxiter + 1):
            d_old = d
            is_check = heldout and it % ce == 0
            stats_a = jnp.zeros((n_atoms, n_atoms), dtype)
            stats_b = jnp.zeros((n_atoms, y.shape[1]), dtype)
            verr = vnorm = jnp.zeros((), jnp.float32)
            obj_it = jnp.zeros((), acc_np)
            for lo in range(0, n_samples, chunk_rows):
                hi = min(lo + chunk_rows, n_samples)
                yc = jnp.asarray(y[lo:hi])
                xc = jnp.asarray(x[lo:hi])
                mc = (None if mask is None
                      else jnp.asarray(mask[lo:hi], real_dtype(yc.dtype)))
                if heldout:
                    val_c = _chunk_val_mask(hd_key, lo, mc, hd_frac)
                    mc_t = mc - val_c       # train on the remainder
                else:
                    mc_t = mc
                xc, a_c, b_c = _chunk_code_and_stats(
                    yc, d, xc, alpha_j, lasso_tol_j, mc_t,
                    lasso_method=lasso_method, lasso_iter=lasso_iter,
                    masked=mask is not None)
                if is_check:
                    # validation error with the freshly-coded xc against
                    # the pre-update d (matching nmf.solve_streaming's
                    # convention)
                    ve, vn = _val_err_chunk(yc, val_c, xc, d)
                    verr = verr + ve
                    vnorm = vnorm + vn
                if record_objective:
                    obj_it = obj_it + _obj_chunk(yc, mc, xc, d, alpha_j)
                x[lo:hi] = np.asarray(xc)
                stats_a = stats_a + a_c
                stats_b = stats_b + b_c
            if mask is None:
                d = _bcd_dict_update(stats_a, stats_b, d, bcd_mode=bcd_mode)
            else:
                # projected-gradient step from the accumulated Gram
                # (stats_a) and gradient (stats_b) — the in-core
                # _masked_grad_dict_update from full-data statistics
                d = _masked_d_step(stats_a, stats_b, d)
            diff = float(_rel_diff(d_old, d))
            if record_objective:
                obj_curve[it - 1] = float(obj_it)
            niter = it
            if callback is not None:
                callback(it, diff)
            if heldout:
                if is_check:
                    e = float(verr) / max(float(vnorm), 1e-300)
                    last_e = e
                    checks += 1
                    # warm-up: no plateau verdict before the 3rd check
                    if prev_e is not None and checks >= _warmup and (
                            (prev_e - e) / max(prev_e, 1e-300)
                            < float(tol)):
                        converged = True  # validation plateaued
                        break
                    prev_e = e
            elif diff < float(tol):
                converged = True
                break

    aux = (None if last_e is None
           else {"heldout_rel_err": jnp.asarray(np.sqrt(last_e),
                                                jnp.float32)})
    objective = (jnp.asarray(obj_curve[:], jnp.float64
                             if acc_np == np.float64 else jnp.float32)
                 if record_objective else jnp.zeros((0,), jnp.float32))
    return DictionaryLearningResult(
        x=x, d=d, niter=jnp.asarray(niter, jnp.int32),
        converged=jnp.asarray(converged),
        objective=objective,
        aux=aux,
    )


@functools.partial(jax.jit, static_argnames=("lasso_method", "lasso_iter",
                                              "masked"))
def _chunk_code_and_stats(yc, d, xc, alpha, lasso_tol, mc=None, *,
                          lasso_method, lasso_iter, masked=False):
    return _chunk_code_and_stats_impl(
        yc, d, xc, alpha, lasso_tol, mc, lasso_method=lasso_method,
        lasso_iter=lasso_iter, masked=masked)


def _chunk_code_and_stats_impl(yc, d, xc, alpha, lasso_tol, mc=None, *,
                               lasso_method, lasso_iter, masked=False,
                               vary_rows=None):
    """Sparse-code one row chunk and return its dictionary-update
    statistic partials: (x^H x, x^H my) for the unmasked BCD step, or
    (x^H x, x^H (mask*(x@d) - my)) for the masked projected-gradient
    step. ``vary_rows`` marks freshly-created row-shaped lasso carries
    device-varying when traced inside a shard_map body (the fused
    sharded epoch)."""
    step, init, diff_fn, obj_fn = _lasso.build_solver(
        yc, d, alpha, xc, mc, None, method=lasso_method,
        vary_rows=vary_rows)
    res = run_iterations(step, init, tol=lasso_tol, maxiter=lasso_iter,
                         diff_fn=diff_fn, objective_fn=obj_fn,
                         record_objective=False)
    xc = res.state[0]
    gram = xc.conj().T @ xc
    if not masked:
        return xc, gram, xc.conj().T @ yc
    myc = mc * yc
    resid = mc * (xc @ d) - myc
    return xc, gram, xc.conj().T @ resid


@jax.jit
def _chunk_val_mask(key, lo, mc, frac):
    """Per-chunk validation mask: deterministic (keyed by the chunk
    offset only, so every epoch reserves the same entries) and <= mc
    elementwise."""
    kv = jax.random.fold_in(key, lo)
    bern = (jax.random.uniform(kv, mc.shape) < frac).astype(mc.dtype)
    return bern * mc


def _obj_chunk_impl(yc, mc, xc, d, alpha):
    """Chunk contribution to the full DL objective
    0.5*||mask*(y - x@d)||^2 + sum(alpha*|x|), with the freshly-coded x
    against the PRE-update d (the streaming record_objective
    convention; see solve_streaming). ONE implementation for the host
    chunk loop and the traced fused-epoch body; alpha may be a scalar
    or a per-atom vector (weighted, matching the in-core objective)."""
    acc = jnp.promote_types(jnp.float32, real_dtype(yc.dtype))
    recon = xc @ d
    resid = (yc - recon) if mc is None else mc * yc - mc * recon
    r = resid.astype(jnp.promote_types(acc, resid.dtype))
    data = 0.5 * jnp.sum(jnp.real(r * jnp.conj(r))).astype(acc)
    l1 = jnp.sum(jnp.asarray(alpha, acc) * jnp.abs(xc).astype(acc))
    return data + l1


_obj_chunk = jax.jit(_obj_chunk_impl)


@jax.jit
def _val_err_chunk(yc, val_c, xc, d):
    """Chunk contribution to (sum val*(y - x@d)^2, sum (val*y)^2)."""
    acc = jnp.promote_types(jnp.float32, real_dtype(yc.dtype))
    recon = (xc @ d).astype(acc)
    yv = (val_c * yc).astype(acc)
    r = yv - val_c.astype(acc) * recon
    return (jnp.sum(r * r).astype(jnp.float32),
            jnp.sum(yv * yv).astype(jnp.float32))


@jax.jit
def _masked_d_step(gram, grad, d):
    """Projected-gradient dictionary step from accumulated statistics
    (mirrors models.dictionary_learning._masked_grad_dict_update)."""
    rdt = real_dtype(d.dtype)
    lip = jnp.maximum(spectral_norm_psd(gram),
                      jnp.asarray(jnp.finfo(rdt).tiny, rdt))
    return l2_normalize(d - grad / lip.astype(d.dtype), axis=1)


@jax.jit
def _rel_diff(d_old, d_new):
    return _rel_diff_impl(d_old, d_new)


def epoch_cache_info():
    """Hits/misses of the fused DL-epoch compile cache (loader-identity
    pitfall debug hook; see nmf_streaming)."""
    return _DL_EPOCH_CACHE.cache_info()


_DL_EPOCH_CACHE = LoaderKeyedCache(maxsize=16)


def _dl_fused_epoch(y_loader, mask_loader, *geom):
    """Loader-identity + geometry cache front for
    ``_build_dl_fused_epoch`` — weak, self-evicting (see
    ``utils.weakcache``)."""
    return _DL_EPOCH_CACHE.get(
        (y_loader, mask_loader), geom,
        lambda wy, wm: _build_dl_fused_epoch(wy, wm, *geom))


def _build_dl_fused_epoch(y_loader, mask_loader, chunk_rows, n_chunks,
                          n_atoms, n_channels, lasso_method, lasso_iter,
                          masked, dtype, precision, with_obj=False,
                          heldout=None, with_val=False, n_true=None,
                          mesh=None, row_axis=None, bcd_mode="off"):
    """Fused dictionary-learning epoch for jit-traceable loaders: ONE
    dispatched call sparse-codes every chunk (fixed ``lasso_iter``
    budget, warm-started from the resident x), accumulates the
    dictionary statistics A += x^T x and B += x^T my (or the masked
    projected-gradient ingredients), and applies one dictionary update.
    Mirrors nmf_streaming._fused_epoch, including the sharded mode
    (mesh: per-device global row ranges, psum'd statistics, replicated
    d update), ragged tails (clamped+realigned trailing loader window;
    tail rows hold zero x/data and are exact no-ops of the coding and
    statistics), and the per-chunk held-out validation reserve.

    Note the per-chunk sparse coding recomputes the K x K dictionary
    Gram each chunk (build_solver derives it from d); at DL's typical
    K << chunk_rows this is noise next to the coding matmuls.
    """
    dtype = jnp.dtype(dtype)
    acc = jnp.promote_types(jnp.float32, dtype)
    if heldout is not None:
        from decomp_tpu.models.nmf import _HELDOUT_SALT
        hd_frac = jnp.float32(heldout[0])
        hd_key = jax.random.fold_in(
            jax.random.PRNGKey(np.uint32(heldout[1])), _HELDOUT_SALT)
    if mesh is None:
        n_dev = 1
    else:
        from decomp_tpu.parallel.mesh import validate_axis
        n_dev = validate_axis(mesh, row_axis, "row_axis")
    n_local = n_chunks * chunk_rows
    ragged = n_true is not None and int(n_true) < n_dev * n_local
    if mesh is not None:
        vaxes = functools.partial(jax.lax.pcast, axis_name=row_axis,
                                  to="varying")
    else:
        vaxes = None

    def vmark(t):
        return t if vaxes is None else vaxes(t)

    def local_pass(x_l, d, alpha, lasso_tol, row0):
        sa0 = vmark(jnp.zeros((n_atoms, n_atoms), dtype))
        sb0 = vmark(jnp.zeros((n_atoms, n_channels), dtype))
        obj0 = vmark(jnp.zeros((), acc))

        def body(i, carry):
            x_, sa, sb, obj = carry[:4]
            lo_local = i * chunk_rows
            lo = row0 + jnp.asarray(lo_local, jnp.asarray(0).dtype)
            if ragged:
                # clamp the loader window into the true data (see
                # nmf_streaming: the sharded grid's padding can exceed
                # one chunk)
                lo_eff = jnp.clip(lo, 0, n_true - chunk_rows)
                s = lo - lo_eff
                is_tail = s > 0
                valid = (jax.lax.broadcasted_iota(
                    jnp.int32, (chunk_rows, 1), 0)
                    < jnp.asarray(chunk_rows, jnp.int32)
                    - s.astype(jnp.int32))
            else:
                lo_eff = lo

            def tail_align(c):
                if not ragged:
                    return c
                return jax.lax.cond(
                    is_tail,
                    lambda t: jnp.where(valid, jnp.roll(t, -s, axis=0),
                                        jnp.zeros_like(t)),
                    lambda t: t, c)

            yc = tail_align(jnp.asarray(
                y_loader(lo_eff, lo_eff + chunk_rows), dtype))
            mc = (None if mask_loader is None
                  else tail_align(jnp.asarray(
                      mask_loader(lo_eff, lo_eff + chunk_rows), dtype)))
            val_c = None
            if heldout is not None:
                kv = jax.random.fold_in(hd_key, lo.astype(jnp.uint32))
                val_c = ((jax.random.uniform(
                    kv, (chunk_rows, n_channels)) < hd_frac)
                    .astype(dtype) * mc)
                mc = mc - val_c
            xc_prev = jax.lax.dynamic_slice(
                x_, (lo_local, 0), (chunk_rows, n_atoms))
            xc, a_c, b_c = _chunk_code_and_stats_impl(
                yc, d, xc_prev, alpha, lasso_tol, mc,
                lasso_method=lasso_method, lasso_iter=lasso_iter,
                masked=masked, vary_rows=vaxes)
            if ragged:
                # tail rows hold zero data AND zero x, so the coding is
                # an exact no-op there (grad 0 at x 0, soft-threshold of
                # 0 is 0) — the select is belt-and-braces against a
                # nonzero warm start in the padding
                xc = jax.lax.cond(
                    is_tail,
                    lambda a_, b_: jnp.where(valid, a_, b_),
                    lambda a_, b_: a_, xc, xc_prev)
            x_ = jax.lax.dynamic_update_slice(x_, xc, (lo_local, 0))
            oc = jnp.zeros((), acc)
            if with_obj:
                # Streaming record_objective convention (matching
                # nmf.solve_streaming): the full DL objective with the
                # freshly-coded x against the PRE-update d — one extra
                # reconstruction matmul per chunk. Tail rows hold zero
                # x AND zero data, so they contribute nothing. with_obj
                # excludes heldout (validated at entry), so mc is the
                # FULL mask here.
                oc = _obj_chunk_impl(yc, mc, xc, d, alpha)
            if not with_val:
                return (x_, sa + a_c, sb + b_c, obj + oc)
            verr, vnorm = carry[4], carry[5]
            recon_v = (xc @ d).astype(acc)
            yv = (val_c * yc).astype(acc)
            rv = yv - val_c.astype(acc) * recon_v
            return (x_, sa + a_c, sb + b_c, obj + oc,
                    verr + jnp.sum(rv * rv), vnorm + jnp.sum(yv * yv))

        if with_val:
            init = (x_l, sa0, sb0, obj0, vmark(jnp.zeros((), acc)),
                    vmark(jnp.zeros((), acc)))
        else:
            init = (x_l, sa0, sb0, obj0)
        return jax.lax.fori_loop(0, n_chunks, body, init)

    def finish(d, sa, sb):
        if masked:
            d_new = _masked_d_step(sa, sb, d)
        else:
            # Fused-sweep kernel when gated (sharded: sa/sb are psum'd
            # and d replicated; the epoch shard_map runs check_vma=False)
            d_new = _bcd_dict_update(sa, sb, d, bcd_mode=bcd_mode)
        return d_new, _rel_diff_impl(d, d_new)

    if mesh is None:
        @functools.partial(jax.jit, donate_argnums=())
        def epoch(x, d, alpha, lasso_tol):
            with jax.default_matmul_precision(precision):
                int_dt = jnp.asarray(0).dtype
                out = local_pass(x, d, alpha, lasso_tol,
                                 jnp.asarray(0, int_dt))
                x, sa, sb, obj = out[:4]
                d_new, rd = finish(d, sa, sb)
                if with_val:
                    return (x, d_new, rd, obj, out[4], out[5])
                return x, d_new, rd, obj

        return epoch

    from jax.sharding import PartitionSpec as P

    def body_shard(x_l, d_r, alpha, lasso_tol):
        int_dt = jnp.asarray(0).dtype
        row0 = (jax.lax.axis_index(row_axis) * n_local).astype(int_dt)
        out = local_pass(x_l, d_r, alpha, lasso_tol, row0)
        x_l, sa, sb = out[:3]
        sa = jax.lax.psum(sa, row_axis)
        sb = jax.lax.psum(sb, row_axis)
        obj = jax.lax.psum(out[3], row_axis)
        d_new, rd = finish(d_r, sa, sb)
        if with_val:
            return (x_l, d_new, rd, obj,
                    jax.lax.psum(out[4], row_axis),
                    jax.lax.psum(out[5], row_axis))
        return x_l, d_new, rd, obj

    out_specs = (P(row_axis, None), P(None, None), P(), P())
    if with_val:
        out_specs = out_specs + (P(), P())

    @jax.jit
    def sharded_epoch(x, d, alpha, lasso_tol):
        with jax.default_matmul_precision(precision):
            # check_vma off: the inner lasso's convergence scalars are
            # deliberately CHUNK-LOCAL (each device codes different
            # global chunks; a psum'd inner stop would change semantics
            # vs single-device), so its while_loop carries are
            # device-varying by design.
            return jax.shard_map(
                body_shard, mesh=mesh,
                in_specs=(P(row_axis, None), P(None, None), P(), P()),
                out_specs=out_specs, check_vma=False)(x, d, alpha,
                                                      lasso_tol)

    return sharded_epoch


def _rel_diff_impl(d_old, d_new):
    acc_dt = jnp.promote_types(jnp.float32, real_dtype(d_old.dtype))
    num = jnp.linalg.norm((d_new - d_old).astype(
        jnp.promote_types(acc_dt, d_old.dtype)))
    den = jnp.maximum(
        jnp.linalg.norm(d_old.astype(jnp.promote_types(acc_dt,
                                                       d_old.dtype))),
        jnp.asarray(jnp.finfo(acc_dt).tiny, acc_dt))
    return jnp.real(num) / den


def _solve_streaming_fused(y_loader, d, alpha, x, *, tol, maxiter,
                           lasso_method, lasso_iter, lasso_tol,
                           mask_loader, chunk_rows, precision, callback,
                           stop, heldout_frac, check_every, random_seed,
                           n_samples, n_channels, dtype,
                           record_objective=False, mesh=None,
                           row_axis=None, _bcd_pallas=None):
    """Driver for the fused (jit-loader) DL epochs — single-device when
    ``mesh`` is None, sharded otherwise (the parallel entry wraps this).
    """
    _validate_lasso_method(lasso_method)
    if n_samples is None or n_channels is None or dtype is None:
        raise DecompError("a callable y requires explicit n_samples, "
                          "n_channels and dtype")
    dtype = jnp.dtype(dtype)
    if jnp.issubdtype(dtype, jnp.complexfloating):
        raise DecompError("the fused DL epoch supports real dtypes only "
                          "(complex problems stream via the host path "
                          "or run in-core via solve_split)")
    if mask_loader is not None and not callable(mask_loader):
        raise DecompError("with a callable y, mask must also be a "
                          "callable (lo, hi) -> chunk")
    if stop not in ("rel_change", "heldout"):
        raise DecompError(f"stop must be 'rel_change' or 'heldout', "
                          f"got {stop!r}")
    masked = mask_loader is not None
    heldout = stop == "heldout"
    record_objective = bool(record_objective)
    if heldout and not masked:
        raise DecompError("stop='heldout' requires a mask loader")
    if heldout and record_objective:
        raise DecompError("stop='heldout' is incompatible with "
                          "record_objective")
    if heldout and not 0.0 < float(heldout_frac) < 1.0:
        raise DecompError("heldout_frac must be in (0, 1)")
    n_samples, n_channels = int(n_samples), int(n_channels)
    chunk_rows = int(chunk_rows)
    if chunk_rows < 1:
        raise DecompError("chunk_rows must be >= 1")
    if chunk_rows > n_samples:
        raise DecompError(
            f"chunk_rows={chunk_rows} exceeds n_samples={n_samples}")
    if np.asarray(alpha).ndim:
        raise DecompError("the fused DL epoch supports scalar alpha")
    if mesh is None:
        n_dev = 1
    else:
        from decomp_tpu.parallel.mesh import validate_axis
        n_dev = validate_axis(mesh, row_axis, "row_axis")
    n_chunks_local = -(-n_samples // (n_dev * chunk_rows))
    n_local = n_chunks_local * chunk_rows
    n_pad = n_dev * n_local

    d = jnp.asarray(d, dtype)
    assertion.assert_ndim("d", d, 2)
    assertion.assert_axis_size("d", d, 1, n_channels, "n_channels")
    assertion.assert_nonnegative("alpha", alpha)
    d = l2_normalize(d, axis=1)
    n_atoms = d.shape[0]
    alpha_j = jnp.asarray(float(alpha), dtype)
    lasso_tol_j = jnp.asarray(lasso_tol, dtype)

    if x is None:
        x = jnp.zeros((n_pad, n_atoms), dtype)
    else:
        x = jnp.asarray(x, dtype)
        assertion.assert_axis_size("x", x, 0, n_samples, "n_samples")
        assertion.assert_axis_size("x", x, 1, n_atoms, "n_atoms")
        if n_pad != n_samples:
            x = jnp.concatenate(
                [x, jnp.zeros((n_pad - n_samples, n_atoms), dtype)],
                axis=0)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        x = jax.device_put(x, NamedSharding(mesh, P(row_axis, None)))

    n_true = n_samples if n_pad != n_samples else None
    hd_key = (float(heldout_frac), int(random_seed)) if heldout else None
    # result_type canonicalizes the DECLARED dtype (f64 -> f32 under
    # default x64-off) so the gate judges the dtype the epoch actually
    # runs, matching the host-array path's gate.
    bcd_mode = _resolve_bcd(_bcd_pallas, None, jnp.result_type(dtype),
                            n_atoms, n_channels, masked=masked)
    common = (y_loader, mask_loader, chunk_rows, n_chunks_local,
              int(n_atoms), n_channels, lasso_method, int(lasso_iter),
              masked, dtype, precision, record_objective)
    epoch = _dl_fused_epoch(*common, hd_key, False, n_true, mesh,
                            row_axis, bcd_mode)
    epoch_val = (None if not heldout else _dl_fused_epoch(
        *common, hd_key, True, n_true, mesh, row_axis, bcd_mode))

    tol_f = float(tol)
    need_diff = (not heldout) and (tol_f > 0.0 or callback is not None)
    ce = max(1, int(check_every))
    # warm-up floor clamped to the budget: with maxiter < 3
    # check blocks the fixed 'checks >= 3' could never fire
    # (ADVICE round-3 #3's clamp, applied to the streaming
    # drivers — code-review round-4 finding #4); two checks
    # is the minimum that can compare a validation pair
    _warmup = min(3, max(2, int(maxiter) // ce))
    obj_curve = (np.full((int(maxiter),), np.nan, np.float64)
                 if record_objective else None)
    objs_dev = []
    prev_e, last_e, checks = None, None, 0
    niter, converged = 0, False
    with jax.default_matmul_precision(precision):
        for it in range(1, int(maxiter) + 1):
            if heldout and it % ce == 0:
                x, d, diff_dev, _obj, verr, vnorm = epoch_val(
                    x, d, alpha_j, lasso_tol_j)
                e = float(verr) / max(float(vnorm), 1e-300)
                last_e = e
                checks += 1
                if callback is not None:
                    callback(it, float(diff_dev))
                niter = it
                if prev_e is not None and checks >= _warmup and (
                        (prev_e - e) / max(prev_e, 1e-300) < tol_f):
                    converged = True  # validation plateaued
                    break
                prev_e = e
                continue
            x, d, diff_dev, obj_dev = epoch(x, d, alpha_j, lasso_tol_j)
            if record_objective:
                objs_dev.append(obj_dev)
            niter = it
            if need_diff and (it % ce == 0 or it == maxiter):
                diff = float(diff_dev)  # one sync per CHECK epoch
                if callback is not None:
                    callback(it, diff)
                if diff < tol_f:
                    converged = True
                    break
    if record_objective:
        # ONE batched device->host transfer: per-scalar float() reads
        # would cost one ~25 ms tunnel round trip PER EPOCH here
        # (code-review round 4).
        for i, o in enumerate(jax.device_get(objs_dev)):
            obj_curve[i] = float(o)
        acc_np = np.promote_types(np.float32, dtype)
        objective = jnp.asarray(obj_curve[:], jnp.float64
                                if acc_np == np.float64 else jnp.float32)
    else:
        objective = jnp.zeros((0,), jnp.float32)
    aux = (None if last_e is None
           else {"heldout_rel_err": jnp.asarray(np.sqrt(last_e),
                                                jnp.float32)})
    if n_pad != n_samples:
        x = x[:n_samples]
    return DictionaryLearningResult(
        x=x, d=d, niter=jnp.asarray(niter, jnp.int32),
        converged=jnp.asarray(converged),
        objective=objective, aux=aux)
