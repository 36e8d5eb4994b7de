"""Sharded out-of-core NMF: data larger than EVERY chip's HBM, streamed.

The true pod-scale configuration (BASELINE.json:11 beyond per-chip HBM):
the sample axis shards over the mesh AND each device streams its local
row range in chunks through a fused epoch — combining
``parallel.nmf.solve`` (SPMD, psum'd Gram statistics over ICI) with
``nmf.solve_streaming``'s jit-loader machinery (callable chunk sources,
device-resident x, single-pass Pallas chunk kernel).

Per outer iteration each device:
1. loops over its local chunks (lax.fori_loop): the loader is called
   with GLOBAL row offsets (device row-range + chunk index), the x block
   updates in place, and the d-update sufficient statistics accumulate
   locally — through ``pallas_mu.mu_stats_dense/masked`` when the
   geometry allows (one read per chunk);
2. allreduces the K-sized statistics over the mesh (the only
   cross-device traffic, same as the in-core sharded solver);
3. applies the identical d update everywhere (d stays replicated) and
   evaluates the allreduced stopping scalar.

The whole pass is ONE dispatched call per outer iteration per host.

Measured caveat (single-chip rig, 1-device mesh): the shard_map-wrapped
epoch runs ~3.5x slower per chunk than the identical single-device fused
epoch at the same shape (110 vs 31 ms/iter at 262k x 10112 r128 with an
on-device generator; the jnp and Pallas chunk paths BOTH show it, so it
is not the kernel) — the in-core sharded solver shows NO such overhead
(BASELINE.md config 5: sharded == unsharded per-iteration), so the gap
is specific to the chunk-loop-inside-shard_map lowering on this
platform (likely lost pipelining of the per-chunk DMAs), not to the
collectives. On one device prefer
``nmf.solve_streaming``; this entry exists for actual multi-chip meshes,
where the per-device data and epoch time shrink by the device count.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from decomp_tpu.models.nmf_streaming import (
    _chunk_step_impl,
    _d_from_stats_impl,
    _rel_diff_impl,
)
from decomp_tpu.utils.exceptions import DecompError
from decomp_tpu.utils.result import NMFResult


def solve_streaming(
    y,
    d=None,
    *,
    rank: Optional[int] = None,
    x=None,
    mesh: Mesh,
    row_axis: str = "rows",
    tol=1e-4,
    maxiter: int = 100,
    method: str = "mu",
    mask=None,
    chunk_rows: int = 65536,
    random_seed: int = 0,
    eps: float = 1e-15,
    precision: str = "highest",
    factor_dtype=None,
    callback=None,
    n_samples: Optional[int] = None,
    n_channels: Optional[int] = None,
    dtype=None,
    _pallas_interpret: bool = False,
) -> NMFResult:
    """Sharded out-of-core ``y ≈ x @ d`` with nonnegative factors.

    ``y`` MUST be a jit-traceable callable ``(lo, hi) -> chunk`` taking
    GLOBAL row offsets (each device calls it for its own row range; the
    chunk size is static). ``mask`` likewise, if given. ``x`` stays
    device-resident, row-sharded over ``mesh[row_axis]``; ``d`` is
    replicated. Requires ``n_samples`` divisible by
    ``mesh.shape[row_axis] * chunk_rows``. Other parameters as in
    ``decomp_tpu.nmf.solve_streaming`` (methods 'mu'/'kl-mu').

    Returns NMFResult with a row-sharded global ``x``.

    CACHING PITFALL: the compiled sharded epoch is cached per LOADER
    IDENTITY (plus geometry/flags). Pass the SAME loader callable across
    repeated calls — a fresh closure per call re-traces + re-compiles
    the epoch every time. ``epoch_cache_info()`` in this module reports
    hits/misses for debugging.
    """
    if method not in ("mu", "kl-mu"):
        raise DecompError(f"method must be 'mu' or 'kl-mu', got {method!r}")
    if not callable(y):
        raise DecompError("the sharded streaming solver requires a "
                          "callable y loader (host arrays cannot stream "
                          "inside shard_map); see nmf.solve_streaming "
                          "for host-array streaming on one device")
    if n_samples is None or n_channels is None or dtype is None:
        raise DecompError("a callable y requires explicit n_samples, "
                          "n_channels and dtype")
    if mask is not None and not callable(mask):
        raise DecompError("with a callable y, mask must also be a "
                          "callable (lo, hi) -> chunk")
    if row_axis not in mesh.axis_names:
        raise DecompError(f"row_axis {row_axis!r} not in mesh axes "
                          f"{mesh.axis_names}")
    n_dev = mesh.shape[row_axis]
    n_samples, n_channels = int(n_samples), int(n_channels)
    chunk_rows = int(chunk_rows)
    if chunk_rows < 1:
        raise DecompError("chunk_rows must be >= 1")
    if n_samples % (n_dev * chunk_rows):
        raise DecompError(
            f"n_samples={n_samples} must be divisible by "
            f"mesh[{row_axis!r}] * chunk_rows = {n_dev} * {chunk_rows}")
    y_dtype = jnp.dtype(dtype)
    if factor_dtype is not None:
        factor_dtype = jnp.dtype(factor_dtype)
        if factor_dtype == y_dtype:
            factor_dtype = None
    if factor_dtype is not None:
        if method != "mu":
            raise DecompError("factor_dtype currently supports "
                              "method='mu' only")
        if jnp.finfo(factor_dtype).bits < jnp.finfo(y_dtype).bits:
            raise DecompError("factor_dtype must be at least as wide as "
                              "y's dtype")
    fdt = y_dtype if factor_dtype is None else factor_dtype
    if d is None and rank is None:
        raise DecompError("provide an initial dictionary `d` or a `rank`")

    rng = np.random.default_rng(random_seed)
    if d is None:
        # Scale from the first chunk's observed mean (same contract as
        # the single-device streamer).
        head = jnp.asarray(y(0, chunk_rows))
        mh = (None if mask is None
              else jnp.asarray(mask(0, chunk_rows), head.dtype))
        acc = jnp.promote_types(jnp.float32, head.dtype)
        if mh is not None:
            total = float(jnp.sum((head * mh).astype(acc)))
            count = max(float(jnp.sum(mh.astype(acc))), 1.0)
            mean_y = max(total / count, 1e-30)
        else:
            mean_y = max(float(jnp.mean(head.astype(acc))), 1e-30)
        scale = np.sqrt(2.0 * mean_y / rank)
        d = (scale * rng.uniform(size=(rank, n_channels))).astype(fdt)
    d = jnp.asarray(d, fdt)
    rank = d.shape[0]
    x_sharding = NamedSharding(mesh, P(row_axis, None))
    if x is None:
        kx = jax.random.PRNGKey(np.uint32(random_seed))
        scale = float(jnp.sqrt(2.0 * jnp.maximum(
            jnp.mean(jnp.asarray(y(0, chunk_rows)).astype(jnp.float32)),
            1e-30) / rank))
        x = jax.jit(
            lambda k: scale * jax.random.uniform(
                k, (n_samples, rank), dtype=fdt),
            out_shardings=x_sharding)(kx)
    else:
        x = jax.device_put(jnp.asarray(x, fdt), x_sharding)

    epoch = _sharded_epoch(
        y, mask, chunk_rows, n_samples // n_dev // chunk_rows,
        n_samples // n_dev, rank, n_channels, method, mask is not None,
        factor_dtype is not None, y_dtype, float(eps), precision, mesh,
        row_axis, bool(_pallas_interpret))

    tol_f = float(tol)
    need_diff = tol_f > 0.0 or callback is not None
    niter, converged = 0, False
    with jax.default_matmul_precision(precision):
        for it in range(1, int(maxiter) + 1):
            x, d, diff_dev = epoch(x, d)
            niter = it
            if need_diff:
                diff = float(diff_dev)
                if callback is not None:
                    callback(it, diff)
                if diff < tol_f:
                    converged = True
                    break
    return NMFResult(
        x=x, d=d, niter=jnp.asarray(niter, jnp.int32),
        converged=jnp.asarray(converged),
        objective=jnp.zeros((0,), jnp.float32))


def epoch_cache_info():
    """Hits/misses of the sharded-epoch compile cache (debug hook for
    the loader-identity pitfall; see the solve_streaming docstring)."""
    return _sharded_epoch.cache_info()


@functools.lru_cache(maxsize=16)
def _sharded_epoch(y_loader, mask_loader, chunk_rows, n_chunks_local,
                   n_local, rank, n_channels, method, masked, mixed,
                   y_dtype, eps_f, precision, mesh, row_axis,
                   pallas_interpret):
    """Build (and cache) the jitted sharded fused epoch."""
    from decomp_tpu.ops import pallas_mu as _pmu

    acc_j = jnp.promote_types(jnp.float32, y_dtype)
    use_pallas_chunk = (
        (_pmu.calibrated_tpu() or pallas_interpret)
        and method == "mu"
        and chunk_rows % 128 == 0
        and n_channels % 128 == 0
        and rank % 128 == 0
        and _pmu.fits_vmem(n_channels, rank,
                           jnp.dtype(y_dtype).itemsize, masked)
    )

    def body_shard(x_l, d_r):
        # default int dtype (int64 under x64, int32 otherwise): loaders
        # combine lo with python literals, which must promote consistently
        int_dt = jnp.asarray(0).dtype
        row0 = (jax.lax.axis_index(row_axis) * n_local).astype(int_dt)
        db = d_r.astype(y_dtype) if use_pallas_chunk else None
        # fori carry types must be loop-invariant under shard_map's vma
        # checking: the stats become device-varying after one chunk (the
        # loader offset depends on axis_index), so mark the zero inits
        # varying up front.
        vrows = functools.partial(jax.lax.pcast, axis_name=row_axis,
                                  to="varying")
        num0 = vrows(jnp.zeros((rank, n_channels), acc_j))
        den0 = vrows(jnp.zeros((rank, rank), acc_j) if not masked
                     and method == "mu"
                     else jnp.zeros((rank, n_channels), acc_j))

        def body(i, carry):
            x_, num, den = carry
            lo = row0 + jnp.asarray(i, int_dt) * chunk_rows  # GLOBAL
            yc = jnp.asarray(y_loader(lo, lo + chunk_rows), y_dtype)
            mc = (None if mask_loader is None
                  else jnp.asarray(mask_loader(lo, lo + chunk_rows),
                                   yc.dtype))
            xc = jax.lax.dynamic_slice(x_, (i * chunk_rows, 0),
                                       (chunk_rows, rank))
            if use_pallas_chunk:
                from decomp_tpu.ops import pallas_mu

                if masked:
                    xc, nc, dc = pallas_mu.mu_stats_masked(
                        mc * yc, mc, xc, db,
                        jnp.asarray(eps_f, jnp.float32),
                        interpret=pallas_interpret)
                else:
                    xc, nc, dc = pallas_mu.mu_stats_dense(
                        yc, xc, db, jnp.asarray(eps_f, jnp.float32),
                        interpret=pallas_interpret)
                nc = nc.astype(acc_j)
                dc = dc.astype(acc_j)
            else:
                xc, nc, dc, _ = _chunk_step_impl(
                    yc, xc, d_r, mc, jnp.asarray(
                        eps_f, acc_j if mixed else y_dtype),
                    method=method, masked=masked, mixed=mixed,
                    with_obj=False)
            x_ = jax.lax.dynamic_update_slice(x_, xc, (i * chunk_rows, 0))
            return (x_, num + nc, den + dc)

        # NOTE on the shard_map pipelining caveat (module docstring):
        # unrolling this loop was tried and rejected — full unrolling
        # makes every chunk's buffers live at once (OOM at pod scale),
        # and even unroll=2 crashes this platform's remote compile
        # helper on the duplicated kernel calls. The rolled form is
        # correct everywhere; revisit on real multi-chip hardware.
        x_l, num, den = jax.lax.fori_loop(0, n_chunks_local, body,
                                          (x_l, num0, den0))
        # The ONLY cross-device traffic: K-sized statistics over ICI.
        num = jax.lax.psum(num, row_axis)
        den = jax.lax.psum(den, row_axis)
        d_new = _d_from_stats_impl(d_r, num, den,
                                   jnp.asarray(eps_f, acc_j),
                                   method=method, masked=masked,
                                   mixed=mixed)
        return x_l, d_new, _rel_diff_impl(d_r, d_new)

    @jax.jit
    def epoch(x, d):
        with jax.default_matmul_precision(precision):
            return jax.shard_map(
                body_shard, mesh=mesh,
                in_specs=(P(row_axis, None), P(None, None)),
                out_specs=(P(row_axis, None), P(None, None), P()),
                check_vma=not use_pallas_chunk,
            )(x, d)

    return epoch
