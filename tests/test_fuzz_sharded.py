"""Randomized fuzz tier for the DISTRIBUTED paths (SURVEY.md §4.4 plus
the §4 no-golden-files philosophy): every case draws a random small
problem AND a random mesh topology (1-D row mesh, 2-D row×col mesh, or a
hierarchical ('slice', 'rows') tuple axis) from a seeded generator and
asserts the sharded solver reproduces the single-device trajectory —
factors to 1e-12 in f64, and iteration-count/convergence bookkeeping
exactly.

The in-core tier draws mesh-divisible sample counts (divisibility is a
documented contract of the in-core sharded entries); the streaming tier
deliberately draws RAGGED sample counts and chunk sizes, since the
streamers own the padding/masking of the tail.
"""

import numpy as np
import pytest

import decomp_tpu
from decomp_tpu import parallel
from problems import rel_err

MESHES = ("rows8", "rows4cols2", "slice2rows4")


def _draw_mesh(rng):
    """A random mesh topology. Returns (mesh, row_axis, col_axis,
    combined row extent)."""
    kind = str(rng.choice(MESHES))
    if kind == "rows8":
        return parallel.make_mesh((8,), ("rows",)), "rows", None, 8
    if kind == "rows4cols2":
        mesh = parallel.make_mesh((4, 2), ("rows", "cols"))
        # col sharding is only used where the case supports it
        return mesh, "rows", "cols", 4
    mesh = parallel.make_mesh((2, 4), ("slice", "rows"))
    return mesh, ("slice", "rows"), None, 8


@pytest.mark.parametrize("seed", range(701, 713))
def test_fuzz_sharded_nmf_matches_single_device(seed):
    rng = np.random.default_rng(seed)
    mesh, row_axis, col_axis, n_rowdev = _draw_mesh(rng)
    m = n_rowdev * int(rng.integers(2, 9))
    n = 2 * int(rng.integers(4, 17))  # even: divisible by the col axis
    k = int(rng.integers(1, 6))
    method = str(rng.choice(["mu", "kl-mu"]))
    use_col = col_axis is not None and bool(rng.random() < 0.7)
    masked = bool(rng.random() < 0.5)
    record = bool(rng.random() < 0.3)
    y = rng.uniform(0.05, 1.0, (m, n))
    mask = None
    if masked:
        mask = (rng.random((m, n)) < 0.7).astype(np.float64)
        y = y * mask
    x0 = rng.uniform(0.1, 1.0, (m, k))
    d0 = rng.uniform(0.1, 1.0, (k, n))
    tol = 0.0 if rng.random() < 0.5 else 10.0 ** rng.uniform(-5, -2)
    maxiter = int(rng.integers(1, 30))

    core = decomp_tpu.nmf.solve(y, d0, x=x0, mask=mask, tol=tol,
                                maxiter=maxiter, method=method,
                                record_objective=record)
    res = parallel.nmf.solve(y, d0, x=x0, mask=mask, tol=tol,
                             maxiter=maxiter, method=method,
                             record_objective=record, mesh=mesh,
                             row_axis=row_axis,
                             col_axis=col_axis if use_col else None)
    ctx = (m, n, k, method, row_axis, use_col, masked, tol, maxiter)
    assert int(res.niter) == int(core.niter), ctx
    assert bool(res.converged) == bool(core.converged), ctx
    assert rel_err(res.x, core.x) < 1e-12, ctx
    assert rel_err(res.d, core.d) < 1e-12, ctx
    if record:
        np.testing.assert_allclose(np.asarray(res.objective),
                                   np.asarray(core.objective), rtol=1e-10)


@pytest.mark.parametrize("seed", range(801, 811))
def test_fuzz_sharded_lasso_matches_single_device(seed):
    rng = np.random.default_rng(seed)
    mesh, row_axis, _, n_rowdev = _draw_mesh(rng)
    m = n_rowdev * int(rng.integers(1, 9))
    f = int(rng.integers(2, 20))
    c = int(rng.integers(2, 20))
    method = str(rng.choice(["ista", "fista", "acc_ista"]))
    per_problem = bool(rng.random() < 0.5)
    masked = bool(rng.random() < 0.4)
    a = rng.normal(size=(f, c))
    y = rng.normal(size=(m, c))
    mask = None
    if masked:
        mask = (rng.random((m, c)) < 0.7).astype(np.float64)
        y = y * mask
    alpha = 10.0 ** rng.uniform(-2, 0)
    x0 = None
    if rng.random() < 0.4:
        x0 = rng.normal(size=(m, f)) * (rng.random((m, f)) < 0.5)
    tol = 10.0 ** rng.uniform(-6, -4)
    maxiter = int(rng.integers(3, 80))

    kw = dict(tol=tol, maxiter=maxiter, method=method, mask=mask,
              per_problem=per_problem)
    core = decomp_tpu.lasso.solve(y, a, alpha, x=x0, **kw)
    res = parallel.lasso.solve(y, a, alpha, x=x0, mesh=mesh,
                               axis=row_axis, **kw)
    ctx = (m, f, c, method, row_axis, per_problem, masked)
    assert rel_err(res.x, core.x) < 1e-12, ctx
    np.testing.assert_array_equal(np.asarray(res.niter),
                                  np.asarray(core.niter), err_msg=str(ctx))
    np.testing.assert_array_equal(np.asarray(res.converged),
                                  np.asarray(core.converged),
                                  err_msg=str(ctx))


@pytest.mark.parametrize("seed", range(901, 909))
def test_fuzz_sharded_dl_matches_single_device(seed):
    rng = np.random.default_rng(seed)
    mesh, row_axis, _, n_rowdev = _draw_mesh(rng)
    m = n_rowdev * int(rng.integers(1, 7))
    c = int(rng.integers(2, 15))
    k = int(rng.integers(1, 8))
    lasso_method = str(rng.choice(["ista", "fista", "acc_ista"]))
    masked = bool(rng.random() < 0.4)
    y = rng.normal(size=(m, c))
    mask = None
    if masked:
        mask = (rng.random((m, c)) < 0.7).astype(np.float64)
        y = y * mask
    d0 = rng.normal(size=(k, c))
    d0 = d0 / np.sqrt(np.sum(d0 ** 2, axis=1, keepdims=True))
    alpha = 10.0 ** rng.uniform(-2, 0)
    lasso_iter = int(rng.integers(2, 8))
    tol = 0.0 if rng.random() < 0.5 else 10.0 ** rng.uniform(-5, -2)
    maxiter = int(rng.integers(1, 12))

    kw = dict(tol=tol, maxiter=maxiter, lasso_method=lasso_method,
              lasso_iter=lasso_iter, lasso_tol=0.0, mask=mask)
    core = decomp_tpu.dictionary_learning.solve(y, d0, alpha, **kw)
    res = parallel.dictionary_learning.solve(y, d0, alpha, mesh=mesh,
                                             axis=row_axis, **kw)
    ctx = (m, c, k, lasso_method, row_axis, masked, tol, maxiter)
    assert int(res.niter) == int(core.niter), ctx
    assert bool(res.converged) == bool(core.converged), ctx
    assert rel_err(res.d, core.d) < 1e-12, ctx
    assert rel_err(res.x, core.x) < 1e-12, ctx


@pytest.mark.parametrize("seed", range(1001, 1011))
def test_fuzz_sharded_streaming_matches_single_streaming(seed):
    """Sharded out-of-core epochs vs the single-device fused streamer on
    RAGGED geometry: random (m, chunk_rows) with no divisibility at all
    (the sharded grid pads to n_dev * chunk_rows and masks the tail).
    Loaders are the callable dynamic_slice form both streamers share."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    mesh, row_axis, _, n_rowdev = _draw_mesh(rng)
    family = str(rng.choice(["nmf", "dl"]))
    m = int(rng.integers(n_rowdev, 160))
    n = int(rng.integers(4, 24))
    chunk = int(rng.integers(2, 33))
    masked = bool(rng.random() < 0.5)
    maxiter = int(rng.integers(1, 8))
    y = rng.uniform(0.05, 1.0, (m, n))
    mask = None
    if masked:
        mask = (rng.random((m, n)) < 0.7).astype(np.float64)
        y = y * mask
    yd = jnp.asarray(y)
    md = None if mask is None else jnp.asarray(mask)

    def loader(lo, hi):
        return jax.lax.dynamic_slice(yd, (lo, 0), (chunk, n))

    mloader = (None if md is None else
               (lambda lo, hi: jax.lax.dynamic_slice(md, (lo, 0),
                                                     (chunk, n))))
    if family == "nmf":
        k = int(rng.integers(1, 6))
        x0 = rng.uniform(0.1, 1.0, (m, k))
        d0 = rng.uniform(0.1, 1.0, (k, n))
        method = str(rng.choice(["mu", "kl-mu"]))
        kw = dict(tol=0.0, maxiter=maxiter, method=method, mask=mloader,
                  chunk_rows=chunk, n_samples=m, n_channels=n,
                  dtype=np.float64)
        core = decomp_tpu.nmf.solve_streaming(loader, d0, x=x0,
                                              x_device=True,
                                              jit_loader=True, **kw)
        res = parallel.nmf.solve_streaming(loader, d0, x=x0, mesh=mesh,
                                           row_axis=row_axis, **kw)
        ctx = (m, n, k, chunk, method, row_axis, masked)
    else:
        k = int(rng.integers(1, 6))
        d0 = rng.normal(size=(k, n))
        x0 = None
        kw = dict(tol=0.0, maxiter=maxiter, lasso_iter=int(
            rng.integers(2, 6)), lasso_tol=0.0, mask=mloader,
            chunk_rows=chunk, n_samples=m, n_channels=n,
            dtype=np.float64)
        core = decomp_tpu.dictionary_learning.solve_streaming(
            loader, d0, 0.05, jit_loader=True, **kw)
        res = parallel.dictionary_learning.solve_streaming(
            loader, d0, 0.05, mesh=mesh, row_axis=row_axis, **kw)
        ctx = (m, n, k, chunk, row_axis, masked)
    assert rel_err(res.d, core.d) < 1e-10, ctx
    assert rel_err(res.x, core.x) < 1e-10, ctx
