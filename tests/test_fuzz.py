"""Randomized cross-implementation fuzz tier (SURVEY.md §4 philosophy:
no golden files — the NumPy mirror is the executable ground truth).

Each case draws a random small problem (shape, dtype, method, mask, warm
start, alpha form, tolerance, budget) from a SEEDED generator and asserts
trajectory-level agreement with ``tests/reference_impl.py`` in f64:
final factors to 1e-8, plus niter/converged equality. The draw ranges
deliberately include the degenerate edges (single-row batches,
single-feature dictionaries, rank 1, maxiter 1) where indexing and
broadcasting bugs hide.

Constraints mirrored from the reference's own support matrix:
- 'cd' runs unmasked with scalar alpha (the sequential mirror indexes a
  scalar threshold); 'parallel_cd' runs unmasked;
- masks fuzz the three gradient methods (the mirror's masked Gram path);
- per-sample (m, 1) alpha fuzzes gradient methods only.
"""

import numpy as np
import pytest

import decomp_tpu
import reference_impl as ref
from problems import rel_err

GRAD = ("ista", "fista", "acc_ista")


def _mat(rng, shape, complex_):
    a = rng.normal(size=shape)
    if complex_:
        a = a + 1j * rng.normal(size=shape)
    return a


@pytest.mark.parametrize("seed", range(101, 115))
def test_fuzz_lasso_matches_reference(seed):
    rng = np.random.default_rng(seed)
    m = int(rng.integers(1, 13))
    f = int(rng.integers(1, 21))
    c = int(rng.integers(1, 21))
    complex_ = bool(rng.random() < 0.3)
    method = str(rng.choice(["ista", "fista", "acc_ista", "cd",
                             "parallel_cd"]))
    a = _mat(rng, (f, c), complex_)
    y = _mat(rng, (m, c), complex_)
    mask = None
    if method in GRAD and rng.random() < 0.4:
        mask = (rng.random((m, c)) < 0.7).astype(np.float64)
        y = y * mask
    base = 10.0 ** rng.uniform(-3, 0)
    if method == "cd":
        alpha = base
    elif method == "parallel_cd":
        alpha = (base if rng.random() < 0.5
                 else base * rng.uniform(0.5, 1.5, size=(f,)))
    else:
        kind = int(rng.integers(0, 3))
        alpha = (base if kind == 0
                 else base * rng.uniform(0.5, 1.5, size=(f,)) if kind == 1
                 else base * rng.uniform(0.5, 1.5, size=(m, 1)))
    x0 = None
    if rng.random() < 0.5:
        x0 = _mat(rng, (m, f), complex_) * (rng.random((m, f)) < 0.5)
    tol = 0.0 if rng.random() < 0.5 else 10.0 ** rng.uniform(-6, -3)
    maxiter = int(rng.integers(1, 60))

    x_ref, it_ref, conv_ref, _ = ref.lasso(
        y, a, alpha, None if x0 is None else x0.copy(), tol=tol,
        maxiter=maxiter, method=method, mask=mask)
    res = decomp_tpu.lasso.solve(y, a, alpha, x=x0, tol=tol,
                                 maxiter=maxiter, method=method, mask=mask)
    assert int(res.niter) == it_ref, (m, f, c, method, complex_)
    assert bool(res.converged) == conv_ref
    assert rel_err(res.x, x_ref) < 1e-8, (m, f, c, method, complex_)


@pytest.mark.parametrize("seed", range(201, 211))
def test_fuzz_nmf_matches_reference(seed):
    rng = np.random.default_rng(seed)
    m = int(rng.integers(1, 15))
    n = int(rng.integers(1, 15))
    k = int(rng.integers(1, min(m, n) + 2))
    method = str(rng.choice(["mu", "kl-mu"]))
    inner_iter = int(rng.integers(1, 4)) if method == "mu" else 1
    y = rng.uniform(0, 1, (m, n))
    mask = None
    if rng.random() < 0.4:
        mask = (rng.random((m, n)) < 0.7).astype(np.float64)
        y = y * mask
    x0 = rng.uniform(0.1, 1.0, (m, k))
    d0 = rng.uniform(0.1, 1.0, (k, n))
    tol = 0.0 if rng.random() < 0.5 else 10.0 ** rng.uniform(-5, -2)
    maxiter = int(rng.integers(1, 40))

    x_ref, d_ref, it_ref, conv_ref, _ = ref.nmf(
        y, x0.copy(), d0.copy(), tol=tol, maxiter=maxiter, mask=mask,
        method=method, inner_iter=inner_iter)
    res = decomp_tpu.nmf.solve(y, d0, x=x0, tol=tol, maxiter=maxiter,
                               mask=mask, method=method,
                               inner_iter=inner_iter)
    assert int(res.niter) == it_ref, (m, n, k, method, inner_iter)
    assert bool(res.converged) == conv_ref
    assert rel_err(res.x, x_ref) < 1e-8, (m, n, k, method)
    assert rel_err(res.d, d_ref) < 1e-8, (m, n, k, method)


@pytest.mark.parametrize("seed", range(301, 309))
def test_fuzz_dictionary_learning_matches_reference(seed):
    rng = np.random.default_rng(seed)
    m = int(rng.integers(2, 15))
    c = int(rng.integers(2, 15))
    k = int(rng.integers(1, 10))
    complex_ = bool(rng.random() < 0.3)
    lasso_method = str(rng.choice(GRAD))
    y = _mat(rng, (m, c), complex_)
    mask = None
    if not complex_ and rng.random() < 0.4:
        mask = (rng.random((m, c)) < 0.7).astype(np.float64)
        y = y * mask
    d0 = _mat(rng, (k, c), complex_)
    d0 = d0 / np.sqrt(np.sum(np.abs(d0) ** 2, axis=1, keepdims=True))
    alpha = 10.0 ** rng.uniform(-2, 0)
    lasso_iter = int(rng.integers(2, 9))
    tol = 0.0 if rng.random() < 0.5 else 10.0 ** rng.uniform(-5, -2)
    maxiter = int(rng.integers(1, 15))

    x_ref, d_ref, it_ref, conv_ref, _ = ref.dictionary_learning(
        y, d0.copy(), alpha, tol=tol, maxiter=maxiter,
        lasso_method=lasso_method, lasso_iter=lasso_iter, mask=mask)
    res = decomp_tpu.dictionary_learning.solve(
        y, d0, alpha, tol=tol, maxiter=maxiter,
        lasso_method=lasso_method, lasso_iter=lasso_iter, mask=mask)
    assert int(res.niter) == it_ref, (m, c, k, lasso_method, complex_)
    assert bool(res.converged) == conv_ref
    assert rel_err(res.d, d_ref) < 1e-8, (m, c, k, lasso_method, complex_)
    assert rel_err(res.x, x_ref) < 1e-8, (m, c, k, lasso_method, complex_)


@pytest.mark.parametrize("seed", range(401, 413))
def test_fuzz_streaming_matches_in_core(seed):
    """Randomized geometry sweep of the out-of-core NMF path: any
    (m, chunk_rows) combination — ragged tails included — through
    either streaming front-end (host-array chunk loop or the fused
    jit-loader epoch) must reproduce the in-core trajectory in f64.
    Chunked statistic accumulation is exact up to reduction order, so
    the tolerance is tight."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    m = int(rng.integers(8, 180))
    n = int(rng.integers(4, 32))
    k = int(rng.integers(1, 6))
    chunk = int(rng.integers(2, min(m, 64) + 1))
    method = str(rng.choice(["mu", "kl-mu"]))
    jit_loader = bool(rng.random() < 0.5)
    masked = bool(rng.random() < 0.5)
    y = rng.uniform(0.05, 1.0, (m, n))
    mask = None
    if masked:
        mask = (rng.random((m, n)) < 0.7).astype(np.float64)
        y = y * mask
    x0 = rng.uniform(0.1, 1.0, (m, k))
    d0 = rng.uniform(0.1, 1.0, (k, n))
    maxiter = int(rng.integers(1, 12))

    core = decomp_tpu.nmf.solve(y, d0, x=x0, mask=mask, tol=0.0,
                                maxiter=maxiter, method=method)
    if jit_loader:
        yd = jnp.asarray(y)
        md = None if mask is None else jnp.asarray(mask)

        def loader(lo, hi):
            return jax.lax.dynamic_slice(yd, (lo, 0), (chunk, n))

        mloader = (None if md is None else
                   (lambda lo, hi: jax.lax.dynamic_slice(
                       md, (lo, 0), (chunk, n))))
        res = decomp_tpu.nmf.solve_streaming(
            loader, d0, x=x0, tol=0.0, maxiter=maxiter, method=method,
            chunk_rows=chunk, n_samples=m, n_channels=n,
            dtype=np.float64, mask=mloader, x_device=True,
            jit_loader=True)
    else:
        res = decomp_tpu.nmf.solve_streaming(
            y, d0, x=x0, tol=0.0, maxiter=maxiter, method=method,
            chunk_rows=chunk, mask=mask)
    ctx = (m, n, k, chunk, method, jit_loader, masked)
    assert np.asarray(res.x).shape == (m, k)
    assert rel_err(res.d, core.d) < 1e-10, ctx
    assert rel_err(res.x, core.x) < 1e-10, ctx


@pytest.mark.parametrize("seed", range(501, 509))
def test_fuzz_dl_streaming_matches_in_core(seed):
    """Same sweep for out-of-core dictionary learning: with the inner
    sparse coding at a fixed budget (lasso_tol=0), the chunked epochs
    reproduce the in-core alternation exactly up to reduction order."""
    rng = np.random.default_rng(seed)
    m = int(rng.integers(8, 120))
    n = int(rng.integers(4, 28))
    k = int(rng.integers(1, 8))
    chunk = int(rng.integers(2, min(m, 48) + 1))
    masked = bool(rng.random() < 0.5)
    lasso_iter = int(rng.integers(2, 7))
    y = rng.normal(size=(m, n))
    mask = None
    if masked:
        mask = (rng.random((m, n)) < 0.7).astype(np.float64)
        y = y * mask
    d0 = rng.normal(size=(k, n))
    maxiter = int(rng.integers(1, 9))
    kw = dict(tol=0.0, maxiter=maxiter, lasso_iter=lasso_iter,
              lasso_tol=0.0, mask=mask)
    core = decomp_tpu.dictionary_learning.solve(y, d0, 0.05, **kw)
    res = decomp_tpu.dictionary_learning.solve_streaming(
        y, d0, 0.05, chunk_rows=chunk, **kw)
    ctx = (m, n, k, chunk, masked, lasso_iter)
    assert rel_err(res.d, core.d) < 1e-10, ctx
    assert rel_err(res.x, core.x) < 1e-10, ctx


@pytest.mark.parametrize("seed", range(601, 609))
def test_fuzz_streaming_lasso_matches_in_core(seed):
    """Streaming batch lasso: rows are independent, so any chunking of
    the batch axis must reproduce the in-core result row-for-row —
    including per-problem niter/converged bookkeeping."""
    rng = np.random.default_rng(seed)
    m = int(rng.integers(4, 120))
    f = int(rng.integers(2, 20))
    c = int(rng.integers(2, 20))
    chunk = int(rng.integers(2, m + 1))
    complex_ = bool(rng.random() < 0.25)
    per_problem = bool(rng.random() < 0.5)
    method = str(rng.choice(["ista", "fista", "acc_ista"]))
    a = _mat(rng, (f, c), complex_)
    y = _mat(rng, (m, c), complex_)
    mask = None
    if not complex_ and rng.random() < 0.4:
        mask = (rng.random((m, c)) < 0.7).astype(np.float64)
        y = y * mask
    alpha = 10.0 ** rng.uniform(-2, 0)
    tol = 10.0 ** rng.uniform(-6, -4)
    maxiter = int(rng.integers(5, 80))
    kw = dict(tol=tol, maxiter=maxiter, method=method, mask=mask,
              per_problem=per_problem)
    core = decomp_tpu.lasso.solve(y, a, alpha, **kw)
    res = decomp_tpu.lasso.solve_streaming(y, a, alpha,
                                           chunk_rows=chunk, **kw)
    ctx = (m, f, c, chunk, method, complex_, per_problem)
    assert rel_err(res.x, core.x) < 1e-10, ctx
    if per_problem:
        np.testing.assert_array_equal(np.asarray(res.niter),
                                      np.asarray(core.niter))
        np.testing.assert_array_equal(np.asarray(res.converged),
                                      np.asarray(core.converged))
