"""Out-of-core ("serial") NMF tier: host-streamed chunks must reproduce the
full-batch trajectory exactly (the x update is row-local and the d update
uses accumulated sufficient statistics)."""

import numpy as np
import pytest

import decomp_tpu
from problems import planted_nmf, random_mask, rel_err


def _init(seed, m, n, k):
    rng = np.random.default_rng(seed)
    return (rng.uniform(0.1, 1.0, (m, k)), rng.uniform(0.1, 1.0, (k, n)))


@pytest.mark.parametrize("method", ["mu", "kl-mu"])
@pytest.mark.parametrize("masked", [False, True])
def test_streamed_matches_full_batch(method, masked):
    y, *_ = planted_nmf(seed=40, n_samples=83, n_channels=30, rank=4)
    mask = random_mask(41, y.shape) if masked else None
    x0, d0 = _init(42, 83, 30, 4)
    full = decomp_tpu.nmf.solve(y, d0, x=x0, tol=0.0, maxiter=25,
                                method=method, mask=mask)
    # ragged chunk size exercises the remainder chunk
    stream = decomp_tpu.nmf.solve_streaming(
        y, d0, x=x0, tol=0.0, maxiter=25, method=method, mask=mask,
        chunk_rows=17)
    assert rel_err(stream.d, full.d) < 1e-12
    assert rel_err(stream.x, full.x) < 1e-12
    assert isinstance(stream.x, np.ndarray)  # host-side factor


@pytest.mark.parametrize("masked", [False, True])
def test_streamed_mixed_precision_matches_in_core(masked):
    """factor_dtype=f32 over streamed bf16 chunks == the in-core mixed
    solve (chunking stays exact in mixed mode: the x update is row-local
    and the f32 statistics accumulate identically)."""
    import jax.numpy as jnp

    y, *_ = planted_nmf(seed=50, n_samples=83, n_channels=30, rank=4)
    y16 = np.asarray(y, np.float32).astype(jnp.bfloat16)
    mask = (random_mask(51, y.shape).astype(jnp.bfloat16) if masked
            else None)
    x0, d0 = _init(52, 83, 30, 4)
    x0, d0 = x0.astype(np.float32), d0.astype(np.float32)
    full = decomp_tpu.nmf.solve(y16, d0, x=x0, tol=0.0, maxiter=25,
                                mask=mask, factor_dtype=jnp.float32,
                                precision="default")
    stream = decomp_tpu.nmf.solve_streaming(
        np.asarray(y16), d0, x=x0, tol=0.0, maxiter=25,
        mask=None if mask is None else np.asarray(mask),
        factor_dtype=jnp.float32, precision="default", chunk_rows=17)
    assert stream.x.dtype == np.float32
    assert stream.d.dtype == jnp.float32
    # Chunked f32 statistic sums differ from the in-core dot by reduction
    # order (~1e-7/iter); in mixed mode that noise crosses bf16 rounding
    # boundaries on the quantised operands and amplifies — measured ~1e-3
    # after 25 iterations. Both are equally valid quantised trajectories;
    # single-iteration agreement is at reduction-order level (~1e-7).
    assert rel_err(stream.d, full.d) < 5e-3
    assert rel_err(stream.x, full.x) < 5e-3


@pytest.mark.parametrize("method", ["mu", "kl-mu"])
@pytest.mark.parametrize("masked", [False, True])
def test_streamed_inner_iter_matches_in_core(method, masked):
    """Accelerated MU out of core: the chunked inner_iter trajectory
    equals nmf.solve's at the same inner_iter (the x refinements are
    row-local, so chunking stays exact)."""
    y, *_ = planted_nmf(seed=140, n_samples=83, n_channels=30, rank=4)
    mask = random_mask(141, y.shape) if masked else None
    x0, d0 = _init(142, 83, 30, 4)
    full = decomp_tpu.nmf.solve(y, d0, x=x0, tol=0.0, maxiter=15,
                                method=method, mask=mask, inner_iter=3)
    stream = decomp_tpu.nmf.solve_streaming(
        y, d0, x=x0, tol=0.0, maxiter=15, method=method, mask=mask,
        chunk_rows=17, inner_iter=3)
    assert rel_err(stream.d, full.d) < 1e-12
    assert rel_err(stream.x, full.x) < 1e-12


def test_streamed_inner_iter_accelerates():
    """Fewer outer iterations (= fewer full passes over the data) to the
    same tolerance — out of core each saved outer iteration is a saved
    HBM/loader sweep, which is the point of inner_iter at pod scale."""
    y, *_ = planted_nmf(seed=143, n_samples=64, n_channels=40, rank=4)
    x0, d0 = _init(144, 64, 40, 4)
    plain = decomp_tpu.nmf.solve_streaming(y, d0, x=x0, tol=1e-5,
                                           maxiter=30000, chunk_rows=16)
    accel = decomp_tpu.nmf.solve_streaming(y, d0, x=x0, tol=1e-5,
                                           maxiter=30000, chunk_rows=16,
                                           inner_iter=3)
    assert bool(accel.converged)
    assert int(accel.niter) < int(plain.niter)


def test_inner_iter_validated():
    y, *_ = planted_nmf(seed=145)
    for bad in (0, -1, 1.5, "2", True):
        with pytest.raises(decomp_tpu.utils.DecompError,
                           match="inner_iter"):
            decomp_tpu.nmf.solve_streaming(y, rank=4, inner_iter=bad)
        with pytest.raises(decomp_tpu.utils.DecompError,
                           match="inner_iter"):
            decomp_tpu.nmf.solve(y, rank=4, inner_iter=bad)


def test_streamed_convergence_and_callback():
    y, *_ = planted_nmf(seed=43, n_samples=64, n_channels=40, rank=4)
    x0, d0 = _init(44, 64, 40, 4)
    diffs = []
    res = decomp_tpu.nmf.solve_streaming(
        y, d0, x=x0, tol=1e-4, maxiter=5000, chunk_rows=16,
        callback=lambda it, diff: diffs.append((it, diff)))
    assert bool(res.converged)
    assert len(diffs) == int(res.niter)
    assert diffs[-1][1] < 1e-4
    ref = decomp_tpu.nmf.solve(y, d0, x=x0, tol=1e-4, maxiter=5000)
    assert int(res.niter) == int(ref.niter)


def test_streamed_validation():
    y, *_ = planted_nmf(seed=45)
    with pytest.raises(decomp_tpu.utils.DecompError):
        decomp_tpu.nmf.solve_streaming(y)
    with pytest.raises(decomp_tpu.utils.DecompError):
        decomp_tpu.nmf.solve_streaming(y, rank=4, chunk_rows=0)
    with pytest.raises(decomp_tpu.utils.DecompError):
        decomp_tpu.nmf.solve_streaming(y, rank=4, method="nope")


def test_streamed_lasso_matches_full_batch():
    from problems import planted_lasso
    y, a, _ = planted_lasso(seed=46, n_samples=37)
    full = decomp_tpu.lasso.solve(y, a, 0.05, tol=0.0, maxiter=30)
    stream = decomp_tpu.lasso.solve_streaming(y, a, 0.05, tol=0.0,
                                              maxiter=30, chunk_rows=8)
    assert isinstance(stream.x, np.ndarray)
    assert rel_err(stream.x, full.x) < 1e-12


def test_streamed_lasso_per_problem_and_per_sample_alpha():
    """Per-problem convergence and 2-D per-sample alpha both slice
    correctly across chunk boundaries (alpha slicing: ADVICE round 1)."""
    rng = np.random.default_rng(55)
    a = rng.normal(size=(16, 48))
    y = rng.normal(size=(37, 48)) * (10.0 ** rng.uniform(-1, 1, (37, 1)))
    alpha2d = np.full((37, 16), 0.05)
    alpha2d[5:9] = 0.5  # heavier rows
    full = decomp_tpu.lasso.solve(y, a, alpha2d, tol=1e-6, maxiter=3000,
                                  per_problem=True)
    stream = decomp_tpu.lasso.solve_streaming(
        y, a, alpha2d, tol=1e-6, maxiter=3000, chunk_rows=10,
        per_problem=True)
    np.testing.assert_array_equal(np.asarray(stream.niter),
                                  np.asarray(full.niter))
    np.testing.assert_array_equal(np.asarray(stream.converged),
                                  np.asarray(full.converged))
    np.testing.assert_allclose(np.asarray(stream.x), np.asarray(full.x),
                               rtol=0, atol=1e-12)
    assert np.asarray(stream.niter).shape == (37,)


def test_streamed_lasso_masked_and_complex():
    from problems import planted_lasso
    y, a, _ = planted_lasso(seed=47, n_samples=21, complex_=True)
    full = decomp_tpu.lasso.solve(y, a, 0.05, tol=0.0, maxiter=25)
    stream = decomp_tpu.lasso.solve_streaming(y, a, 0.05, tol=0.0,
                                              maxiter=25, chunk_rows=6)
    assert rel_err(stream.x, full.x) < 1e-10
    yr, ar, _ = planted_lasso(seed=48, n_samples=21)
    mask = random_mask(49, yr.shape)
    fullm = decomp_tpu.lasso.solve(yr * mask, ar, 0.05, tol=0.0,
                                   maxiter=25, mask=mask)
    streamm = decomp_tpu.lasso.solve_streaming(yr * mask, ar, 0.05,
                                               tol=0.0, maxiter=25,
                                               mask=mask, chunk_rows=6)
    assert rel_err(streamm.x, fullm.x) < 1e-12


def test_streamed_masked_dictionary_learning_matches_full_batch():
    """Masked streaming DL: the projected-gradient dictionary step's Gram
    and gradient accumulate over chunks, reproducing the in-core masked
    update (inner lasso at full budget -> exact up to reduction order)."""
    rng = np.random.default_rng(57)
    m, n, k = 53, 24, 8
    y = rng.normal(size=(m, n))
    mask = random_mask(58, (m, n))
    d0 = rng.normal(size=(k, n))
    full = decomp_tpu.dictionary_learning.solve(
        y * mask, d0, 0.05, mask=mask, tol=0.0, maxiter=8, lasso_iter=5,
        lasso_tol=0.0)
    stream = decomp_tpu.dictionary_learning.solve_streaming(
        y * mask, d0, 0.05, mask=mask, tol=0.0, maxiter=8, lasso_iter=5,
        lasso_tol=0.0, chunk_rows=17)
    assert rel_err(stream.d, full.d) < 1e-10
    assert rel_err(stream.x, full.x) < 1e-10
    norms = np.linalg.norm(np.asarray(stream.d), axis=1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-10)


def test_streamed_dictionary_learning_matches_full_batch():
    from problems import planted_patches
    y, d_true, _ = planted_patches(seed=50, n_samples=90)
    rng = np.random.default_rng(51)
    d0 = d_true + 0.3 * rng.normal(size=d_true.shape)
    full = decomp_tpu.dictionary_learning.solve(
        y, d0, 0.05, tol=0.0, maxiter=10, lasso_iter=8, lasso_tol=0.0)
    stream = decomp_tpu.dictionary_learning.solve_streaming(
        y, d0, 0.05, tol=0.0, maxiter=10, lasso_iter=8, lasso_tol=0.0,
        chunk_rows=17)
    assert isinstance(stream.x, np.ndarray)
    assert rel_err(stream.d, full.d) < 1e-10
    assert rel_err(stream.x, full.x) < 1e-10


def test_callable_loader_matches_array():
    """A callable (lo, hi) data loader reproduces the array path exactly
    (VERDICT.md round-2 Missing #4 machinery: the loader is how the full
    pod-scale shape streams through one chip)."""
    y, *_ = planted_nmf(seed=90, n_samples=300, n_channels=64, rank=6)
    rng = np.random.default_rng(91)
    x0 = rng.uniform(0.1, 1.0, (300, 6)).astype(np.float32)
    d0 = rng.uniform(0.1, 1.0, (6, 64)).astype(np.float32)
    y32 = np.asarray(y, np.float32)
    ref = decomp_tpu.nmf.solve_streaming(y32, d0, x=x0, tol=0.0,
                                         maxiter=20, chunk_rows=77)
    res = decomp_tpu.nmf.solve_streaming(
        lambda lo, hi: y32[lo:hi], d0, x=x0, tol=0.0, maxiter=20,
        chunk_rows=77, n_samples=300, n_channels=64, dtype=np.float32)
    np.testing.assert_array_equal(np.asarray(res.d), np.asarray(ref.d))
    np.testing.assert_array_equal(np.asarray(res.x), np.asarray(ref.x))


def test_x_device_matches_host():
    y, *_ = planted_nmf(seed=92, n_samples=256, n_channels=48, rank=4)
    rng = np.random.default_rng(93)
    x0 = rng.uniform(0.1, 1.0, (256, 4)).astype(np.float32)
    d0 = rng.uniform(0.1, 1.0, (4, 48)).astype(np.float32)
    y32 = np.asarray(y, np.float32)
    ref = decomp_tpu.nmf.solve_streaming(y32, d0, x=x0, tol=0.0,
                                         maxiter=15, chunk_rows=64)
    res = decomp_tpu.nmf.solve_streaming(y32, d0, x=x0, tol=0.0,
                                         maxiter=15, chunk_rows=64,
                                         x_device=True)
    assert not isinstance(res.x, np.ndarray)  # device-resident
    np.testing.assert_array_equal(np.asarray(res.x), np.asarray(ref.x))
    np.testing.assert_array_equal(np.asarray(res.d), np.asarray(ref.d))


def test_streaming_record_objective():
    """Streaming objective curves (VERDICT.md round-2 Weak #6): the
    recorded data-fit (after the x update, against the pre-update d)
    decreases and matches a direct evaluation."""
    y, *_ = planted_nmf(seed=94, n_samples=200, n_channels=40, rank=4)
    rng = np.random.default_rng(95)
    x0 = rng.uniform(0.1, 1.0, (200, 4)).astype(np.float32)
    d0 = rng.uniform(0.1, 1.0, (4, 40)).astype(np.float32)
    y32 = np.asarray(y, np.float32)
    res = decomp_tpu.nmf.solve_streaming(y32, d0, x=x0, tol=0.0,
                                         maxiter=10, chunk_rows=64,
                                         record_objective=True)
    obj = np.asarray(res.objective)
    assert obj.shape == (10,)
    assert np.all(np.isfinite(obj))
    assert obj[-1] < obj[0]
    # direct check of the last value: replay 10 iterations, then one more
    # x update against the final d of iteration 9
    r9 = decomp_tpu.nmf.solve_streaming(y32, d0, x=x0, tol=0.0,
                                        maxiter=9, chunk_rows=64)
    import jax.numpy as jnp

    from decomp_tpu.models.nmf import _update_x
    x10 = np.asarray(_update_x(jnp.asarray(y32),
                               jnp.asarray(np.asarray(r9.x)),
                               jnp.asarray(r9.d), None,
                               jnp.asarray(1e-15, np.float32)))
    direct = 0.5 * np.sum((y32 - x10 @ np.asarray(r9.d)) ** 2)
    np.testing.assert_allclose(obj[-1], direct, rtol=1e-4)


def test_callable_loader_validation():
    with pytest.raises(decomp_tpu.utils.DecompError):
        decomp_tpu.nmf.solve_streaming(lambda lo, hi: None, rank=4)


@pytest.mark.parametrize("method", ["mu", "kl-mu"])
@pytest.mark.parametrize("masked", [False, True])
def test_fused_epoch_pallas_chunk_matches_jnp(masked, method):
    """The fused epoch's Pallas chunk step (mu_stats_* for 'mu',
    kl_stats_* for 'kl-mu'; interpret mode) tracks the jnp chunk step —
    pod-scale (masked) streaming runs through the single-pass kernels
    for both update families."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(97)
    m, n, k, chunk = 512, 128, 128, 128
    y = np.maximum(rng.uniform(0, 1, (m, 8)) @ rng.uniform(0, 1, (8, n))
                   + 0.01 * rng.normal(size=(m, n)), 0).astype(np.float32)
    mask = ((rng.random((m, n)) >= 0.3).astype(np.float32)
            if masked else None)
    x0 = rng.uniform(0.1, 1, (m, k)).astype(np.float32)
    d0 = rng.uniform(0.1, 1, (k, n)).astype(np.float32)
    yd = jnp.asarray(y)
    md = None if mask is None else jnp.asarray(mask)

    def loader(lo, hi):
        return jax.lax.dynamic_slice(yd, (lo, 0), (chunk, n))

    mask_loader = (None if md is None else
                   (lambda lo, hi: jax.lax.dynamic_slice(
                       md, (lo, 0), (chunk, n))))
    kw = dict(tol=0.0, maxiter=12, chunk_rows=chunk, n_samples=m,
              n_channels=n, dtype=np.float32, x_device=True,
              jit_loader=True, mask=mask_loader, method=method)
    ref = decomp_tpu.nmf.solve_streaming(loader, d0, x=x0, **kw)
    res = decomp_tpu.nmf.solve_streaming(loader, d0, x=x0,
                                         _pallas_interpret=True, **kw)
    assert rel_err(res.d, ref.d) < 1e-5
    assert rel_err(res.x, ref.x) < 1e-5


def test_fused_epoch_inner_iter():
    """inner_iter in jit_loader mode: the fused jnp epoch equals the
    host-array streamer bit-for-bit, the dense-MU chunk kernel (whose
    refinements reuse the stripe's y @ d.T numerator in VMEM) tracks the
    jnp step, and the kernel gate rejects inner_iter > 1 off the dense
    'mu' path with a typed error — all mirroring nmf.solve."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(146)
    m, n, k, chunk = 512, 128, 128, 128
    y = np.maximum(rng.uniform(0, 1, (m, 8)) @ rng.uniform(0, 1, (8, n))
                   + 0.01 * rng.normal(size=(m, n)), 0).astype(np.float32)
    x0 = rng.uniform(0.1, 1, (m, k)).astype(np.float32)
    d0 = rng.uniform(0.1, 1, (k, n)).astype(np.float32)
    yd = jnp.asarray(y)

    def loader(lo, hi):
        return jax.lax.dynamic_slice(yd, (lo, 0), (chunk, n))

    kw = dict(tol=0.0, maxiter=10, chunk_rows=chunk, n_samples=m,
              n_channels=n, dtype=np.float32, inner_iter=2)
    host = decomp_tpu.nmf.solve_streaming(y, d0, x=x0, **kw)
    fused = decomp_tpu.nmf.solve_streaming(
        loader, d0, x=x0, x_device=True, jit_loader=True,
        use_pallas=False, **kw)
    np.testing.assert_array_equal(np.asarray(fused.d), np.asarray(host.d))
    np.testing.assert_array_equal(np.asarray(fused.x), np.asarray(host.x))
    kernel = decomp_tpu.nmf.solve_streaming(
        loader, d0, x=x0, x_device=True, jit_loader=True,
        use_pallas=True, _pallas_interpret=True, **kw)
    assert rel_err(kernel.d, fused.d) < 1e-5
    assert rel_err(kernel.x, fused.x) < 1e-5

    def mask_loader(lo, hi):
        return jnp.ones((chunk, n), jnp.float32)

    with pytest.raises(decomp_tpu.utils.DecompError, match="inner_iter"):
        decomp_tpu.nmf.solve_streaming(
            loader, d0, x=x0, x_device=True, jit_loader=True,
            use_pallas=True, mask=mask_loader, _pallas_interpret=True,
            **kw)
    with pytest.raises(decomp_tpu.utils.DecompError, match="inner_iter"):
        decomp_tpu.nmf.solve_streaming(
            loader, d0, x=x0, x_device=True, jit_loader=True,
            use_pallas=True, method="kl-mu", _pallas_interpret=True,
            **kw)


def test_streaming_use_pallas_flag():
    """use_pallas mirrors nmf.solve's semantics in the streamer:
    'auto' (default) gates, False keeps the jnp chunk step even when
    the kernel would engage, True forces it (typed error naming the
    unmet requirement otherwise), and the host-array path rejects
    True."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(99)
    m, n, k, chunk = 512, 128, 128, 128
    y = np.maximum(rng.uniform(0, 1, (m, 8)) @ rng.uniform(0, 1, (8, n))
                   + 0.01 * rng.normal(size=(m, n)), 0).astype(np.float32)
    x0 = rng.uniform(0.1, 1, (m, k)).astype(np.float32)
    d0 = rng.uniform(0.1, 1, (k, n)).astype(np.float32)
    yd = jnp.asarray(y)

    def loader(lo, hi):
        return jax.lax.dynamic_slice(yd, (lo, 0), (chunk, n))

    kw = dict(tol=0.0, maxiter=8, chunk_rows=chunk, n_samples=m,
              n_channels=n, dtype=np.float32, x_device=True,
              jit_loader=True)
    plain = decomp_tpu.nmf.solve_streaming(loader, d0, x=x0, **kw)
    off = decomp_tpu.nmf.solve_streaming(loader, d0, x=x0,
                                         use_pallas=False,
                                         _pallas_interpret=True, **kw)
    np.testing.assert_array_equal(np.asarray(off.d), np.asarray(plain.d))
    auto = decomp_tpu.nmf.solve_streaming(loader, d0, x=x0,
                                          _pallas_interpret=True, **kw)
    forced = decomp_tpu.nmf.solve_streaming(loader, d0, x=x0,
                                            use_pallas=True,
                                            _pallas_interpret=True, **kw)
    np.testing.assert_array_equal(np.asarray(forced.d), np.asarray(auto.d))
    with pytest.raises(decomp_tpu.utils.DecompError, match="rank"):
        decomp_tpu.nmf.solve_streaming(
            loader, d0[:64], x=x0[:, :64], use_pallas=True,
            _pallas_interpret=True, **kw)
    with pytest.raises(decomp_tpu.utils.DecompError,
                       match="record_objective"):
        decomp_tpu.nmf.solve_streaming(
            loader, d0, x=x0, use_pallas=True, record_objective=True,
            _pallas_interpret=True, **kw)
    with pytest.raises(decomp_tpu.utils.DecompError, match="jit_loader"):
        decomp_tpu.nmf.solve_streaming(y, d0, x=x0.copy(),
                                       use_pallas=True, maxiter=2)
    with pytest.raises(decomp_tpu.utils.DecompError, match="use_pallas"):
        decomp_tpu.nmf.solve_streaming(loader, d0, x=x0,
                                       use_pallas="bogus", **kw)


def test_streaming_pallas_block_rows_validated():
    """pallas_block_rows is validated up front with a typed error: 0
    must not surface as a raw ZeroDivisionError from the gate's
    chunk_rows % block_rows (review finding), and negative /
    non-multiple-of-8 values must not reach the kernel."""
    import jax
    import jax.numpy as jnp

    yd = jnp.zeros((256, 128), jnp.float32)

    def loader(lo, hi):
        return jax.lax.dynamic_slice(yd, (lo, 0), (128, 128))

    kw = dict(rank=128, tol=0.0, maxiter=2, chunk_rows=128, n_samples=256,
              n_channels=128, dtype=np.float32, x_device=True,
              jit_loader=True)
    for bad in (0, -64, 7, 64.0, True):
        with pytest.raises(decomp_tpu.utils.DecompError,
                           match="pallas_block_rows"):
            decomp_tpu.nmf.solve_streaming(loader, use_pallas=False,
                                           pallas_block_rows=bad, **kw)


def test_masked_kl_vmem_model():
    """fits_vmem models the masked-KL kernel's FOUR K x N f32 stat
    residents (kl_masked=True): the measured-unfit f32 n=4096 shape is
    rejected (it died at 19.95M even at br=64) while the measured
    1.19x-win n=2048 br=128 shape passes, and the streaming gate
    raises the typed VMEM error for forced masked-KL at n=4096
    instead of letting the compile crash."""
    from decomp_tpu.models.nmf_streaming import _chunk_kernel_gate
    from decomp_tpu.ops.pallas_mu import fits_vmem

    assert not fits_vmem(4096, 128, 4, True, 64, kl_masked=True)
    assert fits_vmem(2048, 128, 4, True, 128, kl_masked=True)
    # dense-KL tier (24 B/col; in-core calibration 2026-08-18): f32
    # n=4096 died at 18.05M (model: 18.0M — exact), bf16 n=4096 and
    # f32 n<=3584 compiled. n=3584 models at 15.75M, marginally above
    # the 15.7M headroom line, so the gate conservatively rejects it;
    # n=3072 (13.5M) passes. block_rows=None models the kernel's
    # actual default stripe.
    assert fits_vmem(3072, 128, 4, True, kl_dense=True)
    assert not fits_vmem(4096, 128, 4, True, kl_dense=True)
    assert fits_vmem(4096, 128, 2, True, kl_dense=True)
    with pytest.raises(decomp_tpu.utils.DecompError, match="VMEM"):
        _chunk_kernel_gate(True, on_tpu=True, method="kl-mu",
                           mixed=False, record_objective=False,
                           chunk_rows=32768, n_channels=4096, rank=128,
                           y_itemsize=4, masked=True, block_rows=64)


def test_streaming_auto_gate_compile_fallback(monkeypatch):
    """Under use_pallas='auto', a kernel epoch that fails to compile
    falls back to the jnp chunk step with a RuntimeWarning and the
    solve still returns the correct result (the platform's scoped-VMEM
    stack quirk is whole-program-dependent, so no closed-form gate can
    exclude it — docs/DESIGN.md). Simulated here by calibrating the CPU
    backend: the non-interpret Pallas epoch then genuinely fails."""
    import warnings

    import jax
    import jax.numpy as jnp

    from decomp_tpu.ops import pallas_mu

    rng = np.random.default_rng(101)
    m, n, k, chunk = 512, 128, 128, 128
    y = np.maximum(rng.uniform(0, 1, (m, 8)) @ rng.uniform(0, 1, (8, n))
                   + 0.01 * rng.normal(size=(m, n)), 0).astype(np.float32)
    x0 = rng.uniform(0.1, 1, (m, k)).astype(np.float32)
    d0 = rng.uniform(0.1, 1, (k, n)).astype(np.float32)
    yd = jnp.asarray(y)

    def loader(lo, hi):
        return jax.lax.dynamic_slice(yd, (lo, 0), (chunk, n))

    kw = dict(tol=0.0, maxiter=6, chunk_rows=chunk, n_samples=m,
              n_channels=n, dtype=np.float32, x_device=True,
              jit_loader=True)
    ref = decomp_tpu.nmf.solve_streaming(loader, d0, x=x0, **kw)
    monkeypatch.setattr(pallas_mu, "calibrated_tpu", lambda: True)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        res = decomp_tpu.nmf.solve_streaming(loader, d0, x=x0, **kw)
    assert any("falling back" in str(w.message) for w in rec
               if issubclass(w.category, RuntimeWarning))
    np.testing.assert_array_equal(np.asarray(res.d), np.asarray(ref.d))
    np.testing.assert_array_equal(np.asarray(res.x), np.asarray(ref.x))
    # explicit use_pallas=True must PROPAGATE the failure instead
    with pytest.raises(Exception):
        decomp_tpu.nmf.solve_streaming(loader, d0, x=x0, use_pallas=True,
                                       **kw)


def test_hbm_cache_chunks_matches_uncached():
    """hbm_cache_chunks: cached chunks skip the loader but the
    trajectory is identical (the cache holds exactly what the loader
    would return)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(98)
    m, n, k, chunk = 512, 64, 4, 128
    y = np.maximum(rng.uniform(0, 1, (m, k)) @ rng.uniform(0, 1, (k, n))
                   + 0.01 * rng.normal(size=(m, n)), 0).astype(np.float32)
    x0 = rng.uniform(0.1, 1, (m, k)).astype(np.float32)
    d0 = rng.uniform(0.1, 1, (k, n)).astype(np.float32)
    yd = jnp.asarray(y)
    calls = []

    def loader(lo, hi):
        calls.append(1)
        return jax.lax.dynamic_slice(yd, (lo, 0), (chunk, n))

    kw = dict(tol=0.0, maxiter=10, chunk_rows=chunk, n_samples=m,
              n_channels=n, dtype=np.float32, x_device=True,
              jit_loader=True)
    ref = decomp_tpu.nmf.solve_streaming(loader, d0, x=x0, **kw)
    res = decomp_tpu.nmf.solve_streaming(loader, d0, x=x0,
                                         hbm_cache_chunks=2, **kw)
    np.testing.assert_array_equal(np.asarray(res.d), np.asarray(ref.d))
    np.testing.assert_array_equal(np.asarray(res.x), np.asarray(ref.x))


@pytest.mark.parametrize("m,cache_chunks", [
    (512, 4),    # cache covers EVERY chunk: cache-segment loop only
    (509, 4),    # ragged tail, fully cached (clamped window in cache)
    (509, 2),    # ragged tail in the loader segment, head cached
])
def test_hbm_cache_segments_match_uncached(m, cache_chunks):
    """The segmented chunk loops (cache segment + loader segment — the
    per-chunk lax.cond was replaced by segment-static sources) leave the
    trajectory identical to the uncached epoch, including ragged tails
    whose clamped windows live in either segment."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(115)
    n, k, chunk = 64, 4, 128
    y = np.maximum(rng.uniform(0, 1, (m, k)) @ rng.uniform(0, 1, (k, n))
                   + 0.01 * rng.normal(size=(m, n)), 0).astype(np.float32)
    x0 = rng.uniform(0.1, 1, (m, k)).astype(np.float32)
    d0 = rng.uniform(0.1, 1, (k, n)).astype(np.float32)
    yd = jnp.asarray(y)

    def loader(lo, hi):
        return jax.lax.dynamic_slice(yd, (jnp.clip(lo, 0, m - chunk), 0),
                                     (chunk, n))

    kw = dict(tol=0.0, maxiter=8, chunk_rows=chunk, n_samples=m,
              n_channels=n, dtype=np.float32, x_device=True,
              jit_loader=True)
    ref = decomp_tpu.nmf.solve_streaming(loader, d0, x=x0, **kw)
    res = decomp_tpu.nmf.solve_streaming(loader, d0, x=x0,
                                         hbm_cache_chunks=cache_chunks,
                                         **kw)
    np.testing.assert_array_equal(np.asarray(res.d), np.asarray(ref.d))
    np.testing.assert_array_equal(np.asarray(res.x), np.asarray(ref.x))


def test_hbm_cache_prefill_runs_under_solve_precision():
    """The cache prefill executes the loader under the solve's matmul
    precision: a generator loader containing matmuls would otherwise
    cache values computed at the ambient default, silently breaking the
    cached == uncached trajectory identity on TPU (the identity tests
    above use dynamic_slice loaders and cannot see it)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(116)
    m, n, k, chunk = 512, 64, 4, 128
    y = np.maximum(rng.uniform(0, 1, (m, k)) @ rng.uniform(0, 1, (k, n)),
                   0).astype(np.float32)
    d0 = rng.uniform(0.1, 1, (k, n)).astype(np.float32)
    yd = jnp.asarray(y)
    seen = []

    def loader(lo, hi):
        if not isinstance(lo, jax.core.Tracer):  # prefill calls only
            seen.append(jax.config.jax_default_matmul_precision)
        return jax.lax.dynamic_slice(yd, (lo, 0), (chunk, n))

    decomp_tpu.nmf.solve_streaming(
        loader, d0, tol=0.0, maxiter=2, chunk_rows=chunk, n_samples=m,
        n_channels=n, dtype=np.float32, x_device=True, jit_loader=True,
        hbm_cache_chunks=2, precision="highest")
    assert seen and all(p == "highest" for p in seen), seen


def test_streaming_heldout_stop():
    """Out-of-core stop='heldout': validation entries are reserved per
    chunk deterministically, iteration stops at the validation plateau,
    and the reported error tracks the true missing-entry error."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(99)
    m, n, k, chunk = 2048, 128, 6, 256
    ytrue = (rng.uniform(0, 1, (m, k)) @ rng.uniform(0, 1, (k, n))
             + 0.02 * rng.normal(size=(m, n))).astype(np.float32)
    mask = (rng.random((m, n)) >= 0.3).astype(np.float32)
    yd, md = jnp.asarray(ytrue * mask), jnp.asarray(mask)

    def loader(lo, hi):
        return jax.lax.dynamic_slice(yd, (lo, 0), (chunk, n))

    def mloader(lo, hi):
        return jax.lax.dynamic_slice(md, (lo, 0), (chunk, n))

    res = decomp_tpu.nmf.solve_streaming(
        loader, rank=k, mask=mloader, tol=1e-3, maxiter=3000,
        chunk_rows=chunk, n_samples=m, n_channels=n, dtype=np.float32,
        x_device=True, jit_loader=True, stop="heldout", check_every=10,
        random_seed=3)
    assert bool(res.converged)
    assert int(res.niter) < 3000
    ho_rep = float(np.asarray(res.aux["heldout_rel_err"]))
    recon = np.asarray(res.x) @ np.asarray(res.d)
    miss = np.asarray(mask) == 0
    ho_true = (np.linalg.norm(recon[miss] - ytrue[miss])
               / np.linalg.norm(ytrue[miss]))
    assert ho_true < 0.1
    assert abs(ho_rep - ho_true) < 0.5 * ho_true
    # validations
    with pytest.raises(decomp_tpu.utils.DecompError):
        decomp_tpu.nmf.solve_streaming(
            loader, rank=k, tol=1e-3, maxiter=10, chunk_rows=chunk,
            n_samples=m, n_channels=n, dtype=np.float32, x_device=True,
            jit_loader=True, stop="heldout")  # no mask


def test_streaming_mode_flags_validated_on_host_path():
    """stop/hbm_cache_chunks are validated up front: the host-array path
    must raise instead of silently running the rel-change rule (ADVICE
    round-3 #1)."""
    rng = np.random.default_rng(100)
    y = rng.uniform(0, 1, (64, 16)).astype(np.float32)
    mask = (rng.random((64, 16)) >= 0.3).astype(np.float32)
    with pytest.raises(decomp_tpu.utils.DecompError):
        decomp_tpu.nmf.solve_streaming(y, rank=4, stop="bogus")
    with pytest.raises(decomp_tpu.utils.DecompError):
        decomp_tpu.nmf.solve_streaming(y, rank=4, mask=mask,
                                       stop="heldout")
    with pytest.raises(decomp_tpu.utils.DecompError):
        decomp_tpu.nmf.solve_streaming(y, rank=4, hbm_cache_chunks=2)


def test_fused_epoch_reused_loader_no_recompile():
    """Repeat solve_streaming calls with the SAME loader reuse the
    compiled epoch (the loader-identity cache key pitfall, VERDICT
    round-3 Weak #5): misses must not grow on the second call."""
    import jax
    import jax.numpy as jnp
    from decomp_tpu.models import nmf_streaming as mns

    rng = np.random.default_rng(101)
    m, n, k, chunk = 256, 32, 4, 64
    yd = jnp.asarray(rng.uniform(0, 1, (m, n)).astype(np.float32))
    x0 = rng.uniform(0.1, 1, (m, k)).astype(np.float32)
    d0 = rng.uniform(0.1, 1, (k, n)).astype(np.float32)

    def loader(lo, hi):
        return jax.lax.dynamic_slice(yd, (lo, 0), (chunk, n))

    kw = dict(tol=0.0, maxiter=3, chunk_rows=chunk, n_samples=m,
              n_channels=n, dtype=np.float32, x_device=True,
              jit_loader=True)
    decomp_tpu.nmf.solve_streaming(loader, d0, x=x0, **kw)
    misses0 = mns.epoch_cache_info().misses
    decomp_tpu.nmf.solve_streaming(loader, d0, x=x0, **kw)
    info = mns.epoch_cache_info()
    assert info.misses == misses0  # same loader -> cache hit
    # and a FRESH closure is a miss (documents the pitfall)
    decomp_tpu.nmf.solve_streaming(
        lambda lo, hi: jax.lax.dynamic_slice(yd, (lo, 0), (chunk, n)),
        d0, x=x0, **kw)
    assert mns.epoch_cache_info().misses == misses0 + 1


def test_jit_loader_rel_change_check_every():
    """Amortised rel-change stopping (jit_loader): the convergence
    scalar is read only on every check_every-th epoch, so the stop
    lands on a check epoch (>= the per-epoch stop, < one block later)
    and the callback fires on check epochs only."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(102)
    m, n, k, chunk = 512, 64, 4, 128
    y = np.maximum(rng.uniform(0, 1, (m, k)) @ rng.uniform(0, 1, (k, n))
                   + 0.01 * rng.normal(size=(m, n)), 0).astype(np.float32)
    yd = jnp.asarray(y)

    def loader(lo, hi):
        return jax.lax.dynamic_slice(yd, (lo, 0), (chunk, n))

    x0 = rng.uniform(0.1, 1, (m, k)).astype(np.float32)
    d0 = rng.uniform(0.1, 1, (k, n)).astype(np.float32)
    kw = dict(tol=1e-3, maxiter=2000, chunk_rows=chunk, n_samples=m,
              n_channels=n, dtype=np.float32, x_device=True,
              jit_loader=True)
    per_epoch = decomp_tpu.nmf.solve_streaming(loader, d0, x=x0,
                                               check_every=1, **kw)
    calls = []
    amort = decomp_tpu.nmf.solve_streaming(
        loader, d0, x=x0, check_every=7,
        callback=lambda it, diff: calls.append(it), **kw)
    n1, n7 = int(per_epoch.niter), int(amort.niter)
    assert bool(per_epoch.converged) and bool(amort.converged)
    assert n7 % 7 == 0 or n7 == 2000
    assert n1 <= n7 < n1 + 7
    assert calls == [i for i in range(1, n7 + 1) if i % 7 == 0]


@pytest.mark.parametrize("masked", [False, True])
def test_jit_loader_ragged_tail_matches_in_core(masked):
    """Prime n_samples through the fused jit-loader epoch: the trailing
    chunk reads a clamped loader window, masks rows at/after n_samples,
    and the trajectory equals the in-core solve (VERDICT round-3
    Weak #2)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(103)
    m, n, k, chunk = 509, 48, 4, 64  # 509 is prime
    y = np.maximum(rng.uniform(0, 1, (m, k)) @ rng.uniform(0, 1, (k, n))
                   + 0.01 * rng.normal(size=(m, n)), 0).astype(np.float32)
    mask = ((rng.random((m, n)) >= 0.3).astype(np.float32)
            if masked else None)
    x0 = rng.uniform(0.1, 1, (m, k)).astype(np.float32)
    d0 = rng.uniform(0.1, 1, (k, n)).astype(np.float32)
    yd = jnp.asarray(y if mask is None else y * mask)
    md = None if mask is None else jnp.asarray(mask)

    def loader(lo, hi):
        return jax.lax.dynamic_slice(yd, (lo, 0), (chunk, n))

    mloader = (None if md is None else
               (lambda lo, hi: jax.lax.dynamic_slice(md, (lo, 0),
                                                     (chunk, n))))
    res = decomp_tpu.nmf.solve_streaming(
        loader, d0, x=x0, tol=0.0, maxiter=15, chunk_rows=chunk,
        n_samples=m, n_channels=n, dtype=np.float32, mask=mloader,
        x_device=True, jit_loader=True)
    core = decomp_tpu.nmf.solve(y if mask is None else y * mask, d0,
                                x=x0, mask=mask, tol=0.0, maxiter=15,
                                use_pallas=False)
    assert np.asarray(res.x).shape == (m, k)
    assert rel_err(res.d, core.d) < 1e-5
    assert rel_err(res.x, core.x) < 1e-5
    # chunk_rows larger than the data must raise, not clamp silently
    with pytest.raises(decomp_tpu.utils.DecompError):
        decomp_tpu.nmf.solve_streaming(
            loader, d0, tol=0.0, maxiter=3, chunk_rows=1024,
            n_samples=m, n_channels=n, dtype=np.float32,
            x_device=True, jit_loader=True)


def test_streamed_dl_heldout_stop():
    """stop='heldout' in streamed dictionary learning: per-chunk
    deterministic validation reserve, plateau stop, reported error
    tracks the true missing-entry error."""
    rng = np.random.default_rng(104)
    m, ch, k = 1200, 48, 12
    d_true = rng.normal(size=(k, ch))
    d_true /= np.linalg.norm(d_true, axis=1, keepdims=True)
    xt = rng.normal(size=(m, k)) * (rng.random((m, k)) < 0.3)
    ytrue = (xt @ d_true + 0.01 * rng.normal(size=(m, ch))
             ).astype(np.float32)
    mask = (rng.random((m, ch)) >= 0.3).astype(np.float32)
    d0 = rng.normal(size=(k, ch)).astype(np.float32)
    res = decomp_tpu.dictionary_learning.solve_streaming(
        ytrue * mask, d0, 0.02, mask=mask, tol=1e-3, maxiter=400,
        lasso_iter=10, chunk_rows=256, stop="heldout", check_every=5,
        random_seed=5)
    assert bool(res.converged)
    assert int(res.niter) < 400
    ho_rep = float(np.asarray(res.aux["heldout_rel_err"]))
    recon = np.asarray(res.x) @ np.asarray(res.d)
    miss = np.asarray(mask) == 0
    ho_true = (np.linalg.norm(recon[miss] - ytrue[miss])
               / np.linalg.norm(ytrue[miss]))
    assert ho_true < 0.3
    assert abs(ho_rep - ho_true) < 0.5 * ho_true
    with pytest.raises(decomp_tpu.utils.DecompError):
        decomp_tpu.dictionary_learning.solve_streaming(
            ytrue, d0, 0.02, stop="heldout")  # no mask
    with pytest.raises(decomp_tpu.utils.DecompError):
        decomp_tpu.dictionary_learning.solve_streaming(
            ytrue, d0, 0.02, mask=mask, stop="nope")


def _dl_problem(seed, m, ch, k, masked=False):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    d_true = rng.normal(size=(k, ch))
    d_true /= np.linalg.norm(d_true, axis=1, keepdims=True)
    xt = rng.normal(size=(m, k)) * (rng.random((m, k)) < 0.3)
    y = (xt @ d_true + 0.01 * rng.normal(size=(m, ch))).astype(np.float32)
    mask = ((rng.random((m, ch)) >= 0.3).astype(np.float32)
            if masked else None)
    d0 = rng.normal(size=(k, ch)).astype(np.float32)
    ym = y if mask is None else y * mask
    yd = jnp.asarray(ym)
    md = None if mask is None else jnp.asarray(mask)
    return ym, mask, d0, yd, md


@pytest.mark.parametrize("masked", [False, True])
def test_fused_dl_epoch_matches_host_streaming(masked):
    """jit_loader DL streaming (round 4): the fused single-dispatch
    epoch reproduces the host-streamed trajectory (same per-chunk
    coding, same accumulated statistics)."""
    import jax

    m, ch, k, chunk = 512, 32, 6, 128
    ym, mask, d0, yd, md = _dl_problem(105, m, ch, k, masked)

    def loader(lo, hi):
        return jax.lax.dynamic_slice(yd, (lo, 0), (chunk, ch))

    mloader = (None if md is None else
               (lambda lo, hi: jax.lax.dynamic_slice(md, (lo, 0),
                                                     (chunk, ch))))
    kw = dict(tol=0.0, maxiter=10, lasso_iter=6, chunk_rows=chunk)
    host = decomp_tpu.dictionary_learning.solve_streaming(
        ym, d0, 0.03, mask=mask, **kw)
    fused = decomp_tpu.dictionary_learning.solve_streaming(
        loader, d0, 0.03, mask=mloader, jit_loader=True,
        n_samples=m, n_channels=ch, dtype=np.float32, **kw)
    assert rel_err(fused.d, host.d) < 1e-5
    assert rel_err(fused.x, host.x) < 1e-5


@pytest.mark.parametrize("masked", [False, True])
def test_sharded_dl_streaming_matches_single(masked):
    """parallel.dictionary_learning.solve_streaming: psum'd statistics
    over the CPU mesh == single-device fused epoch, incl. a ragged
    (prime) sample count."""
    import jax
    from decomp_tpu import parallel

    m, ch, k, chunk = 1021, 32, 6, 64  # prime rows: ragged tail
    ym, mask, d0, yd, md = _dl_problem(106, m, ch, k, masked)

    def loader(lo, hi):
        return jax.lax.dynamic_slice(yd, (lo, 0), (chunk, ch))

    mloader = (None if md is None else
               (lambda lo, hi: jax.lax.dynamic_slice(md, (lo, 0),
                                                     (chunk, ch))))
    mesh = parallel.make_mesh(axis_names=("rows",))
    kw = dict(tol=0.0, maxiter=8, lasso_iter=5, chunk_rows=chunk,
              n_samples=m, n_channels=ch, dtype=np.float32,
              mask=mloader)
    single = decomp_tpu.dictionary_learning.solve_streaming(
        loader, d0, 0.03, jit_loader=True, **kw)
    shard = parallel.dictionary_learning.solve_streaming(
        loader, d0, 0.03, mesh=mesh, **kw)
    assert np.asarray(single.x).shape == (m, k)
    assert np.asarray(shard.x).shape == (m, k)
    assert rel_err(shard.d, single.d) < 1e-5
    assert rel_err(shard.x, single.x) < 1e-5


@pytest.mark.parametrize("masked", [False, True])
def test_dl_streaming_record_objective(masked):
    """record_objective in the DL streamers: host and fused curves
    agree, the first entry equals a direct evaluation of the full
    objective (fresh x against the PRE-update d — the documented
    streaming convention), and the sharded curve equals the
    single-device one."""
    import jax
    import jax.numpy as jnp
    from decomp_tpu import parallel
    from decomp_tpu.utils.normalize import l2_normalize

    m, ch, k, chunk = 512, 32, 6, 128
    ym, mask, d0, yd, md = _dl_problem(118, m, ch, k, masked)
    alpha = 0.03

    def loader(lo, hi):
        return jax.lax.dynamic_slice(yd, (lo, 0), (chunk, ch))

    mloader = (None if md is None else
               (lambda lo, hi: jax.lax.dynamic_slice(md, (lo, 0),
                                                     (chunk, ch))))
    kw = dict(tol=0.0, maxiter=6, lasso_iter=6, chunk_rows=chunk,
              record_objective=True)
    host = decomp_tpu.dictionary_learning.solve_streaming(
        ym, d0, alpha, mask=mask, **kw)
    fkw = dict(kw, mask=mloader, jit_loader=True, n_samples=m,
               n_channels=ch, dtype=np.float32)
    fused = decomp_tpu.dictionary_learning.solve_streaming(
        loader, d0, alpha, **fkw)
    ho = np.asarray(host.objective)
    fo = np.asarray(fused.objective)
    assert ho.shape == (6,) and fo.shape == (6,)
    assert np.all(np.isfinite(ho))
    np.testing.assert_allclose(fo, ho, rtol=1e-5)

    # Direct first-entry check: at maxiter=1 the returned x IS the
    # freshly-coded x and the pre-update d is the normalised d0.
    one = decomp_tpu.dictionary_learning.solve_streaming(
        ym, d0, alpha, mask=mask, tol=0.0, maxiter=1, lasso_iter=6,
        chunk_rows=chunk, record_objective=True)
    dn = np.asarray(l2_normalize(jnp.asarray(d0), axis=1))
    recon = np.asarray(one.x) @ dn
    resid = (ym - recon) if mask is None else mask * ym - mask * recon
    direct = 0.5 * np.sum(resid.astype(np.float64) ** 2) \
        + alpha * np.sum(np.abs(one.x).astype(np.float64))
    np.testing.assert_allclose(float(np.asarray(one.objective)[0]),
                               direct, rtol=1e-4)

    mesh = parallel.make_mesh(axis_names=("rows",))
    shard = parallel.dictionary_learning.solve_streaming(
        loader, d0, alpha, mesh=mesh,
        **{k_: v for k_, v in fkw.items() if k_ != "jit_loader"})
    np.testing.assert_allclose(np.asarray(shard.objective), fo,
                               rtol=1e-5)


def test_dl_streaming_record_objective_array_alpha():
    """Per-atom (array) alpha with record_objective: the L1 term is the
    WEIGHTED sum(alpha*|x|) matching the in-core objective — a scalar
    alpha*sum(|x|) form crashed float() and was semantically wrong
    (code-review round-4 finding)."""
    rng = np.random.default_rng(120)
    m, ch, k, chunk = 256, 32, 4, 128
    y = np.abs(rng.normal(size=(m, ch))).astype(np.float32)
    d0 = rng.normal(size=(k, ch)).astype(np.float32)
    alpha = np.linspace(0.01, 0.1, k).astype(np.float32)
    res = decomp_tpu.dictionary_learning.solve_streaming(
        y, d0, alpha, tol=0.0, maxiter=1, lasso_iter=6,
        chunk_rows=chunk, record_objective=True)
    from decomp_tpu.utils.normalize import l2_normalize
    import jax.numpy as jnp
    dn = np.asarray(l2_normalize(jnp.asarray(d0), axis=1))
    resid = y - np.asarray(res.x) @ dn
    direct = (0.5 * np.sum(resid.astype(np.float64) ** 2)
              + np.sum(alpha * np.abs(np.asarray(res.x))
                       .astype(np.float64)))
    np.testing.assert_allclose(float(np.asarray(res.objective)[0]),
                               direct, rtol=1e-4)


def test_dl_streaming_record_objective_heldout_raises():
    """record_objective is incompatible with stop='heldout' in both DL
    streaming paths (same contract as the NMF streamers)."""
    import jax
    from decomp_tpu.utils.exceptions import DecompError

    m, ch, k, chunk = 256, 32, 4, 128
    ym, mask, d0, yd, md = _dl_problem(119, m, ch, k, masked=True)

    def loader(lo, hi):
        return jax.lax.dynamic_slice(yd, (lo, 0), (chunk, ch))

    def mloader(lo, hi):
        return jax.lax.dynamic_slice(md, (lo, 0), (chunk, ch))

    with pytest.raises(DecompError, match="record_objective"):
        decomp_tpu.dictionary_learning.solve_streaming(
            ym, d0, 0.03, mask=mask, stop="heldout",
            record_objective=True, chunk_rows=chunk)
    with pytest.raises(DecompError, match="record_objective"):
        decomp_tpu.dictionary_learning.solve_streaming(
            loader, d0, 0.03, mask=mloader, jit_loader=True,
            stop="heldout", record_objective=True, chunk_rows=chunk,
            n_samples=m, n_channels=ch, dtype=np.float32)


def test_fused_dl_heldout_lockstep():
    """stop='heldout' through the fused DL epochs: sharded and
    single-device stop on the same iteration with the same error."""
    import jax
    from decomp_tpu import parallel

    m, ch, k, chunk = 1024, 32, 6, 128
    ym, mask, d0, yd, md = _dl_problem(107, m, ch, k, masked=True)

    def loader(lo, hi):
        return jax.lax.dynamic_slice(yd, (lo, 0), (chunk, ch))

    def mloader(lo, hi):
        return jax.lax.dynamic_slice(md, (lo, 0), (chunk, ch))

    mesh = parallel.make_mesh(axis_names=("rows",))
    kw = dict(tol=5e-3, maxiter=400, lasso_iter=8, chunk_rows=chunk,
              n_samples=m, n_channels=ch, dtype=np.float32,
              mask=mloader, stop="heldout", check_every=5,
              random_seed=9)
    single = decomp_tpu.dictionary_learning.solve_streaming(
        loader, d0, 0.03, jit_loader=True, **kw)
    shard = parallel.dictionary_learning.solve_streaming(
        loader, d0, 0.03, mesh=mesh, **kw)
    assert bool(single.converged) and bool(shard.converged)
    assert int(shard.niter) == int(single.niter)
    np.testing.assert_allclose(
        float(shard.aux["heldout_rel_err"]),
        float(single.aux["heldout_rel_err"]), rtol=1e-4)


def test_streaming_heldout_small_budget_can_converge():
    """The streaming heldout warm-up floor clamps to the budget
    (code-review round-4 finding #4): maxiter allowing only two checks
    can still report a genuine plateau as converged."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(110)
    m, n, k, chunk = 512, 64, 4, 128
    ytrue = (rng.uniform(0, 1, (m, k)) @ rng.uniform(0, 1, (k, n))
             ).astype(np.float32)
    mask = (rng.random((m, n)) >= 0.3).astype(np.float32)
    yd, md = jnp.asarray(ytrue * mask), jnp.asarray(mask)

    def loader(lo, hi):
        return jax.lax.dynamic_slice(yd, (lo, 0), (chunk, n))

    def mloader(lo, hi):
        return jax.lax.dynamic_slice(md, (lo, 0), (chunk, n))

    # tol=inf: the second check ALWAYS reads as a plateau, so converged
    # proves the clamped floor fired within the 10-epoch budget
    res = decomp_tpu.nmf.solve_streaming(
        loader, rank=k, mask=mloader, tol=np.inf, maxiter=10,
        chunk_rows=chunk, n_samples=m, n_channels=n, dtype=np.float32,
        x_device=True, jit_loader=True, stop="heldout", check_every=5,
        random_seed=3)
    assert bool(res.converged)
    assert int(res.niter) == 10


@pytest.mark.parametrize("sharded", [False, True])
def test_masked_completion_streaming_preset(sharded):
    """The out-of-core completion preset (round 4): heldout-stopped
    masked MU over callable loaders, single-device or sharded, with the
    reported validation error tracking the true missing-entry error."""
    import jax
    import jax.numpy as jnp
    from decomp_tpu import parallel

    rng = np.random.default_rng(113)
    m, n, k, chunk = 2048, 64, 4, 128
    ytrue = (rng.uniform(0, 1, (m, k)) @ rng.uniform(0, 1, (k, n))
             + 0.02 * rng.normal(size=(m, n))).astype(np.float32)
    mask = (rng.random((m, n)) >= 0.3).astype(np.float32)
    yd, md = jnp.asarray(ytrue * mask), jnp.asarray(mask)

    def loader(lo, hi):
        return jax.lax.dynamic_slice(yd, (lo, 0), (chunk, n))

    def mloader(lo, hi):
        return jax.lax.dynamic_slice(md, (lo, 0), (chunk, n))

    kw = dict(rank=k, n_samples=m, n_channels=n, dtype=np.float32,
              chunk_rows=chunk, tol=5e-3, maxiter=3000, check_every=10,
              random_seed=3)
    if sharded:
        res = decomp_tpu.nmf.masked_completion_streaming(
            loader, mloader, mesh=parallel.make_mesh(
                axis_names=("rows",)), **kw)
    else:
        res = decomp_tpu.nmf.masked_completion_streaming(
            loader, mloader, **kw)
    assert bool(res.converged)
    ho_rep = float(np.asarray(res.aux["heldout_rel_err"]))
    recon = np.asarray(res.x) @ np.asarray(res.d)
    miss = np.asarray(mask) == 0
    ho_true = (np.linalg.norm(recon[miss] - ytrue[miss])
               / np.linalg.norm(ytrue[miss]))
    assert ho_true < 0.1
    assert abs(ho_rep - ho_true) < 0.5 * ho_true


def test_bf16_wrap_cache_does_not_pin_loader():
    """The preset's bf16 loader-wrapper cache must hold user loaders
    WEAKLY: closures routinely capture multi-GB device arrays, and a
    strong cache would keep that HBM alive for the process lifetime
    after the caller drops the loader (round-4 review finding)."""
    import gc
    import weakref as _weakref

    import jax.numpy as jnp

    from decomp_tpu.models.nmf_streaming import _BF16_WRAPS, _bf16_wrap

    def make_loader():
        captured = np.ones((4, 4), np.float32)

        def loader(lo, hi):
            return captured[lo:hi]

        return loader

    loader = make_loader()
    w1 = _bf16_wrap(loader)
    # repeat calls with the SAME loader reuse the wrapper (epoch cache key)
    assert _bf16_wrap(loader) is w1
    assert np.asarray(w1(0, 2)).dtype == jnp.bfloat16
    sentinel = _weakref.ref(loader)
    key = id(loader)
    del loader, w1
    gc.collect()
    assert sentinel() is None, "cache pinned the dropped loader"
    assert key not in _BF16_WRAPS, "cache entry not self-evicted"


def test_fused_epoch_cache_does_not_pin_loader():
    """The fused-epoch compile cache must hold loaders WEAKLY and evict
    a dropped loader's compiled epochs: the old lru_cache pinned the
    loader — and, via the epoch's jaxpr constants, every device array
    it captured — for the process lifetime (code-review finding; same
    class as the _bf16_wrap fix)."""
    import gc
    import weakref as _weakref

    import jax
    import jax.numpy as jnp
    from decomp_tpu.models import nmf_streaming as mns

    m, n, k, chunk = 256, 32, 4, 64
    rng = np.random.default_rng(121)
    x0 = rng.uniform(0.1, 1, (m, k)).astype(np.float32)
    d0 = rng.uniform(0.1, 1, (k, n)).astype(np.float32)

    def make_loader():
        captured = jnp.asarray(
            rng.uniform(0, 1, (m, n)).astype(np.float32))

        def loader(lo, hi):
            return jax.lax.dynamic_slice(captured, (lo, 0), (chunk, n))

        return loader

    loader = make_loader()
    kw = dict(tol=0.0, maxiter=2, chunk_rows=chunk, n_samples=m,
              n_channels=n, dtype=np.float32, x_device=True,
              jit_loader=True)
    decomp_tpu.nmf.solve_streaming(loader, d0, x=x0, **kw)
    misses0 = mns.epoch_cache_info().misses
    # same loader still hits (the lru behaviour the weak cache keeps)
    decomp_tpu.nmf.solve_streaming(loader, d0, x=x0, **kw)
    assert mns.epoch_cache_info().misses == misses0
    size0 = mns.epoch_cache_info().currsize
    sentinel = _weakref.ref(loader)
    del loader
    gc.collect()
    assert sentinel() is None, "epoch cache pinned the dropped loader"
    assert mns.epoch_cache_info().currsize < size0, (
        "dropped loader's compiled epochs were not evicted")


def test_streaming_warm_d_validated():
    """A wrong-width or 1-D warm d raises a typed error at entry
    instead of a cryptic XLA shape mismatch inside the epoch
    (code-review round 4)."""
    rng = np.random.default_rng(60)
    y = rng.uniform(0, 1, (64, 40)).astype(np.float32)
    with pytest.raises(decomp_tpu.utils.ShapeError):
        decomp_tpu.nmf.solve_streaming(
            y, rng.uniform(0, 1, (4, 41)).astype(np.float32),
            chunk_rows=32, maxiter=2)
    with pytest.raises(decomp_tpu.utils.ShapeError):
        decomp_tpu.nmf.solve_streaming(
            y, rng.uniform(0, 1, (40,)).astype(np.float32),
            chunk_rows=32, maxiter=2)
    with pytest.raises(decomp_tpu.utils.DecompError, match="rank"):
        decomp_tpu.nmf.solve_streaming(
            y, rng.uniform(0, 1, (4, 40)).astype(np.float32), rank=5,
            chunk_rows=32, maxiter=2)


def test_loader_error_not_swallowed_as_compile_fallback(monkeypatch):
    """A loader that raises at trace time propagates its own error —
    it must NOT be misattributed to the Pallas auto-gate and warned
    away as a compile fallback (code-review round 4)."""
    import warnings

    from decomp_tpu.ops import pallas_mu

    monkeypatch.setattr(pallas_mu, "calibrated_tpu", lambda: True)

    def bad_loader(lo, hi):
        raise FileNotFoundError("shard 7 missing")

    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        with pytest.raises(FileNotFoundError, match="shard 7"):
            decomp_tpu.nmf.solve_streaming(
                bad_loader, rng_d(), chunk_rows=128, n_samples=512,
                n_channels=128, dtype=np.float32, x_device=True,
                jit_loader=True, tol=0.0, maxiter=3)
    assert not any("falling back" in str(w.message) for w in rec)


def rng_d():
    return np.random.default_rng(61).uniform(
        0.1, 1, (128, 128)).astype(np.float32)
