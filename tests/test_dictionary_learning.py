"""Dictionary-learning tests (SURVEY.md §4): trajectory parity vs the NumPy
reference, objective decrease, unit-norm atoms, masked and minibatch and
complex variants."""

import numpy as np
import pytest

import decomp_tpu
import reference_impl as ref
from problems import planted_patches, random_mask, rel_err

ALPHA = 0.05


def _perturbed_init(d_true, seed, scale=0.3):
    rng = np.random.default_rng(seed)
    noise = rng.normal(size=d_true.shape)
    if np.iscomplexobj(d_true):
        noise = noise + 1j * rng.normal(size=d_true.shape)
    d0 = d_true + scale * noise
    return d0 / np.sqrt(np.sum(np.abs(d0) ** 2, axis=1, keepdims=True))


@pytest.mark.parametrize("complex_", [False, True])
def test_trajectory_parity(complex_):
    y, d_true, _ = planted_patches(seed=1, complex_=complex_)
    d0 = _perturbed_init(d_true, 2)
    x_ref, d_ref, it_ref, _, _ = ref.dictionary_learning(
        y, d0, ALPHA, tol=0.0, maxiter=15, lasso_iter=8)
    res = decomp_tpu.dictionary_learning.solve(
        y, d0, ALPHA, tol=0.0, maxiter=15, lasso_iter=8)
    assert int(res.niter) == it_ref == 15
    assert rel_err(res.d, d_ref) < 1e-8
    assert rel_err(res.x, x_ref) < 1e-8


@pytest.mark.parametrize("masked", [False, True])
def test_complex_split_matches_native(masked):
    """Split-(re,im) dictionary learning (for TPU backends without complex
    support) matches the native complex path trajectory-for-trajectory:
    inner split lasso + split BCD / masked projected-gradient dict updates
    (VERDICT.md round-1 Missing #4)."""
    y, d_true, _ = planted_patches(seed=20, complex_=True)
    mask = random_mask(21, y.shape) if masked else None
    if mask is not None:
        y = y * mask
    d0 = _perturbed_init(d_true, 22)
    native = decomp_tpu.dictionary_learning.solve(
        y, d0, ALPHA, tol=0.0, maxiter=12, lasso_iter=8, mask=mask,
        complex_split=False, record_objective=True)
    split = decomp_tpu.dictionary_learning.solve(
        y, d0, ALPHA, tol=0.0, maxiter=12, lasso_iter=8, mask=mask,
        complex_split=True, record_objective=True)
    assert split.d.dtype == native.d.dtype
    assert rel_err(split.d, native.d) < 1e-10
    assert rel_err(split.x, native.x) < 1e-10
    np.testing.assert_allclose(np.asarray(split.objective),
                               np.asarray(native.objective), rtol=1e-9)
    norms = np.sqrt(np.sum(np.abs(np.asarray(split.d)) ** 2, axis=1))
    np.testing.assert_allclose(norms, 1.0, rtol=1e-10)


def test_complex_split_warm_start_and_early_stop():
    y, d_true, _ = planted_patches(seed=23, complex_=True)
    d0 = _perturbed_init(d_true, 24)
    full = decomp_tpu.dictionary_learning.solve(
        y, d0, ALPHA, tol=1e-8, maxiter=200, lasso_iter=10,
        complex_split=True)
    resumed = decomp_tpu.dictionary_learning.solve(
        y, np.asarray(full.d), ALPHA, x=np.asarray(full.x), tol=1e-4,
        maxiter=50, lasso_iter=10, complex_split=True)
    assert bool(resumed.converged)
    assert int(resumed.niter) <= 3


def test_complex_split_rejects_minibatch():
    y, d_true, _ = planted_patches(seed=25, complex_=True)
    d0 = _perturbed_init(d_true, 26)
    with pytest.raises(decomp_tpu.utils.DecompError):
        decomp_tpu.dictionary_learning.solve(
            y, d0, ALPHA, minibatch=8, complex_split=True)


def test_masked_trajectory_parity():
    y, d_true, _ = planted_patches(seed=3)
    mask = random_mask(4, y.shape)
    d0 = _perturbed_init(d_true, 5)
    x_ref, d_ref, _, _, _ = ref.dictionary_learning(
        y * mask, d0, ALPHA, tol=0.0, maxiter=10, lasso_iter=8, mask=mask)
    res = decomp_tpu.dictionary_learning.solve(
        y * mask, d0, ALPHA, tol=0.0, maxiter=10, lasso_iter=8, mask=mask)
    assert rel_err(res.d, d_ref) < 1e-8
    assert rel_err(res.x, x_ref) < 1e-8


def test_atoms_unit_norm_and_objective_decreases():
    y, d_true, _ = planted_patches(seed=6)
    d0 = _perturbed_init(d_true, 7)
    res = decomp_tpu.dictionary_learning.solve(
        y, d0, ALPHA, tol=0.0, maxiter=30, lasso_iter=10,
        record_objective=True)
    norms = np.sqrt(np.sum(np.asarray(res.d) ** 2, axis=1))
    np.testing.assert_allclose(norms, 1.0, rtol=1e-10)
    objs = np.asarray(res.objective)
    assert objs[-1] < objs[0]
    recon = np.asarray(res.x) @ np.asarray(res.d)
    assert rel_err(recon, y) < 0.1


def test_convergence_flag():
    y, d_true, _ = planted_patches(seed=8, noise=0.0)
    d0 = _perturbed_init(d_true, 9, scale=0.05)
    res = decomp_tpu.dictionary_learning.solve(
        y, d0, 1e-3, tol=1e-8, maxiter=500, lasso_iter=20)
    assert bool(res.converged)
    assert int(res.niter) < 500


def test_minibatch_improves_objective():
    y, d_true, _ = planted_patches(seed=10, n_samples=400)
    d0 = _perturbed_init(d_true, 11)
    res = decomp_tpu.dictionary_learning.solve(
        y, d0, ALPHA, tol=0.0, maxiter=200, lasso_iter=8, minibatch=64,
        random_seed=12, record_objective=True)
    objs = np.asarray(res.objective)
    # x rows not visited recently lag, so compare full objective start/end
    assert objs[-1] < 0.5 * objs[0]
    norms = np.sqrt(np.sum(np.asarray(res.d) ** 2, axis=1))
    np.testing.assert_allclose(norms, 1.0, rtol=1e-10)


def test_masked_minibatch_runs():
    y, d_true, _ = planted_patches(seed=13, n_samples=300)
    mask = random_mask(14, y.shape)
    d0 = _perturbed_init(d_true, 15)
    res = decomp_tpu.dictionary_learning.solve(
        y * mask, d0, ALPHA, tol=0.0, maxiter=150, lasso_iter=6,
        minibatch=48, mask=mask, random_seed=16, record_objective=True)
    objs = np.asarray(res.objective)
    assert objs[-1] < objs[0]


def test_validation_errors():
    y, d_true, _ = planted_patches(seed=17)
    with pytest.raises(decomp_tpu.utils.ShapeError):
        decomp_tpu.dictionary_learning.solve(y, d_true.T, ALPHA)
    with pytest.raises(decomp_tpu.utils.DecompError):
        decomp_tpu.dictionary_learning.solve(y, d_true, ALPHA,
                                             lasso_method="cd")


def test_unknown_lasso_method_raises_host_side():
    """An unknown lasso_method must raise DecompError at every DL entry,
    not a bare AssertionError from inside the jitted sparse-coding step
    (which is what happened before the shared validator: lasso guards
    its methods only in its public solve, and DL bypasses that)."""
    import jax.numpy as jnp

    y, d_true, _ = planted_patches(seed=18)
    with pytest.raises(decomp_tpu.utils.DecompError, match="bogus"):
        decomp_tpu.dictionary_learning.solve(y, d_true, ALPHA,
                                             lasso_method="bogus")
    yd = jnp.asarray(y)
    chunk = 32

    def loader(lo, hi):
        import jax
        return jax.lax.dynamic_slice(yd, (lo, 0), (chunk, y.shape[1]))

    # host-array streaming path
    with pytest.raises(decomp_tpu.utils.DecompError, match="bogus"):
        decomp_tpu.dictionary_learning.solve_streaming(
            y, d_true, ALPHA, chunk_rows=chunk, maxiter=2,
            lasso_method="bogus")
    # fused jit-loader streaming path
    with pytest.raises(decomp_tpu.utils.DecompError, match="bogus"):
        decomp_tpu.dictionary_learning.solve_streaming(
            loader, d_true, ALPHA, chunk_rows=chunk, maxiter=2,
            jit_loader=True, n_samples=y.shape[0], n_channels=y.shape[1],
            dtype=np.float32, lasso_method="bogus")


def test_whole_kernel_sparse_coding_matches_jnp():
    """Explicit opt-in: the whole-solve Pallas sparse-coding kernel
    (interpret mode) reproduces the jnp inner loop bit-exactly at
    padding-free shapes (VERDICT.md round-2 Next #6; auto stays OFF —
    measured slower at the graded config-3 shape)."""
    rng = np.random.default_rng(70)
    n_samp, n_ch, n_atoms = 512, 64, 128
    d_true = rng.normal(size=(n_atoms, n_ch))
    d_true /= np.linalg.norm(d_true, axis=1, keepdims=True)
    x_true = (rng.normal(size=(n_samp, n_atoms))
              * (rng.random((n_samp, n_atoms)) < 0.1))
    y = (x_true @ d_true
         + 0.01 * rng.normal(size=(n_samp, n_ch))).astype(np.float32)
    d0 = rng.normal(size=(n_atoms, n_ch)).astype(np.float32)
    ref = decomp_tpu.dictionary_learning.solve(
        y, d0, 0.05, maxiter=15, lasso_iter=10, use_pallas=False)
    ker = decomp_tpu.dictionary_learning.solve(
        y, d0, 0.05, maxiter=15, lasso_iter=10, use_pallas=True,
        _pallas_interpret=True)
    np.testing.assert_array_equal(np.asarray(ker.d), np.asarray(ref.d))
    np.testing.assert_array_equal(np.asarray(ker.x), np.asarray(ref.x))


def test_whole_kernel_sparse_coding_fixed_budget():
    """lasso_tol=0 routes the whole-solve sparse coding through the
    kernel's FIXED-BUDGET mode (the freeze/stopping lattice is statically
    elided — exactly DL's fixed-lasso_iter regime): results stay
    bit-exact vs the jnp inner loop at the same lasso_tol=0."""
    rng = np.random.default_rng(72)
    n_samp, n_ch, n_atoms = 512, 64, 128
    d_true = rng.normal(size=(n_atoms, n_ch))
    d_true /= np.linalg.norm(d_true, axis=1, keepdims=True)
    x_true = (rng.normal(size=(n_samp, n_atoms))
              * (rng.random((n_samp, n_atoms)) < 0.1))
    y = (x_true @ d_true
         + 0.01 * rng.normal(size=(n_samp, n_ch))).astype(np.float32)
    d0 = rng.normal(size=(n_atoms, n_ch)).astype(np.float32)
    kw = dict(maxiter=12, lasso_iter=8, lasso_tol=0.0)
    ref = decomp_tpu.dictionary_learning.solve(
        y, d0, 0.05, use_pallas=False, **kw)
    ker = decomp_tpu.dictionary_learning.solve(
        y, d0, 0.05, use_pallas=True, _pallas_interpret=True, **kw)
    np.testing.assert_array_equal(np.asarray(ker.d), np.asarray(ref.d))
    np.testing.assert_array_equal(np.asarray(ker.x), np.asarray(ref.x))


def test_solve_split_matches_native_complex():
    """dictionary_learning.solve_split over SplitComplex pytrees matches
    the native complex path and composes under jit (the split-complex
    mirror of lasso.solve_split)."""
    import jax

    from decomp_tpu.ops import complex_split as cs

    rng = np.random.default_rng(71)
    m, ch, k = 60, 24, 16
    d_true = (rng.normal(size=(k, ch)) + 1j * rng.normal(size=(k, ch)))
    d_true /= np.linalg.norm(d_true, axis=1, keepdims=True)
    xt = ((rng.normal(size=(m, k)) + 1j * rng.normal(size=(m, k)))
          * (rng.random((m, k)) < 0.3))
    y = (xt @ d_true + 0.01 * (rng.normal(size=(m, ch))
                               + 1j * rng.normal(size=(m, ch)))
         ).astype(np.complex64)
    d0 = (rng.normal(size=(k, ch))
          + 1j * rng.normal(size=(k, ch))).astype(np.complex64)
    native = decomp_tpu.dictionary_learning.solve(
        y, d0, ALPHA, tol=0.0, maxiter=12, lasso_iter=5,
        complex_split=False)
    res = decomp_tpu.dictionary_learning.solve_split(
        cs.from_numpy(y), cs.from_numpy(d0), ALPHA, tol=0.0, maxiter=12,
        lasso_iter=5)
    d_split = np.asarray(res.d.re) + 1j * np.asarray(res.d.im)
    assert rel_err(d_split, native.d) < 1e-5
    # jit composition
    jitted = jax.jit(lambda ys, ds: decomp_tpu.dictionary_learning
                     .solve_split(ys, ds, ALPHA, tol=0.0, maxiter=12,
                                  lasso_iter=5))
    rj = jitted(cs.from_numpy(y), cs.from_numpy(d0))
    np.testing.assert_array_equal(np.asarray(rj.d.re),
                                  np.asarray(res.d.re))
    # unit atoms in split form
    norms = np.sqrt(np.asarray(cs.row_sum_abs2(res.d)))
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_heldout_stop_masked_dl():
    """stop='heldout' for masked dictionary learning: stops at the
    validation plateau with the reported error tracking the true
    missing-entry error (sparse-coding completion)."""
    rng = np.random.default_rng(72)
    m, ch, k = 1500, 48, 12
    d_true = rng.normal(size=(k, ch))
    d_true /= np.linalg.norm(d_true, axis=1, keepdims=True)
    xt = (rng.normal(size=(m, k)) * (rng.random((m, k)) < 0.3))
    ytrue = (xt @ d_true + 0.01 * rng.normal(size=(m, ch))
             ).astype(np.float32)
    mask = (rng.random((m, ch)) >= 0.3).astype(np.float32)
    d0 = rng.normal(size=(k, ch)).astype(np.float32)
    res = decomp_tpu.dictionary_learning.solve(
        ytrue * mask, d0, 0.02, mask=mask, tol=1e-3, maxiter=400,
        lasso_iter=10, stop="heldout", random_seed=5)
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
        decomp_tpu.dictionary_learning.solve(ytrue, d0, 0.02,
                                             stop="heldout")  # no mask


def test_heldout_small_maxiter_can_converge():
    """The held-out warm-up floor clamps to maxiter-1: with a tiny
    iteration budget a genuine validation plateau can still be reported
    as converged (ADVICE round-3 #3)."""
    rng = np.random.default_rng(73)
    m, ch, k = 300, 16, 4
    ytrue = (rng.normal(size=(m, k)) @ rng.normal(size=(k, ch))
             ).astype(np.float32)
    mask = (rng.random((m, ch)) >= 0.3).astype(np.float32)
    d0 = rng.normal(size=(k, ch)).astype(np.float32)
    # tol=inf: ANY check after the warm-up floor counts as a plateau, so
    # with maxiter=6 a converged verdict proves the floor is < maxiter.
    res = decomp_tpu.dictionary_learning.solve(
        ytrue * mask, d0, 0.02, mask=mask, tol=np.inf, maxiter=6,
        lasso_iter=3, stop="heldout", random_seed=5)
    assert bool(res.converged)
    assert int(res.niter) <= 6
