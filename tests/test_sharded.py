"""Distributed tier (SURVEY.md §4.4): shard_map solvers on 8 virtual CPU
devices (real psum semantics on one host) must match the single-device
solvers to fp tolerance."""

import jax
import numpy as np
import pytest

import decomp_tpu
from decomp_tpu import parallel
from problems import planted_lasso, planted_nmf, random_mask, rel_err


@pytest.fixture(scope="module")
def mesh8():
    return parallel.make_mesh(axis_names=("rows",))


@pytest.fixture(scope="module")
def mesh4x2():
    return parallel.make_mesh((4, 2), axis_names=("rows", "cols"))


def _init(seed, m, n, k):
    rng = np.random.default_rng(seed)
    return (rng.uniform(0.1, 1.0, (m, k)),
            rng.uniform(0.1, 1.0, (k, n)))


def test_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("masked", [False, True])
def test_row_sharded_nmf_matches_single_device(mesh8, masked):
    y, *_ = planted_nmf(seed=1, n_samples=64, n_channels=40, rank=5)
    mask = random_mask(2, y.shape) if masked else None
    x0, d0 = _init(3, 64, 40, 5)

    ref = decomp_tpu.nmf.solve(y, d0, x=x0, tol=0.0, maxiter=40, mask=mask)
    res = parallel.nmf.solve(y, d0, x=x0, tol=0.0, maxiter=40, mask=mask,
                             mesh=mesh8)
    assert rel_err(res.x, ref.x) < 1e-12
    assert rel_err(res.d, ref.d) < 1e-12
    assert int(res.niter) == int(ref.niter)


def test_2d_sharded_nmf_matches_single_device(mesh4x2):
    y, *_ = planted_nmf(seed=4, n_samples=64, n_channels=40, rank=5)
    x0, d0 = _init(5, 64, 40, 5)
    ref = decomp_tpu.nmf.solve(y, d0, x=x0, tol=0.0, maxiter=40)
    res = parallel.nmf.solve(y, d0, x=x0, tol=0.0, maxiter=40,
                             mesh=mesh4x2, row_axis="rows", col_axis="cols")
    assert rel_err(res.x, ref.x) < 1e-12
    assert rel_err(res.d, ref.d) < 1e-12


def test_2d_sharded_masked_nmf_with_objective(mesh4x2):
    y, *_ = planted_nmf(seed=6, n_samples=32, n_channels=16, rank=3)
    mask = random_mask(7, y.shape)
    x0, d0 = _init(8, 32, 16, 3)
    ref = decomp_tpu.nmf.solve(y, d0, x=x0, tol=0.0, maxiter=25, mask=mask,
                               record_objective=True)
    res = parallel.nmf.solve(y, d0, x=x0, tol=0.0, maxiter=25, mask=mask,
                             mesh=mesh4x2, col_axis="cols",
                             record_objective=True)
    np.testing.assert_allclose(np.asarray(res.objective),
                               np.asarray(ref.objective), rtol=1e-10)


def test_sharded_nmf_random_init_runs(mesh8):
    y, *_ = planted_nmf(seed=9, n_samples=64, n_channels=40, rank=4)
    res = parallel.nmf.solve(y, rank=4, tol=1e-5, maxiter=3000, mesh=mesh8,
                             random_seed=10)
    recon = np.asarray(res.x) @ np.asarray(res.d)
    assert rel_err(recon, y) < 0.05


def test_sharded_nmf_convergence_agrees(mesh8):
    """tol-triggered early stop happens at the same iteration as the
    single-device solver (the convergence predicate is itself allreduced)."""
    y, *_ = planted_nmf(seed=11, n_samples=64, n_channels=40, rank=5)
    x0, d0 = _init(12, 64, 40, 5)
    ref = decomp_tpu.nmf.solve(y, d0, x=x0, tol=1e-4, maxiter=4000)
    res = parallel.nmf.solve(y, d0, x=x0, tol=1e-4, maxiter=4000, mesh=mesh8)
    assert bool(res.converged) and bool(ref.converged)
    assert int(res.niter) == int(ref.niter)


@pytest.mark.parametrize("masked", [False, True])
def test_2d_sharded_kl_nmf_matches_single_device(mesh4x2, masked):
    y, *_ = planted_nmf(seed=19, n_samples=64, n_channels=40, rank=5)
    mask = random_mask(20, y.shape) if masked else None
    x0, d0 = _init(21, 64, 40, 5)
    ref = decomp_tpu.nmf.solve(y, d0, x=x0, tol=0.0, maxiter=30, mask=mask,
                               method="kl-mu")
    res = parallel.nmf.solve(y, d0, x=x0, tol=0.0, maxiter=30, mask=mask,
                             method="kl-mu", mesh=mesh4x2, col_axis="cols")
    assert rel_err(res.x, ref.x) < 1e-12
    assert rel_err(res.d, ref.d) < 1e-12


@pytest.mark.parametrize("masked", [False, True])
def test_sharded_mixed_precision_matches_single_device(mesh8, masked):
    """factor_dtype=f32 over bf16 data under shard_map == single device."""
    import jax.numpy as jnp

    y, *_ = planted_nmf(seed=61, n_samples=64, n_channels=40, rank=4)
    y = y.astype(jnp.bfloat16)
    mask = (random_mask(62, (64, 40)).astype(jnp.bfloat16) if masked
            else None)
    rng = np.random.default_rng(63)
    x0 = rng.uniform(0.1, 1.0, (64, 4)).astype(np.float32)
    d0 = rng.uniform(0.1, 1.0, (4, 40)).astype(np.float32)
    ref = decomp_tpu.nmf.solve(y, d0, x=x0, tol=0.0, maxiter=25, mask=mask,
                               factor_dtype=jnp.float32,
                               precision="default")
    res = parallel.nmf.solve(y, d0, x=x0, tol=0.0, maxiter=25, mask=mask,
                             factor_dtype=jnp.float32, precision="default",
                             mesh=mesh8, use_pallas=False)
    assert res.x.dtype == jnp.float32 and res.d.dtype == jnp.float32
    assert rel_err(res.x, ref.x) < 1e-5
    assert rel_err(res.d, ref.d) < 1e-5


@pytest.mark.parametrize("method", ["ista", "fista", "acc_ista",
                                    "parallel_cd", "cd"])
def test_sharded_lasso_matches_single_device(mesh8, method):
    y, a, _ = planted_lasso(seed=13, n_samples=16)
    ref = decomp_tpu.lasso.solve(y, a, 0.05, tol=0.0, maxiter=30,
                                 method=method)
    res = parallel.lasso.solve(y, a, 0.05, tol=0.0, maxiter=30,
                               method=method, mesh=mesh8)
    assert rel_err(res.x, ref.x) < 1e-12


@pytest.mark.parametrize("method", ["fista", "acc_ista"])
def test_sharded_lasso_per_problem_matches_single_device(mesh8, method):
    """Per-row convergence under shard_map: rows freeze device-locally at
    different iterations, only the all-done stopping decision crosses the
    mesh, and the global per-row niter/converged/x match the single-device
    per_problem solve exactly."""
    rng = np.random.default_rng(31)
    a = rng.normal(size=(24, 96))
    y = rng.normal(size=(16, 96)) * (10.0 ** rng.uniform(-2, 1,
                                                         size=(16, 1)))
    ref = decomp_tpu.lasso.solve(y, a, 0.05, tol=1e-6, maxiter=5000,
                                 method=method, per_problem=True)
    res = parallel.lasso.solve(y, a, 0.05, tol=1e-6, maxiter=5000,
                               method=method, mesh=mesh8, per_problem=True)
    assert np.asarray(res.niter).shape == (16,)
    np.testing.assert_array_equal(np.asarray(res.niter),
                                  np.asarray(ref.niter))
    np.testing.assert_array_equal(np.asarray(res.converged),
                                  np.asarray(ref.converged))
    assert len(set(np.asarray(res.niter).tolist())) > 1
    assert rel_err(res.x, ref.x) < 1e-12


@pytest.mark.parametrize("per_problem", [False, True])
def test_sharded_masked_lasso_pallas_matches_jnp(mesh8, per_problem):
    """The fused masked-gradient kernel under shard_map (interpret mode,
    ragged local shapes exercising per-device padding) tracks the sharded
    jnp path."""
    rng = np.random.default_rng(71)
    m, n, f = 48, 72, 40
    a = rng.normal(size=(f, n)).astype(np.float32)
    y = rng.normal(size=(m, n)).astype(np.float32)
    mask = (rng.random((m, n)) > 0.3).astype(np.float32)
    lip = float(np.linalg.eigvalsh(a @ a.T).max() * 1.05)
    kw = dict(mask=mask, tol=1e-5, maxiter=2000, method="fista",
              lipschitz=lip, mesh=mesh8, per_problem=per_problem)
    ref = parallel.lasso.solve(y * mask, a, 0.05, use_pallas=False, **kw)
    res = parallel.lasso.solve(y * mask, a, 0.05, use_pallas=True,
                               pallas_block_rows=8, _pallas_interpret=True,
                               **kw)
    assert rel_err(res.x, ref.x) < 1e-5
    if per_problem:
        assert np.asarray(res.niter).shape == (m,)
        np.testing.assert_array_equal(np.asarray(res.niter),
                                      np.asarray(ref.niter))


def test_sharded_lasso_masked_and_early_stop(mesh8):
    y, a, _ = planted_lasso(seed=14, n_samples=16)
    mask = random_mask(15, y.shape)
    ref = decomp_tpu.lasso.solve(y * mask, a, 0.05, tol=1e-8, maxiter=5000,
                                 method="acc_ista", mask=mask)
    res = parallel.lasso.solve(y * mask, a, 0.05, tol=1e-8, maxiter=5000,
                               method="acc_ista", mask=mask, mesh=mesh8)
    assert bool(res.converged)
    assert int(res.niter) == int(ref.niter)
    assert rel_err(res.x, ref.x) < 1e-10


@pytest.mark.parametrize("method,masked", [("kl-mu", False),
                                           ("kl-mu", True)])
def test_row_sharded_pallas_kl_hals_matches_jnp(mesh8, method, masked):
    """Sharded KL through the per-device fused kernels (interpret mode,
    ragged local shapes) tracks the sharded jnp path. (The HALS kernel
    was removed — see ops.pallas_mu.)"""
    y, *_ = planted_nmf(seed=25, n_samples=80, n_channels=50, rank=4)
    y = y.astype(np.float32)
    mask = (random_mask(26, y.shape).astype(np.float32) if masked else None)
    rng = np.random.default_rng(27)
    x0 = rng.uniform(0.1, 1.0, (80, 4)).astype(np.float32)
    d0 = rng.uniform(0.1, 1.0, (4, 50)).astype(np.float32)
    ref = parallel.nmf.solve(y, d0, x=x0, tol=0.0, maxiter=10, mask=mask,
                             method=method, mesh=mesh8, use_pallas=False)
    res = parallel.nmf.solve(y, d0, x=x0, tol=0.0, maxiter=10, mask=mask,
                             method=method, mesh=mesh8, use_pallas=True,
                             pallas_block_rows=8, _pallas_interpret=True)
    assert rel_err(res.x, ref.x) < 2e-4
    assert rel_err(res.d, ref.d) < 2e-4


def test_sharded_masked_dl_pallas_matches_jnp(mesh8):
    """Sharded masked dictionary learning through both fused kernels
    (interpret mode, ragged local shapes, per-device padding)."""
    rng = np.random.default_rng(81)
    m, n, k = 48, 72, 40
    y = rng.normal(size=(m, n)).astype(np.float32)
    mask = (rng.random((m, n)) > 0.3).astype(np.float32)
    d0 = rng.normal(size=(k, n)).astype(np.float32)
    kw = dict(mask=mask, tol=0.0, maxiter=6, lasso_iter=4, mesh=mesh8,
              record_objective=True)
    ref = parallel.dictionary_learning.solve(y * mask, d0, 0.05,
                                             use_pallas=False, **kw)
    res = parallel.dictionary_learning.solve(y * mask, d0, 0.05,
                                             use_pallas=True,
                                             pallas_block_rows=8,
                                             _pallas_interpret=True, **kw)
    assert res.x.shape == ref.x.shape and res.d.shape == ref.d.shape
    # padded inner power iterations start from longer ramp vectors ->
    # slightly different step sizes; compare objectives (see the single-
    # device masked-DL pallas test)
    np.testing.assert_allclose(np.asarray(res.objective),
                               np.asarray(ref.objective), rtol=2e-2)
    norms = np.linalg.norm(np.asarray(res.d), axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


@pytest.mark.parametrize("masked", [False, True])
def test_row_sharded_pallas_matches_jnp_path(mesh8, masked):
    """The fused per-device Pallas kernels (interpret mode) under shard_map
    track the jnp sharded path, including ragged local shapes that
    exercise the in-body padding."""
    y, *_ = planted_nmf(seed=22, n_samples=80, n_channels=50, rank=4)
    y = y.astype(np.float32)
    mask = (random_mask(23, y.shape).astype(np.float32) if masked else None)
    rng = np.random.default_rng(24)
    x0 = rng.uniform(0.1, 1.0, (80, 4)).astype(np.float32)
    d0 = rng.uniform(0.1, 1.0, (4, 50)).astype(np.float32)
    ref = parallel.nmf.solve(y, d0, x=x0, tol=0.0, maxiter=12, mask=mask,
                             mesh=mesh8, use_pallas=False)
    res = parallel.nmf.solve(y, d0, x=x0, tol=0.0, maxiter=12, mask=mask,
                             mesh=mesh8, use_pallas=True,
                             pallas_block_rows=8, _pallas_interpret=True)
    assert res.x.shape == ref.x.shape and res.d.shape == ref.d.shape
    assert rel_err(res.x, ref.x) < 1e-4
    assert rel_err(res.d, ref.d) < 1e-4


@pytest.mark.parametrize("masked", [False, True])
def test_sharded_dictionary_learning_matches_single_device(mesh8, masked):
    from problems import planted_patches
    y, d_true, _ = planted_patches(seed=25, n_samples=160)
    mask = random_mask(26, y.shape) if masked else None
    if mask is not None:
        y = y * mask
    rng = np.random.default_rng(27)
    d0 = d_true + 0.3 * rng.normal(size=d_true.shape)
    ref = decomp_tpu.dictionary_learning.solve(
        y, d0, 0.05, tol=0.0, maxiter=12, lasso_iter=8, mask=mask)
    res = parallel.dictionary_learning.solve(
        y, d0, 0.05, tol=0.0, maxiter=12, lasso_iter=8, mask=mask,
        mesh=mesh8)
    assert rel_err(res.d, ref.d) < 1e-10
    assert rel_err(res.x, ref.x) < 1e-10


def test_sharded_dl_bcd_kernel_matches_single(mesh8):
    """The BCD sweep kernel (interpret) inside the sharded in-core DL
    body — psum'd stats, replicated d, vma=frozenset() under the vma
    checker — and inside the sharded fused streaming epoch both track
    the jnp-sweep single-device run."""
    import jax
    import jax.numpy as jnp

    from problems import planted_patches
    y, d_true, _ = planted_patches(seed=28, n_samples=160)
    rng = np.random.default_rng(29)
    d0 = (d_true + 0.3 * rng.normal(size=d_true.shape)).astype(np.float32)
    y = y.astype(np.float32)
    kw = dict(tol=0.0, maxiter=6, lasso_iter=4)
    ref = decomp_tpu.dictionary_learning.solve(y, d0, 0.05, **kw)
    res = parallel.dictionary_learning.solve(y, d0, 0.05, mesh=mesh8,
                                             _bcd_pallas="interpret", **kw)
    assert rel_err(res.d, ref.d) < 1e-5
    assert rel_err(res.x, ref.x) < 1e-5

    m, n = y.shape
    yd = jnp.asarray(y)
    chunk = m // 16
    loader = lambda lo, hi: jax.lax.dynamic_slice(  # noqa: E731
        yd, (lo, 0), (chunk, n))
    kwf = dict(chunk_rows=chunk, n_samples=m, n_channels=n,
               dtype=np.float32, **kw)
    reff = decomp_tpu.dictionary_learning.solve_streaming(
        loader, d0, 0.05, jit_loader=True, **kwf)
    resf = parallel.dictionary_learning.solve_streaming(
        loader, d0, 0.05, mesh=mesh8, _bcd_pallas="interpret", **kwf)
    assert rel_err(resf.d, reff.d) < 1e-5


def test_sharded_dictionary_learning_heldout_lockstep(mesh8):
    """stop='heldout' on the sharded IN-CORE DL solver: identical
    validation reserve (global salted draw), allreduced validation
    error, and the SAME stop iteration as the single-device solver —
    the last cell of the {nmf, dl} x {in-core, streaming} x {single,
    sharded} heldout matrix."""
    from problems import planted_patches
    y, d_true, _ = planted_patches(seed=31, n_samples=160)
    mask = random_mask(32, y.shape)
    rng = np.random.default_rng(33)
    d0 = d_true + 0.3 * rng.normal(size=d_true.shape)
    kw = dict(tol=1e-3, maxiter=300, lasso_iter=8, mask=mask,
              stop="heldout", random_seed=3)
    s = decomp_tpu.dictionary_learning.solve(y * mask, d0, 0.05, **kw)
    p = parallel.dictionary_learning.solve(y * mask, d0, 0.05,
                                           mesh=mesh8, **kw)
    assert int(p.niter) == int(s.niter)
    assert bool(p.converged) == bool(s.converged)
    assert p.aux is not None and s.aux is not None
    np.testing.assert_allclose(float(p.aux["heldout_rel_err"]),
                               float(s.aux["heldout_rel_err"]), rtol=1e-4)
    assert rel_err(p.d, s.d) < 1e-6
    # validation: heldout without a mask / bad frac raise host-side
    with pytest.raises(decomp_tpu.utils.DecompError):
        parallel.dictionary_learning.solve(y, d0, 0.05, mesh=mesh8,
                                           stop="heldout")
    with pytest.raises(decomp_tpu.utils.DecompError):
        parallel.dictionary_learning.solve(y * mask, d0, 0.05,
                                           mesh=mesh8, mask=mask,
                                           stop="bogus")


def test_masked_completion_preset_sharded_lockstep(mesh8):
    """nmf.masked_completion(mesh=...) routes the whole preset —
    held-out stop, optional refit polish — through parallel.nmf.solve
    in lockstep with the single-device preset (the in-core twin of the
    sharded masked_completion_streaming mode)."""
    rng = np.random.default_rng(119)
    m, n, k = 320, 64, 4
    ytrue = (rng.uniform(0, 1, (m, k)) @ rng.uniform(0, 1, (k, n))
             + 0.02 * rng.normal(size=(m, n))).astype(np.float32)
    mask = (rng.random((m, n)) >= 0.3).astype(np.float32)
    # explicit inits: rank-only init draws PER-SHARD on the mesh (a
    # different random dictionary than single-device by design), so the
    # lockstep comparison pins the starting point like the other
    # sharded-vs-single tests
    x0 = rng.uniform(0.1, 1, (m, k)).astype(np.float32)
    d0 = rng.uniform(0.1, 1, (k, n)).astype(np.float32)
    kw = dict(d=d0, x=x0, maxiter=3000, tol=1e-3, random_seed=5,
              refit=40)
    s = decomp_tpu.nmf.masked_completion(ytrue * mask, mask, **kw)
    p = decomp_tpu.nmf.masked_completion(ytrue * mask, mask, mesh=mesh8,
                                         **kw)
    assert bool(p.converged) == bool(s.converged)
    assert int(p.niter) == int(s.niter)
    assert p.aux is not None
    np.testing.assert_allclose(float(p.aux["heldout_rel_err"]),
                               float(s.aux["heldout_rel_err"]),
                               rtol=1e-4)
    miss = np.asarray(mask) == 0
    recon = np.asarray(p.x) @ np.asarray(p.d)
    ho = (np.linalg.norm(recon[miss] - ytrue[miss])
          / np.linalg.norm(ytrue[miss]))
    assert ho < 0.1


def test_sharded_dictionary_learning_complex(mesh8):
    from problems import planted_patches
    y, d_true, _ = planted_patches(seed=28, n_samples=160, complex_=True)
    rng = np.random.default_rng(29)
    d0 = d_true + 0.2 * (rng.normal(size=d_true.shape)
                         + 1j * rng.normal(size=d_true.shape))
    ref = decomp_tpu.dictionary_learning.solve(
        y, d0, 0.05, tol=0.0, maxiter=8, lasso_iter=6)
    res = parallel.dictionary_learning.solve(
        y, d0, 0.05, tol=0.0, maxiter=8, lasso_iter=6, mesh=mesh8)
    assert rel_err(res.d, ref.d) < 1e-10


def test_pre_placed_global_arrays(mesh8):
    """Inputs already placed with a NamedSharding run without resharding."""
    y, *_ = planted_nmf(seed=16, n_samples=64, n_channels=40, rank=4)
    x0, d0 = _init(17, 64, 40, 4)
    y_sharded = parallel.shard_rows(jax.numpy.asarray(y), mesh8)
    ref = decomp_tpu.nmf.solve(y, d0, x=x0, tol=0.0, maxiter=20)
    res = parallel.nmf.solve(y_sharded, d0, x=x0, tol=0.0, maxiter=20,
                             mesh=mesh8)
    assert rel_err(res.x, ref.x) < 1e-12


def test_validation_errors(mesh8):
    y, *_ = planted_nmf(seed=18, n_samples=30, n_channels=40, rank=4)
    with pytest.raises(decomp_tpu.utils.DecompError):
        # 30 rows not divisible by 8 devices
        parallel.nmf.solve(y, rank=4, mesh=mesh8)
    with pytest.raises(decomp_tpu.utils.DecompError):
        parallel.nmf.solve(y, rank=4, mesh=mesh8, row_axis="nope")


def test_2d_sharded_hals_matches_single_device(mesh4x2):
    y, *_ = planted_nmf(seed=30, n_samples=64, n_channels=40, rank=5)
    x0, d0 = _init(31, 64, 40, 5)
    ref = decomp_tpu.nmf.solve(y, d0, x=x0, tol=0.0, maxiter=20,
                               method="hals")
    res = parallel.nmf.solve(y, d0, x=x0, tol=0.0, maxiter=20,
                             method="hals", mesh=mesh4x2, col_axis="cols")
    assert rel_err(res.x, ref.x) < 1e-12
    assert rel_err(res.d, ref.d) < 1e-12


def test_sharded_lasso_feature_alpha_and_warm(mesh8):
    y, a, _ = planted_lasso(seed=32, n_samples=16)
    alphas = np.full((a.shape[0],), 0.05)
    ref = decomp_tpu.lasso.solve(y, a, alphas, tol=0.0, maxiter=25)
    res = parallel.lasso.solve(y, a, alphas, tol=0.0, maxiter=25, mesh=mesh8)
    assert rel_err(res.x, ref.x) < 1e-12
    # warm start through the sharded path: resume from a converged solution
    full = parallel.lasso.solve(y, a, alphas, tol=1e-12, maxiter=50000,
                                mesh=mesh8)
    assert bool(full.converged)
    res2 = parallel.lasso.solve(y, a, alphas, x=full.x, tol=1e-6,
                                maxiter=50, method="ista", mesh=mesh8)
    assert bool(res2.converged)
    assert int(res2.niter) <= 3


def test_checkpointed_sharded_solve(mesh8, tmp_path):
    from decomp_tpu.utils.checkpoint import (CheckpointManager,
                                             checkpointed_solve)
    y, *_ = planted_nmf(seed=33, n_samples=64, n_channels=40, rank=4)
    x0, d0 = _init(34, 64, 40, 4)
    mgr = CheckpointManager(str(tmp_path / "shard_ckpt"))
    res, total = checkpointed_solve(
        parallel.nmf.solve, y, manager=mgr, chunk_iters=10, maxiter=30,
        tol=0.0, d=d0, x=x0, mesh=mesh8)
    straight = parallel.nmf.solve(y, d0, x=x0, tol=0.0, maxiter=30,
                                  mesh=mesh8)
    assert total == 30
    assert rel_err(res.d, straight.d) < 1e-12


def test_make_mesh_validation():
    with pytest.raises(ValueError):
        parallel.make_mesh((3,), ("rows",))  # 3 != 8 devices


def test_row_sharded_whole_solve_kernel(mesh8):
    """Sharded whole-solve batched-FISTA path (interpret mode): each
    device runs its local block's ENTIRE per-problem solve in the kernel
    with zero collectives. Per-device stripe geometry changes fp
    reduction tilings, so parity is tol-level with rare +-1 stopping
    shifts (same class as padding effects — see ops.pallas_fista)."""
    rng = np.random.default_rng(85)
    m, f, n = 320, 256, 96
    a = (rng.normal(size=(f, n)) / np.sqrt(n)).astype(np.float32)
    xt = (rng.normal(size=(m, f))
          * (rng.random((m, f)) < 0.1)).astype(np.float32)
    y = (xt @ a + 0.01 * rng.normal(size=(m, n))).astype(np.float32)
    ref = decomp_tpu.lasso.solve(y, a, 0.05, tol=1e-5, maxiter=300,
                                 method="fista", per_problem=True,
                                 use_pallas=True, _pallas_interpret=True)
    res = parallel.lasso.solve(y, a, 0.05, mesh=mesh8, tol=1e-5,
                               maxiter=300, method="fista",
                               per_problem=True, use_pallas=True,
                               _pallas_interpret=True)
    assert rel_err(res.x, ref.x) < 1e-3
    assert np.mean(np.asarray(res.niter) == np.asarray(ref.niter)) > 0.95
    assert (np.mean(np.asarray(res.converged)
                    == np.asarray(ref.converged)) > 0.95)
    with pytest.raises(decomp_tpu.utils.DecompError):
        # unmasked + use_pallas requires per_problem, sharded too
        parallel.lasso.solve(y, a, 0.05, mesh=mesh8, use_pallas=True)


def test_sharded_heldout_stop_matches_single_device(mesh8):
    """stop='heldout' in the sharded solver: the GLOBAL validation mask
    uses the single-device derivation and the validation error is an
    allreduced scalar, so (with pinned inits) the sharded run stops on
    the SAME iteration with the same held-out error."""
    rng = np.random.default_rng(86)
    m, n, k = 160, 64, 4
    ytrue = (rng.uniform(0, 1, (m, k)) @ rng.uniform(0, 1, (k, n))
             + 0.02 * rng.normal(size=(m, n))).astype(np.float32)
    mask = (rng.random((m, n)) >= 0.3).astype(np.float32)
    x0 = rng.uniform(0.1, 1, (m, k)).astype(np.float32)
    d0 = rng.uniform(0.1, 1, (k, n)).astype(np.float32)
    kw = dict(mask=mask, tol=1e-3, maxiter=3000, stop="heldout",
              random_seed=3)
    s = decomp_tpu.nmf.solve(ytrue * mask, d0, x=x0, **kw)
    p = parallel.nmf.solve(ytrue * mask, d0, x=x0, mesh=mesh8, **kw)
    assert int(p.niter) == int(s.niter)
    assert bool(p.converged) == bool(s.converged)
    np.testing.assert_allclose(float(p.aux["heldout_rel_err"]),
                               float(s.aux["heldout_rel_err"]), rtol=1e-4)
    assert rel_err(p.d, s.d) < 1e-4
    with pytest.raises(decomp_tpu.utils.DecompError):
        parallel.nmf.solve(ytrue * mask, d0, mesh=mesh8, stop="heldout")


@pytest.mark.parametrize("masked,pallas", [(False, False), (True, False),
                                           (False, True), (True, True)])
def test_sharded_streaming_matches_single_device(mesh8, masked, pallas):
    """parallel.nmf.solve_streaming: the sharded out-of-core fused epoch
    (each device streams its GLOBAL row range in chunks, psum'd K-sized
    statistics) matches the single-device streaming solver to matmul
    reduction order — the data-larger-than-every-HBM pod configuration."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(87)
    m, n, k, chunk = 1024, 128, 4, 128
    y = np.maximum(rng.uniform(0, 1, (m, k)) @ rng.uniform(0, 1, (k, n))
                   + 0.01 * rng.normal(size=(m, n)), 0).astype(np.float32)
    mask_arr = ((rng.random((m, n)) >= 0.3).astype(np.float32)
                if masked else None)
    x0 = rng.uniform(0.1, 1, (m, k)).astype(np.float32)
    d0 = rng.uniform(0.1, 1, (k, n)).astype(np.float32)
    yd = jnp.asarray(y if mask_arr is None else y * mask_arr)
    md = None if mask_arr is None else jnp.asarray(mask_arr)

    def loader(lo, hi):
        return jax.lax.dynamic_slice(yd, (lo, 0), (chunk, n))

    mloader = (None if md is None else
               (lambda lo, hi: jax.lax.dynamic_slice(md, (lo, 0),
                                                     (chunk, n))))
    # rank must be 128-aligned for the kernel path; pad via rank=... no —
    # use the interpret kernel only when aligned (k=4 is not), so the
    # pallas variant uses k=128.
    kk = 128 if pallas else k
    d0k = (rng.uniform(0.1, 1, (kk, n)).astype(np.float32)
           if pallas else d0)
    x0k = (rng.uniform(0.1, 1, (m, kk)).astype(np.float32)
           if pallas else x0)
    kw = dict(tol=0.0, maxiter=15, chunk_rows=chunk, n_samples=m,
              n_channels=n, dtype=np.float32, mask=mloader,
              _pallas_interpret=pallas)
    ref = decomp_tpu.nmf.solve_streaming(loader, d0k, x=x0k, x_device=True,
                                         jit_loader=True, **kw)
    res = parallel.nmf.solve_streaming(loader, d0k, x=x0k, mesh=mesh8,
                                       **kw)
    assert rel_err(res.d, ref.d) < 1e-5
    assert rel_err(res.x, ref.x) < 1e-5


def test_sharded_heldout_2d_mesh(mesh4x2):
    """Held-out stopping on a 2-D (rows x cols) mesh: the validation
    error allreduces over BOTH axes and still matches single-device."""
    rng = np.random.default_rng(88)
    m, n, k = 160, 64, 4
    ytrue = (rng.uniform(0, 1, (m, k)) @ rng.uniform(0, 1, (k, n))
             + 0.02 * rng.normal(size=(m, n))).astype(np.float32)
    mask = (rng.random((m, n)) >= 0.3).astype(np.float32)
    x0 = rng.uniform(0.1, 1, (m, k)).astype(np.float32)
    d0 = rng.uniform(0.1, 1, (k, n)).astype(np.float32)
    kw = dict(mask=mask, tol=1e-3, maxiter=2000, stop="heldout",
              random_seed=3)
    s = decomp_tpu.nmf.solve(ytrue * mask, d0, x=x0, **kw)
    p = parallel.nmf.solve(ytrue * mask, d0, x=x0, mesh=mesh4x2,
                           col_axis="cols", **kw)
    assert int(p.niter) == int(s.niter)
    np.testing.assert_allclose(float(p.aux["heldout_rel_err"]),
                               float(s.aux["heldout_rel_err"]), rtol=1e-4)


@pytest.mark.parametrize("variant", ["mixed", "kl"])
def test_sharded_streaming_mixed_and_kl(mesh8, variant):
    """Sharded streaming in the mixed operating point (bf16 chunks / f32
    factors) and for KL-MU matches the single-device streamer."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(89)
    m, n, k, chunk = 512, 64, 4, 64
    y = np.maximum(rng.uniform(0, 1, (m, k)) @ rng.uniform(0, 1, (k, n))
                   + 0.01 * rng.normal(size=(m, n)), 0).astype(np.float32)
    x0 = rng.uniform(0.1, 1, (m, k)).astype(np.float32)
    d0 = rng.uniform(0.1, 1, (k, n)).astype(np.float32)
    if variant == "mixed":
        yd = jnp.asarray(y, jnp.bfloat16)
        kw = dict(dtype=jnp.bfloat16, factor_dtype=jnp.float32,
                  precision="default", method="mu")
    else:
        yd = jnp.asarray(y)
        kw = dict(dtype=np.float32, method="kl-mu")

    def loader(lo, hi):
        return jax.lax.dynamic_slice(yd, (lo, 0), (chunk, n))

    base = dict(tol=0.0, maxiter=12, chunk_rows=chunk, n_samples=m,
                n_channels=n, **kw)
    ref = decomp_tpu.nmf.solve_streaming(loader, d0, x=x0, x_device=True,
                                         jit_loader=True, **base)
    res = parallel.nmf.solve_streaming(loader, d0, x=x0, mesh=mesh8,
                                       **base)
    assert rel_err(res.d, ref.d) < 1e-5
    assert rel_err(res.x, ref.x) < 1e-5


def _stream_problem(seed, m, n, k, chunk, masked=False):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    y = np.maximum(rng.uniform(0, 1, (m, k)) @ rng.uniform(0, 1, (k, n))
                   + 0.01 * rng.normal(size=(m, n)), 0).astype(np.float32)
    mask_arr = ((rng.random((m, n)) >= 0.3).astype(np.float32)
                if masked else None)
    x0 = rng.uniform(0.1, 1, (m, k)).astype(np.float32)
    d0 = rng.uniform(0.1, 1, (k, n)).astype(np.float32)
    yd = jnp.asarray(y if mask_arr is None else y * mask_arr)
    md = None if mask_arr is None else jnp.asarray(mask_arr)

    def loader(lo, hi):
        return jax.lax.dynamic_slice(yd, (lo, 0), (chunk, n))

    mloader = (None if md is None else
               (lambda lo, hi: jax.lax.dynamic_slice(md, (lo, 0),
                                                     (chunk, n))))
    return y, mask_arr, x0, d0, loader, mloader


def test_sharded_streaming_inner_iter_matches_single(mesh8):
    """inner_iter (accelerated MU) in the sharded out-of-core epoch: the
    per-chunk x refinements are row-local, so the sharded trajectory
    matches the single-device streamer at the same inner_iter."""
    y, _, x0, d0, loader, _ = _stream_problem(151, 512, 64, 4, 64)
    kw = dict(tol=0.0, maxiter=12, chunk_rows=64, n_samples=512,
              n_channels=64, dtype=np.float32, inner_iter=3)
    ref = decomp_tpu.nmf.solve_streaming(loader, d0, x=x0, x_device=True,
                                         jit_loader=True, **kw)
    res = parallel.nmf.solve_streaming(loader, d0, x=x0, mesh=mesh8, **kw)
    assert rel_err(res.d, ref.d) < 1e-5
    assert rel_err(res.x, ref.x) < 1e-5
    with pytest.raises(decomp_tpu.utils.DecompError, match="inner_iter"):
        parallel.nmf.solve_streaming(loader, d0, x=x0, mesh=mesh8,
                                     **{**kw, "inner_iter": 0})


def test_sharded_streaming_heldout_lockstep(mesh8):
    """stop='heldout' in the SHARDED streaming solver (VERDICT round-3
    Missing #1): the validation draw is keyed by global chunk offset and
    the error allreduced, so the sharded run stops on the SAME iteration
    as single-device streaming with the same reported error."""
    m, n, k, chunk = 2048, 64, 4, 128
    y, mask_arr, x0, d0, loader, mloader = _stream_problem(
        90, m, n, k, chunk, masked=True)
    kw = dict(mask=mloader, tol=5e-3, maxiter=4000, chunk_rows=chunk,
              n_samples=m, n_channels=n, dtype=np.float32,
              stop="heldout", check_every=10, random_seed=7)
    s = decomp_tpu.nmf.solve_streaming(loader, d0, x=x0, x_device=True,
                                       jit_loader=True, **kw)
    p = parallel.nmf.solve_streaming(loader, d0, x=x0, mesh=mesh8, **kw)
    assert bool(s.converged) and bool(p.converged)
    assert int(p.niter) == int(s.niter)
    np.testing.assert_allclose(float(p.aux["heldout_rel_err"]),
                               float(s.aux["heldout_rel_err"]),
                               rtol=1e-4)
    assert rel_err(p.d, s.d) < 1e-4


def test_sharded_streaming_record_objective(mesh8):
    """record_objective in the sharded streamer: the allreduced
    objective curve equals the single-device streaming curve."""
    m, n, k, chunk = 1024, 64, 4, 128
    y, _, x0, d0, loader, _ = _stream_problem(91, m, n, k, chunk)
    kw = dict(tol=0.0, maxiter=10, chunk_rows=chunk, n_samples=m,
              n_channels=n, dtype=np.float32, record_objective=True)
    s = decomp_tpu.nmf.solve_streaming(loader, d0, x=x0, x_device=True,
                                       jit_loader=True, **kw)
    p = parallel.nmf.solve_streaming(loader, d0, x=x0, mesh=mesh8, **kw)
    so = np.asarray(s.objective)
    po = np.asarray(p.objective)
    assert po.shape == so.shape
    np.testing.assert_allclose(po, so, rtol=1e-5)


def test_sharded_streaming_hbm_cache_matches_uncached(mesh8):
    """hbm_cache_chunks in the sharded streamer: each device caches the
    head of its OWN row range; the trajectory is unchanged."""
    m, n, k, chunk = 2048, 64, 4, 128
    y, _, x0, d0, loader, _ = _stream_problem(92, m, n, k, chunk)
    kw = dict(tol=0.0, maxiter=8, chunk_rows=chunk, n_samples=m,
              n_channels=n, dtype=np.float32, mesh=mesh8)
    ref = parallel.nmf.solve_streaming(loader, d0, x=x0, **kw)
    res = parallel.nmf.solve_streaming(loader, d0, x=x0,
                                       hbm_cache_chunks=1, **kw)
    np.testing.assert_array_equal(np.asarray(res.d), np.asarray(ref.d))
    np.testing.assert_array_equal(np.asarray(res.x), np.asarray(ref.x))


def test_sharded_streaming_cache_prefill_per_shard_and_precision(mesh8):
    """The sharded cache prefill (a) assembles shard-by-shard (a full
    n_dev*n_cache stack on one device can OOM even when the sharded
    steady state fits every chip), (b) runs the loader under the solve's
    matmul precision, and (c) requests each device's OWN local head
    offsets, clamped. The mask cache follows the same path."""
    import jax

    m, n, k, chunk = 2048, 64, 4, 128
    y, mask_arr, x0, d0, loader, mloader = _stream_problem(
        117, m, n, k, chunk, masked=True)
    seen_prec, seen_offs = [], []

    def spy_loader(lo, hi):
        if not isinstance(lo, jax.core.Tracer):  # prefill calls only
            seen_prec.append(jax.config.jax_default_matmul_precision)
            seen_offs.append(int(lo))
        return loader(lo, hi)

    kw = dict(mask=mloader, tol=0.0, maxiter=4, chunk_rows=chunk,
              n_samples=m, n_channels=n, dtype=np.float32, mesh=mesh8,
              precision="highest")
    ref = parallel.nmf.solve_streaming(loader, d0, x=x0, **kw)
    res = parallel.nmf.solve_streaming(spy_loader, d0, x=x0,
                                       hbm_cache_chunks=1, **kw)
    np.testing.assert_array_equal(np.asarray(res.d), np.asarray(ref.d))
    # Prefill offsets: with 8 devices x 2 local chunks of 128 rows and
    # n_cache=1, device r caches global row r*256 — every prefill-time
    # (eager) loader call must be one of those heads, under 'highest'.
    heads = {r * 2 * chunk for r in range(8)}
    assert seen_offs and set(seen_offs) == heads, seen_offs
    assert all(p == "highest" for p in seen_prec), seen_prec


@pytest.mark.parametrize("masked", [False, True])
def test_sharded_streaming_ragged_tail(mesh8, masked):
    """Prime n_samples (VERDICT round-3 Weak #2): the trailing chunk
    reads a clamped loader window and masks rows at/after n_samples, so
    sharded streaming == single-device streaming == in-core on ragged
    shapes."""
    m, n, k, chunk = 1021, 64, 4, 128  # 1021 is prime
    y, mask_arr, x0, d0, loader, mloader = _stream_problem(
        93, m, n, k, chunk, masked=masked)
    kw = dict(tol=0.0, maxiter=12, chunk_rows=chunk, n_samples=m,
              n_channels=n, dtype=np.float32, mask=mloader)
    s = decomp_tpu.nmf.solve_streaming(loader, d0, x=x0, x_device=True,
                                       jit_loader=True, **kw)
    p = parallel.nmf.solve_streaming(loader, d0, x=x0, mesh=mesh8, **kw)
    core = decomp_tpu.nmf.solve(
        y if mask_arr is None else y * mask_arr, d0, x=x0,
        mask=mask_arr, tol=0.0, maxiter=12, use_pallas=False)
    assert np.asarray(s.x).shape == (m, k)
    assert np.asarray(p.x).shape == (m, k)
    assert rel_err(s.d, core.d) < 1e-5
    assert rel_err(p.d, core.d) < 1e-5
    assert rel_err(p.x, s.x) < 1e-5


def test_sharded_streaming_ragged_pallas_interpret(mesh8):
    """Ragged tails through the Pallas chunk-stats path (interpret
    mode): kernel == jnp on non-divisible n_samples."""
    m, n, k, chunk = 1021, 128, 128, 128
    y, _, x0, d0, loader, _ = _stream_problem(94, m, n, k, chunk)
    kw = dict(tol=0.0, maxiter=6, chunk_rows=chunk, n_samples=m,
              n_channels=n, dtype=np.float32, mesh=mesh8)
    ref = parallel.nmf.solve_streaming(loader, d0, x=x0, **kw)
    res = parallel.nmf.solve_streaming(loader, d0, x=x0,
                                       _pallas_interpret=True, **kw)
    assert rel_err(res.d, ref.d) < 1e-5
    assert rel_err(res.x, ref.x) < 1e-5


@pytest.mark.parametrize("masked", [False, True])
def test_sharded_streaming_kl_pallas_interpret(mesh8, masked):
    """KL-MU through the fused chunk kernels (kl_stats_dense/masked,
    interpret mode) under shard_map: kernel == jnp, dense and masked."""
    m, n, k, chunk = 1024, 128, 128, 128
    y, mask_arr, x0, d0, loader, mloader = _stream_problem(
        121, m, n, k, chunk, masked=masked)
    kw = dict(tol=0.0, maxiter=6, chunk_rows=chunk, n_samples=m,
              n_channels=n, dtype=np.float32, mesh=mesh8,
              method="kl-mu", mask=mloader)
    ref = parallel.nmf.solve_streaming(loader, d0, x=x0, **kw)
    res = parallel.nmf.solve_streaming(loader, d0, x=x0,
                                       _pallas_interpret=True, **kw)
    assert rel_err(res.d, ref.d) < 1e-5
    assert rel_err(res.x, ref.x) < 1e-5


def test_sharded_streaming_use_pallas_flag(mesh8):
    """The sharded streamer exposes the same use_pallas gate as the
    single-device one: False disables the chunk kernels bitwise, True
    forces them (interpret run == auto interpret run), and an unmet
    geometry requirement under True raises a typed error."""
    m, n, k, chunk = 1024, 128, 128, 128
    y, _, x0, d0, loader, _ = _stream_problem(96, m, n, k, chunk)
    kw = dict(tol=0.0, maxiter=6, chunk_rows=chunk, n_samples=m,
              n_channels=n, dtype=np.float32, mesh=mesh8)
    plain = parallel.nmf.solve_streaming(loader, d0, x=x0, **kw)
    off = parallel.nmf.solve_streaming(loader, d0, x=x0,
                                       use_pallas=False,
                                       _pallas_interpret=True, **kw)
    np.testing.assert_array_equal(np.asarray(off.d), np.asarray(plain.d))
    auto = parallel.nmf.solve_streaming(loader, d0, x=x0,
                                        _pallas_interpret=True, **kw)
    forced = parallel.nmf.solve_streaming(loader, d0, x=x0,
                                          use_pallas=True,
                                          _pallas_interpret=True, **kw)
    np.testing.assert_array_equal(np.asarray(forced.d), np.asarray(auto.d))
    with pytest.raises(decomp_tpu.utils.DecompError, match="rank"):
        parallel.nmf.solve_streaming(loader, d0[:64], x=x0[:, :64],
                                     use_pallas=True,
                                     _pallas_interpret=True, **kw)
    with pytest.raises(decomp_tpu.utils.DecompError, match="use_pallas"):
        parallel.nmf.solve_streaming(loader, d0, x=x0,
                                     use_pallas="bogus", **kw)


def test_sharded_streaming_check_every_amortised(mesh8):
    """Amortised rel-change stop in the sharded streamer: the stop lands
    on a check epoch and matches the per-epoch stop to within one
    check block."""
    m, n, k, chunk = 1024, 64, 4, 128
    y, _, x0, d0, loader, _ = _stream_problem(95, m, n, k, chunk)
    kw = dict(tol=1e-3, maxiter=2000, chunk_rows=chunk, n_samples=m,
              n_channels=n, dtype=np.float32, mesh=mesh8)
    per_epoch = parallel.nmf.solve_streaming(loader, d0, x=x0,
                                             check_every=1, **kw)
    amort = parallel.nmf.solve_streaming(loader, d0, x=x0,
                                         check_every=6, **kw)
    n1, n6 = int(per_epoch.niter), int(amort.niter)
    assert bool(per_epoch.converged) and bool(amort.converged)
    assert n6 % 6 == 0 or n6 == 2000
    assert n1 <= n6 < n1 + 6


@pytest.mark.parametrize("per_problem", [False, True])
def test_sharded_streaming_lasso_matches_in_core(mesh8, per_problem):
    """parallel.lasso.solve_streaming (round 4): out-of-core sharded
    batch lasso == the in-core solve (rows are independent problems, so
    chunked sharded solves with a shared Lipschitz constant ARE the
    global solve), incl. a ragged final chunk."""
    rng = np.random.default_rng(96)
    m, f, ch = 300, 24, 32  # 300 % 128 ragged final chunk
    a = rng.normal(size=(f, ch)).astype(np.float32)
    xt = (rng.normal(size=(m, f)) * (rng.random((m, f)) < 0.2)
          ).astype(np.float32)
    y = (xt @ a + 0.01 * rng.normal(size=(m, ch))).astype(np.float32)
    core = decomp_tpu.lasso.solve(y, a, 0.05, tol=1e-5, maxiter=600,
                                  method="fista",
                                  per_problem=per_problem)
    stream = parallel.lasso.solve_streaming(
        y, a, 0.05, mesh=mesh8, tol=1e-5, maxiter=600, method="fista",
        chunk_rows=128, per_problem=per_problem, use_pallas=False)
    # per-row math is identical, but different matmul SHAPES (16-row
    # device blocks vs the 300-row batch) legitimately tile reductions
    # differently, so a stray row may cross tol one iteration apart
    assert rel_err(stream.x, core.x) < 1e-4
    if per_problem:
        ns, nc = np.asarray(stream.niter), np.asarray(core.niter)
        assert (ns == nc).mean() > 0.95
        assert np.abs(ns - nc).max() <= 2
        assert np.asarray(stream.converged).all()


@pytest.mark.parametrize("masked", [False, True])
def test_sharded_streaming_padding_beyond_one_chunk(mesh8, masked):
    """Ragged sharded grid where SEVERAL devices hold only padding
    (n_samples=257 over 8 devices x 64-row chunks -> devices 5..7 are
    entirely past the data): loader windows stay clamped inside
    [0, n_samples - chunk_rows] (code-review round-4 finding #1) and
    the result equals the in-core solve."""
    import jax
    import jax.numpy as jnp

    m, n, k, chunk = 257, 48, 4, 64
    rng = np.random.default_rng(108)
    y = np.maximum(rng.uniform(0, 1, (m, k)) @ rng.uniform(0, 1, (k, n))
                   + 0.01 * rng.normal(size=(m, n)), 0).astype(np.float32)
    mask_arr = ((rng.random((m, n)) >= 0.3).astype(np.float32)
                if masked else None)
    x0 = rng.uniform(0.1, 1, (m, k)).astype(np.float32)
    d0 = rng.uniform(0.1, 1, (k, n)).astype(np.float32)
    yd = jnp.asarray(y if mask_arr is None else y * mask_arr)
    md = None if mask_arr is None else jnp.asarray(mask_arr)

    def loader(lo, hi):
        # y has EXACTLY n_samples rows: any out-of-contract offset
        # (lo > n_samples - chunk_rows) would make this slice clamp and
        # read rows already covered — the solver must never ask for one
        return jax.lax.dynamic_slice(yd, (lo, 0), (chunk, n))

    mloader = (None if md is None else
               (lambda lo, hi: jax.lax.dynamic_slice(md, (lo, 0),
                                                     (chunk, n))))
    res = parallel.nmf.solve_streaming(
        loader, d0, x=x0, mesh=mesh8, tol=0.0, maxiter=10,
        chunk_rows=chunk, n_samples=m, n_channels=n, dtype=np.float32,
        mask=mloader)
    core = decomp_tpu.nmf.solve(
        y if mask_arr is None else y * mask_arr, d0, x=x0,
        mask=mask_arr, tol=0.0, maxiter=10, use_pallas=False)
    assert np.asarray(res.x).shape == (m, k)
    assert rel_err(res.d, core.d) < 1e-5
    assert rel_err(res.x, core.x) < 1e-5


def test_sharded_streaming_bf16_init_stays_bf16(mesh8):
    """Random x init with bf16 data and no factor_dtype must stay bf16
    (code-review round-4 finding #2: a strongly-typed f32 scale was
    promoting the sharded init — 2x HBM for x at pod scale)."""
    import jax
    import jax.numpy as jnp

    m, n, k, chunk = 512, 32, 4, 64
    rng = np.random.default_rng(109)
    yd = jnp.asarray(rng.uniform(0, 1, (m, n)).astype(np.float32)
                     ).astype(jnp.bfloat16)

    def loader(lo, hi):
        return jax.lax.dynamic_slice(yd, (lo, 0), (chunk, n))

    res = parallel.nmf.solve_streaming(
        loader, rank=k, mesh=mesh8, tol=0.0, maxiter=2,
        chunk_rows=chunk, n_samples=m, n_channels=n,
        dtype=jnp.bfloat16, precision="default", random_seed=1)
    assert res.x.dtype == jnp.bfloat16
    assert res.d.dtype == jnp.bfloat16


def test_sharded_streaming_init_ignores_masked_entries(mesh8):
    """Masked entries may hold arbitrary finite garbage: they must not
    influence ANY part of the solve, including the random d/x init
    scales (code-review finding: the sharded x-init scale used the
    UNMASKED chunk mean, so garbage under the mask leaked into the
    trajectory). Also pins the single shared head load: the init makes
    exactly one eager loader call."""
    import jax
    import jax.numpy as jnp

    m, n, k, chunk = 512, 64, 4, 64
    rng = np.random.default_rng(115)
    ytrue = (rng.uniform(0, 1, (m, k)) @ rng.uniform(0, 1, (k, n))
             ).astype(np.float32)
    mask = (rng.random((m, n)) >= 0.3).astype(np.float32)
    garbage = (1.0 - mask) * 1e6
    clean = jnp.asarray(ytrue * mask)
    dirty = jnp.asarray(ytrue * mask + garbage)
    md = jnp.asarray(mask)
    eager_calls = []

    def make_loader(src, log=False):
        def loader(lo, hi):
            if log and not isinstance(lo, jax.core.Tracer):
                eager_calls.append((int(lo), int(hi)))
            return jax.lax.dynamic_slice(src, (lo, 0), (chunk, n))
        return loader

    def mloader(lo, hi):
        return jax.lax.dynamic_slice(md, (lo, 0), (chunk, n))

    kw = dict(rank=k, mesh=mesh8, mask=mloader, tol=0.0, maxiter=8,
              chunk_rows=chunk, n_samples=m, n_channels=n,
              dtype=np.float32, random_seed=5)
    a = parallel.nmf.solve_streaming(make_loader(clean, log=True), **kw)
    assert eager_calls == [(0, chunk)], (
        "d/x init must share ONE eager head load, got %r" % eager_calls)
    b = parallel.nmf.solve_streaming(make_loader(dirty), **kw)
    np.testing.assert_array_equal(np.asarray(a.d), np.asarray(b.d))
    np.testing.assert_array_equal(np.asarray(a.x), np.asarray(b.x))


def test_sharded_streaming_warm_start_shape_validation(mesh8):
    """Warm d/x with wrong shapes must fail host-side with a typed
    error, not a cryptic device_put/epoch shape mismatch (code-review
    finding: the sharded streamer validated neither)."""
    import jax
    import jax.numpy as jnp

    m, n, k, chunk = 512, 64, 4, 64
    rng = np.random.default_rng(116)
    yd = jnp.asarray(rng.uniform(0, 1, (m, n)).astype(np.float32))

    def loader(lo, hi):
        return jax.lax.dynamic_slice(yd, (lo, 0), (chunk, n))

    d0 = rng.uniform(0.1, 1, (k, n)).astype(np.float32)
    kw = dict(mesh=mesh8, tol=0.0, maxiter=2, chunk_rows=chunk,
              n_samples=m, n_channels=n, dtype=np.float32)
    with pytest.raises(decomp_tpu.utils.ShapeError):
        parallel.nmf.solve_streaming(loader, d0[:, :-1], **kw)
    with pytest.raises(decomp_tpu.utils.DecompError):
        parallel.nmf.solve_streaming(
            loader, d0, x=np.ones((m - 1, k), np.float32), **kw)
    with pytest.raises(decomp_tpu.utils.ShapeError):
        parallel.nmf.solve_streaming(
            loader, d0, x=np.ones((m, k + 1), np.float32), **kw)


def test_sharded_streaming_ragged_heldout_cache_combined(mesh8):
    """The round-4 features compose: ragged sample count + heldout stop
    + per-device HBM cache in one sharded run, in lockstep with the
    single-device fused streamer."""
    import jax
    import jax.numpy as jnp

    m, n, k, chunk = 1993, 64, 4, 128  # prime
    rng = np.random.default_rng(111)
    ytrue = (rng.uniform(0, 1, (m, k)) @ rng.uniform(0, 1, (k, n))
             + 0.02 * rng.normal(size=(m, n))).astype(np.float32)
    mask = (rng.random((m, n)) >= 0.3).astype(np.float32)
    x0 = rng.uniform(0.1, 1, (m, k)).astype(np.float32)
    d0 = rng.uniform(0.1, 1, (k, n)).astype(np.float32)
    yd, md = jnp.asarray(ytrue * mask), jnp.asarray(mask)

    def loader(lo, hi):
        return jax.lax.dynamic_slice(yd, (lo, 0), (chunk, n))

    def mloader(lo, hi):
        return jax.lax.dynamic_slice(md, (lo, 0), (chunk, n))

    kw = dict(mask=mloader, tol=5e-3, maxiter=3000, chunk_rows=chunk,
              n_samples=m, n_channels=n, dtype=np.float32,
              stop="heldout", check_every=10, hbm_cache_chunks=1,
              random_seed=7)
    s = decomp_tpu.nmf.solve_streaming(loader, d0, x=x0, x_device=True,
                                       jit_loader=True, **kw)
    p = parallel.nmf.solve_streaming(loader, d0, x=x0, mesh=mesh8, **kw)
    assert bool(s.converged) and bool(p.converged)
    assert int(p.niter) == int(s.niter)
    np.testing.assert_allclose(float(p.aux["heldout_rel_err"]),
                               float(s.aux["heldout_rel_err"]),
                               rtol=1e-4)
    assert np.asarray(p.x).shape == (m, k)


def test_sharded_streaming_mixed_kl_matches_single(mesh8):
    """Mixed-precision KL through the SHARDED streaming epoch == the
    single-device fused streamer (round-4 factor_dtype extension)."""
    import jax
    import jax.numpy as jnp

    m, n, k, chunk = 1024, 64, 4, 128
    rng = np.random.default_rng(112)
    y16 = jnp.asarray(np.maximum(
        rng.uniform(0, 1, (m, k)) @ rng.uniform(0, 1, (k, n))
        + 0.01 * rng.normal(size=(m, n)), 0).astype(np.float32)
    ).astype(jnp.bfloat16)
    x0 = rng.uniform(0.1, 1, (m, k)).astype(np.float32)
    d0 = rng.uniform(0.1, 1, (k, n)).astype(np.float32)

    def loader(lo, hi):
        return jax.lax.dynamic_slice(y16, (lo, 0), (chunk, n))

    kw = dict(tol=0.0, maxiter=10, method="kl-mu", chunk_rows=chunk,
              n_samples=m, n_channels=n, dtype=jnp.bfloat16,
              factor_dtype=jnp.float32, precision="default")
    s = decomp_tpu.nmf.solve_streaming(loader, d0, x=x0, x_device=True,
                                       jit_loader=True, **kw)
    p = parallel.nmf.solve_streaming(loader, d0, x=x0, mesh=mesh8, **kw)
    assert p.x.dtype == jnp.float32 and p.d.dtype == jnp.float32
    assert rel_err(p.d, s.d) < 1e-5
    assert rel_err(p.x, s.x) < 1e-5


def test_sharded_heldout_small_budget_and_in_jit_draw(mesh8):
    """Two round-4 fixes in one: (a) the sharded heldout warm-up floor
    clamps to the budget (maxiter < 2*check_every can still report
    convergence), and (b) the validation reserve is now drawn INSIDE
    the jitted sharded solve under a sharding constraint (the old eager
    entry-level draw materialised full-size unsharded arrays on one
    device — pod-scale OOM); the partitionable threefry keeps the drawn
    set IDENTICAL, so lockstep with the single-device solver must
    hold exactly."""
    rng = np.random.default_rng(72)
    m, n, k = 64, 40, 4
    y = (rng.uniform(0, 1, (m, k)) @ rng.uniform(0, 1, (k, n))
         ).astype(np.float32)
    mask = (rng.random((m, n)) > 0.3).astype(np.float32)
    x0 = rng.uniform(0.1, 1, (m, k)).astype(np.float32)
    d0 = rng.uniform(0.1, 1, (k, n)).astype(np.float32)
    kw = dict(x=x0, mask=mask, tol=1e9, maxiter=40, stop="heldout",
              random_seed=1)
    single = decomp_tpu.nmf.solve(y * mask, d0, **kw)
    shard = parallel.nmf.solve(y * mask, d0, mesh=mesh8,
                               row_axis="rows", **kw)
    assert bool(shard.converged) and bool(single.converged)
    assert int(shard.niter) == int(single.niter)
    assert np.isclose(float(shard.aux["heldout_rel_err"]),
                      float(single.aux["heldout_rel_err"]), rtol=1e-5)


# ---------------------------------------------------------------------------
# Multi-slice (hierarchical tuple-axis) tier: every parallel.* solver
# accepts a TUPLE of mesh axis names for its row/sample axis — the
# pod-of-pods layout where an outer axis spans DCN-connected slices and
# the inner axis spans each slice's ICI ring (parallel.mesh docstring).
# Tuple-axis solves must equal the flat-axis sharded solve AND the
# single-device solve to fp tolerance, with the same stop iterations.


@pytest.fixture(scope="module")
def mesh2x4():
    return parallel.make_mesh((2, 4), axis_names=("slice", "rows"))


@pytest.fixture(scope="module")
def mesh2x2x2():
    return parallel.make_mesh((2, 2, 2),
                              axis_names=("slice", "rows", "cols"))


@pytest.mark.parametrize("masked", [False, True])
def test_multislice_nmf_matches_single_and_flat(mesh8, mesh2x4, masked):
    y, *_ = planted_nmf(seed=201, n_samples=64, n_channels=40, rank=5)
    mask = random_mask(202, y.shape) if masked else None
    x0, d0 = _init(203, 64, 40, 5)
    kw = dict(x=x0, tol=0.0, maxiter=30, mask=mask)
    ref = decomp_tpu.nmf.solve(y, d0, **kw)
    flat = parallel.nmf.solve(y, d0, mesh=mesh8, **kw)
    hier = parallel.nmf.solve(y, d0, mesh=mesh2x4,
                              row_axis=("slice", "rows"), **kw)
    assert rel_err(hier.x, ref.x) < 1e-12
    assert rel_err(hier.d, ref.d) < 1e-12
    assert rel_err(hier.x, flat.x) < 1e-12
    assert int(hier.niter) == int(ref.niter)


def test_multislice_nmf_row_tuple_plus_col_axis(mesh2x2x2):
    """3-axis mesh: the sample axis shards hierarchically over
    ('slice', 'rows') while the channel axis shards over 'cols' — the
    statistic psums name all three axes."""
    y, *_ = planted_nmf(seed=204, n_samples=64, n_channels=40, rank=5)
    x0, d0 = _init(205, 64, 40, 5)
    ref = decomp_tpu.nmf.solve(y, d0, x=x0, tol=0.0, maxiter=30)
    res = parallel.nmf.solve(y, d0, x=x0, tol=0.0, maxiter=30,
                             mesh=mesh2x2x2, row_axis=("slice", "rows"),
                             col_axis="cols")
    assert rel_err(res.x, ref.x) < 1e-12
    assert rel_err(res.d, ref.d) < 1e-12


def test_multislice_nmf_heldout_lockstep(mesh2x4):
    """stop='heldout' with a tuple row axis: the validation reserve is
    the identical global draw and the error allreduces over both axes,
    BUT the hierarchical psum's two-stage reduction order differs from
    the single-device sum — at a plateau boundary the fp difference can
    move the verdict by one check interval (25 here), never more. All
    devices within the tuple-axis run still stop together (the scalar is
    allreduced), which is the lockstep that matters."""
    rng = np.random.default_rng(206)
    m, n, k = 160, 64, 4
    ytrue = (rng.uniform(0, 1, (m, k)) @ rng.uniform(0, 1, (k, n))
             + 0.02 * rng.normal(size=(m, n))).astype(np.float32)
    mask = (rng.random((m, n)) >= 0.3).astype(np.float32)
    x0 = rng.uniform(0.1, 1, (m, k)).astype(np.float32)
    d0 = rng.uniform(0.1, 1, (k, n)).astype(np.float32)
    kw = dict(mask=mask, tol=1e-3, maxiter=2000, stop="heldout",
              random_seed=3)
    s = decomp_tpu.nmf.solve(ytrue * mask, d0, x=x0, **kw)
    p = parallel.nmf.solve(ytrue * mask, d0, x=x0, mesh=mesh2x4,
                           row_axis=("slice", "rows"), **kw)
    assert bool(p.converged) and bool(s.converged)
    assert abs(int(p.niter) - int(s.niter)) <= 25  # one check interval
    np.testing.assert_allclose(float(p.aux["heldout_rel_err"]),
                               float(s.aux["heldout_rel_err"]), rtol=1e-2)


@pytest.mark.parametrize("per_problem", [False, True])
def test_multislice_lasso_matches_single_device(mesh2x4, per_problem):
    rng = np.random.default_rng(207)
    a = rng.normal(size=(24, 96))
    y = rng.normal(size=(16, 96)) * (10.0 ** rng.uniform(-2, 1,
                                                         size=(16, 1)))
    kw = dict(tol=1e-6, maxiter=3000, method="fista",
              per_problem=per_problem)
    ref = decomp_tpu.lasso.solve(y, a, 0.05, **kw)
    res = parallel.lasso.solve(y, a, 0.05, mesh=mesh2x4,
                               axis=("slice", "rows"), **kw)
    np.testing.assert_array_equal(np.asarray(res.niter),
                                  np.asarray(ref.niter))
    assert rel_err(res.x, ref.x) < 1e-12


@pytest.mark.parametrize("masked", [False, True])
def test_multislice_dictionary_learning(mesh2x4, masked):
    y, a, _ = planted_lasso(seed=208, n_samples=16)
    mask = random_mask(209, y.shape) if masked else None
    rng = np.random.default_rng(210)
    d0 = rng.normal(size=a.shape)
    kw = dict(tol=0.0, maxiter=8, lasso_iter=5, mask=mask)
    ref = decomp_tpu.dictionary_learning.solve(y, d0, 0.05, **kw)
    res = parallel.dictionary_learning.solve(y, d0, 0.05, mesh=mesh2x4,
                                             axis=("slice", "rows"), **kw)
    assert rel_err(res.x, ref.x) < 1e-10
    assert rel_err(res.d, ref.d) < 1e-10


def test_multislice_streaming_nmf_matches_single(mesh2x4):
    """The sharded out-of-core fused epoch with a tuple row axis: each
    device's global row offset comes from the FLATTENED
    axis_index(('slice', 'rows')), so loader windows tile the global
    range exactly as with a flat axis."""
    y, _, x0, d0, loader, _ = _stream_problem(211, 512, 64, 4, 64)
    kw = dict(tol=0.0, maxiter=10, chunk_rows=64, n_samples=512,
              n_channels=64, dtype=np.float32)
    ref = decomp_tpu.nmf.solve_streaming(loader, d0, x=x0, x_device=True,
                                         jit_loader=True, **kw)
    res = parallel.nmf.solve_streaming(loader, d0, x=x0, mesh=mesh2x4,
                                       row_axis=("slice", "rows"), **kw)
    assert rel_err(res.d, ref.d) < 1e-5
    assert rel_err(res.x, ref.x) < 1e-5


def test_multislice_streaming_dl_matches_single(mesh2x4):
    """Sharded out-of-core dictionary learning over a tuple row axis."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(212)
    m, n, k, chunk = 256, 48, 6, 32
    y = rng.normal(size=(m, n)).astype(np.float32)
    d0 = rng.normal(size=(k, n)).astype(np.float32)
    yd = jnp.asarray(y)

    def loader(lo, hi):
        return jax.lax.dynamic_slice(yd, (lo, 0), (chunk, n))

    kw = dict(tol=0.0, maxiter=6, lasso_iter=5, chunk_rows=chunk,
              n_samples=m, n_channels=n, dtype=np.float32)
    ref = decomp_tpu.dictionary_learning.solve_streaming(
        loader, d0, 0.05, jit_loader=True, **kw)
    res = parallel.dictionary_learning.solve_streaming(
        loader, d0, 0.05, mesh=mesh2x4, row_axis=("slice", "rows"), **kw)
    assert rel_err(res.d, ref.d) < 1e-5
    assert rel_err(res.x, ref.x) < 1e-5


def test_multislice_shard_rows_and_pre_placed(mesh2x4):
    """parallel.shard_rows with a tuple axis places the leading axis over
    the combined extent; pre-placed global arrays solve unchanged."""
    y, *_ = planted_nmf(seed=213, n_samples=64, n_channels=40, rank=4)
    x0, d0 = _init(214, 64, 40, 4)
    y_s = parallel.shard_rows(np.asarray(y), mesh2x4, ("slice", "rows"))
    assert y_s.sharding.spec[0] == ("slice", "rows")
    ref = decomp_tpu.nmf.solve(y, d0, x=x0, tol=0.0, maxiter=20)
    res = parallel.nmf.solve(y_s, d0, x=x0, tol=0.0, maxiter=20,
                             mesh=mesh2x4, row_axis=("slice", "rows"))
    assert rel_err(res.x, ref.x) < 1e-12


def test_multislice_validation_errors(mesh2x4, mesh2x2x2):
    y, *_ = planted_nmf(seed=215, n_samples=64, n_channels=40, rank=4)
    err = decomp_tpu.utils.DecompError
    with pytest.raises(err, match="repeats"):
        parallel.nmf.solve(y, rank=4, mesh=mesh2x4,
                           row_axis=("rows", "rows"))
    with pytest.raises(err, match="not in mesh"):
        parallel.nmf.solve(y, rank=4, mesh=mesh2x4,
                           row_axis=("slice", "cols"))
    with pytest.raises(err, match="at least one"):
        parallel.nmf.solve(y, rank=4, mesh=mesh2x4, row_axis=())
    with pytest.raises(err, match="share a mesh axis"):
        parallel.nmf.solve(y, rank=4, mesh=mesh2x2x2,
                           row_axis=("slice", "rows", "cols"),
                           col_axis="cols")
    # non-string, non-sequence axes raise the library's typed error,
    # not a bare TypeError (code-review round 5)
    with pytest.raises(err, match="axis name"):
        parallel.nmf.solve(y, rank=4, mesh=mesh2x4, row_axis=None)
    with pytest.raises(err, match="strings"):
        parallel.lasso.solve(y, np.ones((4, 40)), 0.1, mesh=mesh2x4,
                             axis=("slice", 0))
    # lists are accepted and normalised to tuples (jit static args must
    # be hashable)
    x0, d0 = _init(216, 64, 40, 4)
    res = parallel.nmf.solve(y, d0, x=x0, tol=0.0, maxiter=5,
                             mesh=mesh2x4, row_axis=["slice", "rows"])
    ref = decomp_tpu.nmf.solve(y, d0, x=x0, tol=0.0, maxiter=5)
    assert rel_err(res.x, ref.x) < 1e-12


def test_make_multislice_mesh(mesh8):
    """make_multislice_mesh groups devices by slice (explicit n_slices
    on virtual devices) and the resulting tuple-axis solve matches
    single-device."""
    err = decomp_tpu.utils.DecompError
    msh = parallel.make_multislice_mesh(n_slices=2)
    assert dict(msh.shape) == {"slice": 2, "rows": 4}
    # inferred grouping: all 8 virtual devices report process 0 ->
    # one slice of 8
    inferred = parallel.make_multislice_mesh()
    assert dict(inferred.shape)["slice"] == 1
    with pytest.raises(err, match="does not divide"):
        parallel.make_multislice_mesh(n_slices=3)
    with pytest.raises(err, match="exactly two axes"):
        parallel.make_multislice_mesh(axis_names=("a", "b", "c"))

    y, *_ = planted_nmf(seed=217, n_samples=64, n_channels=40, rank=4)
    x0, d0 = _init(218, 64, 40, 4)
    ref = decomp_tpu.nmf.solve(y, d0, x=x0, tol=0.0, maxiter=10)
    res = parallel.nmf.solve(y, d0, x=x0, tol=0.0, maxiter=10, mesh=msh,
                             row_axis=("slice", "rows"))
    assert rel_err(res.x, ref.x) < 1e-12


def test_multislice_streaming_lasso(mesh2x4):
    """parallel.lasso.solve_streaming over a tuple axis: chunks
    row-shard over the combined ('slice', 'rows') extent."""
    rng = np.random.default_rng(219)
    m, f, ch = 256, 24, 32
    a = rng.normal(size=(f, ch)).astype(np.float32)
    y = (rng.normal(size=(m, f)) @ a
         + 0.01 * rng.normal(size=(m, ch))).astype(np.float32)
    core = decomp_tpu.lasso.solve(y, a, 0.05, tol=1e-5, maxiter=600,
                                  method="fista", per_problem=True)
    stream = parallel.lasso.solve_streaming(
        y, a, 0.05, mesh=mesh2x4, axis=("slice", "rows"), tol=1e-5,
        maxiter=600, method="fista", chunk_rows=64, per_problem=True,
        use_pallas=False)
    assert rel_err(stream.x, core.x) < 1e-4
    assert np.asarray(stream.converged).all()
