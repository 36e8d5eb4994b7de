"""Checkpoint/resume tier (SURVEY.md §5): chunked solves snapshot warm-start
fields atomically and resume to the same answer."""

import numpy as np
import pytest

import decomp_tpu
from decomp_tpu.utils.checkpoint import CheckpointManager, checkpointed_solve
from problems import planted_nmf, rel_err


def _problem():
    y, *_ = planted_nmf(seed=30, n_samples=60, n_channels=40, rank=4)
    rng = np.random.default_rng(31)
    x0 = rng.uniform(0.1, 1.0, (60, 4))
    d0 = rng.uniform(0.1, 1.0, (4, 40))
    return y, x0, d0


def test_chunked_matches_straight_run(tmp_path):
    y, x0, d0 = _problem()
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    res, total = checkpointed_solve(
        decomp_tpu.nmf.solve, y, manager=mgr, chunk_iters=25, maxiter=100,
        tol=0.0, d=d0, x=x0)
    assert total == 100
    straight = decomp_tpu.nmf.solve(y, d0, x=x0, tol=0.0, maxiter=100)
    assert rel_err(res.d, straight.d) < 1e-12
    assert rel_err(res.x, straight.x) < 1e-12


def test_resume_after_interruption(tmp_path):
    y, x0, d0 = _problem()
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    # "crash" after 50 of 100 iterations
    checkpointed_solve(decomp_tpu.nmf.solve, y, manager=mgr, chunk_iters=25,
                       maxiter=50, tol=0.0, d=d0, x=x0)
    assert mgr.exists()
    step, state = mgr.load()
    assert step == 50 and set(state) == {"x", "d"}
    # resume to 100 in a fresh "session"
    res, total = checkpointed_solve(
        decomp_tpu.nmf.solve, y, manager=mgr, chunk_iters=25, maxiter=100,
        tol=0.0, d=d0, x=x0)
    assert total == 100
    straight = decomp_tpu.nmf.solve(y, d0, x=x0, tol=0.0, maxiter=100)
    assert rel_err(res.d, straight.d) < 1e-12


def test_stops_on_convergence(tmp_path):
    y, x0, d0 = _problem()
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    res, total = checkpointed_solve(
        decomp_tpu.nmf.solve, y, manager=mgr, chunk_iters=2000,
        maxiter=100000, tol=1e-5, d=d0, x=x0)
    assert bool(res.converged)
    assert total < 100000


def test_lasso_checkpointing(tmp_path):
    rng = np.random.default_rng(32)
    a = rng.normal(size=(16, 24))
    y = rng.normal(size=(8, 24))
    mgr = CheckpointManager(str(tmp_path / "lasso"))
    # ISTA is Markovian in x, so chunked == straight exactly. (FISTA's
    # momentum restarts at chunk boundaries — still correct, just slower.)
    res, total = checkpointed_solve(
        decomp_tpu.lasso.solve, y, a, 0.05, manager=mgr, chunk_iters=10,
        maxiter=40, tol=0.0, method="ista", warm_fields=("x",))
    straight = decomp_tpu.lasso.solve(y, a, 0.05, tol=0.0, maxiter=40,
                                      method="ista")
    assert total == 40
    assert rel_err(res.x, straight.x) < 1e-12


def test_default_warm_fields_adapt_to_solver(tmp_path):
    """warm_fields defaults to auto-derivation: lasso (whose result has
    no `d`) must checkpoint with NO warm_fields argument (code-review
    finding: the old ("x", "d") default died with AttributeError on the
    first chunk), and a factor passed positionally where the auto
    machinery would have to re-inject it raises a usable DecompError
    instead of a TypeError on the second chunk."""
    rng = np.random.default_rng(57)
    a = rng.normal(size=(16, 24))
    y = rng.normal(size=(8, 24))
    mgr = CheckpointManager(str(tmp_path / "auto"))
    res, total = checkpointed_solve(
        decomp_tpu.lasso.solve, y, a, 0.05, manager=mgr, chunk_iters=10,
        maxiter=40, tol=0.0, method="ista")
    straight = decomp_tpu.lasso.solve(y, a, 0.05, tol=0.0, maxiter=40,
                                      method="ista")
    assert total == 40
    assert rel_err(res.x, straight.x) < 1e-12
    # NMF with d= keyword still threads both factors by default
    yn, x0, d0 = _problem()
    mgr2 = CheckpointManager(str(tmp_path / "auto_nmf"))
    resn, _ = checkpointed_solve(
        decomp_tpu.nmf.solve, yn, manager=mgr2, chunk_iters=25,
        maxiter=100, tol=0.0, d=d0, x=x0)
    straightn = decomp_tpu.nmf.solve(yn, d0, x=x0, tol=0.0, maxiter=100)
    assert rel_err(resn.d, straightn.d) < 1e-12
    # dictionary learning's d is positional: clear host-side error
    d0l = rng.normal(size=(4, 24)).astype(np.float64)
    with pytest.raises(decomp_tpu.utils.DecompError, match="keyword"):
        checkpointed_solve(
            decomp_tpu.dictionary_learning.solve, y, d0l, 0.05,
            manager=CheckpointManager(str(tmp_path / "dl")),
            chunk_iters=5, maxiter=10, tol=0.0)


@pytest.mark.parametrize("method", ["fista", "acc_ista"])
def test_momentum_state_exact_resume(method):
    """Direct API: (z, t) from aux continues the exact trajectory."""
    rng = np.random.default_rng(33)
    a = rng.normal(size=(16, 24))
    y = rng.normal(size=(8, 24))
    straight = decomp_tpu.lasso.solve(y, a, 0.05, tol=0.0, maxiter=40,
                                      method=method)
    r1 = decomp_tpu.lasso.solve(y, a, 0.05, tol=0.0, maxiter=20,
                                method=method, return_state=True)
    r2 = decomp_tpu.lasso.solve(y, a, 0.05, x=r1.x, tol=0.0, maxiter=20,
                                method=method,
                                momentum_state=(r1.aux["z"], r1.aux["t"]))
    np.testing.assert_array_equal(np.asarray(r2.x), np.asarray(straight.x))


def test_momentum_state_exact_resume_complex_split():
    rng = np.random.default_rng(34)
    a = (rng.normal(size=(12, 20)) + 1j * rng.normal(size=(12, 20)))
    y = (rng.normal(size=(6, 20)) + 1j * rng.normal(size=(6, 20)))
    straight = decomp_tpu.lasso.solve(y, a, 0.05, tol=0.0, maxiter=30,
                                      method="fista", complex_split=True)
    r1 = decomp_tpu.lasso.solve(y, a, 0.05, tol=0.0, maxiter=15,
                                method="fista", complex_split=True,
                                return_state=True)
    r2 = decomp_tpu.lasso.solve(y, a, 0.05, x=r1.x, tol=0.0, maxiter=15,
                                method="fista", complex_split=True,
                                momentum_state=(r1.aux["z"], r1.aux["t"]))
    np.testing.assert_array_equal(np.asarray(r2.x), np.asarray(straight.x))


@pytest.mark.parametrize("method", ["fista", "acc_ista"])
def test_chunked_fista_matches_straight_exactly(tmp_path, method):
    """checkpointed_solve threads (z, t) between chunks: chunked momentum
    runs reproduce the uninterrupted trajectory bit-for-bit (VERDICT.md
    round-1 Weak #3)."""
    rng = np.random.default_rng(35)
    a = rng.normal(size=(16, 24))
    y = rng.normal(size=(8, 24))
    mgr = CheckpointManager(str(tmp_path / "fista"))
    res, total = checkpointed_solve(
        decomp_tpu.lasso.solve, y, a, 0.05, manager=mgr, chunk_iters=10,
        maxiter=40, tol=0.0, method=method, warm_fields=("x",))
    straight = decomp_tpu.lasso.solve(y, a, 0.05, tol=0.0, maxiter=40,
                                      method=method)
    assert total == 40
    np.testing.assert_array_equal(np.asarray(res.x), np.asarray(straight.x))
    # interruption: a fresh session resumes from the .npz (z, t) included
    mgr2 = CheckpointManager(str(tmp_path / "fista2"))
    checkpointed_solve(decomp_tpu.lasso.solve, y, a, 0.05, manager=mgr2,
                       chunk_iters=10, maxiter=20, tol=0.0, method=method,
                       warm_fields=("x",))
    res2, total2 = checkpointed_solve(
        decomp_tpu.lasso.solve, y, a, 0.05, manager=mgr2, chunk_iters=10,
        maxiter=40, tol=0.0, method=method, warm_fields=("x",))
    assert total2 == 40
    np.testing.assert_array_equal(np.asarray(res2.x),
                                  np.asarray(straight.x))


def test_checkpointed_solve_per_problem_compatible():
    """checkpointed_solve must not inject return_state when per_problem is
    requested (the solver rejects the combination) nor override an
    explicit return_state=False (round-2 self-review)."""
    rng = np.random.default_rng(37)
    a = rng.normal(size=(8, 16))
    y = rng.normal(size=(4, 16))
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        mgr = CheckpointManager(tmp + "/pp")
        res, total = checkpointed_solve(
            decomp_tpu.lasso.solve, y, a, 0.05, manager=mgr,
            chunk_iters=10, maxiter=20, tol=0.0, method="ista",
            warm_fields=("x",), per_problem=True)
        assert total == 20
        assert np.asarray(res.niter).shape == (4,)
        mgr2 = CheckpointManager(tmp + "/rs")
        res2, _ = checkpointed_solve(
            decomp_tpu.lasso.solve, y, a, 0.05, manager=mgr2,
            chunk_iters=10, maxiter=20, tol=0.0, method="fista",
            warm_fields=("x",), return_state=False)
        assert res2.aux is None


def test_momentum_state_validation():
    rng = np.random.default_rng(36)
    a = rng.normal(size=(8, 12))
    y = rng.normal(size=(4, 12))
    z = np.zeros((4, 8))
    with pytest.raises(decomp_tpu.utils.DecompError):
        decomp_tpu.lasso.solve(y, a, 0.05, method="ista",
                               momentum_state=(z, 1.0))
    with pytest.raises(decomp_tpu.utils.DecompError):
        # momentum_state without the warm start x
        decomp_tpu.lasso.solve(y, a, 0.05, method="fista",
                               momentum_state=(z, 1.0))


def test_exhausted_budget_raises(tmp_path):
    y, x0, d0 = _problem()
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    checkpointed_solve(decomp_tpu.nmf.solve, y, manager=mgr, chunk_iters=10,
                       maxiter=10, tol=0.0, d=d0, x=x0)
    with pytest.raises(RuntimeError):
        checkpointed_solve(decomp_tpu.nmf.solve, y, manager=mgr,
                           chunk_iters=10, maxiter=10, tol=0.0, d=d0, x=x0)


def test_streaming_solve_checkpoint_composes(tmp_path):
    """checkpointed_solve x solve_streaming: the out-of-core path (the one
    whose runs are long enough to NEED checkpointing at pod scale) resumes
    exactly — MU streaming is Markovian in (x, d), so chunked budgets
    reproduce the uninterrupted epoch trajectory bit-for-bit."""
    y, x0, d0 = _problem()  # 60 x 40 rank 4
    straight = decomp_tpu.nmf.solve_streaming(
        y, d0, x=x0, tol=0.0, maxiter=12, chunk_rows=30)
    mgr = CheckpointManager(str(tmp_path / "stream"))
    res, total = checkpointed_solve(
        decomp_tpu.nmf.solve_streaming, y, manager=mgr, chunk_iters=4,
        maxiter=12, tol=0.0, d=d0, x=x0, chunk_rows=30)
    assert total == 12
    np.testing.assert_array_equal(np.asarray(res.d), np.asarray(straight.d))
    np.testing.assert_array_equal(np.asarray(res.x), np.asarray(straight.x))
    # interruption: a fresh "session" picks up from the .npz mid-run
    mgr2 = CheckpointManager(str(tmp_path / "stream2"))
    checkpointed_solve(
        decomp_tpu.nmf.solve_streaming, y, manager=mgr2, chunk_iters=4,
        maxiter=8, tol=0.0, d=d0, x=x0, chunk_rows=30)
    assert mgr2.exists()
    res2, total2 = checkpointed_solve(
        decomp_tpu.nmf.solve_streaming, y, manager=mgr2, chunk_iters=4,
        maxiter=12, tol=0.0, d=d0, x=x0, chunk_rows=30)
    assert total2 == 12
    np.testing.assert_array_equal(np.asarray(res2.d),
                                  np.asarray(straight.d))


def test_streaming_jit_loader_checkpoint_composes(tmp_path):
    """Same composition through the fused jit_loader epoch (callable
    loader + device-resident x): the pod-scale configuration checkpoints
    and resumes exactly. The loader is module-level-stable across calls,
    so the compiled epoch is reused (cache-key contract)."""
    import jax.numpy as jnp

    y, x0, d0 = _problem()
    yj = jnp.asarray(y.astype(np.float32))

    def loader(lo, hi):
        import jax.lax as lax
        return lax.dynamic_slice_in_dim(yj, lo, 30, axis=0)

    kw = dict(rank=4, n_samples=60, n_channels=40, dtype=np.float32,
              chunk_rows=30, jit_loader=True, x_device=True, tol=0.0)
    straight = decomp_tpu.nmf.solve_streaming(
        loader, d0.astype(np.float32), x=x0.astype(np.float32),
        maxiter=12, **kw)
    mgr = CheckpointManager(str(tmp_path / "jstream"))
    res, total = checkpointed_solve(
        decomp_tpu.nmf.solve_streaming, loader, manager=mgr,
        chunk_iters=4, maxiter=12, d=d0.astype(np.float32),
        x=x0.astype(np.float32), **kw)
    assert total == 12
    np.testing.assert_array_equal(np.asarray(res.d), np.asarray(straight.d))
    np.testing.assert_array_equal(np.asarray(res.x), np.asarray(straight.x))


@pytest.mark.parametrize("method", ["ista", "fista"])
def test_chunked_per_problem_matches_straight(tmp_path, method):
    """checkpointed_solve + per_problem + state dict: chunked runs equal
    the uninterrupted one per-row — frozen rows stay frozen across chunk
    boundaries and the cumulative per-row niter matches (VERDICT.md
    round-2 Missing #5 / ADVICE #3)."""
    rng = np.random.default_rng(40)
    a = (rng.normal(size=(24, 32)) / np.sqrt(32)).astype(np.float32)
    xt = (rng.normal(size=(10, 24))
          * (rng.random((10, 24)) < 0.3)).astype(np.float32)
    y = (xt @ a + 0.01 * rng.normal(size=(10, 32))).astype(np.float32)
    straight = decomp_tpu.lasso.solve(y, a, 0.02, tol=2e-4, maxiter=400,
                                      method=method, per_problem=True)
    # mixed-difficulty check: some rows converge well before others
    nit_s = np.asarray(straight.niter)
    assert nit_s.min() < nit_s.max()
    mgr = CheckpointManager(str(tmp_path / "pp"))
    res, total = checkpointed_solve(
        decomp_tpu.lasso.solve, y, a, 0.02, manager=mgr, chunk_iters=60,
        maxiter=400, tol=2e-4, method=method, per_problem=True,
        warm_fields=("x",))
    np.testing.assert_array_equal(np.asarray(res.x), np.asarray(straight.x))
    np.testing.assert_array_equal(np.asarray(res.niter), nit_s)
    # the budget charged equals the loop iterations a straight run does
    assert total == int(nit_s.max())
    # interruption mid-run, fresh session resumes per-row
    mgr2 = CheckpointManager(str(tmp_path / "pp2"))
    checkpointed_solve(
        decomp_tpu.lasso.solve, y, a, 0.02, manager=mgr2, chunk_iters=60,
        maxiter=120, tol=2e-4, method=method, per_problem=True,
        warm_fields=("x",))
    res2, total2 = checkpointed_solve(
        decomp_tpu.lasso.solve, y, a, 0.02, manager=mgr2, chunk_iters=60,
        maxiter=400, tol=2e-4, method=method, per_problem=True,
        warm_fields=("x",))
    np.testing.assert_array_equal(np.asarray(res2.x),
                                  np.asarray(straight.x))
    np.testing.assert_array_equal(np.asarray(res2.niter), nit_s)


def test_chunked_sharded_streaming_matches_straight(tmp_path):
    """checkpointed_solve x parallel.nmf.solve_streaming: the POD
    configuration (sharded + out-of-core) checkpoints and resumes
    exactly — chunked budgets on the 8-device mesh equal the
    uninterrupted sharded run bit-for-bit, and a mid-run 'crash'
    resumes from the npz. Sharded in-core DL is exercised the same way
    (its result carries both warm fields)."""
    import jax.numpy as jnp

    from decomp_tpu import parallel

    mesh = parallel.make_mesh(axis_names=("rows",))
    rng = np.random.default_rng(33)
    m, n, k, chunk = 64, 40, 4, 8
    y = np.abs(rng.normal(size=(m, n))).astype(np.float32)
    yj = jnp.asarray(y)

    def loader(lo, hi):
        import jax.lax as lax
        return lax.dynamic_slice_in_dim(yj, lo, 8, axis=0)

    x0 = rng.uniform(0.1, 1.0, (m, k)).astype(np.float32)
    d0 = rng.uniform(0.1, 1.0, (k, n)).astype(np.float32)
    kw = dict(mesh=mesh, tol=0.0, maxiter=12, chunk_rows=chunk,
              n_samples=m, n_channels=n, dtype=np.float32)
    straight = parallel.nmf.solve_streaming(loader, d0, x=x0, **kw)

    mgr = CheckpointManager(str(tmp_path / "shstream"))
    ckw = dict(kw)
    del ckw["maxiter"]
    res, total = checkpointed_solve(
        parallel.nmf.solve_streaming, loader, manager=mgr, chunk_iters=4,
        maxiter=12, d=d0, x=x0, **ckw)
    assert total == 12
    np.testing.assert_array_equal(np.asarray(res.d), np.asarray(straight.d))
    np.testing.assert_array_equal(np.asarray(res.x), np.asarray(straight.x))

    # crash after 8 of 12, resume from the manager file
    mgr2 = CheckpointManager(str(tmp_path / "shstream2"))
    checkpointed_solve(parallel.nmf.solve_streaming, loader, manager=mgr2,
                       chunk_iters=4, maxiter=8, d=d0, x=x0, **ckw)
    assert mgr2.exists()
    res2, total2 = checkpointed_solve(
        parallel.nmf.solve_streaming, loader, manager=mgr2, chunk_iters=4,
        maxiter=12, d=d0, x=x0, **ckw)
    assert total2 == 12
    np.testing.assert_array_equal(np.asarray(res2.d),
                                  np.asarray(straight.d))

    # sharded in-core dictionary learning through the same driver
    a0 = rng.normal(size=(6, n)).astype(np.float32)
    dl_straight = parallel.dictionary_learning.solve(
        y, a0, 0.05, mesh=mesh, tol=0.0, maxiter=6, lasso_iter=3)
    mgr3 = CheckpointManager(str(tmp_path / "shdl"))
    dl_res, dl_total = checkpointed_solve(
        parallel.dictionary_learning.solve, y, manager=mgr3,
        chunk_iters=2, maxiter=6, d=a0, alpha=0.05, mesh=mesh, tol=0.0,
        lasso_iter=3)
    assert dl_total == 6
    # not bit-exact: the DL entry re-normalizes the warm-started d
    # (unit rows divided by their ~1.0 norm shift low bits at each
    # chunk boundary) — trajectory-equal to fp tolerance
    np.testing.assert_allclose(np.asarray(dl_res.d),
                               np.asarray(dl_straight.d),
                               rtol=1e-4, atol=1e-6)
