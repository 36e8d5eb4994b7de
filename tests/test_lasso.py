"""Lasso tests (SURVEY.md §4): trajectory parity vs the NumPy reference per
method x dtype x mask (the reference's main coverage axis), cross-method
consistency on the convex problem, KKT optimality, batching/vmap."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import decomp_tpu
import reference_impl as ref
from problems import planted_lasso, random_mask, rel_err

ALPHA = 0.05


@pytest.mark.parametrize("method", ["ista", "fista", "acc_ista", "cd",
                                    "parallel_cd"])
@pytest.mark.parametrize("complex_", [False, True])
def test_trajectory_parity(method, complex_):
    y, a, _ = planted_lasso(seed=1, complex_=complex_)
    x_ref, it_ref, conv_ref, _ = ref.lasso(
        y, a, ALPHA, tol=0.0, maxiter=40, method=method)
    res = decomp_tpu.lasso.solve(y, a, ALPHA, tol=0.0, maxiter=40,
                                 method=method)
    assert int(res.niter) == it_ref == 40
    assert rel_err(res.x, x_ref) < 1e-9


@pytest.mark.parametrize("method", ["ista", "fista", "acc_ista"])
def test_masked_trajectory_parity(method):
    y, a, _ = planted_lasso(seed=2)
    mask = random_mask(3, y.shape)
    x_ref, _, _, _ = ref.lasso(y * mask, a, ALPHA, tol=0.0, maxiter=40,
                               method=method, mask=mask)
    res = decomp_tpu.lasso.solve(y * mask, a, ALPHA, tol=0.0, maxiter=40,
                                 method=method, mask=mask)
    assert rel_err(res.x, x_ref) < 1e-9


@pytest.mark.parametrize("complex_", [False, True])
def test_cross_method_consistency(complex_):
    """Different methods on the same convex problem agree (SURVEY.md §4
    'a free oracle')."""
    y, a, _ = planted_lasso(seed=4, complex_=complex_)
    sols = {}
    for method in ["ista", "fista", "acc_ista", "cd", "parallel_cd"]:
        res = decomp_tpu.lasso.solve(y, a, ALPHA, tol=1e-12, maxiter=20000,
                                     method=method)
        assert bool(res.converged), method
        sols[method] = np.asarray(res.x)
    base = sols["cd"]
    for method, x in sols.items():
        assert rel_err(x, base) < 1e-4, method


def test_kkt_optimality():
    y, a, _ = planted_lasso(seed=5)
    res = decomp_tpu.lasso.solve(y, a, ALPHA, tol=1e-14, maxiter=50000,
                                 method="fista")
    x = np.asarray(res.x)
    grad = (x @ a - y) @ a.conj().T
    # where x != 0: grad = -alpha * sign(x); where x == 0: |grad| <= alpha
    nz = np.abs(x) > 1e-10
    np.testing.assert_allclose(grad[nz], -ALPHA * np.sign(x[nz]), atol=1e-6)
    assert np.all(np.abs(grad[~nz]) <= ALPHA + 1e-6)


def test_sparse_recovery():
    y, a, x_true = planted_lasso(seed=6, n_samples=4, n_features=32,
                                 n_channels=64, density=0.1, noise=1e-4)
    res = decomp_tpu.lasso.solve(y, a, 1e-3, tol=1e-12, maxiter=20000,
                                 method="fista")
    x = np.asarray(res.x)
    # support recovery: the large true coefficients are found
    big = np.abs(x_true) > 0.5
    assert np.all(np.abs(x[big]) > 0.1)
    assert rel_err(x, x_true) < 0.1


def test_1d_y_squeeze():
    y, a, _ = planted_lasso(seed=7)
    res1 = decomp_tpu.lasso.solve(y[0], a, ALPHA, maxiter=30, tol=0.0)
    res2 = decomp_tpu.lasso.solve(y[:1], a, ALPHA, maxiter=30, tol=0.0)
    assert res1.x.shape == (a.shape[0],)
    np.testing.assert_allclose(np.asarray(res1.x), np.asarray(res2.x[0]))


def test_warm_start_converges_immediately():
    y, a, _ = planted_lasso(seed=8)
    res = decomp_tpu.lasso.solve(y, a, ALPHA, tol=1e-13, maxiter=50000,
                                 method="fista")
    res2 = decomp_tpu.lasso.solve(y, a, ALPHA, x=res.x, tol=1e-6,
                                  maxiter=100, method="ista")
    assert bool(res2.converged)
    assert int(res2.niter) <= 3


def test_alpha_array_per_feature():
    y, a, _ = planted_lasso(seed=9)
    alphas = np.full((a.shape[0],), ALPHA)
    res_scalar = decomp_tpu.lasso.solve(y, a, ALPHA, maxiter=30, tol=0.0)
    res_array = decomp_tpu.lasso.solve(y, a, alphas, maxiter=30, tol=0.0)
    np.testing.assert_allclose(np.asarray(res_scalar.x),
                               np.asarray(res_array.x))


def test_vmap_over_dictionaries():
    """Batch solves over many independent problems with DIFFERENT
    dictionaries vmap cleanly (SURVEY.md §2b N4)."""
    problems = [planted_lasso(seed=s) for s in (10, 11, 12)]
    ys = jnp.stack([jnp.asarray(p[0]) for p in problems])
    as_ = jnp.stack([jnp.asarray(p[1]) for p in problems])

    def solve_one(y, a):
        return decomp_tpu.lasso.solve(y, a, ALPHA, maxiter=30, tol=0.0).x

    batched = jax.vmap(solve_one)(ys, as_)
    for i, (y, a, _) in enumerate(problems):
        single = decomp_tpu.lasso.solve(y, a, ALPHA, maxiter=30, tol=0.0).x
        np.testing.assert_allclose(np.asarray(batched[i]),
                                   np.asarray(single), rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("method", ["ista", "fista", "acc_ista",
                                    "parallel_cd"])
@pytest.mark.parametrize("masked", [False, True])
def test_complex_split_matches_native(method, masked):
    """The (re, im)-decomposed execution path (for TPU backends without
    complex support, SURVEY.md §7 hard part 5) matches the native complex
    path trajectory-for-trajectory."""
    y, a, _ = planted_lasso(seed=16, complex_=True)
    mask = random_mask(17, y.shape) if masked else None
    if mask is not None:
        y = y * mask
    native = decomp_tpu.lasso.solve(y, a, ALPHA, tol=0.0, maxiter=35,
                                    method=method, mask=mask,
                                    complex_split=False,
                                    record_objective=True)
    split = decomp_tpu.lasso.solve(y, a, ALPHA, tol=0.0, maxiter=35,
                                   method=method, mask=mask,
                                   complex_split=True,
                                   record_objective=True)
    assert split.x.dtype == native.x.dtype
    assert rel_err(split.x, native.x) < 1e-10
    np.testing.assert_allclose(np.asarray(split.objective),
                               np.asarray(native.objective), rtol=1e-9)


def test_complex_split_1d_and_warm_start():
    y, a, _ = planted_lasso(seed=18, complex_=True)
    r_full = decomp_tpu.lasso.solve(y, a, ALPHA, tol=1e-10, maxiter=5000,
                                    complex_split=True)
    r1 = decomp_tpu.lasso.solve(y[0], a, ALPHA, tol=0.0, maxiter=20,
                                complex_split=True)
    assert r1.x.shape == (a.shape[0],)
    r2 = decomp_tpu.lasso.solve(y, a, ALPHA, x=r_full.x, tol=1e-6,
                                maxiter=50, method="ista",
                                complex_split=True)
    assert bool(r2.converged) and int(r2.niter) <= 3


def test_complex_split_rejects_cd():
    y, a, _ = planted_lasso(seed=19, complex_=True)
    with pytest.raises(decomp_tpu.utils.DecompError):
        decomp_tpu.lasso.solve(y, a, ALPHA, method="cd", complex_split=True)


def test_objective_recording_matches_reference():
    y, a, _ = planted_lasso(seed=13)
    _, _, _, objs = ref.lasso(y, a, ALPHA, tol=0.0, maxiter=25,
                              method="fista")
    res = decomp_tpu.lasso.solve(y, a, ALPHA, tol=0.0, maxiter=25,
                                 method="fista", record_objective=True)
    np.testing.assert_allclose(np.asarray(res.objective), np.asarray(objs),
                               rtol=1e-9)


def test_zero_solution_for_huge_alpha():
    y, a, _ = planted_lasso(seed=14)
    res = decomp_tpu.lasso.solve(y, a, 1e6, tol=1e-8, maxiter=100)
    assert bool(res.converged)
    assert np.allclose(np.asarray(res.x), 0.0)


@pytest.mark.parametrize("method", ["ista", "fista", "acc_ista",
                                    "parallel_cd"])
def test_per_problem_matches_single_solves(method):
    """SURVEY.md §7 hard part 4: with per_problem=True a mixed-difficulty
    batch stops every row at its own iteration, frozen rows keep their
    stopping-point value, and each row matches an independent single-row
    solve (x, niter, converged)."""
    rng = np.random.default_rng(21)
    a = rng.normal(size=(24, 96))
    # Mixed difficulty: rows scaled over 3 orders of magnitude converge at
    # very different iterations under the relative-change criterion.
    y = rng.normal(size=(6, 96)) * (10.0 ** rng.uniform(-2, 1, size=(6, 1)))
    res = decomp_tpu.lasso.solve(y, a, ALPHA, tol=1e-6, maxiter=5000,
                                 method=method, per_problem=True)
    niter = np.asarray(res.niter)
    conv = np.asarray(res.converged)
    assert niter.shape == (6,) and conv.shape == (6,)
    assert conv.all()
    assert len(set(niter.tolist())) > 1, "rows should stop at different its"
    for i in range(y.shape[0]):
        ri = decomp_tpu.lasso.solve(y[i], a, ALPHA, tol=1e-6, maxiter=5000,
                                    method=method)
        assert int(ri.niter) == niter[i], i
        assert bool(ri.converged) == bool(conv[i])
        np.testing.assert_allclose(np.asarray(res.x[i]), np.asarray(ri.x),
                                   rtol=0, atol=1e-12)


def test_per_problem_masked():
    y, a, _ = planted_lasso(seed=22)
    mask = random_mask(23, y.shape)
    res = decomp_tpu.lasso.solve(y * mask, a, ALPHA, tol=1e-6, maxiter=5000,
                                 method="fista", mask=mask,
                                 per_problem=True)
    assert np.asarray(res.converged).all()
    for i in range(y.shape[0]):
        ri = decomp_tpu.lasso.solve(y[i] * mask[i], a, ALPHA, tol=1e-6,
                                    maxiter=5000, method="fista",
                                    mask=mask[i])
        assert int(ri.niter) == int(np.asarray(res.niter)[i])
        np.testing.assert_allclose(np.asarray(res.x[i]), np.asarray(ri.x),
                                   rtol=0, atol=1e-12)


@pytest.mark.parametrize("method", ["fista", "acc_ista"])
def test_per_problem_complex_split_matches_native(method):
    y, a, _ = planted_lasso(seed=24, complex_=True)
    native = decomp_tpu.lasso.solve(y, a, ALPHA, tol=1e-6, maxiter=5000,
                                    method=method, per_problem=True,
                                    complex_split=False)
    split = decomp_tpu.lasso.solve(y, a, ALPHA, tol=1e-6, maxiter=5000,
                                   method=method, per_problem=True,
                                   complex_split=True)
    np.testing.assert_array_equal(np.asarray(native.niter),
                                  np.asarray(split.niter))
    np.testing.assert_array_equal(np.asarray(native.converged),
                                  np.asarray(split.converged))
    assert rel_err(split.x, native.x) < 1e-10


def test_per_problem_runs_to_maxiter_at_tol_zero():
    y, a, _ = planted_lasso(seed=25)
    res = decomp_tpu.lasso.solve(y, a, ALPHA, tol=0.0, maxiter=17,
                                 method="fista", per_problem=True)
    np.testing.assert_array_equal(np.asarray(res.niter), 17)
    assert not np.asarray(res.converged).any()
    base = decomp_tpu.lasso.solve(y, a, ALPHA, tol=0.0, maxiter=17,
                                  method="fista")
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(base.x),
                               rtol=0, atol=0)


def test_per_problem_zero_rows_converge():
    """Rows whose solution is exactly zero (huge alpha / zero data) must
    mark done — the freeze predicate uses the division form because the
    product form (num < tol*tiny) flushes to 0 < 0 on TPU subnormals."""
    rng = np.random.default_rng(27)
    a = rng.normal(size=(8, 32))
    y = rng.normal(size=(4, 32))
    y[1] = 0.0  # exactly-zero problem
    res = decomp_tpu.lasso.solve(y, a, 1e6, tol=1e-6, maxiter=200,
                                 method="fista", per_problem=True)
    assert np.asarray(res.converged).all()
    assert np.allclose(np.asarray(res.x), 0.0)
    assert int(np.asarray(res.niter).max()) < 10


def test_per_problem_rejects_cd():
    y, a, _ = planted_lasso(seed=26)
    with pytest.raises(decomp_tpu.utils.DecompError):
        decomp_tpu.lasso.solve(y, a, ALPHA, method="cd", per_problem=True)


def test_validation_errors():
    y, a, _ = planted_lasso(seed=15)
    with pytest.raises(decomp_tpu.utils.DecompError):
        decomp_tpu.lasso.solve(y, a, ALPHA, method="nope")
    with pytest.raises(decomp_tpu.utils.ShapeError):
        decomp_tpu.lasso.solve(y, a.T, ALPHA)
    with pytest.raises(decomp_tpu.utils.DecompError):
        decomp_tpu.lasso.solve(y, a, ALPHA, method="cd",
                               mask=np.ones_like(y))


# ---------------------------------------------------------------------------
# Whole-solve Pallas kernel (ops.pallas_fista; VERDICT.md round-2 Next #1)
# and per-problem exact resume (Missing #5). Interpret mode on CPU.
# ---------------------------------------------------------------------------

def _whole_problem(m=320, f=256, n=160, seed=50):
    """Padding-free shape for the whole-solve kernel (F % 128 == 0 and one
    row stripe), so interpret-mode results are BIT-EXACT vs the jnp path
    (padding only changes fp reduction lengths)."""
    rng = np.random.default_rng(seed)
    a = (rng.normal(size=(f, n)) / np.sqrt(n)).astype(np.float32)
    xt = (rng.normal(size=(m, f))
          * (rng.random((m, f)) < 0.1)).astype(np.float32)
    y = (xt @ a + 0.01 * rng.normal(size=(m, n))).astype(np.float32)
    return y, a


@pytest.mark.parametrize("method", ["ista", "fista", "acc_ista",
                                    "parallel_cd"])
def test_whole_kernel_matches_jnp_bitexact(method):
    y, a = _whole_problem()
    ref = decomp_tpu.lasso.solve(y, a, 0.05, method=method, tol=1e-5,
                                 maxiter=300, per_problem=True,
                                 use_pallas=False)
    ker = decomp_tpu.lasso.solve(y, a, 0.05, method=method, tol=1e-5,
                                 maxiter=300, per_problem=True,
                                 use_pallas=True, _pallas_interpret=True)
    np.testing.assert_array_equal(np.asarray(ker.x), np.asarray(ref.x))
    np.testing.assert_array_equal(np.asarray(ker.niter),
                                  np.asarray(ref.niter))
    np.testing.assert_array_equal(np.asarray(ker.converged),
                                  np.asarray(ref.converged))


def test_whole_kernel_padded_shape_close():
    """Padded M/F change fp reduction lengths, so parity is tol-level (a
    few rows may stop one iteration apart), not bitwise."""
    y, a = _whole_problem(m=300, f=200, n=160, seed=51)
    ref = decomp_tpu.lasso.solve(y, a, 0.05, method="fista", tol=1e-5,
                                 maxiter=300, per_problem=True,
                                 use_pallas=False)
    ker = decomp_tpu.lasso.solve(y, a, 0.05, method="fista", tol=1e-5,
                                 maxiter=300, per_problem=True,
                                 use_pallas=True, _pallas_interpret=True)
    assert rel_err(ker.x, ref.x) < 1e-3
    nit_ref = np.asarray(ref.niter)
    nit_ker = np.asarray(ker.niter)
    assert np.mean(nit_ref == nit_ker) > 0.9


def test_whole_kernel_feature_alpha():
    y, a = _whole_problem()
    alpha = np.linspace(0.01, 0.1, a.shape[0]).astype(np.float32)
    ref = decomp_tpu.lasso.solve(y, a, alpha, method="fista", tol=1e-5,
                                 maxiter=300, per_problem=True,
                                 use_pallas=False)
    ker = decomp_tpu.lasso.solve(y, a, alpha, method="fista", tol=1e-5,
                                 maxiter=300, per_problem=True,
                                 use_pallas=True, _pallas_interpret=True)
    np.testing.assert_array_equal(np.asarray(ker.x), np.asarray(ref.x))


@pytest.mark.parametrize("momentum,restart,feat_vecs",
                         [(True, False, False), (True, True, False),
                          (False, False, False), (True, False, True),
                          (False, False, True)])
@pytest.mark.parametrize("maxiter", [0, 7, 8, 37])
def test_solve_rows_fixed_budget_bitexact(momentum, restart, feat_vecs,
                                          maxiter):
    """fixed=True (the static fixed-budget mode: the per-iteration
    freeze/stopping lattice is elided — ops.pallas_fista._kernel) is
    BIT-IDENTICAL to the exact kernel at tol=0 across momentum/restart/
    ista, scalar and per-feature step vectors, and maxiter remainders of
    the unroll block — including a resumed-done row, which stays frozen."""
    from decomp_tpu.ops import pallas_fista as pf

    rng = np.random.default_rng(55)
    m, f = 64, 128
    a = rng.normal(size=(f, 200)).astype(np.float32)
    gram = (a @ a.T).astype(np.float32)
    yah = rng.normal(size=(m, f)).astype(np.float32)
    x0 = rng.normal(size=(m, f)).astype(np.float32)
    t0 = np.ones((m, 1), np.float32)
    d0 = np.zeros((m, 1), np.float32)
    d0[5] = 1.0                    # one row resumes already-converged
    n0 = np.zeros((m, 1), np.float32)
    n0[5] = 9.0
    if feat_vecs:
        step = (0.5 / np.abs(np.diag(gram))).astype(np.float32)[None, :]
        thresh = (0.01 * step).astype(np.float32)
    else:
        step, thresh = np.float32(1e-3), np.float32(1e-4)
    kw = dict(momentum=momentum, restart=restart, maxiter=maxiter,
              block_rows=32, interpret=True)
    ex = pf.solve_rows(yah, gram, x0, x0, t0, d0, n0, step, thresh,
                       0.0, **kw)
    fx = pf.solve_rows(yah, gram, x0, x0, t0, d0, n0, step, thresh,
                       0.0, fixed=True, **kw)
    for e, f_ in zip(ex, fx):
        np.testing.assert_array_equal(np.asarray(e), np.asarray(f_))


@pytest.mark.parametrize("method", ["ista", "fista", "acc_ista",
                                    "parallel_cd"])
def test_whole_kernel_fixed_budget_matches_jnp(method):
    """tol <= 0 engages the kernel's fixed-budget mode through the public
    solve(): results track the jnp path at the same fixed budget (the
    kernel itself is bit-identical to the exact kernel — previous test —
    but XLA may compile the two programs' step-size PRECOMPUTE a ulp
    apart, so public-level parity is near-exact, not bitwise), and niter
    is exactly maxiter everywhere."""
    y, a = _whole_problem()
    ref = decomp_tpu.lasso.solve(y, a, 0.05, method=method, tol=0.0,
                                 maxiter=37, per_problem=True,
                                 use_pallas=False)
    ker = decomp_tpu.lasso.solve(y, a, 0.05, method=method, tol=0.0,
                                 maxiter=37, per_problem=True,
                                 use_pallas=True, _pallas_interpret=True)
    assert rel_err(ker.x, ref.x) < 1e-6
    assert (np.asarray(ker.niter) == 37).all()
    assert not np.asarray(ker.converged).any()


def test_whole_kernel_fixed_budget_resume_freezes():
    """Rows resumed as already-converged stay bit-frozen through the
    fixed-budget kernel (its single trailing done0 restore), while live
    rows advance exactly maxiter iterations."""
    y, a = _whole_problem(seed=54)
    kw = dict(method="fista", per_problem=True, use_pallas=True,
              _pallas_interpret=True)
    straight = decomp_tpu.lasso.solve(y, a, 0.05, tol=2e-4, maxiter=200,
                                      **kw)
    nit_s = np.asarray(straight.niter)
    assert nit_s.min() < nit_s.max()
    # stop mid-flight so SOME rows are converged at the handoff
    first = int(nit_s.min() + nit_s.max()) // 2
    r1 = decomp_tpu.lasso.solve(y, a, 0.05, tol=2e-4, maxiter=first,
                                return_state=True, **kw)
    conv = np.asarray(r1.converged)
    assert 0 < conv.sum() < y.shape[0]
    st = {"done": r1.converged, "niter": r1.niter,
          "z": r1.aux["z"], "t": r1.aux["t"]}
    r2 = decomp_tpu.lasso.solve(y, a, 0.05, x=r1.x, tol=0.0, maxiter=7,
                                state=st, **kw)
    np.testing.assert_array_equal(np.asarray(r2.x)[conv],
                                  np.asarray(r1.x)[conv])
    nit1, nit2 = np.asarray(r1.niter), np.asarray(r2.niter)
    np.testing.assert_array_equal(nit2[conv], nit1[conv])
    np.testing.assert_array_equal(nit2[~conv], nit1[~conv] + 7)
    # and the live rows really did advance, not just stay put
    assert (np.asarray(r2.x)[~conv] != np.asarray(r1.x)[~conv]).any()


def test_whole_kernel_validation():
    y, a = _whole_problem()
    with pytest.raises(decomp_tpu.utils.DecompError):
        # unmasked use_pallas requires per_problem
        decomp_tpu.lasso.solve(y, a, 0.05, method="fista",
                               use_pallas=True)
    with pytest.raises(decomp_tpu.utils.DecompError):
        decomp_tpu.lasso.solve(y, a, 0.05, method="cd", per_problem=True,
                               use_pallas=True)
    with pytest.raises(decomp_tpu.utils.DecompError):
        decomp_tpu.lasso.solve(y.astype(np.float64), a.astype(np.float64),
                               0.05, method="fista", per_problem=True,
                               use_pallas=True)
    with pytest.raises(decomp_tpu.utils.DecompError):
        decomp_tpu.lasso.solve(y, a, 0.05, method="fista",
                               per_problem=True, record_objective=True,
                               use_pallas=True)


@pytest.mark.parametrize("use_pallas", [False, True])
@pytest.mark.parametrize("method", ["ista", "fista", "acc_ista"])
def test_per_problem_state_exact_resume(method, use_pallas):
    """state= dict resume: chunked per-problem solves reproduce the
    uninterrupted one row-for-row — converged rows stay frozen and niter
    accumulates (VERDICT.md round-2 Missing #5)."""
    y, a = _whole_problem(seed=52)
    kw = dict(method=method, tol=2e-4, per_problem=True,
              use_pallas=use_pallas)
    if use_pallas:
        kw["_pallas_interpret"] = True
    straight = decomp_tpu.lasso.solve(y, a, 0.05, maxiter=200,
                                      return_state=True, **kw)
    # adaptive split so SOME (not all) rows are converged at the chunk
    # boundary: midpoint of the straight run's per-row stopping range
    nit_s = np.asarray(straight.niter)
    assert nit_s.min() < nit_s.max()
    first = int(nit_s.min() + nit_s.max()) // 2
    r1 = decomp_tpu.lasso.solve(y, a, 0.05, maxiter=first,
                                return_state=True, **kw)
    st = {"done": r1.converged, "niter": r1.niter}
    if r1.aux is not None:
        st["z"] = r1.aux["z"]
        st["t"] = r1.aux["t"]
    r2 = decomp_tpu.lasso.solve(y, a, 0.05, x=r1.x, maxiter=200 - first,
                                state=st, **kw)
    del nit_s
    # the straight run converges some rows mid-flight, so the resume path
    # is genuinely exercised
    assert 0 < int(np.sum(np.asarray(r1.converged))) < y.shape[0]
    np.testing.assert_array_equal(np.asarray(r2.x), np.asarray(straight.x))
    np.testing.assert_array_equal(np.asarray(r2.niter),
                                  np.asarray(straight.niter))
    np.testing.assert_array_equal(np.asarray(r2.converged),
                                  np.asarray(straight.converged))


def test_per_problem_degenerate_tol_still_exact():
    """ADVICE round-2 #4: the per-problem loop must compare the
    unconverged-row COUNT against zero, never the user tol — a tol > 1
    with a hostile warm start must not stop the loop with unconverged
    rows un-frozen."""
    rng = np.random.default_rng(53)
    a = rng.normal(size=(16, 24)).astype(np.float32)
    y = rng.normal(size=(6, 24)).astype(np.float32)
    x0 = 100.0 * rng.normal(size=(6, 16)).astype(np.float32)
    res = decomp_tpu.lasso.solve(y, a, 0.05, x=x0, tol=1.5, maxiter=100,
                                 method="fista", per_problem=True)
    # every row's niter must equal its own single-row solve at the same
    # degenerate tol (freeze semantics intact)
    for i in range(y.shape[0]):
        single = decomp_tpu.lasso.solve(y[i], a, 0.05, x=x0[i], tol=1.5,
                                        maxiter=100, method="fista",
                                        per_problem=True)
        assert int(np.asarray(res.niter)[i]) == int(np.asarray(single.niter))


def test_state_validation():
    y, a = _whole_problem()
    with pytest.raises(decomp_tpu.utils.DecompError):
        decomp_tpu.lasso.solve(y, a, 0.05, method="fista",
                               state={"bogus": 1})
    with pytest.raises(decomp_tpu.utils.DecompError):
        # done/niter without per_problem
        decomp_tpu.lasso.solve(
            y, a, 0.05, method="fista",
            state={"done": np.zeros(y.shape[0], bool),
                   "niter": np.zeros(y.shape[0], np.int32)})
    with pytest.raises(decomp_tpu.utils.DecompError):
        # z without t
        decomp_tpu.lasso.solve(y, a, 0.05, method="fista",
                               state={"z": np.zeros((y.shape[0],
                                                     a.shape[0]))})


# ---------------------------------------------------------------------------
# solve_split: jit/vmap-composable split-complex entry (VERDICT r2 Next #8)
# ---------------------------------------------------------------------------

def _complex_problem(seed=8, m=40, f=24, n=16):
    rng = np.random.default_rng(seed)
    a = ((rng.normal(size=(f, n)) + 1j * rng.normal(size=(f, n)))
         / np.sqrt(2 * n)).astype(np.complex64)
    xt = ((rng.normal(size=(m, f)) + 1j * rng.normal(size=(m, f)))
          * (rng.random((m, f)) < 0.2))
    y = (xt @ a + 0.01 * (rng.normal(size=(m, n))
                          + 1j * rng.normal(size=(m, n)))
         ).astype(np.complex64)
    return y, a


@pytest.mark.parametrize("method", ["ista", "fista", "acc_ista",
                                    "parallel_cd"])
def test_solve_split_matches_native_complex(method):
    from decomp_tpu.ops import complex_split as cs

    y, a = _complex_problem()
    ref = decomp_tpu.lasso.solve(y, a, ALPHA, tol=0.0, maxiter=200,
                                 method=method, complex_split=False)
    res = decomp_tpu.lasso.solve_split(cs.from_numpy(y), cs.from_numpy(a),
                                       ALPHA, tol=0.0, maxiter=200,
                                       method=method)
    x_split = np.asarray(res.x.re) + 1j * np.asarray(res.x.im)
    assert rel_err(x_split, ref.x) < 1e-5


def test_solve_split_composes_under_jit():
    """The whole point: solve() with complex tracers silently degrades to
    native complex (which TPU backends reject); solve_split takes real
    pytrees and traces cleanly."""
    from decomp_tpu.ops import complex_split as cs

    y, a = _complex_problem(seed=9)
    ref = decomp_tpu.lasso.solve_split(cs.from_numpy(y), cs.from_numpy(a),
                                       ALPHA, tol=0.0, maxiter=100)
    jitted = jax.jit(lambda ys, as_: decomp_tpu.lasso.solve_split(
        ys, as_, ALPHA, tol=0.0, maxiter=100))
    res = jitted(cs.from_numpy(y), cs.from_numpy(a))
    np.testing.assert_array_equal(np.asarray(res.x.re),
                                  np.asarray(ref.x.re))
    np.testing.assert_array_equal(np.asarray(res.x.im),
                                  np.asarray(ref.x.im))


def test_solve_split_momentum_resume_exact():
    from decomp_tpu.ops import complex_split as cs

    y, a = _complex_problem(seed=10)
    ys, as_ = cs.from_numpy(y), cs.from_numpy(a)
    straight = decomp_tpu.lasso.solve_split(ys, as_, ALPHA, tol=0.0,
                                            maxiter=80, method="fista")
    r1 = decomp_tpu.lasso.solve_split(ys, as_, ALPHA, tol=0.0, maxiter=40,
                                      method="fista", return_state=True)
    r2 = decomp_tpu.lasso.solve_split(
        ys, as_, ALPHA, x=r1.x, tol=0.0, maxiter=40, method="fista",
        momentum_state=(r1.aux["z"], r1.aux["t"]))
    np.testing.assert_array_equal(np.asarray(r2.x.re),
                                  np.asarray(straight.x.re))
    np.testing.assert_array_equal(np.asarray(r2.x.im),
                                  np.asarray(straight.x.im))


def test_solve_split_accepts_pairs_and_validates():
    from decomp_tpu.ops import complex_split as cs

    y, a = _complex_problem(seed=11)
    ys = cs.from_numpy(y)
    res = decomp_tpu.lasso.solve_split(
        (np.asarray(ys.re), np.asarray(ys.im)),
        (np.real(a), np.imag(a)), ALPHA, tol=0.0, maxiter=20)
    assert res.x.re.shape == (y.shape[0], a.shape[0])
    with pytest.raises(decomp_tpu.utils.DecompError):
        decomp_tpu.lasso.solve_split(np.real(y), (np.real(a), np.imag(a)),
                                     ALPHA)
    with pytest.raises(decomp_tpu.utils.DecompError):
        decomp_tpu.lasso.solve_split(ys, cs.from_numpy(a), ALPHA,
                                     method="cd")


def test_solve_split_per_problem_state_resume():
    """Per-problem chunked resume through the split-complex entry equals
    the uninterrupted split run row-for-row."""
    from decomp_tpu.ops import complex_split as cs

    y, a = _complex_problem(seed=12, m=60, f=32, n=24)
    ys, as_ = cs.from_numpy(y), cs.from_numpy(a)
    kw = dict(method="fista", tol=2e-4, per_problem=True)
    straight = decomp_tpu.lasso.solve_split(ys, as_, ALPHA, maxiter=300,
                                            return_state=True, **kw)
    nit_s = np.asarray(straight.niter)
    assert nit_s.min() < nit_s.max()
    first = int(nit_s.min() + nit_s.max()) // 2
    r1 = decomp_tpu.lasso.solve_split(ys, as_, ALPHA, maxiter=first,
                                      return_state=True, **kw)
    st = {"z": r1.aux["z"], "t": r1.aux["t"],
          "done": r1.converged, "niter": r1.niter}
    r2 = decomp_tpu.lasso.solve_split(ys, as_, ALPHA, x=r1.x,
                                      maxiter=300 - first, state=st, **kw)
    np.testing.assert_array_equal(np.asarray(r2.x.re),
                                  np.asarray(straight.x.re))
    np.testing.assert_array_equal(np.asarray(r2.x.im),
                                  np.asarray(straight.x.im))
    np.testing.assert_array_equal(np.asarray(r2.niter), nit_s)


def test_complex_solve_per_problem_state_resume():
    """The same through solve(complex_split=True): the state dict rides
    the host-decomposing path too."""
    y, a = _complex_problem(seed=13, m=40, f=24, n=16)
    kw = dict(method="fista", tol=2e-4, per_problem=True,
              complex_split=True)
    straight = decomp_tpu.lasso.solve(y, a, ALPHA, maxiter=300,
                                      return_state=True, **kw)
    nit_s = np.asarray(straight.niter)
    assert nit_s.min() < nit_s.max()
    first = int(nit_s.min() + nit_s.max()) // 2
    r1 = decomp_tpu.lasso.solve(y, a, ALPHA, maxiter=first,
                                return_state=True, **kw)
    st = {"z": r1.aux["z"], "t": r1.aux["t"],
          "done": r1.converged, "niter": r1.niter}
    r2 = decomp_tpu.lasso.solve(y, a, ALPHA, x=r1.x,
                                maxiter=300 - first, state=st, **kw)
    np.testing.assert_array_equal(np.asarray(r2.x), np.asarray(straight.x))
    np.testing.assert_array_equal(np.asarray(r2.niter), nit_s)


def test_whole_kernel_edge_cases():
    """Kernel edge shapes: single row (sub-stripe padding), tol=0 (runs
    to maxiter), huge alpha (all-zero solution marks done), warm start
    at the solution (immediate per-row stop)."""
    rng = np.random.default_rng(54)
    f, n = 128, 64
    a = (rng.normal(size=(f, n)) / np.sqrt(n)).astype(np.float32)
    y1 = rng.normal(size=(1, n)).astype(np.float32)
    kw = dict(per_problem=True, use_pallas=True, _pallas_interpret=True)
    r1 = decomp_tpu.lasso.solve(y1, a, 0.05, tol=1e-5, maxiter=200, **kw)
    ref = decomp_tpu.lasso.solve(y1, a, 0.05, tol=1e-5, maxiter=200,
                                 per_problem=True, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(r1.x), np.asarray(ref.x))

    y = rng.normal(size=(48, n)).astype(np.float32)
    r0 = decomp_tpu.lasso.solve(y, a, 0.05, tol=0.0, maxiter=37, **kw)
    np.testing.assert_array_equal(np.asarray(r0.niter), 37)
    assert not np.asarray(r0.converged).any()

    rh = decomp_tpu.lasso.solve(y, a, 1e6, tol=1e-6, maxiter=100, **kw)
    assert np.asarray(rh.converged).all()
    assert np.allclose(np.asarray(rh.x), 0.0)

    sol = decomp_tpu.lasso.solve(y, a, 0.05, tol=1e-12, maxiter=20000,
                                 method="fista")
    rw = decomp_tpu.lasso.solve(y, a, 0.05, x=sol.x, tol=1e-6,
                                maxiter=100, **kw)
    assert np.asarray(rw.converged).all()
    assert int(np.asarray(rw.niter).max()) <= 3
