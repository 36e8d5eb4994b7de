"""Pallas kernel tier (SURVEY.md §4 item 3, §5 'Race detection'): the fused
MU kernels are validated against the dense jnp composition — an exact-math
oracle — in interpreter mode on CPU (compiled-mode validation runs on real
TPU via bench/verify)."""

import jax.numpy as jnp
import numpy as np
import pytest

import decomp_tpu
from decomp_tpu.models.nmf import _update_d, _update_x
from decomp_tpu.ops import pallas_mu
from problems import planted_nmf, random_mask, rel_err

EPS = 1e-15


def _arrs(seed, m, n, k, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    return (jnp.asarray(rng.uniform(0.1, 1, (m, n)), dtype),
            jnp.asarray(rng.uniform(0.1, 1, (m, k)), dtype),
            jnp.asarray(rng.uniform(0.1, 1, (k, n)), dtype))


@pytest.mark.parametrize("block_rows", [32, 128])
def test_dense_kernel_matches_oracle(block_rows):
    y, x, d = _arrs(0, 256, 256, 128)
    xn, dn = pallas_mu.mu_update_dense(y, x, d, EPS,
                                       block_rows=block_rows,
                                       interpret=True)
    x_ref = _update_x(y, x, d, None, EPS)
    d_ref = _update_d(y, x_ref, d, None, EPS)
    assert rel_err(xn, x_ref) < 1e-5
    assert rel_err(dn, d_ref) < 1e-5


def test_masked_kernel_matches_oracle():
    y, x, d = _arrs(1, 128, 384, 128)
    rng = np.random.default_rng(2)
    mask = jnp.asarray(rng.random((128, 384)) > 0.3, jnp.float32)
    my = mask * y
    xn, dn = pallas_mu.mu_update_masked(my, mask, x, d, EPS,
                                        block_rows=32, interpret=True)
    x_ref = _update_x(my, x, d, mask, EPS)
    d_ref = _update_d(my, x_ref, d, mask, EPS)
    assert rel_err(xn, x_ref) < 1e-5
    assert rel_err(dn, d_ref) < 1e-5


def test_alignment_contract_enforced():
    y, x, d = _arrs(3, 250, 256, 128)  # M=250 not divisible
    with pytest.raises(ValueError):
        pallas_mu.mu_update_dense(y, x, d, EPS, block_rows=128,
                                  interpret=True)
    y, x, d = _arrs(4, 256, 200, 128)  # N=200 not 128-aligned
    with pytest.raises(ValueError):
        pallas_mu.mu_update_dense(y, x, d, EPS, block_rows=128,
                                  interpret=True)


@pytest.mark.parametrize("masked", [False, True])
def test_solve_pallas_path_matches_jnp_path(masked):
    """End-to-end: use_pallas=True (interpret mode, with ragged shapes
    exercising the zero-padding fixed-point argument) tracks the jnp path."""
    y, *_ = planted_nmf(seed=5, n_samples=70, n_channels=50, rank=4)
    y = y.astype(np.float32)
    mask = random_mask(6, y.shape).astype(np.float32) if masked else None
    rng = np.random.default_rng(7)
    x0 = rng.uniform(0.1, 1.0, (70, 4)).astype(np.float32)
    d0 = rng.uniform(0.1, 1.0, (4, 50)).astype(np.float32)

    ref = decomp_tpu.nmf.solve(y, d0, x=x0, tol=0.0, maxiter=15, mask=mask)
    res = decomp_tpu.nmf.solve(y, d0, x=x0, tol=0.0, maxiter=15, mask=mask,
                               use_pallas=True, pallas_block_rows=16,
                               _pallas_interpret=True)
    assert res.x.shape == ref.x.shape and res.d.shape == ref.d.shape
    assert rel_err(res.x, ref.x) < 1e-4
    assert rel_err(res.d, ref.d) < 1e-4


@pytest.mark.parametrize("block_rows", [32, 128])
def test_kl_dense_kernel_matches_oracle(block_rows):
    from decomp_tpu.models.nmf import _update_d_kl, _update_x_kl

    y, x, d = _arrs(20, 256, 256, 128)
    xn, dn = pallas_mu.kl_update_dense(y, x, d, EPS,
                                       block_rows=block_rows,
                                       interpret=True)
    x_ref = _update_x_kl(y, x, d, None, EPS)
    d_ref = _update_d_kl(y, x_ref, d, None, EPS)
    assert rel_err(xn, x_ref) < 1e-5
    assert rel_err(dn, d_ref) < 1e-5


def test_kl_masked_kernel_matches_oracle():
    from decomp_tpu.models.nmf import _update_d_kl, _update_x_kl

    y, x, d = _arrs(21, 128, 384, 128)
    rng = np.random.default_rng(22)
    mask = jnp.asarray(rng.random((128, 384)) > 0.3, jnp.float32)
    my = mask * y
    xn, dn = pallas_mu.kl_update_masked(my, mask, x, d, EPS,
                                        block_rows=32, interpret=True)
    x_ref = _update_x_kl(my, x, d, mask, EPS)
    d_ref = _update_d_kl(my, x_ref, d, mask, EPS)
    assert rel_err(xn, x_ref) < 1e-5
    assert rel_err(dn, d_ref) < 1e-5


@pytest.mark.parametrize("masked", [False, True])
def test_kl_solve_pallas_path_matches_jnp_path(masked):
    """End-to-end KL through the fused kernels (interpret, ragged shapes
    exercising the padding fixed point) tracks the jnp path."""
    y, *_ = planted_nmf(seed=23, n_samples=70, n_channels=50, rank=4)
    y = y.astype(np.float32)
    mask = random_mask(24, y.shape).astype(np.float32) if masked else None
    rng = np.random.default_rng(25)
    x0 = rng.uniform(0.1, 1.0, (70, 4)).astype(np.float32)
    d0 = rng.uniform(0.1, 1.0, (4, 50)).astype(np.float32)
    ref = decomp_tpu.nmf.solve(y, d0, x=x0, tol=0.0, maxiter=15, mask=mask,
                               method="kl-mu", record_objective=True)
    res = decomp_tpu.nmf.solve(y, d0, x=x0, tol=0.0, maxiter=15, mask=mask,
                               method="kl-mu", use_pallas=True,
                               pallas_block_rows=16, _pallas_interpret=True,
                               record_objective=True)
    assert rel_err(res.x, ref.x) < 1e-4
    assert rel_err(res.d, ref.d) < 1e-4
    np.testing.assert_allclose(np.asarray(res.objective),
                               np.asarray(ref.objective), rtol=1e-3)




def test_hals_use_pallas_rejected():
    """The fused HALS x-pass kernel was removed (measured loser; the VPU
    min lane tile makes the one-hot component sweeps irreducible at rank
    <= 128 — see ops.pallas_mu): explicit use_pallas=True with 'hals'
    must now raise instead of silently taking a dead path."""
    y, *_ = planted_nmf(seed=32, n_samples=70, n_channels=50, rank=4)
    with pytest.raises(decomp_tpu.utils.DecompError):
        decomp_tpu.nmf.solve(np.asarray(y, np.float32), rank=4,
                             method="hals", use_pallas=True)


@pytest.mark.parametrize("block_rows", [32, 128])
def test_masked_grad_rows_matches_oracle(block_rows):
    from decomp_tpu.ops import pallas_lasso

    rng = np.random.default_rng(10)
    m, n, f = 256, 384, 128
    my0 = jnp.asarray(rng.normal(size=(m, n)), jnp.float32)
    mask = jnp.asarray(rng.random((m, n)) > 0.3, jnp.float32)
    my = mask * my0
    x = jnp.asarray(rng.normal(size=(m, f)), jnp.float32)
    a = jnp.asarray(rng.normal(size=(f, n)), jnp.float32)
    g = pallas_lasso.masked_grad_rows(my, mask, x, a,
                                      block_rows=block_rows,
                                      interpret=True)
    g_ref = (mask * (x @ a) - my) @ a.T
    assert g.shape == (m, f) and g.dtype == x.dtype
    assert rel_err(g, g_ref) < 1e-5


def test_masked_grad_dict_matches_oracle():
    from decomp_tpu.ops import pallas_lasso

    rng = np.random.default_rng(11)
    m, n, k = 160, 256, 128
    my0 = jnp.asarray(rng.normal(size=(m, n)), jnp.float32)
    mask = jnp.asarray(rng.random((m, n)) > 0.3, jnp.float32)
    my = mask * my0
    x = jnp.asarray(rng.normal(size=(m, k)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(k, n)), jnp.float32)
    g = pallas_lasso.masked_grad_dict(my, mask, x, d, block_rows=32,
                                      interpret=True)
    g_ref = x.T @ (mask * (x @ d) - my)
    assert g.shape == (k, n)
    assert rel_err(g, g_ref) < 1e-5


def test_masked_grad_alignment_contract():
    from decomp_tpu.ops import pallas_lasso

    rng = np.random.default_rng(12)
    bad = jnp.asarray(rng.normal(size=(250, 256)), jnp.float32)
    mask = jnp.ones_like(bad)
    x = jnp.zeros((250, 128), jnp.float32)
    a = jnp.zeros((128, 256), jnp.float32)
    with pytest.raises(ValueError):
        pallas_lasso.masked_grad_rows(bad, mask, x, a, block_rows=128,
                                      interpret=True)


@pytest.mark.parametrize("method", ["fista", "acc_ista"])
def test_lasso_pallas_path_matches_jnp_path(method):
    """End-to-end masked lasso: use_pallas=True (interpret mode, ragged
    shapes exercising the zero-padding fixed point) tracks the dense jnp
    path trajectory-for-trajectory (lipschitz pinned: the padded power
    iteration would otherwise start from a different ramp vector)."""
    rng = np.random.default_rng(13)
    m, n, f = 70, 90, 50
    a = rng.normal(size=(f, n)).astype(np.float32)
    y = rng.normal(size=(m, n)).astype(np.float32)
    mask = (rng.random((m, n)) > 0.3).astype(np.float32)
    lip = float(np.linalg.eigvalsh(a @ a.T).max() * 1.05)
    ref = decomp_tpu.lasso.solve(y * mask, a, 0.05, mask=mask, tol=0.0,
                                 maxiter=25, method=method, lipschitz=lip,
                                 use_pallas=False)
    res = decomp_tpu.lasso.solve(y * mask, a, 0.05, mask=mask, tol=0.0,
                                 maxiter=25, method=method, lipschitz=lip,
                                 use_pallas=True, pallas_block_rows=16,
                                 _pallas_interpret=True)
    assert res.x.shape == ref.x.shape
    assert rel_err(res.x, ref.x) < 1e-4


def test_lasso_pallas_per_problem_slices_rows():
    rng = np.random.default_rng(14)
    m, n, f = 30, 70, 40
    a = rng.normal(size=(f, n)).astype(np.float32)
    y = rng.normal(size=(m, n)).astype(np.float32)
    mask = (rng.random((m, n)) > 0.3).astype(np.float32)
    res = decomp_tpu.lasso.solve(y * mask, a, 0.05, mask=mask, tol=1e-4,
                                 maxiter=2000, method="fista",
                                 per_problem=True, use_pallas=True,
                                 pallas_block_rows=16,
                                 _pallas_interpret=True)
    assert np.asarray(res.niter).shape == (m,)
    assert np.asarray(res.converged).all()
    ref = decomp_tpu.lasso.solve(y * mask, a, 0.05, mask=mask, tol=1e-4,
                                 maxiter=2000, method="fista",
                                 per_problem=True, use_pallas=False)
    # Padded power iteration gives a slightly different L: compare
    # solutions, not iteration counts.
    assert rel_err(res.x, ref.x) < 1e-3


def test_dl_pallas_path_matches_jnp_path():
    """End-to-end masked dictionary learning through both fused kernels."""
    rng = np.random.default_rng(15)
    m, n, k = 60, 70, 40
    y = rng.normal(size=(m, n)).astype(np.float32)
    mask = (rng.random((m, n)) > 0.3).astype(np.float32)
    d0 = rng.normal(size=(k, n)).astype(np.float32)
    ref = decomp_tpu.dictionary_learning.solve(
        y * mask, d0, 0.05, mask=mask, tol=0.0, maxiter=8, lasso_iter=5,
        use_pallas=False, record_objective=True)
    res = decomp_tpu.dictionary_learning.solve(
        y * mask, d0, 0.05, mask=mask, tol=0.0, maxiter=8, lasso_iter=5,
        use_pallas=True, pallas_block_rows=16, _pallas_interpret=True,
        record_objective=True)
    assert res.x.shape == ref.x.shape and res.d.shape == ref.d.shape
    # The padded inner power iterations start from longer ramp vectors, so
    # step sizes differ slightly: compare objectives, not trajectories.
    ro = np.asarray(ref.objective)
    po = np.asarray(res.objective)
    np.testing.assert_allclose(po, ro, rtol=2e-2)
    norms = np.linalg.norm(np.asarray(res.d), axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def test_dl_pallas_per_atom_alpha_padded():
    """1-D per-atom alpha must be padded alongside the atom axis when the
    fused kernels pad n_atoms to the 128 alignment (round-2 self-review:
    the unpadded alpha broadcast against the padded x crashed the trace)."""
    rng = np.random.default_rng(17)
    m, n, k = 40, 60, 30  # k not a multiple of 128
    y = rng.normal(size=(m, n)).astype(np.float32)
    mask = (rng.random((m, n)) > 0.3).astype(np.float32)
    d0 = rng.normal(size=(k, n)).astype(np.float32)
    alphas = np.full((k,), 0.05, np.float32)
    ref = decomp_tpu.dictionary_learning.solve(
        y * mask, d0, alphas, mask=mask, tol=0.0, maxiter=4, lasso_iter=3,
        use_pallas=False, record_objective=True)
    res = decomp_tpu.dictionary_learning.solve(
        y * mask, d0, alphas, mask=mask, tol=0.0, maxiter=4, lasso_iter=3,
        use_pallas=True, pallas_block_rows=16, _pallas_interpret=True,
        record_objective=True)
    np.testing.assert_allclose(np.asarray(res.objective),
                               np.asarray(ref.objective), rtol=2e-2)


def test_lasso_pallas_rejects_unmasked_and_complex():
    rng = np.random.default_rng(16)
    y = rng.normal(size=(8, 16)).astype(np.float32)
    a = rng.normal(size=(4, 16)).astype(np.float32)
    with pytest.raises(decomp_tpu.utils.DecompError):
        decomp_tpu.lasso.solve(y, a, 0.1, use_pallas=True)
    with pytest.raises(decomp_tpu.utils.DecompError):
        decomp_tpu.lasso.solve(y, a, 0.1, mask=np.ones_like(y),
                               method="cd", use_pallas=True)


def test_dense_pallas_inner_iter_matches_jnp():
    """Accelerated MU (inner_iter > 1) inside the fused dense kernel: the
    numerator is reused across x refinements, matching the jnp path."""
    y, *_ = planted_nmf(seed=34, n_samples=70, n_channels=50, rank=4)
    y = y.astype(np.float32)
    rng = np.random.default_rng(35)
    x0 = rng.uniform(0.1, 1.0, (70, 4)).astype(np.float32)
    d0 = rng.uniform(0.1, 1.0, (4, 50)).astype(np.float32)
    ref = decomp_tpu.nmf.solve(y, d0, x=x0, tol=0.0, maxiter=12,
                               inner_iter=3)
    res = decomp_tpu.nmf.solve(y, d0, x=x0, tol=0.0, maxiter=12,
                               inner_iter=3, use_pallas=True,
                               pallas_block_rows=16, _pallas_interpret=True)
    assert rel_err(res.x, ref.x) < 1e-4
    assert rel_err(res.d, ref.d) < 1e-4
    # masked + inner_iter via Pallas stays rejected
    with pytest.raises(decomp_tpu.utils.DecompError):
        decomp_tpu.nmf.solve(y, d0, x=x0, mask=np.ones_like(y),
                             inner_iter=2, use_pallas=True)


def test_auto_is_off_on_cpu():
    """'auto' must not enable Pallas on the CPU backend (no TPU kernels)."""
    y, *_ = planted_nmf(seed=8, n_samples=1100, n_channels=1000, rank=3)
    res = decomp_tpu.nmf.solve(y.astype(np.float32), rank=3, tol=0.0,
                               maxiter=2, use_pallas="auto")
    assert np.isfinite(np.asarray(res.d)).all()


def test_bcd_sweep_kernel_matches_oracle():
    """The fused BCD dictionary-sweep kernel (ops.pallas_bcd): bit-exact
    vs the jnp fori sweep at padding-free shapes; zero padding (atoms
    and channels) is an exact sweep no-op on the real block (padded
    norms only append zeros, which can re-associate the reduction —
    tested at the padded shape to 1e-6)."""
    import jax

    from decomp_tpu.models.dictionary_learning import _bcd_dict_update
    from decomp_tpu.ops import pallas_bcd

    rng = np.random.default_rng(80)
    k, n = 64, 128
    x = rng.normal(size=(500, k)).astype(np.float32)
    y = rng.normal(size=(500, n)).astype(np.float32)
    a = jnp.asarray((x.T @ x).astype(np.float32))
    b = jnp.asarray((x.T @ y).astype(np.float32))
    d = rng.normal(size=(k, n)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
    with jax.default_matmul_precision("highest"):
        ref = _bcd_dict_update(a, b, d)
    ker = pallas_bcd.bcd_sweep(a, b, d, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(ker))

    # padded atoms + channels: padded rows stay exactly zero, the real
    # block matches to reduction-order tolerance
    kp, np_pad = k + 8, n + 128
    pad = lambda v, r, c: np.pad(np.asarray(v),  # noqa: E731
                                 ((0, r - v.shape[0]), (0, c - v.shape[1])))
    kerp = pallas_bcd.bcd_sweep(jnp.asarray(pad(a, kp, kp)),
                                jnp.asarray(pad(b, kp, np_pad)),
                                jnp.asarray(pad(d, kp, np_pad)),
                                interpret=True)
    kerp = np.asarray(kerp)
    assert np.abs(kerp[k:]).max() == 0
    assert np.abs(kerp[:, n:]).max() == 0
    assert rel_err(kerp[:k, :n], np.asarray(ref)) < 1e-6

    with pytest.raises(ValueError):
        pallas_bcd.bcd_sweep(a, b, jnp.asarray(np.zeros((k, 40),
                                                        np.float32)),
                             interpret=True)  # N not 128-aligned
    with pytest.raises(ValueError):
        pallas_bcd.bcd_sweep(a[:32], b, d, interpret=True)  # A mismatch


def test_dl_bcd_kernel_paths_match_jnp():
    """_bcd_pallas='interpret' routes every unmasked dictionary update
    through the fused sweep kernel; trajectories track the jnp sweep
    (whole-program compilation may move precompute by a ulp, so parity
    is near-exact, not bitwise) across in-core, minibatch, host-
    streaming and fused-streaming paths. Forced engagement off f32
    raises."""
    import jax

    rng = np.random.default_rng(81)
    m, n, k = 256, 40, 16
    d_true = rng.normal(size=(k, n))
    d_true /= np.linalg.norm(d_true, axis=1, keepdims=True)
    xt = rng.normal(size=(m, k)) * (rng.random((m, k)) < 0.2)
    y = (xt @ d_true + 0.01 * rng.normal(size=(m, n))).astype(np.float32)
    d0 = rng.normal(size=(k, n)).astype(np.float32)
    kw = dict(tol=0.0, maxiter=6, lasso_iter=4)

    ref = decomp_tpu.dictionary_learning.solve(y, d0, 0.05, **kw)
    ker = decomp_tpu.dictionary_learning.solve(y, d0, 0.05,
                                               _bcd_pallas="interpret",
                                               **kw)
    assert rel_err(ker.d, ref.d) < 1e-5 and rel_err(ker.x, ref.x) < 1e-5

    refm = decomp_tpu.dictionary_learning.solve(
        y, d0, 0.05, minibatch=64, random_seed=1, **kw)
    kerm = decomp_tpu.dictionary_learning.solve(
        y, d0, 0.05, minibatch=64, random_seed=1,
        _bcd_pallas="interpret", **kw)
    assert rel_err(kerm.d, refm.d) < 1e-5

    refh = decomp_tpu.dictionary_learning.solve_streaming(
        y, d0, 0.05, chunk_rows=64, **kw)
    kerh = decomp_tpu.dictionary_learning.solve_streaming(
        y, d0, 0.05, chunk_rows=64, _bcd_pallas="interpret", **kw)
    assert rel_err(kerh.d, refh.d) < 1e-5

    yd = jnp.asarray(y)
    loader = lambda lo, hi: jax.lax.dynamic_slice(  # noqa: E731
        yd, (lo, 0), (64, n))
    kwf = dict(chunk_rows=64, n_samples=m, n_channels=n,
               dtype=np.float32, jit_loader=True, **kw)
    reff = decomp_tpu.dictionary_learning.solve_streaming(
        loader, d0, 0.05, **kwf)
    kerf = decomp_tpu.dictionary_learning.solve_streaming(
        loader, d0, 0.05, _bcd_pallas="interpret", **kwf)
    assert rel_err(kerf.d, reff.d) < 1e-5

    with pytest.raises(decomp_tpu.utils.DecompError, match="float32"):
        decomp_tpu.dictionary_learning.solve(
            y.astype(np.float64), d0.astype(np.float64), 0.05,
            _bcd_pallas="interpret", **kw)


def test_pallas_minibatch_rejected():
    y, *_ = planted_nmf(seed=9)
    with pytest.raises(decomp_tpu.utils.DecompError):
        decomp_tpu.nmf.solve(y, rank=3, minibatch=8, use_pallas=True)


@pytest.mark.parametrize("method", ["fista", "acc_ista", "ista",
                                    "parallel_cd"])
def test_whole_kernel_split_complex_matches_jnp(method):
    """group_fc mode (round 4): the split-complex whole-solve kernel
    (real 2Fc x 2Fc Gram embedding + paired-magnitude soft-threshold)
    matches the jnp split path — per-row stops identical, solutions to
    reduction order."""
    from decomp_tpu.ops import complex_split as cs

    rng = np.random.default_rng(77)
    m, f, c = 48, 24, 32
    a = (rng.normal(size=(f, c))
         + 1j * rng.normal(size=(f, c))).astype(np.complex64)
    xt = ((rng.normal(size=(m, f)) + 1j * rng.normal(size=(m, f)))
          * (rng.random((m, f)) < 0.15)).astype(np.complex64)
    y = (xt @ a + 0.01 * (rng.normal(size=(m, c))
                          + 1j * rng.normal(size=(m, c)))
         ).astype(np.complex64)
    ys, a_s = cs.from_numpy(y), cs.from_numpy(a)
    kw = dict(tol=1e-5, maxiter=500, method=method, per_problem=True)
    ref = decomp_tpu.lasso.solve_split(ys, a_s, 0.1, **kw)
    res = decomp_tpu.lasso.solve_split(ys, a_s, 0.1, use_pallas=True,
                                       _pallas_interpret=True, **kw)

    def as_c(s):
        return np.asarray(s.re) + 1j * np.asarray(s.im)

    # The kernel contracts the 2F-wide embedding in ONE matmul while
    # the jnp split path sums four F-wide matmuls — reduction order
    # differs, so a stray row may legitimately cross tol one iteration
    # apart (observed compiled on TPU; interpret mode usually agrees
    # exactly). Oracle: near-total per-row agreement + solution match.
    nr, nk = np.asarray(ref.niter), np.asarray(res.niter)
    assert (nr == nk).mean() >= 0.98, (nr != nk).sum()
    assert np.abs(nr - nk).max() <= 2
    assert (np.linalg.norm(as_c(res.x) - as_c(ref.x))
            / max(np.linalg.norm(as_c(ref.x)), 1e-30)) < 1e-3


def test_whole_kernel_split_complex_fixed_budget():
    """group_fc + fixed-budget (tol=0): the split kernel's static-trip
    mode matches the jnp split path at the same fixed budget."""
    from decomp_tpu.ops import complex_split as cs

    rng = np.random.default_rng(79)
    m, f, c = 48, 128, 32  # padding-free atom count for the group halves
    a = (rng.normal(size=(f, c))
         + 1j * rng.normal(size=(f, c))).astype(np.complex64)
    y = (rng.normal(size=(m, c))
         + 1j * rng.normal(size=(m, c))).astype(np.complex64)
    ys, a_s = cs.from_numpy(y), cs.from_numpy(a)
    kw = dict(tol=0.0, maxiter=21, method="acc_ista", per_problem=True)
    ref = decomp_tpu.lasso.solve_split(ys, a_s, 0.1, **kw)
    res = decomp_tpu.lasso.solve_split(ys, a_s, 0.1, use_pallas=True,
                                       _pallas_interpret=True, **kw)

    def as_c(s):
        return np.asarray(s.re) + 1j * np.asarray(s.im)

    assert (np.asarray(res.niter) == 21).all()
    assert not np.asarray(res.converged).any()
    # one 2F-wide contraction vs four F-wide: reduction order differs,
    # so solution-level (not bitwise) parity is the oracle here.
    assert (np.linalg.norm(as_c(res.x) - as_c(ref.x))
            / max(np.linalg.norm(as_c(ref.x)), 1e-30)) < 1e-4


def test_whole_kernel_split_complex_resume_and_validation():
    """Exact per-row state resume through the split kernel, plus the
    contract validations."""
    from decomp_tpu.ops import complex_split as cs

    rng = np.random.default_rng(78)
    m, f, c = 32, 16, 24
    a = (rng.normal(size=(f, c))
         + 1j * rng.normal(size=(f, c))).astype(np.complex64)
    y = (rng.normal(size=(m, c))
         + 1j * rng.normal(size=(m, c))).astype(np.complex64)
    ys, a_s = cs.from_numpy(y), cs.from_numpy(a)
    kw = dict(method="acc_ista", per_problem=True, use_pallas=True,
              _pallas_interpret=True)
    full = decomp_tpu.lasso.solve_split(ys, a_s, 0.1, tol=1e-5,
                                        maxiter=400, **kw)
    part = decomp_tpu.lasso.solve_split(ys, a_s, 0.1, tol=1e-5,
                                        maxiter=50, return_state=True,
                                        **kw)
    state = {"z": part.aux["z"], "t": part.aux["t"],
             "done": part.converged, "niter": part.niter}
    rest = decomp_tpu.lasso.solve_split(
        ys, a_s, 0.1, x=part.x, tol=1e-5, maxiter=350, state=state, **kw)
    total_nit = np.asarray(rest.niter)
    np.testing.assert_array_equal(total_nit, np.asarray(full.niter))
    with pytest.raises(decomp_tpu.utils.DecompError):
        decomp_tpu.lasso.solve_split(ys, a_s, 0.1, use_pallas=True,
                                     per_problem=False)
    with pytest.raises(decomp_tpu.utils.DecompError):
        decomp_tpu.lasso.solve_split(ys, a_s, 0.1, use_pallas=True,
                                     per_problem=True,
                                     record_objective=True)


def test_solve_split_auto_default_off_cpu():
    """solve_split defaults to use_pallas='auto' (round 4): on the CPU
    backend the gate must stay off and the jnp split path must run, even
    for configurations the kernel would otherwise accept (unmasked,
    per_problem, f32, large batch)."""
    from decomp_tpu.ops import complex_split as cs

    rng = np.random.default_rng(79)
    m, f, c = 24, 12, 16
    a = (rng.normal(size=(f, c))
         + 1j * rng.normal(size=(f, c))).astype(np.complex64)
    y = (rng.normal(size=(m, c))
         + 1j * rng.normal(size=(m, c))).astype(np.complex64)
    ys, a_s = cs.from_numpy(y), cs.from_numpy(a)
    ref = decomp_tpu.lasso.solve_split(ys, a_s, 0.1, tol=1e-5,
                                       maxiter=200, per_problem=True,
                                       use_pallas=False)
    res = decomp_tpu.lasso.solve_split(ys, a_s, 0.1, tol=1e-5,
                                       maxiter=200, per_problem=True)
    np.testing.assert_array_equal(np.asarray(res.niter),
                                  np.asarray(ref.niter))
    np.testing.assert_allclose(np.asarray(res.x.re),
                               np.asarray(ref.x.re), rtol=1e-6)
    # 'auto' also composes with modes the kernel REJECTS (masked,
    # per_problem=False, record_objective): the gate must decline, not
    # raise.
    decomp_tpu.lasso.solve_split(ys, a_s, 0.1, tol=1e-5, maxiter=5,
                                 record_objective=True)


def test_auto_gates_judge_user_block_rows():
    """use_pallas='auto' with an explicit pallas_block_rows must gate on
    THAT stripe height, not the default (code-review finding: auto
    admitted configurations the kernel then failed to compile instead of
    falling back to jnp)."""
    from decomp_tpu.ops import pallas_fista, pallas_lasso

    # default stripes fit at these shapes...
    assert pallas_lasso.fits_vmem(1024, 128, 4)
    assert pallas_lasso.auto_wins(1024, 128, 4)
    assert pallas_fista.fits_vmem(512, True, False)
    # ...but an absurd user override must flip the same gates off
    assert not pallas_lasso.fits_vmem(1024, 128, 4, block_rows=1 << 20)
    assert not pallas_lasso.auto_wins(1024, 128, 4, block_rows=1 << 20)
    assert not pallas_fista.fits_vmem(512, True, False,
                                      block_rows=1 << 20)
    assert not pallas_fista.fits_vmem(1024, True, False,
                                      block_rows=1 << 20, group=True)
    # a sane explicit override keeps the gate open
    assert pallas_lasso.auto_wins(1024, 128, 4, block_rows=128)
    assert pallas_fista.fits_vmem(512, True, False, block_rows=64)


def test_complex_solve_honors_use_pallas():
    """lasso.solve on complex inputs with complex_split routes through
    solve_split, so use_pallas engages the group_fc whole-solve kernel
    (code-review finding: the complex branch silently DROPPED
    use_pallas=True and ran jnp speeds)."""
    rng = np.random.default_rng(91)
    m, f, c = 24, 12, 16
    a = (rng.normal(size=(f, c))
         + 1j * rng.normal(size=(f, c))).astype(np.complex64)
    y = (rng.normal(size=(m, c))
         + 1j * rng.normal(size=(m, c))).astype(np.complex64)
    kw = dict(tol=1e-5, maxiter=200, method="fista", per_problem=True,
              complex_split=True)
    ref = decomp_tpu.lasso.solve(y, a, 0.1, use_pallas=False, **kw)
    res = decomp_tpu.lasso.solve(y, a, 0.1, use_pallas=True,
                                 _pallas_interpret=True, **kw)
    np.testing.assert_array_equal(np.asarray(res.niter),
                                  np.asarray(ref.niter))
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=1e-5, atol=1e-6)
    # proof the request reaches the kernel gate: its validation now fires
    with pytest.raises(decomp_tpu.utils.DecompError):
        decomp_tpu.lasso.solve(y, a, 0.1, use_pallas=True,
                               record_objective=True, **kw)


def test_bcd_force_incompatible_raises_and_falsy_vetoes():
    """Forcing _bcd_pallas on a masked or complex problem raises a
    typed error instead of a silent no-op (the masked dictionary step
    is projected-gradient; complex takes the split/native path), and
    any falsy use_pallas spelling (False, 0) vetoes the auto gate
    everywhere the lasso kernels honour it (code-review round-4
    findings #1/#4)."""
    from decomp_tpu.models.dictionary_learning import _resolve_bcd

    rng = np.random.default_rng(82)
    m, n, k = 64, 40, 8
    y = rng.normal(size=(m, n)).astype(np.float32)
    d0 = rng.normal(size=(k, n)).astype(np.float32)
    mask = (rng.random((m, n)) > 0.3).astype(np.float32)
    kw = dict(tol=0.0, maxiter=2, lasso_iter=2)

    with pytest.raises(decomp_tpu.utils.DecompError, match="UNMASKED"):
        decomp_tpu.dictionary_learning.solve(
            y, d0, 0.05, mask=mask, _bcd_pallas="interpret", **kw)
    with pytest.raises(decomp_tpu.utils.DecompError, match="UNMASKED"):
        decomp_tpu.dictionary_learning.solve_streaming(
            y, d0, 0.05, mask=mask, chunk_rows=32,
            _bcd_pallas="interpret", **kw)
    with pytest.raises(decomp_tpu.utils.DecompError, match="complex"):
        decomp_tpu.dictionary_learning.solve(
            y.astype(np.complex64), d0.astype(np.complex64), 0.05,
            complex_split=True, _bcd_pallas=True, **kw)

    # falsy non-None use_pallas vetoes auto; 'auto'/None leave it to
    # the calibrated-TPU gate (off on CPU)
    for veto in (False, 0):
        assert _resolve_bcd(None, veto, np.float32, 16, 128) == "off"
    assert _resolve_bcd(None, None, np.float32, 16, 128) in ("off", "tpu")
    # masked problems never auto-engage
    assert _resolve_bcd(None, "auto", np.float32, 16, 128,
                        masked=True) == "off"
    # unknown override spellings raise instead of silently forcing the
    # compiled kernel ('off'/'auto' are truthy strings)
    for bad in ("off", "auto", "tpu", 2):
        with pytest.raises(decomp_tpu.utils.DecompError,
                           match="_bcd_pallas"):
            _resolve_bcd(bad, None, np.float32, 16, 128)

    # the fused-streaming entry canonicalizes the DECLARED dtype exactly
    # like the host-array entry (jnp.result_type), so a float64
    # declaration is judged as the dtype the epochs actually run:
    # f32-and-engage under production x64-off, f64-and-raise under this
    # suite's x64-on. The two entries must behave identically either
    # way (code-review round-4: the fused path used the raw dtype).
    import jax

    yj = jnp.asarray(y.astype(np.float64))
    loader = lambda lo, hi: jax.lax.dynamic_slice(  # noqa: E731
        yj, (lo, 0), (32, n))

    def outcome(fn):
        try:
            fn()
            return "engaged"
        except decomp_tpu.utils.DecompError:
            return "raised"

    host = outcome(lambda: decomp_tpu.dictionary_learning.solve_streaming(
        y.astype(np.float64), d0.astype(np.float64), 0.05, chunk_rows=32,
        _bcd_pallas="interpret", **kw))
    fused = outcome(lambda: decomp_tpu.dictionary_learning.solve_streaming(
        loader, d0.astype(np.float64), 0.05, chunk_rows=32, n_samples=m,
        n_channels=n, dtype=np.float64, jit_loader=True,
        _bcd_pallas="interpret", **kw))
    assert host == fused, (host, fused)
    assert host == ("raised" if jnp.result_type(np.float64)
                    == jnp.float64 else "engaged")
