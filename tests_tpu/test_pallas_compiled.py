"""Compiled-mode (Mosaic) oracle tests for every Pallas kernel.

The interpret-mode tier in tests/test_pallas.py pins the kernels' math;
this tier pins their Mosaic COMPILATION on real TPU hardware: layout
choices, scoped-VMEM fit, and MXU lowering, for both block sizes of each
kernel. Tolerances are f32-kernel vs f32-'highest' jnp oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

requires_tpu = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="compiled Pallas tier needs a TPU backend")

EPS = 1e-6


def _rel(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-300)


def _arrs(seed, m, n, k):
    rng = np.random.default_rng(seed)
    return (jnp.asarray(rng.uniform(0.1, 1, (m, n)), jnp.float32),
            jnp.asarray(rng.uniform(0.1, 1, (m, k)), jnp.float32),
            jnp.asarray(rng.uniform(0.1, 1, (k, n)), jnp.float32))


@requires_tpu
@pytest.mark.parametrize("block_rows", [32, 128])
def test_mu_dense_compiled(block_rows):
    from decomp_tpu.models.nmf import _update_d, _update_x
    from decomp_tpu.ops import pallas_mu

    y, x, d = _arrs(0, 256, 256, 128)
    xn, dn = pallas_mu.mu_update_dense(y, x, d, EPS, block_rows=block_rows)
    with jax.default_matmul_precision("highest"):
        x_ref = _update_x(y, x, d, None, EPS)
        d_ref = _update_d(y, x_ref, d, None, EPS)
    assert _rel(xn, x_ref) < 1e-5
    assert _rel(dn, d_ref) < 1e-5


@requires_tpu
@pytest.mark.parametrize("block_rows", [32, 128])
def test_mu_masked_compiled(block_rows):
    from decomp_tpu.models.nmf import _update_d, _update_x
    from decomp_tpu.ops import pallas_mu

    y, x, d = _arrs(1, 128, 384, 128)
    rng = np.random.default_rng(2)
    mask = jnp.asarray(rng.random((128, 384)) > 0.3, jnp.float32)
    my = mask * y
    xn, dn = pallas_mu.mu_update_masked(my, mask, x, d, EPS,
                                        block_rows=block_rows)
    with jax.default_matmul_precision("highest"):
        x_ref = _update_x(my, x, d, mask, EPS)
        d_ref = _update_d(my, x_ref, d, mask, EPS)
    assert _rel(xn, x_ref) < 1e-5
    assert _rel(dn, d_ref) < 1e-5


@requires_tpu
@pytest.mark.parametrize("block_rows", [32, 128])
def test_kl_dense_compiled(block_rows):
    from decomp_tpu.models.nmf import _update_d_kl, _update_x_kl
    from decomp_tpu.ops import pallas_mu

    y, x, d = _arrs(20, 256, 256, 128)
    xn, dn = pallas_mu.kl_update_dense(y, x, d, EPS, block_rows=block_rows)
    with jax.default_matmul_precision("highest"):
        x_ref = _update_x_kl(y, x, d, None, EPS)
        d_ref = _update_d_kl(y, x_ref, d, None, EPS)
    assert _rel(xn, x_ref) < 1e-5
    assert _rel(dn, d_ref) < 1e-5


@requires_tpu
def test_kl_masked_compiled():
    from decomp_tpu.models.nmf import _update_d_kl, _update_x_kl
    from decomp_tpu.ops import pallas_mu

    y, x, d = _arrs(21, 128, 384, 128)
    rng = np.random.default_rng(22)
    mask = jnp.asarray(rng.random((128, 384)) > 0.3, jnp.float32)
    my = mask * y
    xn, dn = pallas_mu.kl_update_masked(my, mask, x, d, EPS, block_rows=32)
    with jax.default_matmul_precision("highest"):
        x_ref = _update_x_kl(my, x, d, mask, EPS)
        d_ref = _update_d_kl(my, x_ref, d, mask, EPS)
    assert _rel(xn, x_ref) < 1e-5
    assert _rel(dn, d_ref) < 1e-5



@requires_tpu
def test_mixed_precision_mu_compiled():
    """Mixed mode (bf16 data / f32 factors) through the compiled dense
    kernel: dtype contract + agreement with the jnp mixed path."""
    import decomp_tpu

    rng = np.random.default_rng(23)
    y = jnp.asarray(rng.uniform(0.1, 1, (512, 256)), jnp.bfloat16)
    x0 = rng.uniform(0.1, 1.0, (512, 128)).astype(np.float32)
    d0 = rng.uniform(0.1, 1.0, (128, 256)).astype(np.float32)
    kw = dict(x=x0, tol=0.0, maxiter=10, factor_dtype=jnp.float32,
              precision="default")
    ref = decomp_tpu.nmf.solve(y, d0, use_pallas=False, **kw)
    res = decomp_tpu.nmf.solve(y, d0, use_pallas=True, **kw)
    assert res.x.dtype == jnp.float32 and res.d.dtype == jnp.float32
    assert _rel(res.x, ref.x) < 2e-2
    assert _rel(res.d, ref.d) < 2e-2


@requires_tpu
@pytest.mark.parametrize("block_rows", [128, 512])
def test_masked_grad_rows_compiled(block_rows):
    from decomp_tpu.ops import pallas_lasso

    rng = np.random.default_rng(3)
    m, n, f = 1024, 256, 128
    mask = jnp.asarray(rng.random((m, n)) > 0.3, jnp.float32)
    my = mask * jnp.asarray(rng.normal(size=(m, n)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(m, f)), jnp.float32)
    a = jnp.asarray(rng.normal(size=(f, n)), jnp.float32)
    g = pallas_lasso.masked_grad_rows(my, mask, x, a,
                                      block_rows=block_rows)
    with jax.default_matmul_precision("highest"):
        g_ref = (mask * (x @ a) - my) @ a.T
    assert _rel(g, g_ref) < 1e-5


@requires_tpu
@pytest.mark.parametrize("block_rows", [128, 512])
def test_masked_grad_dict_compiled(block_rows):
    from decomp_tpu.ops import pallas_lasso

    rng = np.random.default_rng(4)
    m, n, k = 1024, 256, 128
    mask = jnp.asarray(rng.random((m, n)) > 0.3, jnp.float32)
    my = mask * jnp.asarray(rng.normal(size=(m, n)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(m, k)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(k, n)), jnp.float32)
    g = pallas_lasso.masked_grad_dict(my, mask, x, d,
                                      block_rows=block_rows)
    with jax.default_matmul_precision("highest"):
        g_ref = x.T @ (mask * (x @ d) - my)
    assert _rel(g, g_ref) < 1e-5


@requires_tpu
def test_masked_lasso_solve_pallas_compiled():
    """End-to-end compiled masked FISTA through the fused gradient kernel
    matches the jnp path (lipschitz pinned so padding does not perturb the
    power-iteration start vector)."""
    import decomp_tpu

    rng = np.random.default_rng(5)
    m, n, f = 600, 200, 100  # ragged: exercises the padding fixed point
    a = rng.normal(size=(f, n)).astype(np.float32)
    y = rng.normal(size=(m, n)).astype(np.float32)
    mask = (rng.random((m, n)) > 0.3).astype(np.float32)
    lip = float(np.linalg.eigvalsh(a @ a.T).max() * 1.05)
    ref = decomp_tpu.lasso.solve(y * mask, a, 0.05, mask=mask, tol=0.0,
                                 maxiter=20, method="fista", lipschitz=lip,
                                 use_pallas=False)
    res = decomp_tpu.lasso.solve(y * mask, a, 0.05, mask=mask, tol=0.0,
                                 maxiter=20, method="fista", lipschitz=lip,
                                 use_pallas=True)
    assert _rel(res.x, ref.x) < 1e-4


@requires_tpu
@pytest.mark.parametrize("method", ["fista", "acc_ista", "ista",
                                    "parallel_cd"])
def test_whole_solve_fista_compiled(method):
    """Whole-solve batched FISTA kernel (ops.pallas_fista) vs the jnp
    per_problem path, compiled through Mosaic."""
    import decomp_tpu

    rng = np.random.default_rng(60)
    m, f, n = 512, 256, 160
    a = (rng.normal(size=(f, n)) / np.sqrt(n)).astype(np.float32)
    xt = (rng.normal(size=(m, f)) * (rng.random((m, f)) < 0.1)
          ).astype(np.float32)
    y = (xt @ a + 0.01 * rng.normal(size=(m, n))).astype(np.float32)
    ker = decomp_tpu.lasso.solve(y, a, 0.05, method=method, tol=1e-5,
                                 maxiter=400, per_problem=True,
                                 use_pallas=True)
    ref = decomp_tpu.lasso.solve(y, a, 0.05, method=method, tol=1e-5,
                                 maxiter=400, per_problem=True,
                                 use_pallas=False)
    assert _rel(ker.x, ref.x) < 1e-4
    nit_k = np.asarray(ker.niter)
    nit_r = np.asarray(ref.niter)
    # fp reduction-order differences flip a few stopping boundaries
    assert np.mean(nit_k == nit_r) > 0.95
    assert np.asarray(ker.converged).all()


@requires_tpu
def test_whole_solve_fista_high_compiled():
    """bf16x3 (hi_lo) mode: the bitmask-truncation split must survive
    --xla_allow_excess_precision (a round-trip split degrades to
    single-pass bf16 and blows the iteration count ~4x — measured)."""
    import decomp_tpu

    rng = np.random.default_rng(61)
    m, f, n = 512, 256, 160
    a = (rng.normal(size=(f, n)) / np.sqrt(n)).astype(np.float32)
    xt = (rng.normal(size=(m, f)) * (rng.random((m, f)) < 0.1)
          ).astype(np.float32)
    y = (xt @ a + 0.01 * rng.normal(size=(m, n))).astype(np.float32)
    hi = decomp_tpu.lasso.solve(y, a, 0.05, method="fista", tol=1e-4,
                                maxiter=2000, per_problem=True,
                                use_pallas=True, precision="high")
    ref = decomp_tpu.lasso.solve(y, a, 0.05, method="fista", tol=1e-4,
                                 maxiter=2000, per_problem=True,
                                 use_pallas=False, precision="highest")
    assert _rel(hi.x, ref.x) < 1e-2
    # the iteration counts stay in the f32 regime (the degraded
    # single-pass mode needs ~4x more to cross the same tol)
    assert np.asarray(hi.niter).mean() < 1.5 * np.asarray(ref.niter).mean()


@requires_tpu
def test_solve_split_jit_on_tpu():
    """solve_split under jit ON THE TPU BACKEND — the configuration that
    motivated it (native complex is rejected there; the host-decomposing
    complex_split path needs concrete inputs)."""
    import decomp_tpu
    from decomp_tpu.ops import complex_split as cs

    rng = np.random.default_rng(12)
    m, f, n = 64, 32, 16
    a = ((rng.normal(size=(f, n)) + 1j * rng.normal(size=(f, n)))
         / np.sqrt(2 * n)).astype(np.complex64)
    y = (rng.normal(size=(m, n))
         + 1j * rng.normal(size=(m, n))).astype(np.complex64)
    jitted = jax.jit(lambda ys, as_: decomp_tpu.lasso.solve_split(
        ys, as_, 0.05, tol=1e-4, maxiter=2000))
    res = jitted(cs.from_numpy(y), cs.from_numpy(a))
    assert bool(res.converged)
    # KKT sanity on the reassembled complex solution (host side)
    x = np.asarray(res.x.re) + 1j * np.asarray(res.x.im)
    grad = (x @ np.asarray(a) - y) @ np.conj(np.asarray(a)).T
    # at optimum, |grad| <= alpha (+ tol slack) on zero coords
    zero = np.abs(x) < 1e-7
    assert np.abs(grad[zero]).max() < 0.05 + 2e-2


@requires_tpu
@pytest.mark.parametrize("precision", ["highest", "high"])
def test_whole_solve_split_complex_compiled(precision):
    """Split-complex whole-solve kernel (group_fc mode, round 4) vs the
    jnp split path, compiled through Mosaic: near-total per-row stop
    agreement (reduction order differs — one 2F-wide contraction vs
    four F-wide ones) and solution match."""
    import decomp_tpu
    from decomp_tpu.ops import complex_split as cs

    rng = np.random.default_rng(62)
    m, f, c = 512, 128, 128
    a = ((rng.normal(size=(f, c)) + 1j * rng.normal(size=(f, c)))
         / np.sqrt(2 * c)).astype(np.complex64)
    xt = ((rng.normal(size=(m, f)) + 1j * rng.normal(size=(m, f)))
          * (rng.random((m, f)) < 0.1)).astype(np.complex64)
    y = (xt @ a + 0.01 * (rng.normal(size=(m, c))
                          + 1j * rng.normal(size=(m, c)))
         ).astype(np.complex64)
    ys, a_s = cs.from_numpy(y), cs.from_numpy(a)
    kw = dict(tol=1e-4, maxiter=2000, method="acc_ista",
              per_problem=True, precision=precision)
    ref = decomp_tpu.lasso.solve_split(ys, a_s, 0.05, **kw)
    ker = decomp_tpu.lasso.solve_split(ys, a_s, 0.05, use_pallas=True,
                                       **kw)
    xr = np.asarray(ref.x.re) + 1j * np.asarray(ref.x.im)
    xk = np.asarray(ker.x.re) + 1j * np.asarray(ker.x.im)
    tol_x = 1e-4 if precision == "highest" else 1e-2
    assert (np.linalg.norm(xk - xr)
            / max(np.linalg.norm(xr), 1e-300)) < tol_x
    if precision == "highest":
        nr, nk = np.asarray(ref.niter), np.asarray(ker.niter)
        assert (nr == nk).mean() > 0.95
    assert np.asarray(ker.converged).all()
