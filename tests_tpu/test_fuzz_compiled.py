"""Compiled randomized kernel fuzz (real TPU).

The CPU fuzz tier (tests/test_fuzz.py) checks trajectory parity against
the NumPy mirror; the compiled oracles (test_pallas_compiled.py) check
the kernels at FIXED shapes. This tier closes the gap between them:
seeded-random shapes — deliberately unaligned, so the solve-level
padding paths compile too — driven through the Pallas kernel paths and
compared against the jnp paths ON THE CHIP. A Mosaic frontier surprise
(the scoped-VMEM stacking class of bug: whole-program-dependent,
invisible at the fixed oracle shapes) fails here in pytest instead of
in a user's solve.

Tolerances are reduction-order budgets: kernel and jnp run the same
math at the same precision, differing only in contraction order, so
short trajectories (maxiter <= 12) stay within ~1e-4 relative at
f32-'highest'.

Shapes are drawn once from a fixed master seed (deterministic across
runs — required for the persistent compile cache to amortise the
~20-60 s remote compile each distinct shape costs on first run).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from decomp_tpu.ops.pallas_mu import calibrated_tpu

requires_tpu = pytest.mark.skipif(
    not calibrated_tpu(),
    reason="compiled fuzz runs on real calibrated TPU hardware")


def _rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    denom = max(float(np.abs(b).max()), 1e-30)
    return float(np.abs(a - b).max()) / denom


_RNG = np.random.default_rng(0xF022)
# (m, n) drawn once at import: unaligned on purpose.
_MU_CASES = [(int(_RNG.integers(600, 5000)), int(_RNG.integers(150, 1500)))
             for _ in range(3)]
_LASSO_CASES = [(int(_RNG.integers(400, 3000)),  # problems
                 int(_RNG.integers(60, 400)),    # features
                 int(_RNG.integers(100, 300)))   # channels
                for _ in range(2)]
_DL_CASES = [(int(_RNG.integers(800, 6000)),     # samples
              int(_RNG.integers(60, 200)),       # channels
              int(_RNG.integers(24, 200)))       # atoms
             for _ in range(2)]


@requires_tpu
@pytest.mark.parametrize("case", range(len(_MU_CASES)))
@pytest.mark.parametrize("masked", [False, True])
def test_fuzz_mu_kernel_vs_jnp(case, masked):
    import decomp_tpu

    m, n = _MU_CASES[case]
    k = int(np.random.default_rng(case).integers(8, 100))
    rng = np.random.default_rng(1000 + case)
    y = np.abs(rng.normal(size=(m, n))).astype(np.float32)
    mask = ((rng.random((m, n)) > 0.3).astype(np.float32)
            if masked else None)
    x0 = rng.uniform(0.1, 1.0, (m, k)).astype(np.float32)
    d0 = rng.uniform(0.1, 1.0, (k, n)).astype(np.float32)
    kw = dict(x=x0, mask=mask, tol=0.0, maxiter=10, random_seed=0,
              precision="highest")
    ker = decomp_tpu.nmf.solve(y, d0, use_pallas=True, **kw)
    ref = decomp_tpu.nmf.solve(y, d0, use_pallas=False, **kw)
    r = _rel(ker.d, ref.d)
    assert r < 5e-4, (m, n, k, masked, r)


@requires_tpu
@pytest.mark.parametrize("case", range(len(_LASSO_CASES)))
def test_fuzz_whole_solve_lasso_vs_jnp(case):
    """Per-problem whole-solve kernel at a random unaligned batch shape:
    per-row stop iterations must match the jnp path row-for-row (same
    math, same freeze rule) and solutions to reduction-order budget."""
    import decomp_tpu

    p, f, c = _LASSO_CASES[case]
    rng = np.random.default_rng(2000 + case)
    a = (rng.normal(size=(f, c)) / np.sqrt(c)).astype(np.float32)
    xt = (rng.normal(size=(p, f)) * (rng.random((p, f)) < 0.1)
          ).astype(np.float32)
    y = (xt @ a + 0.01 * rng.normal(size=(p, c))).astype(np.float32)
    kw = dict(tol=1e-3, maxiter=300, method="acc_ista",
              per_problem=True, precision="highest")
    ker = decomp_tpu.lasso.solve(y, a, 0.05, use_pallas=True, **kw)
    ref = decomp_tpu.lasso.solve(y, a, 0.05, use_pallas=False, **kw)
    niter_match = float(np.mean(np.asarray(ker.niter)
                                == np.asarray(ref.niter)))
    assert niter_match > 0.98, (p, f, c, niter_match)
    assert _rel(ker.x, ref.x) < 2e-3, (p, f, c, _rel(ker.x, ref.x))


@requires_tpu
@pytest.mark.parametrize("case", range(len(_DL_CASES)))
def test_fuzz_dl_bcd_kernel_vs_jnp(case):
    """Dictionary learning at a random shape: compiled BCD sweep kernel
    (forced) vs the jnp sweep, identical coding path."""
    import decomp_tpu

    m, n, k = _DL_CASES[case]
    rng = np.random.default_rng(3000 + case)
    dt = rng.normal(size=(k, n))
    dt /= np.linalg.norm(dt, axis=1, keepdims=True)
    xs = rng.normal(size=(m, k)) * (rng.random((m, k)) < 0.15)
    y = (xs @ dt + 0.01 * rng.normal(size=(m, n))).astype(np.float32)
    d0 = rng.normal(size=(k, n)).astype(np.float32)
    kw = dict(tol=0.0, maxiter=6, lasso_iter=4, precision="highest",
              use_pallas=False)
    ker = decomp_tpu.dictionary_learning.solve(y, d0, 0.05,
                                               _bcd_pallas=True, **kw)
    ref = decomp_tpu.dictionary_learning.solve(y, d0, 0.05,
                                               _bcd_pallas=False, **kw)
    assert _rel(ker.d, ref.d) < 5e-4, (m, n, k, _rel(ker.d, ref.d))
    assert _rel(ker.x, ref.x) < 5e-3, (m, n, k, _rel(ker.x, ref.x))
