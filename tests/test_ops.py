"""Unit tests for the compute building blocks (ops/ and utils/)."""

import jax.numpy as jnp
import numpy as np
import pytest

from decomp_tpu.ops import (
    lipschitz_gram,
    run_iterations,
    soft_threshold,
    spectral_norm_psd,
)
from decomp_tpu.utils.dtypes import real_dtype
from decomp_tpu.utils.normalize import l2_normalize


def test_soft_threshold_real():
    x = jnp.asarray([-2.0, -0.5, 0.0, 0.5, 2.0])
    out = np.asarray(soft_threshold(x, 1.0))
    np.testing.assert_allclose(out, [-1.0, 0.0, 0.0, 0.0, 1.0])


def test_soft_threshold_complex_keeps_phase():
    z = jnp.asarray([3 + 4j, 0.1 + 0.1j, 0j])
    out = np.asarray(soft_threshold(z, 1.0))
    # |3+4j| = 5 -> shrink to 4, same phase
    np.testing.assert_allclose(out[0], (3 + 4j) * (4 / 5), rtol=1e-12)
    assert out[1] == 0 and out[2] == 0


def test_spectral_norm_matches_eigvalsh():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(40, 60))
    gram = a @ a.T
    exact = np.linalg.eigvalsh(gram)[-1]
    est = float(spectral_norm_psd(jnp.asarray(gram)))
    assert exact <= est <= 1.05 * exact  # upper bound, tight
    est_eigh = float(spectral_norm_psd(jnp.asarray(gram), method="eigh"))
    np.testing.assert_allclose(est_eigh, exact, rtol=1e-10)


def test_spectral_norm_complex():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(20, 30)) + 1j * rng.normal(size=(20, 30))
    gram = a @ a.conj().T
    exact = np.linalg.eigvalsh(gram)[-1]
    est = float(lipschitz_gram(jnp.asarray(a)))
    assert exact <= est <= 1.05 * exact


def test_spectral_norm_never_exceeds_certified_bound():
    """The safety-scaled estimate is capped by the Hermitian inf-norm upper
    bound, and stays a valid upper bound on lambda_max across a sweep of
    random PSD shapes (step-size validity: ADVICE round 1)."""
    rng = np.random.default_rng(2)
    for n_feat, n_ch in [(5, 8), (64, 32), (128, 200)]:
        a = rng.normal(size=(n_feat, n_ch))
        gram = a @ a.T
        exact = np.linalg.eigvalsh(gram)[-1]
        ub = np.max(np.sum(np.abs(gram), axis=-1))
        est = float(spectral_norm_psd(jnp.asarray(gram)))
        assert exact * (1 - 1e-10) <= est <= ub * (1 + 1e-10)


def test_spectral_norm_slow_convergence_falls_back_to_certificate():
    """A huge ill-conditioned cluster that the 60-step power iteration
    cannot settle must not silently undershoot: the Rayleigh/matvec gap
    triggers the certified upper bound."""
    from decomp_tpu.ops.spectral import spectral_norm_psd as sn

    # Two eigenvalues 1.0005 apart with eigenvectors mixing the ramp start
    # equally: after `iters` steps the iterate is still a strong mix.
    n = 64
    q, _ = np.linalg.qr(np.random.default_rng(3).normal(size=(n, n)))
    evals = np.full(n, 1e-3)
    evals[0], evals[1] = 100.0, 99.95
    gram = (q * evals) @ q.T
    exact = np.linalg.eigvalsh(gram)[-1]
    est = float(sn(jnp.asarray(gram), iters=3))  # deliberately undercooked
    assert est >= exact * (1 - 1e-10)


def test_run_iterations_converges_and_counts():
    # x <- x/2 from 1.0: rel change is |x/2 - x| / (x/2) = 1 ... never
    # converges by rel change; use absolute-style diff instead.
    def step(state, it):
        return (state[0] * 0.5,)

    res = run_iterations(
        step, (jnp.asarray(1.0),), tol=1e-3, maxiter=100,
        diff_fn=lambda old, new: jnp.abs(new[0] - old[0]),
    )
    # diff at iteration k (1-based) is 2^-k; first < 1e-3 at k = 10
    assert int(res.niter) == 10
    assert bool(res.converged)
    np.testing.assert_allclose(float(res.state[0]), 2.0 ** -10)
    assert res.objective.shape == (0,)


def test_run_iterations_maxiter_and_objective():
    def step(state, it):
        return (state[0] + 1.0,)

    res = run_iterations(
        step, (jnp.asarray(0.0),), tol=0.0, maxiter=5,
        diff_fn=lambda old, new: jnp.asarray(1.0),
        objective_fn=lambda s: s[0], record_objective=True,
    )
    assert int(res.niter) == 5 and not bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.objective),
                               [1.0, 2.0, 3.0, 4.0, 5.0])


def test_run_iterations_rejects_bad_args():
    with pytest.raises(ValueError):
        run_iterations(lambda s, i: s, (jnp.asarray(0.0),), tol=0.0,
                       maxiter=0, diff_fn=lambda a, b: jnp.asarray(1.0))
    with pytest.raises(ValueError):
        run_iterations(lambda s, i: s, (jnp.asarray(0.0),), tol=0.0,
                       maxiter=3, diff_fn=lambda a, b: jnp.asarray(1.0),
                       record_objective=True)


def test_l2_normalize_zero_safe():
    d = jnp.asarray([[3.0, 4.0], [0.0, 0.0]])
    out = np.asarray(l2_normalize(d, axis=1))
    np.testing.assert_allclose(out[0], [0.6, 0.8])
    np.testing.assert_allclose(out[1], [0.0, 0.0])


def test_real_dtype():
    assert real_dtype(jnp.complex64) == np.float32
    assert real_dtype(jnp.complex128) == np.float64
    assert real_dtype(jnp.float32) == np.float32
    assert real_dtype(jnp.bfloat16) == jnp.bfloat16


def test_check_every_block_semantics():
    # x <- x + 1, diff measured across the block
    def step(state, it):
        return (state[0] + 1.0,)

    res = run_iterations(
        step, (jnp.asarray(0.0),), tol=0.0, maxiter=10,
        diff_fn=lambda o, n: jnp.abs(n[0] - o[0]), check_every=4,
    )
    assert int(res.niter) == 10  # 4 + 4 + 2 (remainder block)
    np.testing.assert_allclose(float(res.state[0]), 10.0)

    # converges when the across-block change drops below tol
    def decay(state, it):
        return (state[0] * 0.5,)

    res = run_iterations(
        decay, (jnp.asarray(1.0),), tol=1e-3, maxiter=100,
        diff_fn=lambda o, n: jnp.abs(n[0] - o[0]), check_every=4,
    )
    assert bool(res.converged)
    assert int(res.niter) % 4 == 0

    with pytest.raises(ValueError):
        run_iterations(step, (jnp.asarray(0.0),), tol=0.0, maxiter=4,
                       diff_fn=lambda o, n: jnp.asarray(1.0),
                       check_every=2, objective_fn=lambda s: s[0],
                       record_objective=True)
