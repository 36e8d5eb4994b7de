"""Degenerate-input robustness: no NaNs/Infs out of the solvers for inputs
a user will eventually feed them."""

import numpy as np
import pytest

import decomp_tpu
from problems import planted_nmf, rel_err


def _finite(*arrays):
    return all(np.isfinite(np.asarray(a)).all() for a in arrays)


def test_nmf_all_zero_rows_and_columns():
    y, *_ = planted_nmf(seed=50, n_samples=40, n_channels=30, rank=3)
    y[5] = 0.0
    y[:, 7] = 0.0
    res = decomp_tpu.nmf.solve(y, rank=3, tol=0.0, maxiter=200,
                               random_seed=1)
    assert _finite(res.x, res.d)


def test_nmf_fully_masked_row():
    y, *_ = planted_nmf(seed=51, n_samples=40, n_channels=30, rank=3)
    mask = np.ones_like(y)
    mask[3] = 0.0          # a sample with no observations at all
    mask[:, 11] = 0.0      # a channel with no observations at all
    res = decomp_tpu.nmf.solve(y * mask, rank=3, mask=mask, tol=0.0,
                               maxiter=200, random_seed=2)
    assert _finite(res.x, res.d)


def test_nmf_zero_matrix():
    y = np.zeros((16, 12))
    res = decomp_tpu.nmf.solve(y, rank=2, tol=0.0, maxiter=50,
                               random_seed=3)
    assert _finite(res.x, res.d)


def test_lasso_zero_dictionary_row():
    rng = np.random.default_rng(52)
    a = rng.normal(size=(10, 20))
    a[4] = 0.0             # dead atom: gram row/col zero
    y = rng.normal(size=(6, 20))
    for method in ("fista", "parallel_cd", "cd"):
        res = decomp_tpu.lasso.solve(y, a, 0.1, tol=0.0, maxiter=100,
                                     method=method)
        x = np.asarray(res.x)
        assert np.isfinite(x).all(), method
        assert np.allclose(x[:, 4], 0.0), method  # dead atom stays unused


def test_lasso_zero_y():
    rng = np.random.default_rng(53)
    a = rng.normal(size=(10, 20))
    res = decomp_tpu.lasso.solve(np.zeros((4, 20)), a, 0.1, tol=1e-8,
                                 maxiter=50)
    assert bool(res.converged)
    assert np.allclose(np.asarray(res.x), 0.0)


def test_lasso_single_sample_single_feature():
    rng = np.random.default_rng(54)
    a = rng.normal(size=(1, 8))
    y = rng.normal(size=(1, 8))
    res = decomp_tpu.lasso.solve(y, a, 0.01, tol=1e-10, maxiter=2000)
    assert bool(res.converged)
    # closed form: soft-threshold of the scalar least-squares solution
    g = float((a @ a.T).item())
    r = float((y @ a.T).item())
    expect = np.sign(r) * max(abs(r) - 0.01, 0) / g
    np.testing.assert_allclose(float(res.x[0, 0]), expect, rtol=1e-6)


def test_dictionary_learning_dead_atom_survives():
    from problems import planted_patches
    y, d_true, _ = planted_patches(seed=55, n_samples=120)
    d0 = np.array(d_true)
    d0[2] = 0.0            # zero atom in the init
    res = decomp_tpu.dictionary_learning.solve(y, d0, 0.05, tol=0.0,
                                               maxiter=10, lasso_iter=5)
    assert _finite(res.x, res.d)


def test_nmf_rank_larger_than_channels():
    y, *_ = planted_nmf(seed=56, n_samples=30, n_channels=8, rank=2)
    res = decomp_tpu.nmf.solve(y, rank=16, tol=0.0, maxiter=100,
                               random_seed=4)
    assert _finite(res.x, res.d)
    recon = np.asarray(res.x) @ np.asarray(res.d)
    assert rel_err(recon, y) < 0.1


def test_hals_overcomplete_rank_stays_finite():
    """Rank above true rank: near-dead components must not blow up
    (the HALS denominators get a relative floor, not a tiny clamp)."""
    y, *_ = planted_nmf(seed=57, n_samples=60, n_channels=30, rank=2)
    res = decomp_tpu.nmf.solve(y.astype(np.float32), rank=16, tol=0.0,
                               maxiter=3000, method="hals", random_seed=5)
    assert _finite(res.x, res.d)
    recon = np.asarray(res.x, np.float64) @ np.asarray(res.d, np.float64)
    assert rel_err(recon, y) < 0.05
