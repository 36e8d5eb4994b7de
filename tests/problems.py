"""Planted-factorisation problem generators (SURVEY.md §4: every test
synthesizes a problem with a known factorisation, fixed RNG seed)."""

import numpy as np


def planted_lasso(seed=0, n_samples=6, n_features=24, n_channels=16,
                  density=0.25, noise=0.01, complex_=False):
    rng = np.random.default_rng(seed)

    def randn(*shape):
        z = rng.normal(size=shape)
        if complex_:
            z = (z + 1j * rng.normal(size=shape)) / np.sqrt(2)
        return z

    a = randn(n_features, n_channels)
    a /= np.sqrt(np.sum(np.abs(a) ** 2, axis=1, keepdims=True))
    x_true = randn(n_samples, n_features)
    x_true *= rng.random((n_samples, n_features)) < density
    y = x_true @ a + noise * randn(n_samples, n_channels)
    return y, a, x_true


def planted_nmf(seed=0, n_samples=60, n_channels=40, rank=5, noise=0.01):
    rng = np.random.default_rng(seed)
    x_true = rng.uniform(0.0, 1.0, (n_samples, rank))
    d_true = rng.uniform(0.0, 1.0, (rank, n_channels))
    y = x_true @ d_true + noise * rng.normal(size=(n_samples, n_channels))
    return np.maximum(y, 0.0), x_true, d_true


def random_mask(seed, shape, frac_missing=0.3):
    rng = np.random.default_rng(seed)
    return (rng.random(shape) >= frac_missing).astype(np.float64)


def planted_patches(seed=0, n_samples=200, n_channels=64, n_atoms=12,
                    density=0.25, noise=0.01, complex_=False):
    """Sparse-codes-over-unit-atoms problem, 8x8-image-patch shaped
    (BASELINE.json:9 config 3)."""
    rng = np.random.default_rng(seed)

    def randn(*shape):
        z = rng.normal(size=shape)
        if complex_:
            z = (z + 1j * rng.normal(size=shape)) / np.sqrt(2)
        return z

    d_true = randn(n_atoms, n_channels)
    d_true /= np.sqrt(np.sum(np.abs(d_true) ** 2, axis=1, keepdims=True))
    x_true = randn(n_samples, n_atoms)
    x_true *= rng.random((n_samples, n_atoms)) < density
    y = x_true @ d_true + noise * randn(n_samples, n_channels)
    return y, d_true, x_true


def rel_err(approx, exact):
    return float(np.linalg.norm(np.asarray(approx) - np.asarray(exact))
                 / max(np.linalg.norm(np.asarray(exact)), 1e-300))
