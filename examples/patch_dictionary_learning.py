"""Example: learn a sparse dictionary for 8x8 image patches.

Mirrors the reference's canonical use case (BASELINE.json:9): extract
patches, learn 256 unit-norm atoms with the online (minibatch) variant,
then sparse-code with FISTA. Synthetic "image" so the example is
self-contained; runs on CPU or TPU unchanged.

    python examples/patch_dictionary_learning.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

import decomp_tpu


def make_patches(n_patches=20_000, patch=8, seed=0):
    """Synthetic texture: sparse combinations of 2-D cosine atoms."""
    rng = np.random.default_rng(seed)
    # DCT-ish dictionary as the "true" generator
    freqs = [(i, j) for i in range(4) for j in range(4)]
    atoms = []
    grid = np.arange(patch)
    for fi, fj in freqs:
        a = np.outer(np.cos(np.pi * fi * (grid + 0.5) / patch),
                     np.cos(np.pi * fj * (grid + 0.5) / patch)).ravel()
        atoms.append(a / np.linalg.norm(a))
    atoms = np.stack(atoms)
    codes = rng.normal(size=(n_patches, len(atoms)))
    codes *= rng.random(codes.shape) < 0.15
    y = codes @ atoms + 0.02 * rng.normal(size=(n_patches, patch * patch))
    return y.astype(np.float32)


def main():
    y = make_patches()
    rng = np.random.default_rng(1)
    d0 = rng.normal(size=(256, y.shape[1])).astype(np.float32)

    res = decomp_tpu.dictionary_learning.solve(
        y, d0, alpha=0.08, maxiter=300, lasso_iter=8, minibatch=512,
        random_seed=2, tol=0.0, record_objective=True)
    objs = np.asarray(res.objective)
    print(f"online DL: objective {objs[0]:.1f} -> {objs[-1]:.1f} "
          f"over {int(res.niter)} outer iterations")

    # Final full-batch sparse coding with the learned dictionary.
    codes = decomp_tpu.lasso.solve(y, res.d, alpha=0.08, method="fista",
                                   tol=1e-5, maxiter=2000)
    x = np.asarray(codes.x)
    recon = x @ np.asarray(res.d)
    rel = np.linalg.norm(recon - y) / np.linalg.norm(y)
    sparsity = float((np.abs(x) > 1e-6).mean())
    print(f"sparse coding: rel reconstruction error {rel:.3f}, "
          f"{sparsity:.1%} nonzero coefficients")


if __name__ == "__main__":
    main()
