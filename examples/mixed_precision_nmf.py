"""Example: the converging high-throughput operating point for big data.

At large scale, MU-NMF on bf16-STORED factors freezes: the per-step
relative changes fall below bf16's resolution and every update rounds
away (measured at 400k x 10k — see BASELINE.md). `factor_dtype` splits
the dtypes: the data matrix y stays bf16 (half the HBM traffic, bf16 MXU
throughput) while the x/d iterates live in f32 and keep integrating the
updates. On a v5e this runs at ~81% of peak matmul FLOPs while tracking
the f32-exact objective curve to <1%.

    python examples/mixed_precision_nmf.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

import decomp_tpu


def main():
    rng = np.random.default_rng(0)
    # bf16 matmuls are emulated (slowly) on the CPU backend; keep the
    # demonstration shape TPU-sized only where it actually runs on TPU.
    if jax.default_backend() == "tpu":
        m, n, rank = 20_000, 1024, 64
    else:
        m, n, rank = 2_000, 256, 16
    y = (rng.uniform(0, 1, (m, rank)) @ rng.uniform(0, 1, (rank, n)))
    y16 = y.astype(jnp.bfloat16)                      # data in bf16

    res = decomp_tpu.nmf.solve(
        y16, rank=rank,
        factor_dtype=jnp.float32,                     # iterates in f32
        precision="default",                          # single-pass bf16 MXU
        tol=1e-3,                                     # mixed-mode floor
        maxiter=2000, random_seed=1)
    assert res.x.dtype == jnp.float32

    recon = np.asarray(res.x) @ np.asarray(res.d)
    rel = np.linalg.norm(recon - y) / np.linalg.norm(y)
    print(f"mixed-precision NMF: {int(res.niter)} iterations, "
          f"converged={bool(res.converged)}, rel recon err {rel:.2e}")

    # Contrast: the same solve with bf16-stored factors barely moves at
    # scale (here, at toy size, it limps to a worse answer).
    res16 = decomp_tpu.nmf.solve(y16, rank=rank, precision="default",
                                 tol=1e-3, maxiter=2000, random_seed=1)
    recon16 = (np.asarray(res16.x, np.float32)
               @ np.asarray(res16.d, np.float32))
    rel16 = np.linalg.norm(recon16 - y) / np.linalg.norm(y)
    print(f"bf16-stored factors:  {int(res16.niter)} iterations, "
          f"rel recon err {rel16:.2e}")


if __name__ == "__main__":
    main()
