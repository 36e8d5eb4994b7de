"""Example: matrix completion with masked NMF.

Factorise a nonnegative matrix with 30% of its entries missing
(BASELINE.json:10) and evaluate reconstruction on the held-out entries.
Runs on CPU or TPU unchanged (on TPU, the fused masked Pallas kernel is
selected automatically for large inputs).

    python examples/masked_nmf_completion.py
"""

import numpy as np

import decomp_tpu


def main():
    rng = np.random.default_rng(0)
    m, n, rank = 5000, 400, 12
    y_true = rng.uniform(0, 1, (m, rank)) @ rng.uniform(0, 1, (rank, n))
    y_true = y_true.astype(np.float32)
    mask = (rng.random((m, n)) >= 0.3).astype(np.float32)

    res = decomp_tpu.nmf.solve(y_true * mask, rank=rank, mask=mask,
                               tol=1e-5, maxiter=5000, random_seed=1)
    recon = np.asarray(res.x) @ np.asarray(res.d)
    held_out = mask == 0
    rel = (np.linalg.norm(recon[held_out] - y_true[held_out])
           / np.linalg.norm(y_true[held_out]))
    print(f"masked NMF: {int(res.niter)} iterations, "
          f"converged={bool(res.converged)}")
    print(f"held-out relative reconstruction error: {rel:.4f}")

    # Resume from the factors (the warm-start/checkpoint contract).
    res2 = decomp_tpu.nmf.solve(y_true * mask, res.d, x=res.x, mask=mask,
                                tol=1e-6, maxiter=2000)
    print(f"refined to tol=1e-6 in {int(res2.niter)} more iterations")


if __name__ == "__main__":
    main()
