"""Example: matrix completion with masked NMF.

Factorise a nonnegative matrix with 30% of its entries missing
(BASELINE.json:10) and evaluate reconstruction on the held-out entries.
Runs on CPU or TPU unchanged (on TPU, the fused masked Pallas kernel is
selected automatically for large inputs).

    python examples/masked_nmf_completion.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

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

    # The completion PRESET: on TPU this runs the mixed operating point
    # (bf16 data / f32 factors through the fused masked kernel) and stops
    # when a reserved held-out fraction of observed entries plateaus —
    # the usable stopping rule for mixed mode (rel-change fires too
    # early there; see BASELINE.md). On CPU it runs f32 with the same
    # held-out stopping.
    res3 = decomp_tpu.nmf.masked_completion(y_true * mask, mask,
                                            rank=rank, maxiter=5000,
                                            random_seed=1)
    recon3 = np.asarray(res3.x) @ np.asarray(res3.d)
    rel3 = (np.linalg.norm(recon3[held_out] - y_true[held_out])
            / np.linalg.norm(y_true[held_out]))
    print(f"masked_completion preset: {int(res3.niter)} iterations, "
          f"reported heldout={float(res3.aux['heldout_rel_err']):.4f}, "
          f"true missing-entry error={rel3:.4f}")


if __name__ == "__main__":
    main()
