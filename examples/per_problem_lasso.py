"""Example: per-problem convergence for a mixed-difficulty lasso batch.

Each row of y is an independent problem; with the default (reference-
parity) global criterion everyone runs until the SLOWEST row converges.
`per_problem=True` freezes each row at its own stopping iteration and
returns per-row iteration counts and convergence flags — the outputs
match solving every row separately, at batched-matmul speed.

    python examples/per_problem_lasso.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

import decomp_tpu


def main():
    rng = np.random.default_rng(0)
    n_problems, n_features, n_channels = 512, 64, 128
    a = rng.normal(size=(n_features, n_channels)).astype(np.float32)
    # difficulty spread: row scales across three orders of magnitude
    y = (rng.normal(size=(n_problems, n_channels))
         * 10.0 ** rng.uniform(-2, 1, (n_problems, 1))).astype(np.float32)

    res = decomp_tpu.lasso.solve(y, a, alpha=0.05, method="acc_ista",
                                 tol=1e-5, maxiter=5000, per_problem=True)
    niter = np.asarray(res.niter)
    print(f"all converged: {bool(np.asarray(res.converged).all())}")
    print(f"per-row iterations: min {niter.min()}, median "
          f"{int(np.median(niter))}, max {niter.max()}")

    # Exact chunked resume (e.g. checkpointing a long run): momentum
    # state makes the restarted trajectory bit-identical.
    r1 = decomp_tpu.lasso.solve(y, a, 0.05, method="acc_ista", tol=0.0,
                                maxiter=50, return_state=True)
    r2 = decomp_tpu.lasso.solve(y, a, 0.05, x=r1.x, method="acc_ista",
                                tol=0.0, maxiter=50,
                                momentum_state=(r1.aux["z"], r1.aux["t"]))
    straight = decomp_tpu.lasso.solve(y, a, 0.05, method="acc_ista",
                                      tol=0.0, maxiter=100)
    exact = np.array_equal(np.asarray(r2.x), np.asarray(straight.x))
    print(f"chunked 50+50 == straight 100 iterations: {exact}")

    # Per-problem chunking is ALSO exact: the state dict carries each
    # row's momentum plus its converged/niter, so resumed rows stay
    # frozen and the per-row counts accumulate. (On TPU, per_problem
    # solves like these run the whole-solve Pallas kernel — the F x F
    # Gram and every iterate stay VMEM-resident for the entire solve.)
    p1 = decomp_tpu.lasso.solve(y, a, 0.05, method="acc_ista", tol=1e-5,
                                maxiter=60, per_problem=True,
                                return_state=True)
    st = {"z": p1.aux["z"], "t": p1.aux["t"],
          "done": p1.converged, "niter": p1.niter}
    p2 = decomp_tpu.lasso.solve(y, a, 0.05, x=p1.x, method="acc_ista",
                                tol=1e-5, maxiter=4940, per_problem=True,
                                state=st)
    pp = decomp_tpu.lasso.solve(y, a, 0.05, method="acc_ista", tol=1e-5,
                                maxiter=5000, per_problem=True)
    same = np.array_equal(np.asarray(p2.niter), np.asarray(pp.niter))
    print(f"chunked per-problem niter == straight per-problem: {same}")


if __name__ == "__main__":
    main()
