"""Example: per-problem convergence for a mixed-difficulty lasso batch.

Each row of y is an independent problem; with the default (reference-
parity) global criterion everyone runs until the SLOWEST row converges.
`per_problem=True` freezes each row at its own stopping iteration and
returns per-row iteration counts and convergence flags — the outputs
match solving every row separately, at batched-matmul speed.

    python examples/per_problem_lasso.py
"""

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


if __name__ == "__main__":
    main()
