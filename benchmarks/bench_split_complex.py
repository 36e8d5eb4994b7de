"""Split-complex whole-solve kernel vs jnp split path (round 4,
VERDICT round-3 Missing #4 "done" measurement).

Config-2-scale COMPLEX batch lasso: 10k independent problems, 512
complex features, 256 channels. The jnp split path runs the round-3
split-(re,im) composition (the ~5%-of-peak regime the real kernel was
built to escape); the kernel path runs ops.pallas_fista's group_fc mode
(real 2Fc x 2Fc Gram embedding + paired-magnitude soft-threshold).

Usage: python benchmarks/bench_split_complex.py [--small]
Emits one JSON line with both times and the speedup.
"""

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import decomp_tpu  # noqa: E402
from decomp_tpu.ops import complex_split as cs  # noqa: E402


def fence(x):
    return float(jnp.asarray(x, jnp.float32).sum())


def enable_cache():
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--repeats", type=int, default=4)
    args = ap.parse_args()
    enable_cache()

    if args.small:
        m, f, c = 256, 64, 48
    else:
        m, f, c = 10_000, 512, 256
    rng = np.random.default_rng(1)
    a = (rng.normal(size=(f, c))
         + 1j * rng.normal(size=(f, c))).astype(np.complex64)
    xt = ((rng.normal(size=(m, f)) + 1j * rng.normal(size=(m, f)))
          * (rng.random((m, f)) < 0.05)).astype(np.complex64)
    y = (xt @ a + 0.01 * (rng.normal(size=(m, c))
                          + 1j * rng.normal(size=(m, c)))
         ).astype(np.complex64)
    # device-resident split inputs (complex never touches the device)
    ys = cs.SplitComplex(jnp.asarray(y.real), jnp.asarray(y.imag))
    a_s = cs.SplitComplex(jnp.asarray(a.real), jnp.asarray(a.imag))
    fence(ys.re)

    kw = dict(tol=1e-4, maxiter=3000, method="acc_ista",
              per_problem=True)

    def run_jnp():
        # Explicit False: solve_split now DEFAULTS to use_pallas='auto',
        # which would route this baseline through the very kernel it is
        # the baseline for.
        return decomp_tpu.lasso.solve_split(ys, a_s, 0.1,
                                            precision="high",
                                            use_pallas=False, **kw)

    def run_kernel():
        return decomp_tpu.lasso.solve_split(ys, a_s, 0.1,
                                            precision="high",
                                            use_pallas=True, **kw)

    def best(fn):
        r = fn()
        fence(r.x.re)
        b = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            r = fn()
            fence(r.x.re)
            b = min(b, time.perf_counter() - t0)
        return r, b

    rk, tk = best(run_kernel)
    rj, tj = best(run_jnp)
    nk = np.asarray(rk.niter)
    nj = np.asarray(rj.niter)
    xr = np.asarray(rj.x.re) + 1j * np.asarray(rj.x.im)
    xp = np.asarray(rk.x.re) + 1j * np.asarray(rk.x.im)
    rel = float(np.linalg.norm(xp - xr) / max(np.linalg.norm(xr), 1e-30))
    out = {
        "config": f"split_complex_batch_lasso_{m}x{f}c",
        "kernel_time_to_tol_s": round(tk, 4),
        "jnp_split_time_to_tol_s": round(tj, 4),
        "speedup": round(tj / tk, 3),
        "per_row_niter_mean_kernel": round(float(nk.mean()), 1),
        "per_row_niter_mean_jnp": round(float(nj.mean()), 1),
        "niter_rows_equal": bool(np.array_equal(nk, nj)),
        "x_rel_err_vs_jnp": rel,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
