"""A/B the whole-solve kernel's FIXED-BUDGET mode (ops.pallas_fista
``fixed=True``, engaged by tol <= 0) against the exact per-row-stopping
kernel and the jnp path, on the graded shapes.

Two measurements:

1. Config-3 dictionary learning (20k patches x 64ch, 256 atoms,
   lasso_iter=15): the fixed short inner budget is exactly the regime
   where the exact kernel's freeze/stopping lattice is pure VPU overhead
   (measured round 3: kernel 'high' 155 ms vs jnp 'high' 126 ms). The
   fixed mode elides the lattice; this script asks whether that flips
   the kernel from loser to winner (``lasso_tol=0.0, use_pallas=True``).

2. Config-2-scale batch lasso (10k x 512) at a FIXED 300-iteration
   budget (tol=0): fixed kernel vs exact kernel at tol=0 isolates the
   lattice's per-iteration cost directly (identical math, same trip
   count — the only difference is the elided VPU work).

Usage: python benchmarks/bench_fixed_budget.py [--small]
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import decomp_tpu  # noqa: E402


def _fence(res):
    float(jnp.asarray(res.x, jnp.float32).sum())


def _best_of(fn, n=5):
    best = float("inf")
    res = None
    for _ in range(n):
        t0 = time.perf_counter()
        res = fn()
        _fence(res)
        best = min(best, time.perf_counter() - t0)
    return res, best


def dl_config3(small):
    n_samp, n_ch, n_atoms = (300, 64, 32) if small else (20_000, 64, 256)
    rng = np.random.default_rng(2)
    d_true = rng.normal(size=(n_atoms, n_ch))
    d_true /= np.linalg.norm(d_true, axis=1, keepdims=True)
    x_true = (rng.normal(size=(n_samp, n_atoms))
              * (rng.random((n_samp, n_atoms)) < 0.1))
    y = (x_true @ d_true
         + 0.01 * rng.normal(size=(n_samp, n_ch))).astype(np.float32)
    d0 = rng.normal(size=(n_atoms, n_ch)).astype(np.float32)
    y, d0 = jnp.asarray(y), jnp.asarray(d0)
    float(jnp.sum(y))
    on_tpu = jax.devices()[0].platform != "cpu"
    interp = {} if on_tpu else {"_pallas_interpret": True}
    kw = dict(tol=1e-5, maxiter=60, lasso_iter=15, precision="high")

    def run(**extra):
        return decomp_tpu.dictionary_learning.solve(y, d0, 0.05, **kw,
                                                    **extra)

    def obj(res):
        recon = res.x @ res.d
        return float(0.5 * jnp.sum((y - recon) ** 2)
                     + 0.05 * jnp.sum(jnp.abs(res.x)))

    res_jnp, t_jnp = _best_of(lambda: run())
    res_ker, t_ker = _best_of(lambda: run(use_pallas=True, **interp))
    res_fix, t_fix = _best_of(
        lambda: run(use_pallas=True, lasso_tol=0.0, **interp))
    print(json.dumps({
        "bench": "c3_dl_inner_coding",
        "jnp_high_ms": round(1e3 * t_jnp, 1),
        "kernel_exact_ms": round(1e3 * t_ker, 1),
        "kernel_fixed_ms": round(1e3 * t_fix, 1),
        "fixed_vs_jnp": round(t_jnp / t_fix, 3),
        "fixed_vs_exact_kernel": round(t_ker / t_fix, 3),
        "objective_jnp": round(obj(res_jnp), 2),
        "objective_fixed": round(obj(res_fix), 2),
    }))


def batch_lasso_fixed(small):
    n_prob, n_feat, n_ch = (256, 64, 48) if small else (10_000, 512, 256)
    rng = np.random.default_rng(1)
    a = rng.normal(size=(n_feat, n_ch)).astype(np.float32)
    x_true = (rng.normal(size=(n_prob, n_feat))
              * (rng.random((n_prob, n_feat)) < 0.05)).astype(np.float32)
    y = (x_true @ a
         + 0.01 * rng.normal(size=(n_prob, n_ch))).astype(np.float32)
    yd, ad = jnp.asarray(y), jnp.asarray(a)
    float(jnp.sum(yd))
    on_tpu = jax.devices()[0].platform != "cpu"
    interp = {} if on_tpu else {"_pallas_interpret": True}
    kw = dict(method="acc_ista", precision="high", per_problem=True,
              maxiter=300, use_pallas=True, **interp)

    from decomp_tpu.models import lasso as _lasso

    def run_fixed():
        return decomp_tpu.lasso.solve(yd, ad, 0.1, tol=0.0, **kw)

    def run_exact():
        # force the exact kernel at tol=0 (fixed off) for the A/B
        orig = _lasso._static_nonpositive
        _lasso._static_nonpositive = lambda t: False
        try:
            return decomp_tpu.lasso.solve(yd, ad, 0.1, tol=0.0, **kw)
        finally:
            _lasso._static_nonpositive = orig

    res_e, t_e = _best_of(run_exact)
    res_f, t_f = _best_of(run_fixed)
    err = float(jnp.linalg.norm(res_f.x - res_e.x)
                / jnp.maximum(jnp.linalg.norm(res_e.x), 1e-30))
    print(json.dumps({
        "bench": "c2_fixed_300iter_lattice_cost",
        "exact_kernel_ms": round(1e3 * t_e, 1),
        "fixed_kernel_ms": round(1e3 * t_f, 1),
        "fixed_vs_exact": round(t_e / t_f, 3),
        "x_rel": float(f"{err:.2e}"),
    }))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--small", action="store_true")
    args = p.parse_args()
    dl_config3(args.small)
    batch_lasso_fixed(args.small)
