"""A/B the fused BCD dictionary-sweep kernel (ops.pallas_bcd) against
the jnp ``lax.fori_loop`` sweep, micro and solve-level.

The sweep is sequential over atoms with tiny per-step arithmetic
(~33 kFLOP at config 3), so the XLA loop is latency-bound: 256 serial
micro-steps against HBM-resident values. The kernel runs the whole
sweep in one ``pallas_call`` with A/B/d VMEM-resident (docstring of
ops.pallas_bcd for the design).

1. Micro: per-sweep time at config-3 geometry (K=256, N=128), measured
   by chaining ``--chain`` sweeps in ONE jitted scan (a single sweep is
   ~100 us — far below the ~25 ms tunnel dispatch floor, BASELINE.md
   environment table).
2. Solve-level: config-3 dictionary learning (20k x 64ch, 256 atoms,
   60 outer iterations) with the sweep kernel on vs off, both at the
   coding step's best operating point (fixed-budget whole-solve
   kernel, lasso_tol=0.0).

Usage: python benchmarks/bench_bcd_sweep.py [--small] [--chain N]
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
from decomp_tpu.models.dictionary_learning import (  # noqa: E402
    _bcd_dict_update)


def micro(small, chain):
    k, n = (32, 128) if small else (256, 128)
    rng = np.random.default_rng(3)
    x = rng.normal(size=(4 * k, k)).astype(np.float32)
    y = rng.normal(size=(4 * k, n)).astype(np.float32)
    a = jnp.asarray(x.T @ x)
    b = jnp.asarray(x.T @ y)
    d0 = rng.normal(size=(k, n)).astype(np.float32)
    d0 = jnp.asarray(d0 / np.linalg.norm(d0, axis=1, keepdims=True))
    on_tpu = jax.devices()[0].platform != "cpu"
    interp = not on_tpu

    def chained(sweep):
        @jax.jit
        def run(d):
            def step(d_, _):
                return sweep(d_), None
            return jax.lax.scan(step, d, None, length=chain)[0]
        return run

    with jax.default_matmul_precision("highest"):
        run_jnp = chained(lambda d: _bcd_dict_update(a, b, d))
        run_ker = chained(lambda d: _bcd_dict_update(
            a, b, d, bcd_mode="interpret" if interp else "tpu"))
        # parity fence (also warms both compiles)
        out_j = np.asarray(run_jnp(d0))
        out_k = np.asarray(run_ker(d0))
        err = float(np.abs(out_j - out_k).max()
                    / max(np.abs(out_j).max(), 1e-30))

        def best_of(fn, reps=5):
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                jax.block_until_ready(fn(d0))
                best = min(best, time.perf_counter() - t0)
            return best

        t_jnp = best_of(run_jnp)
        t_ker = best_of(run_ker)
    print(json.dumps({
        "bench": "bcd_sweep_micro",
        "shape": f"K={k} N={n} chain={chain}",
        "jnp_us_per_sweep": round(1e6 * t_jnp / chain, 1),
        "kernel_us_per_sweep": round(1e6 * t_ker / chain, 1),
        "kernel_vs_jnp": round(t_jnp / t_ker, 2),
        "max_rel_err": err,
    }))
    return t_jnp / t_ker


def solve_level(small):
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
    bcd_on = True if on_tpu else "interpret"
    kw = dict(tol=1e-5, maxiter=60, lasso_iter=15, lasso_tol=0.0,
              precision="high", use_pallas=True, **interp)

    def run(bcd):
        return decomp_tpu.dictionary_learning.solve(
            y, d0, 0.05, _bcd_pallas=bcd, **kw)

    def best_of(fn, reps=5):
        best = float("inf")
        res = None
        for _ in range(reps):
            t0 = time.perf_counter()
            res = fn()
            jax.block_until_ready(res.d)
            best = min(best, time.perf_counter() - t0)
        return res, best

    res_off, t_off = best_of(lambda: run(False))
    res_on, t_on = best_of(lambda: run(bcd_on))

    def obj(res):
        recon = res.x @ res.d
        return float(0.5 * jnp.sum((y - recon) ** 2)
                     + 0.05 * jnp.sum(jnp.abs(res.x)))

    print(json.dumps({
        "bench": "c3_dl_bcd_sweep",
        "sweep_off_ms": round(1e3 * t_off, 1),
        "sweep_kernel_ms": round(1e3 * t_on, 1),
        "kernel_vs_off": round(t_off / t_on, 3),
        "objective_off": round(obj(res_off), 2),
        "objective_kernel": round(obj(res_on), 2),
    }))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--small", action="store_true")
    p.add_argument("--chain", type=int, default=200)
    args = p.parse_args()
    micro(args.small, args.chain if not args.small else 20)
    solve_level(args.small)
