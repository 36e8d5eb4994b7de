"""Config-5 FULL SHAPE on one chip: 1M x 10112 rank-128 out-of-core NMF
(VERDICT.md round-2 Missing #4 / Next #4).

BASELINE.json:11's pod-scale shape is 1M x 10k over a v5e-8; this single
16 GB chip cannot hold y (1M x 10112 bf16 = 20.2 GB), so the run streams
row chunks through ``nmf.solve_streaming`` — the mixed operating point
(bf16 data stream, f32 factor iterates) with the activation matrix x
device-resident (512 MB) so no per-iteration host traffic exists.

The data chunks are GENERATED ON DEVICE by the callable loader (planted
rank-128 factorisation + noise, deterministic per chunk): the point of
the measurement is the full-shape compute path, not this rig's tunnel
bandwidth — a production deployment would read chunks from local storage
/ host RAM; the loader abstraction is exactly where that plugs in. The
generation cost (2 M N K flops per pass vs the solver's ~4 M N K) is
INCLUDED in the measured wall time, so the solver-only throughput is
understated rather than inflated.

Usage:  python benchmarks/full_shape_streaming.py [--iters 30] [--small]
Emits one JSON line; saves the objective / rel-change curves under
benchmarks/out/.
"""

import argparse
import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import decomp_tpu  # noqa: E402
from bench import peak_flops  # noqa: E402

OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "out")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--cache", type=int, default=0,
                    help="hbm_cache_chunks for the fused epoch")
    args = ap.parse_args()

    if args.small:
        m, n, k, chunk = 4096, 512, 16, 1024
    else:
        # 2^20 rows (>= the 1M spec) so the chunk size is both a
        # divisor of M and 128-aligned for the fused Pallas chunk step.
        m, n, k, chunk = 1_048_576, 10_112, 128, 65_536
    dtype = jnp.bfloat16

    key = jax.random.PRNGKey(7)
    kd, kx = jax.random.split(key)
    d_true = jax.random.uniform(kd, (k, n), dtype=jnp.float32)

    @functools.partial(jax.jit, static_argnames=("rows",))
    def gen_chunk(lo, rows):
        """Deterministic planted rank-k chunk, generated on device in
        bf16. NOISE-FREE by design: a dense per-entry jax.random.normal
        costs ~10x the solver's own FLOPs in threefry + Box-Muller VPU
        work (measured: it dropped the whole run to ~9% of peak), and
        the bf16 quantisation of the product already provides a noise
        floor. The planted factorisation keeps the convergence evidence
        meaningful (objective decays toward the quantisation floor).

        bf16-NATIVE (round 4, VERDICT round-3 Missing #3): the planted
        matmul writes bf16 DIRECTLY (preferred_element_type; the MXU
        still accumulates in f32 internally) instead of materialising a
        2.65 GB f32 chunk in HBM and converting — the f32 intermediates
        were what left no spare HBM for ``hbm_cache_chunks`` at the
        21 GB full shape."""
        kc = jax.random.fold_in(kx, lo)
        xt = jax.random.uniform(kc, (rows, k), dtype=jnp.float32
                                ).astype(dtype)
        prod = jax.lax.dot_general(
            xt, d_true.astype(dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=dtype)
        return jnp.maximum(prod, 0)

    def loader(lo, hi):
        del hi  # chunk size is static under jit_loader
        return gen_chunk(lo, chunk)

    # warm the generator + one full pass (compiles everything)
    diffs = []

    def cb(it, diff):
        diffs.append(diff)

    t0 = time.perf_counter()
    res = decomp_tpu.nmf.solve_streaming(
        loader, rank=k, tol=0.0, maxiter=args.iters, chunk_rows=chunk,
        n_samples=m, n_channels=n, dtype=dtype,
        factor_dtype=jnp.float32, precision="default",
        x_device=True, record_objective=True, callback=cb,
        jit_loader=True, random_seed=11)
    # fence: read a reduction (block_until_ready unreliable on axon)
    float(jnp.asarray(res.d, jnp.float32).sum())
    wall = time.perf_counter() - t0
    # second, compile-warm measurement over fewer iterations for the
    # steady-state rate (warm the no-objective epoch variant first: its
    # cache key differs from the curve-recording run above)
    iters2 = max(args.iters // 3, 2)
    warm = decomp_tpu.nmf.solve_streaming(
        loader, rank=k, tol=0.0, maxiter=2, chunk_rows=chunk,
        n_samples=m, n_channels=n, dtype=dtype,
        factor_dtype=jnp.float32, precision="default",
        x_device=True, jit_loader=True, random_seed=11,
        hbm_cache_chunks=args.cache)
    float(jnp.asarray(warm.d, jnp.float32).sum())
    t0 = time.perf_counter()
    res2 = decomp_tpu.nmf.solve_streaming(
        loader, rank=k, tol=0.0, maxiter=iters2, chunk_rows=chunk,
        n_samples=m, n_channels=n, dtype=dtype,
        factor_dtype=jnp.float32, precision="default",
        x_device=True, jit_loader=True, random_seed=11,
        hbm_cache_chunks=args.cache)
    float(jnp.asarray(res2.d, jnp.float32).sum())
    wall2 = time.perf_counter() - t0

    niter = int(res.niter)
    obj = np.asarray(res.objective)[:niter]
    # solver flops (4 M N K per iteration: data pass + stats) + the
    # included generation cost (2 M N K)
    per_iter = 4.0 * m * n * k
    gen_per_iter = 2.0 * m * n * k
    rate = iters2 / wall2
    peak, label = peak_flops(jax.devices()[0])
    out = {
        "config": "c5_full_shape_streaming_1Mx10112_r128",
        "shape": [m, n, k],
        "chunk_rows": chunk,
        "hbm_cache_chunks": args.cache,
        "operating_point": "bf16 data stream / f32 factors, x device-resident, fused jit epoch",
        "iters": niter,
        "wall_s_first": round(wall, 2),
        "iters_per_sec_steady": round(rate, 3),
        "ms_per_iter_steady": round(1e3 / rate, 1),
        "solver_tflops": round(per_iter * rate / 1e12, 1),
        "solver_plus_gen_tflops": round(
            (per_iter + gen_per_iter) * rate / 1e12, 1),
        "frac_of_peak_incl_gen": round(
            (per_iter + gen_per_iter) * rate / peak, 4) if peak else None,
        "objective_first": float(obj[0]) if niter else None,
        "objective_last": float(obj[-1]) if niter else None,
        "objective_monotone_decreasing": bool(np.all(np.diff(obj) <= 0)),
        "final_rel_change_d": diffs[-1] if diffs else None,
        "peak_basis": label,
    }
    os.makedirs(OUT_DIR, exist_ok=True)
    np.save(os.path.join(OUT_DIR, "c5_full_shape_objective.npy"), obj)
    np.save(os.path.join(OUT_DIR, "c5_full_shape_reldiff.npy"),
            np.asarray(diffs))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
