"""Solve-level A/B: sharded streaming vs single-device streaming epoch
(VERDICT round-3 Missing #2 "done" evidence).

Runs the SAME out-of-core problem (on-device generator loader, bf16 data
/ f32 factors) through ``nmf.solve_streaming`` (single device,
jit_loader fused epoch) and ``parallel.nmf.solve_streaming`` (the same
epoch under shard_map on a 1-device mesh), tol=0 so the epochs chain
with no host syncs. Reports ms/iter for each and the ratio — the
round-3 3.5x chunk-loop-inside-shard_map gap is the regression this
guards against.

Usage: python benchmarks/bench_sharded_streaming.py [--small] [--iters N]
Emits one JSON line.
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
from decomp_tpu import parallel  # noqa: E402


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
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--repeats", type=int, default=4)
    args = ap.parse_args()
    enable_cache()

    if args.small:
        m, n, k, chunk = 4096, 512, 128, 1024
    else:
        m, n, k, chunk = 262_144, 10_112, 128, 65_536
    dtype = jnp.bfloat16

    @jax.jit
    def make_d_true():
        kd, _ = jax.random.split(jax.random.PRNGKey(7))
        return jax.random.uniform(kd, (k, n), dtype=jnp.float32)

    d_true = make_d_true()

    def loader(lo, hi):
        _, kx = jax.random.split(jax.random.PRNGKey(7))
        kc = jax.random.fold_in(kx, lo)
        xt = jax.random.uniform(kc, (chunk, k), dtype=jnp.float32)
        return jnp.maximum(xt @ d_true, 0.0).astype(dtype)

    d0 = np.random.default_rng(0).uniform(size=(k, n)).astype(np.float32)
    mesh = parallel.make_mesh((1,), ("rows",))
    kw = dict(tol=0.0, maxiter=args.iters, chunk_rows=chunk, n_samples=m,
              n_channels=n, dtype=dtype, factor_dtype=jnp.float32,
              precision="default", random_seed=11)

    def run_single():
        return decomp_tpu.nmf.solve_streaming(
            loader, d0, x_device=True, jit_loader=True, **kw)

    def run_sharded():
        return parallel.nmf.solve_streaming(loader, d0, mesh=mesh, **kw)

    # compile warmup
    fence(run_single().d)
    fence(run_sharded().d)

    best = {"single": float("inf"), "sharded": float("inf")}
    for _ in range(args.repeats):
        for name, f in (("single", run_single), ("sharded", run_sharded)):
            t0 = time.perf_counter()
            fence(f().d)
            best[name] = min(best[name], time.perf_counter() - t0)

    ms_single = best["single"] / args.iters * 1e3
    ms_sharded = best["sharded"] / args.iters * 1e3
    out = {
        "config": f"sharded_vs_single_streaming_{m}x{n}_r{k}",
        "shape": [m, n, k],
        "chunk_rows": chunk,
        "iters": args.iters,
        "ms_per_iter_single": round(ms_single, 2),
        "ms_per_iter_sharded_1dev": round(ms_sharded, 2),
        "sharded_over_single": round(ms_sharded / ms_single, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
