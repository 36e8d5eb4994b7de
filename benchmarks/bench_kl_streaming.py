"""Fused KL streaming chunks: kernel (kl_stats_dense/masked) vs the jnp
chunk step, on-chip A/B at a pod-flavoured out-of-core shape.

The jnp KL chunk step materialises two M_c x N ratio reconstructions in
HBM per chunk (x@d for the x update, x_new@d for the d statistics); the
fused kernels keep both in VMEM and read each chunk once. This script
measures the marginal per-iteration cost of both paths with the
``use_pallas`` flag (True/False), differential over two budgets so
per-call setup cancels.

Usage: python benchmarks/bench_kl_streaming.py [--masked] [--small]
Emits one JSON line per variant.
"""

import argparse
import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import decomp_tpu  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--masked", action="store_true")
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--iters", type=int, default=40,
                    help="long budget; short budget is iters//4")
    ap.add_argument("--n", type=int, default=0, help="override width")
    ap.add_argument("--block-rows", type=int, default=0)
    args = ap.parse_args()

    if args.small:
        m, n, k, chunk = 4096, 512, 128, 1024
    else:
        # n=2048 is the widest f32 KL-kernel width the calibrated gate
        # admits at br=128 (n=4096 measurably dies in Mosaic's
        # scoped-VMEM stack in the in-core context and is rejected by
        # the kl_dense/kl_masked fits_vmem tiers — docs/DESIGN.md)
        m, n, k, chunk = 262_144, 2_048, 128, 32_768
    if args.n:
        n = args.n
    dtype = jnp.float32

    key = jax.random.PRNGKey(3)
    kd, kx = jax.random.split(key)
    d_true = jax.random.uniform(kd, (k, n), dtype=jnp.float32)

    @functools.partial(jax.jit, static_argnames=("rows",))
    def gen_chunk(lo, rows):
        kc = jax.random.fold_in(kx, lo)
        xt = jax.random.uniform(kc, (rows, k), dtype=jnp.float32)
        return jnp.maximum(xt @ d_true, 0).astype(dtype)

    @functools.partial(jax.jit, static_argnames=("rows",))
    def gen_mask(lo, rows):
        kc = jax.random.fold_in(jax.random.fold_in(kx, 7), lo)
        return (jax.random.uniform(kc, (rows, n)) >= 0.3).astype(dtype)

    def loader(lo, hi):
        del hi
        return gen_chunk(lo, chunk)

    def mloader(lo, hi):
        del hi
        return gen_mask(lo, chunk)

    short = max(args.iters // 4, 2)
    long_ = max(args.iters, short + 4)  # keep the differential nonzero
    kw = dict(rank=k, tol=0.0, chunk_rows=chunk, n_samples=m,
              n_channels=n, dtype=dtype, x_device=True, jit_loader=True,
              method="kl-mu", precision="highest", random_seed=5,
              mask=mloader if args.masked else None)

    def run(use_pallas, maxiter):
        t0 = time.perf_counter()
        res = decomp_tpu.nmf.solve_streaming(
            loader, maxiter=maxiter, use_pallas=use_pallas,
            pallas_block_rows=(args.block_rows or None
                               if use_pallas is True else None), **kw)
        float(jnp.asarray(res.d, jnp.float32).sum())  # fence (axon)
        return time.perf_counter() - t0

    out = {}
    for name, up in (("kernel", True), ("jnp", False)):
        try:
            run(up, 1)  # compile both budgets' epochs
            run(up, short)
            ws = min(run(up, short) for _ in range(3))
            wl = min(run(up, long_) for _ in range(3))
        except Exception as e:  # gate errors AND platform compile OOMs
            print(json.dumps({"variant": name,
                              "error": f"{type(e).__name__}: "
                                       f"{str(e)[:200]}"}))
            continue
        if wl <= ws:
            print(json.dumps({"variant": name,
                              "error": "degenerate differential "
                                       f"(wall({long_})={wl:.3f} <= "
                                       f"wall({short})={ws:.3f}): "
                                       "host-load noise"}))
            continue
        ms = 1e3 * (wl - ws) / (long_ - short)
        out[name] = ms
        print(json.dumps({
            "config": ("kl_streaming_masked" if args.masked
                       else "kl_streaming_dense"),
            "shape": [m, n, k], "chunk_rows": chunk, "variant": name,
            "ms_per_iter_marginal": round(ms, 2),
        }))
    if len(out) == 2:
        print(json.dumps({"speedup_kernel_vs_jnp":
                          round(out["jnp"] / out["kernel"], 3)}))


if __name__ == "__main__":
    main()
