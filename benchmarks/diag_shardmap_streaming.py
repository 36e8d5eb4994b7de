"""Diagnose the shard_map streaming-epoch overhead (VERDICT round-3 #1).

Round-3 measurement: the sharded out-of-core epoch runs ~3.5x slower per
iteration than the IDENTICAL single-device fused epoch on a 1-device mesh
(110 vs 31 ms at 262k x 10112 r128, on-device generator). Both jnp and
Pallas chunk paths show it, so it is the chunk-loop-inside-shard_map
lowering, not the kernel or the collectives.

This script isolates WHERE the time goes by timing a ladder of epochs:
  1. single-device fused epoch (nmf.solve_streaming jit_loader path)
  2. the sharded _fused_epoch on a 1-device mesh (the then-slow case)
  3. generator-only epoch (sum of chunks), in and out of shard_map
  4. kernel-only epoch (pre-resident chunk), in and out of shard_map
  5. a plain-jit auto-SPMD formulation (no shard_map)

Timing: device-resident inputs, warmup, interleaved min-of-N, value-read
fencing (block_until_ready does not block on this platform).
"""

import argparse
import functools
import sys
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import decomp_tpu  # noqa: E402
from decomp_tpu.parallel import make_mesh  # noqa: E402
from decomp_tpu.models import nmf_streaming as mns  # noqa: E402
from decomp_tpu.ops import pallas_mu  # noqa: E402


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


def timeit(fns, reps=6):
    """Interleaved min-of-N over a dict name -> (thunk returning fenceable)."""
    best = {name: float("inf") for name in fns}
    for _ in range(reps):
        for name, f in fns.items():
            t0 = time.perf_counter()
            fence(f())
            dt = time.perf_counter() - t0
            best[name] = min(best[name], dt)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--reps", type=int, default=6)
    args = ap.parse_args()
    enable_cache()

    if args.small:
        m, n, k, chunk = 4096, 512, 128, 1024
    else:
        m, n, k, chunk = 262_144, 10_112, 128, 65_536
    dtype = jnp.bfloat16
    n_chunks = m // chunk

    # ALL setup inside jit: eager ops each remote-compile on this
    # platform (~tens of seconds per op) — an unjitted setup block can
    # take longer than the measurements.
    @jax.jit
    def make_d_true():
        kd, _ = jax.random.split(jax.random.PRNGKey(7))
        return jax.random.uniform(kd, (k, n), dtype=jnp.float32)

    d_true = make_d_true()

    def gen_chunk(lo):
        _, kx = jax.random.split(jax.random.PRNGKey(7))
        kc = jax.random.fold_in(kx, lo)
        xt = jax.random.uniform(kc, (chunk, k), dtype=jnp.float32)
        return jnp.maximum(xt @ d_true, 0.0).astype(dtype)

    def loader(lo, hi):
        del hi
        return gen_chunk(lo)

    mesh = make_mesh((1,), ("rows",))
    x_shard = NamedSharding(mesh, P("rows", None))

    @functools.partial(jax.jit, out_shardings=x_shard)
    def make_x0():
        return 0.5 * jax.random.uniform(jax.random.PRNGKey(3), (m, k),
                                        jnp.float32)

    x0s = make_x0()
    x0 = jnp.asarray(x0s)
    d0 = jnp.asarray(
        np.random.default_rng(0).uniform(size=(k, n)), jnp.float32)

    results = {}

    # --- 1. single-device fused epoch (the fast twin) ------------------
    ep_single = mns._fused_epoch(
        loader, None, chunk, n_chunks, k, n, "mu", False, True, False,
        jnp.dtype(dtype), 1e-15, "default", True, False, 0, None, False)

    def run_single():
        x, d, diff, obj = ep_single(x0, d0)
        return d

    # --- 2. sharded epoch on the 1-device mesh (the slow twin) ---------
    ep_shard = mns._fused_epoch(
        loader, None, chunk, n_chunks, k, n, "mu", False, True, False,
        jnp.dtype(dtype), 1e-15, "default", True, False, 0, None, False,
        None, mesh, "rows")

    def run_shard():
        x, d, diff, obj = ep_shard(x0s, d0)
        return d

    # --- 3. generator-only epochs --------------------------------------
    @jax.jit
    def gen_only(d):
        def body(i, acc):
            yc = loader(i * chunk, (i + 1) * chunk)
            return acc + jnp.sum(yc.astype(jnp.float32))
        return jax.lax.fori_loop(0, n_chunks, body, jnp.zeros((), jnp.float32)) + d[0, 0]

    @jax.jit
    def gen_only_shard(d):
        def body_shard(d_r):
            def body(i, acc):
                n_dev = jax.lax.axis_size("rows")
                row0 = jax.lax.axis_index("rows") * (m // n_dev)
                yc = loader(row0 + i * chunk, None)
                return acc + jnp.sum(yc.astype(jnp.float32))
            acc = jax.lax.fori_loop(
                0, n_chunks, body,
                jax.lax.pcast(jnp.zeros((), jnp.float32), axis_name="rows",
                              to="varying"))
            return jax.lax.psum(acc, "rows") + d[0, 0]
        return jax.shard_map(body_shard, mesh=mesh, in_specs=(P(None, None),),
                             out_specs=P())(d)

    # --- 4. kernel-only epochs (one resident chunk re-processed) -------
    yc_res = jax.jit(lambda: gen_chunk(0))()
    eps32 = jnp.asarray(1e-15, jnp.float32)

    @jax.jit
    def kern_only(yc, x, d):
        db = d.astype(dtype)
        def body(i, carry):
            x_, num, den = carry
            xc = jax.lax.dynamic_slice(x_, (i * chunk, 0), (chunk, k))
            xc, nc, dc = pallas_mu.mu_stats_dense(yc, xc, db, eps32)
            x_ = jax.lax.dynamic_update_slice(x_, xc, (i * chunk, 0))
            return x_, num + nc, den + dc
        x, num, den = jax.lax.fori_loop(
            0, n_chunks, body,
            (x, jnp.zeros((k, n), jnp.float32), jnp.zeros((k, k), jnp.float32)))
        return num

    @jax.jit
    def kern_only_shard(yc, x, d):
        def body_shard(yc_l, x_l, d_r):
            db = d_r.astype(dtype)
            vrows = functools.partial(jax.lax.pcast, axis_name="rows",
                                      to="varying")
            def body(i, carry):
                x_, num, den = carry
                xc = jax.lax.dynamic_slice(x_, (i * chunk, 0), (chunk, k))
                xc, nc, dc = pallas_mu.mu_stats_dense(yc_l, xc, db, eps32)
                x_ = jax.lax.dynamic_update_slice(x_, xc, (i * chunk, 0))
                return x_, num + nc, den + dc
            x_l, num, den = jax.lax.fori_loop(
                0, n_chunks, body,
                (x_l, vrows(jnp.zeros((k, n), jnp.float32)),
                 vrows(jnp.zeros((k, k), jnp.float32))))
            return jax.lax.psum(num, "rows")
        return jax.shard_map(
            body_shard, mesh=mesh,
            in_specs=(P("rows", None), P("rows", None), P(None, None)),
            out_specs=P(None, None), check_vma=False)(yc, x, d)

    # --- 5. plain-jit auto-SPMD epoch (no shard_map) -------------------
    # Global chunk loop over sharded arrays; XLA partitions each step.
    @jax.jit
    def auto_spmd(x, d):
        db = d.astype(dtype)
        def body(i, carry):
            x_, num, den = carry
            yc = loader(i * chunk, (i + 1) * chunk)
            xc = jax.lax.dynamic_slice(x_, (i * chunk, 0), (chunk, k))
            xc, nc, dc = pallas_mu.mu_stats_dense(yc, xc, db, eps32)
            x_ = jax.lax.dynamic_update_slice(x_, xc, (i * chunk, 0))
            return x_, num + nc, den + dc
        x, num, den = jax.lax.fori_loop(
            0, n_chunks, body,
            (x, jnp.zeros((k, n), jnp.float32), jnp.zeros((k, k), jnp.float32)))
        d_new = mns._d_from_stats_impl(
            d, num, den, jnp.asarray(1e-15, jnp.float32),
            method="mu", masked=False, mixed=True)
        return x, d_new

    print("compiling/warming...", flush=True)
    for name, f in [("single", run_single), ("shard", run_shard)]:
        t0 = time.perf_counter()
        fence(f())
        print(f"  warm {name}: {time.perf_counter() - t0:.1f}s", flush=True)
    fence(gen_only(d0)); fence(gen_only_shard(d0))
    fence(kern_only(yc_res, x0, d0))
    fence(kern_only_shard(yc_res, x0s, d0))
    xw, dw = auto_spmd(x0, d0); fence(dw)

    best = timeit({
        "1_single_fused_epoch": run_single,
        "2_sharded_epoch_1dev": run_shard,
        "3a_gen_only_jit": lambda: gen_only(d0),
        "3b_gen_only_shardmap": lambda: gen_only_shard(d0),
        "4a_kern_only_jit": lambda: kern_only(yc_res, x0, d0),
        "4b_kern_only_shardmap": lambda: kern_only_shard(yc_res, x0s, d0),
        "5_auto_spmd_jit": lambda: auto_spmd(x0, d0)[1],
    }, reps=args.reps)
    for name in sorted(best):
        print(f"{name:28s} {best[name]*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
