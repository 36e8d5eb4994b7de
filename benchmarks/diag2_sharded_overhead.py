"""Isolate the remaining sharded-streaming overhead (round 4).

bench_sharded_streaming measured 1.31x at maxiter=20 incl. per-call
setup. Here: (a) raw epoch-chaining loops (no solve setup) at several
chain lengths, (b) solve-level at maxiter=40 — distinguishes per-CALL
setup cost from per-EPOCH dispatch overhead.
"""

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import decomp_tpu  # noqa: E402
from decomp_tpu import parallel  # noqa: E402
from decomp_tpu.models import nmf_streaming as mns  # noqa: E402


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
    enable_cache()
    m, n, k, chunk = 262_144, 10_112, 128, 65_536
    dtype = jnp.bfloat16
    n_chunks = m // chunk

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

    mesh = parallel.make_mesh((1,), ("rows",))
    x_shard = NamedSharding(mesh, P("rows", None))

    @functools.partial(jax.jit, out_shardings=x_shard)
    def make_x0():
        return 0.5 * jax.random.uniform(jax.random.PRNGKey(3), (m, k),
                                        jnp.float32)

    x0s = make_x0()
    x0 = jax.jit(lambda: 0.5 * jax.random.uniform(
        jax.random.PRNGKey(3), (m, k), jnp.float32))()
    d0 = jnp.asarray(
        np.random.default_rng(0).uniform(size=(k, n)), jnp.float32)

    common = (loader, None, chunk, n_chunks, k, n, "mu", False, True,
              False, jnp.dtype(dtype), 1e-15, "default", True, False, 0,
              None, False, None)
    ep_single = mns._fused_epoch(*common)
    ep_shard = mns._fused_epoch(*common, mesh, "rows")

    def chain(ep, x, d, iters):
        for _ in range(iters):
            x, d, diff, obj = ep(x, d)
        return d

    print("warming...", flush=True)
    fence(chain(ep_single, x0, d0, 2))
    fence(chain(ep_shard, x0s, d0, 2))

    for iters in (5, 20, 40):
        for name, ep, x in (("single", ep_single, x0),
                            ("shard", ep_shard, x0s)):
            best = float("inf")
            for _ in range(4):
                t0 = time.perf_counter()
                fence(chain(ep, x, d0, iters))
                best = min(best, time.perf_counter() - t0)
            print(f"epoch-chain {name:7s} iters={iters:3d}: "
                  f"{best*1e3/iters:7.2f} ms/iter  (total {best*1e3:.0f} ms)",
                  flush=True)


if __name__ == "__main__":
    main()
