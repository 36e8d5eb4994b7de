"""Pod-scale masked completion, sharded AND out-of-core (round 4).

The BASELINE.json:11 configuration at data sizes beyond every chip's
HBM: the sample axis shards over the mesh, each device streams its
global row range in chunks through the fused epoch, and the run stops
under the held-out validation rule — the usable criterion for
mixed-precision completion (the rel-change floor fires too early;
BASELINE.md).

Runs anywhere: on a multi-chip TPU mesh this is the production path;
here it demos on whatever devices exist (use
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu
for an 8-virtual-device CPU mesh).

    python examples/sharded_streaming_completion.py
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from decomp_tpu import parallel  # noqa: E402

# A mesh over all available devices, rows = the sample axis.
mesh = parallel.make_mesh((len(jax.devices()),), ("rows",))
n_dev = mesh.shape["rows"]

# Synthetic planted problem served by a LOADER: in production this is a
# file reader / database cursor / feature generator. The loader must be
# jit-traceable and deterministic; it is called with GLOBAL row offsets.
m, n, k, chunk = 1024 * n_dev, 192, 6, 256
key = jax.random.PRNGKey(0)
kx_t, kd_t, km = jax.random.split(key, 3)
d_true = jax.random.uniform(kd_t, (k, n))


def y_loader(lo, hi):
    kc = jax.random.fold_in(kx_t, lo)
    xt = jax.random.uniform(kc, (chunk, k))
    mask_c = mask_loader(lo, hi)
    return jnp.maximum(xt @ d_true, 0.0) * mask_c  # observed entries


def mask_loader(lo, hi):
    kc = jax.random.fold_in(km, lo)
    return (jax.random.uniform(kc, (chunk, n)) >= 0.3).astype(jnp.float32)


res = parallel.nmf.solve_streaming(
    y_loader,
    rank=k,
    mask=mask_loader,
    mesh=mesh,
    tol=3e-3,                 # plateau threshold on validation error
    maxiter=300,
    chunk_rows=chunk,
    n_samples=m,
    n_channels=n,
    dtype=jnp.float32,
    stop="heldout",           # the pod-scale completion stopping rule
    check_every=10,           # host syncs only every 10th epoch
    hbm_cache_chunks=1,       # each device caches its leading chunk
    random_seed=0,
)

print(f"devices: {n_dev}  converged: {bool(res.converged)} "
      f"after {int(res.niter)} epochs")
print(f"held-out validation rel err: "
      f"{float(np.asarray(res.aux['heldout_rel_err'])):.3e}")
print(f"x sharding: {res.x.shape} over mesh {dict(mesh.shape)}")
