"""Out-of-core NMF with a callable data loader and the fused jit epoch.

The pod-scale pattern (BASELINE.md row 5': 21 GB of data on a 16 GB
chip), demonstrated at toy size so it runs anywhere: ``y`` never exists
as one array — a LOADER yields row chunks (here: generated on the fly;
in production: a file reader / object store / feature pipeline), the
activation matrix stays device-resident, and with ``jit_loader=True``
each full pass over the data compiles into a single dispatched call.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np

import decomp_tpu


def main():
    m, n, rank, chunk = 4096, 512, 16, 512
    key = jax.random.PRNGKey(0)
    kd, kx = jax.random.split(key)
    d_true = jax.random.uniform(kd, (rank, n), dtype=jnp.float32)

    @functools.partial(jax.jit, static_argnames=("rows",))
    def gen_chunk(lo, rows):
        # Deterministic per chunk: each outer iteration re-reads the
        # same data, exactly as a file reader would re-read it.
        kc = jax.random.fold_in(kx, lo)
        xt = jax.random.uniform(kc, (rows, rank), dtype=jnp.float32)
        return jnp.maximum(xt @ d_true, 0.0)

    def loader(lo, hi):
        del hi  # chunk size is static under jit_loader
        return gen_chunk(lo, chunk)

    res = decomp_tpu.nmf.solve_streaming(
        loader, rank=rank, tol=1e-4, maxiter=200, chunk_rows=chunk,
        n_samples=m, n_channels=n, dtype=jnp.float32,
        x_device=True, jit_loader=True, record_objective=True,
        random_seed=1)
    obj = np.asarray(res.objective)
    obj = obj[np.isfinite(obj)]
    print(f"streamed NMF over {m // chunk} chunks: "
          f"{int(res.niter)} epochs, converged={bool(res.converged)}")
    print(f"objective {obj[0]:.4g} -> {obj[-1]:.4g} "
          f"(monotone: {bool(np.all(np.diff(obj) <= 0))})")

    # The same API at pod scale: bf16 chunks + f32 factor iterates
    # (factor_dtype=jnp.float32, precision='default') is the measured
    # high-throughput operating point — see BASELINE.md row 5'.


if __name__ == "__main__":
    main()
