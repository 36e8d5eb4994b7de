"""TPU-compiled test tier (VERDICT.md round-1 Weak #4 / Next #8).

Unlike tests/ (which forces the CPU backend for the 8-virtual-device
distributed tier), this suite runs on the REAL default accelerator and
compiles the Pallas kernels through Mosaic, so kernel regressions surface
in pytest on TPU-equipped machines — not only in bench/verify runs.

Run with:  python -m pytest tests_tpu/ -q     (skips itself off-TPU)

The persistent compilation cache keeps reruns fast (first run pays one
remote compile per kernel variant, ~1-4 min each on the axon tunnel).
"""

import os

import jax

_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      os.pardir, ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _CACHE)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
except Exception:  # pragma: no cover - cache is an optimisation only
    pass
