"""Test configuration (SURVEY.md §4 rebuild test plan).

- Forces the CPU backend with 8 virtual devices, so the distributed tier
  (shard_map + psum) runs with real collective semantics on one host
  (SURVEY.md §4.4). NOTE: this environment's sitecustomize pre-imports jax
  and registers a TPU ('axon') PJRT plugin in every process, so env vars
  like JAX_PLATFORMS are too late / ignored — we must go through
  jax.config.update BEFORE any backend is initialised.
- Enables x64 so parity tests against the float64 NumPy reference
  implementation are meaningful. The library itself is dtype-preserving and
  never relies on x64.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
