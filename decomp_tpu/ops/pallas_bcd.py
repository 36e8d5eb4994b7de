"""Fused BCD dictionary-sweep Pallas TPU kernel.

The dictionary update (Mairal et al. 2010, Algorithm 2 — SURVEY.md §3.3
"D-update: block-CD with unit-norm atom constraint") solves rows of
``A @ d = B`` one atom at a time:

    u_k = b_k - a_k @ d + a_kk * d_k ;   d_k <- u_k / ||u_k||

The sweep is INHERENTLY sequential over atoms (step k+1 reads the d that
step k wrote), and each step's arithmetic is tiny: one (1, K) x (K, N)
matvec plus O(N) vector work — at config 3 (K=256 atoms, N=64 channels)
about 33 kFLOP. Run as a ``lax.fori_loop`` of dynamic-sliced updates
(models.dictionary_learning._bcd_dict_update), XLA executes 256 serial
micro-steps against HBM-resident values; measured on v5e that sweep is
~1.0 ms per outer iteration — roughly half the whole config-3 solve's
per-outer cost, two orders of magnitude more than the sweep's compute
(benchmarks/bench_bcd_sweep.py).

This kernel runs the ENTIRE sweep in one ``pallas_call``: A, B and d
stay VMEM-resident, d lives in a scratch ref that each step updates in
place (dynamic row stores on REFS are Mosaic-legal; dynamic slicing of
VALUES is not), so the per-step cost is on-core latency instead of an
XLA loop iteration. Everything is f32; the matvec runs at
``Precision.HIGHEST`` in BOTH the kernel and the jnp sweep (pinned —
Mosaic cannot lower ``Precision.HIGH`` inside kernels, and at ~33 kFLOP
the precision is free), so kernel-on and kernel-off trajectories run
the same matmul policy under any ``solve(precision=...)`` setting.

Shape contract (as the other kernels: pre-pad outside): K % 8 == 0 and
N % 128 == 0. Padded atoms carry zero A rows / B rows / d rows and are
exact no-ops of the sweep (u = 0 -> norm 0 -> keep d_k = 0); padded
channels carry zero B / d columns and stay zero through the
norm-uniform rescale.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: Calibrated ON-CHIP (v5e, 2026-08-18) by probing standalone compiles:
#: raw working-set bytes 4*(K^2 + 4KN) compile up to 15.75M (K=1792
#: N=128; K=1664 13.81M; K=256 N=3584 14.25M) and fail from 16.25M
#: (K=256 N=4096; K=1920 N=128 17.81M) — i.e. Mosaic charges this
#: kernel essentially its raw residency (calibration 1.0), unlike
#: pallas_fista's 1.6x envelope. The gate keeps ~1.25M of headroom
#: below the measured 16.25M failure floor for whole-program context
#: (other live VMEM values inside a jitted solve body — the
#: scoped-VMEM stacking quirk of docs/DESIGN.md).
_VMEM_LIMIT = int(15.0 * 1024 * 1024)
_CALIBRATION = 1.0


def _resident_bytes(k: int, n: int) -> int:
    # A + B + d-in + d-out + the scratch copy (+ the (1, K)/(1, N) rows
    # and the loop's u/new temporaries, dwarfed by the planes).
    raw = 4 * (k * k + 4 * k * n) + 8 * 4 * max(k, n)
    return int(raw * _CALIBRATION)


def fits_vmem(k_pad: int, n_pad: int) -> bool:
    return _resident_bytes(k_pad, n_pad) <= _VMEM_LIMIT


def auto_engage(n_atoms: int, n_channels: int, dtype) -> bool:
    """Auto-gate: calibrated TPU generation, real f32 statistics, and
    the padded (A, B, d, scratch) working set fits VMEM. Measured win at
    config 3 (K=256, N=128): ~5x over the jnp fori sweep (979 -> 184 us
    per sweep, BASELINE.md / benchmarks/bench_bcd_sweep.py)."""
    from decomp_tpu.ops.pallas_mu import calibrated_tpu

    if jnp.dtype(dtype) != jnp.float32 or not calibrated_tpu():
        return False
    k_pad = -(-int(n_atoms) // 8) * 8
    n_pad = -(-int(n_channels) // 128) * 128
    return fits_vmem(k_pad, n_pad)


def _kernel(n_atoms, a_ref, b_ref, d0_ref, dout_ref, d_ref):
    d_ref[:] = d0_ref[:]
    tiny = jnp.float32(np.finfo(np.float32).tiny)
    k_pad = a_ref.shape[0]
    # (1, K) lane iota for the a_kk extraction (2-D: TPU has no 1-D iota)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, k_pad), 1)

    def step(k, carry):
        a_row = a_ref[pl.ds(k, 1), :]                          # (1, K)
        b_row = b_ref[pl.ds(k, 1), :]                          # (1, N)
        d_k = d_ref[pl.ds(k, 1), :]                            # (1, N)
        a_kk = jnp.sum(jnp.where(lane == k, a_row, 0.0),
                       axis=1, keepdims=True)                  # (1, 1)
        # HIGHEST pinned: Mosaic cannot lower Precision.HIGH inside
        # kernels (probed: "Unsupported dot precision: HIGH"), so
        # inheriting the ambient policy would crash solve(precision=
        # 'high'). The jnp sweep pins HIGHEST on this matvec too, so
        # kernel-on/off trajectories match under any precision setting
        # (and at ~33 kFLOP the extra precision is free).
        u = (b_row
             - jnp.dot(a_row, d_ref[:],
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
             + a_kk * d_k)
        norm = jnp.sqrt(jnp.sum(u * u))
        new = jnp.where(norm > tiny, u / jnp.maximum(norm, tiny), d_k)
        d_ref[pl.ds(k, 1), :] = new
        return carry

    jax.lax.fori_loop(0, n_atoms, step, 0)
    dout_ref[:] = d_ref[:]


def bcd_sweep(stats_a, stats_b, d, *, interpret=False, vma=None):
    """One full BCD pass over atoms, entirely in VMEM.

    stats_a: (K, K) f32 — x^T x.    stats_b: (K, N) f32 — x^T y.
    d:       (K, N) f32 — current dictionary (unit-norm rows in, out).

    Returns the swept (K, N) dictionary; exact-math equal to
    models.dictionary_learning._bcd_dict_update at f32/'highest'
    (oracle-tested in interpret mode; compiled parity is
    reduction-order-level).
    """
    k, n = d.shape
    if stats_a.shape != (k, k) or stats_b.shape != (k, n):
        raise ValueError(f"shape mismatch: A{stats_a.shape} B"
                         f"{stats_b.shape} d{(k, n)}")
    if k % 8 or n % 128:
        raise ValueError(f"K={k} must be a multiple of 8 and N={n} of "
                         "128 (pre-pad outside; zero padding is a sweep "
                         "no-op)")
    f32 = jnp.float32
    return pl.pallas_call(
        functools.partial(_kernel, k),
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, n), f32, vma=vma),
        scratch_shapes=[pltpu.VMEM((k, n), f32)],
        cost_estimate=pl.CostEstimate(
            flops=int(2 * k * k * n),
            bytes_accessed=int(4 * (k * k + 3 * k * n)),
            transcendentals=0,
        ),
        interpret=interpret,
    )(stats_a.astype(f32), stats_b.astype(f32), d.astype(f32))
