"""Headline convergence evidence (BASELINE.json:5: "converging at >= 50%
of peak matmul FLOPs"; VERDICT.md round-1 Missing #5 / Next #2).

The round-1 headline number ran tol=0 with 50 fixed iterations — fast,
but not evidence of CONVERGING at that throughput. This script produces
that evidence for the bf16/'default' operating point of bench.py:

1. Objective curves at a quarter slice (100k x 10112 r128; the f32
   comparison needs y + the recorded reconstruction co-resident in HBM),
   planted rank-128 data, shared init, three operating points:
   bf16-stored factors (negative control — measured FROZEN: per-step
   relative changes fall below bf16 resolution), the MIXED point
   (bf16 data / f32 factors / bf16 MXU, = bench.py's operating point),
   and f32/'highest' (exact reference). The mixed curve tracking
   f32/'highest' is the convergence evidence for the headline number.
2. Plateau analysis of the mixed curve: first iteration within 1% of
   the final objective.
3. Timed MIXED run at the FULL 400k x 10112 slice -> iters/sec and
   fraction of peak at the converging operating point.
4. The measured rel-change(d) criterion floor of the mixed point (what
   tol= the on-device stop can actually reach: 1e-3 yes, 1e-4 no).
5. f32/'highest' timed point at the quarter slice (its fraction of the
   bf16 peak — the f32 jnp path; the fused kernel's k x n residents
   exceed scoped VMEM at f32 x n=10112, see pallas_mu.fits_vmem).

Emits one JSON line per stage; curves under benchmarks/out/.
"""

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
from bench import flops_per_iter, peak_flops  # noqa: E402
from benchmarks.run_configs import _enable_compile_cache  # noqa: E402

OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "out")

M_FULL, N, K = 400_000, 10_112, 128
M_QUARTER = M_FULL // 4
CURVE_ITERS = 200


def _force(res):
    return float(jnp.asarray(res.d, jnp.float32).sum())


@functools.partial(jax.jit, static_argnames=("m", "dtype"))
def _planted(key, m, dtype=jnp.float32):
    kx, kd = jax.random.split(key)
    xt = jax.random.uniform(kx, (m, K), dtype, minval=0.1)
    dt = jax.random.uniform(kd, (K, N), dtype, minval=0.1)
    return xt @ dt  # exact rank-K: convergence has somewhere to go


@functools.partial(jax.jit, static_argnames=("m",))
def _init(key, m):
    kx, kd = jax.random.split(key)
    return (jax.random.uniform(kx, (m, K), jnp.float32, minval=0.1),
            jax.random.uniform(kd, (K, N), jnp.float32, minval=0.1))


def main():
    _enable_compile_cache()
    os.makedirs(OUT_DIR, exist_ok=True)
    dev = jax.devices()[0]
    peak, peak_label = peak_flops(dev)

    # ---- 1. shared-init curves: bf16/'default' vs f32/'highest'
    y32 = _planted(jax.random.PRNGKey(0), M_QUARTER)
    x0, d0 = _init(jax.random.PRNGKey(1), M_QUARTER)
    float(jnp.asarray(y32[:1, :1], jnp.float32).sum())

    curves = {}
    for label, dt, prec, fdt in (
            ("bf16_stored", jnp.bfloat16, "default", None),
            ("mixed_f32_factors", jnp.bfloat16, "default", jnp.float32),
            ("f32_highest", jnp.float32, "highest", None)):
        res = decomp_tpu.nmf.solve(
            y32.astype(dt), d0.astype(dt if fdt is None else fdt),
            x=x0.astype(dt if fdt is None else fdt), tol=0.0,
            maxiter=CURVE_ITERS, eps=1e-9, precision=prec,
            factor_dtype=fdt, record_objective=True)
        _force(res)
        curve = np.asarray(res.objective, np.float64)[:int(res.niter)]
        np.save(os.path.join(OUT_DIR, f"headline_{label}_curve.npy"), curve)
        curves[label] = curve
        print(json.dumps({
            "stage": f"curve_{label}_quarter",
            "shape": [M_QUARTER, N, K],
            "iters": len(curve),
            "objective_first": float(curve[0]),
            "objective_last": float(curve[-1]),
            "n_objective_increases": int(np.sum(np.diff(curve) > 0)),
            "curve": os.path.relpath(
                os.path.join(OUT_DIR, f"headline_{label}_curve.npy")),
        }))

    for label in ("bf16_stored", "mixed_f32_factors"):
        agree = np.abs(curves[label] / curves["f32_highest"] - 1.0)
        print(json.dumps({
            "stage": f"{label}_vs_f32_curve_agreement",
            "max_rel_diff": float(agree.max()),
            "final_rel_diff": float(agree[-1]),
        }))

    # ---- 2. plateau of the MIXED curve (the bench operating point)
    c = curves["mixed_f32_factors"]
    plateau = int(np.argmax(c <= 1.01 * c[-1])) + 1
    print(json.dumps({"stage": "mixed_plateau",
                      "iters_to_within_1pct_of_final": plateau,
                      "of_total_curve_iters": len(c)}))

    # ---- 3. timed bf16 run at the FULL slice over the plateau span
    del y32
    y = _planted(jax.random.PRNGKey(2), M_FULL, jnp.bfloat16)
    float(jnp.asarray(y[:1, :1], jnp.float32).sum())

    def run(seed):
        return decomp_tpu.nmf.solve(y, rank=K, tol=0.0, maxiter=plateau,
                                    eps=1e-6, random_seed=seed,
                                    precision="default",
                                    factor_dtype=jnp.float32)

    _force(run(3))
    best = min(_timeit(run, s) for s in (4, 5, 6))
    ips = plateau / best
    flops = flops_per_iter(M_FULL, N, K) * ips
    print(json.dumps({
        "stage": "timed_mixed_full_plateau_span",
        "shape": [M_FULL, N, K], "iters": plateau,
        "wall_s": round(best, 3),
        "iters_per_sec": round(ips, 2),
        "matmul_tflops": round(flops / 1e12, 2),
        "frac_of_peak": round(flops / peak, 4) if peak else None,
        "peak_basis": peak_label,
        "evidence": "the mixed curve (stage 1) reaches within 1% of its "
                    "final value inside this iteration span, "
                    "monotonically, tracking f32/'highest'",
    }))

    # ---- 4. mixed rel-change(d) criterion floor at the quarter slice
    del y
    y16 = _planted(jax.random.PRNGKey(0), M_QUARTER, jnp.bfloat16)
    float(jnp.asarray(y16[:1, :1], jnp.float32).sum())
    for tol in (1e-4, 1e-3):
        r = decomp_tpu.nmf.solve(y16, rank=K, tol=tol, maxiter=1000,
                                 eps=1e-6, random_seed=1,
                                 precision="default",
                                 factor_dtype=jnp.float32)
        _force(r)
        print(json.dumps({"stage": "mixed_reldiff_floor", "tol": tol,
                          "niter": int(r.niter),
                          "converged": bool(r.converged)}))

    # ---- 5. f32/'highest' timed point (jnp path) at the quarter slice
    del y16
    y32 = _planted(jax.random.PRNGKey(0), M_QUARTER)
    float(jnp.asarray(y32[:1, :1], jnp.float32).sum())

    def run32(seed):
        return decomp_tpu.nmf.solve(y32, rank=K, tol=0.0, maxiter=60,
                                    eps=1e-9, random_seed=seed,
                                    precision="highest")

    _force(run32(8))
    best32 = min(_timeit(run32, s) for s in (9, 10))
    ips32 = 60 / best32
    flops32 = flops_per_iter(M_QUARTER, N, K) * ips32
    print(json.dumps({
        "stage": "timed_f32_highest_quarter",
        "shape": [M_QUARTER, N, K], "iters": 60,
        "wall_s": round(best32, 3),
        "iters_per_sec": round(ips32, 2),
        "matmul_tflops": round(flops32 / 1e12, 2),
        "frac_of_peak_bf16_basis": (round(flops32 / peak, 4)
                                    if peak else None),
        "peak_basis": peak_label,
    }))


def _timeit(fn, seed):
    t0 = time.perf_counter()
    _force(fn(seed))
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
