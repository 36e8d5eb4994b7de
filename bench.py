"""Benchmark harness (SURVEY.md §2b N7, §7 M6; BASELINE.json:2).

Measures the primary metric — MU-NMF update iterations/sec and the implied
matmul GFLOP/s — at the largest single-chip slice of the pod-scale config
(BASELINE.json:11 is 1M x 10k rank 100 over a v5e-8; one v5e chip holds a
400k x 10k bf16 row-slice, i.e. exactly this chip's shard of the pod run).
Rank is padded 100 -> 128 to align with the MXU tile (SURVEY.md §7 hard
part 1).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
``vs_baseline`` is achieved matmul FLOP/s divided by the target of
BASELINE.json:5 ("converging at >= 50% of peak matmul FLOPs"), so
vs_baseline >= 1.0 means the headline target is met.

Flags: --small (CPU-sized shapes for smoke-testing), --profile (emit a
jax.profiler trace under /tmp/decomp_tpu_trace).
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp



def _enable_compile_cache():
    """Persistent XLA compilation cache: verified to work with this
    platform's remote compile (fresh-process compile 12s -> 0.7s)."""
    import os
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass  # older jax or read-only fs: cache is an optimisation only

# Peak bf16 matmul throughput per chip by TPU generation (public specs).
# Matched against jax Device.device_kind substrings, most specific first —
# a hardware-pinned constant would silently lie on other generations.
PEAK_BF16_BY_KIND = (
    ("v6 lite", 918e12), ("v6e", 918e12),
    ("v5 lite", 197e12), ("v5e", 197e12),
    ("v5p", 459e12), ("v5", 459e12),
    ("v4", 275e12),
    ("v3", 123e12),
    ("v2", 46e12),
)


def peak_flops(device):
    """(peak bf16 FLOP/s, label) for ``device``, or (None, kind) when the
    generation is unrecognised (then %-of-peak is not reported rather than
    reported wrongly)."""
    kind = getattr(device, "device_kind", "") or ""
    kl = kind.lower()
    for sub, peak in PEAK_BF16_BY_KIND:
        if sub in kl:
            return peak, f"{kind} ({peak/1e12:.0f} TFLOP/s bf16)"
    return None, kind


def flops_per_iter(m: int, n: int, k: int) -> float:
    """FLOPs of one full MU iteration (x update + d update).

    x-update: y@d.T (2MNK) + d@d.T (2NK^2) + x@(dd.T) (2MK^2)
    d-update: x.T@y (2MNK) + x.T@x (2MK^2) + (x.Tx)@d (2NK^2)
    """
    return 4.0 * m * n * k + 4.0 * m * k * k + 4.0 * n * k * k


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--small", action="store_true",
                        help="tiny shapes (CPU smoke test)")
    # 150 iterations: long enough to amortise factor init + first-step
    # warmup (at 50 iters the measured steady state is ~6% underreported),
    # short enough for best-of-3 to finish in seconds.
    parser.add_argument("--iters", type=int, default=150)
    parser.add_argument("--repeats", type=int, default=3)
    parser.add_argument("--profile", action="store_true")
    args = parser.parse_args()
    _enable_compile_cache()

    dev = jax.devices()[0]
    platform = dev.platform.lower()
    on_tpu = platform in ("tpu", "axon")
    peak, peak_label = peak_flops(dev)
    if on_tpu and peak is None:
        print(f"WARNING: unrecognised TPU generation {dev.device_kind!r}; "
              "no %-of-peak will be reported", file=sys.stderr)

    if args.small or not on_tpu:
        m, n, k = 2048, 1024, 128
    else:
        # N pre-aligned to 128 so the solver's internal padding is a no-op;
        # at 8 GB for y, an extra padded copy would not fit the 16 GB HBM.
        m, n, k = 400_000, 10_112, 128

    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    key = jax.random.PRNGKey(0)
    y = jax.random.uniform(key, (m, n), dtype=dtype)

    import decomp_tpu

    # The full production path: jitted while_loop + fused Pallas MU kernels
    # ('auto' resolves to the fused single-pass kernels on TPU). tol=0 runs
    # exactly args.iters iterations; the on-device convergence norm is part
    # of what's measured. precision='default' because the data is bf16.
    # factor_dtype=f32 is the CONVERGING operating point (BASELINE.json:5
    # "converging at >= 50% of peak"): bf16-stored factors freeze at this
    # scale (per-step relative changes below bf16 resolution) while f32
    # iterates track the f32/'highest' objective curve to <1% — evidence
    # in benchmarks/headline_convergence.py. Measured cost vs bf16-stored:
    # 13.89 vs 13.23 ms/iter (~5%).
    factor_dtype = jnp.float32 if on_tpu else None

    def run(seed):
        return decomp_tpu.nmf.solve(
            y, rank=k, tol=0.0, maxiter=args.iters, eps=1e-6,
            random_seed=seed, precision="default",
            factor_dtype=factor_dtype)

    def force(out):
        # On the experimental 'axon' platform block_until_ready returns
        # before execution completes; reading a value is the only reliable
        # fence. (Measured: dispatch 0.8 ms, "block" 0.1 ms, read = the
        # actual runtime.)
        return float(jnp.asarray(out.d, jnp.float32).sum())

    # warmup / compile
    force(run(0))

    _seed = iter(range(1, 1000))

    def timed():
        t0 = time.perf_counter()
        force(run(next(_seed)))
        return time.perf_counter() - t0

    if args.profile:
        with jax.profiler.trace("/tmp/decomp_tpu_trace"):
            timed()

    best = min(timed() for _ in range(args.repeats))
    iters_per_sec = args.iters / best
    flops = flops_per_iter(m, n, k) * iters_per_sec
    frac_peak = (flops / peak) if (on_tpu and peak) else None
    vs_baseline = (frac_peak / 0.5) if frac_peak is not None else None

    fd_tag = "/f32-factors" if factor_dtype is not None else ""
    result = {
        "metric": f"NMF MU iters/sec, {m}x{n} rank-{k} "
                  f"{dtype.__name__}{fd_tag}, single chip ({platform})",
        "value": round(iters_per_sec, 3),
        "unit": "iters/sec",
        "vs_baseline": round(vs_baseline, 4) if vs_baseline else None,
        "matmul_tflops": round(flops / 1e12, 2),
        "frac_of_peak": round(frac_peak, 4) if frac_peak else None,
        "peak_basis": peak_label if on_tpu else None,
        "wall_s_per_iter": round(best / args.iters, 6),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
