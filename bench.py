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


def _fence_val(x):
    """Value-read completion fence (block_until_ready does not block on
    the axon platform)."""
    return float(jnp.asarray(x, jnp.float32).sum())


def _best_wall(fn, repeats=2):
    _fence_val(fn())  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        _fence_val(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def _marginal_wall(fn, k=6, repeats=4):
    """(best whole-call wall, best marginal-per-call wall) for ``fn``.

    Marginal = (time of k chained calls - time of 1 call) / (k - 1).
    The solves have no internal host syncs, so consecutive dispatches
    chain asynchronously and the ~25-40 ms tunnel round trip plus host
    overhead amortises to ~0 (BASELINE.md environment table); device
    execution is in dispatch order, so fencing the last result fences
    them all. Measured: the whole-call number swings ~30% with tunnel
    weather within one day (config 2: 76 -> 97 ms, same code) while the
    marginal holds to ~±6% — the marginal measures the solver, the
    whole-call measures the rig."""
    _fence_val(fn())  # compile + warm
    best_1 = best_k = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        _fence_val(fn())
        best_1 = min(best_1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        for _ in range(k - 1):
            fn()
        _fence_val(fn())
        best_k = min(best_k, time.perf_counter() - t0)
    if best_k > best_1:
        return best_1, (best_k - best_1) / (k - 1)
    return best_1, best_k / k  # degenerate: noise swamped the chain gap


def _dispatch_probe_ms() -> float:
    """Rig-health stamp: one tiny fenced dispatch, timed, best-of-3.

    The tunnel's round-trip latency swings from ~25 ms (healthy) to
    minutes (degraded — observed 2026-08-18: a 1k x 1k sum took 158 s),
    and a capture taken during such an episode reads as a solver
    regression when it is the rig. Whole-call-timed metrics carry this
    latency in their value, so each one re-probes right before it runs
    (a mid-session degradation must not be stamped with an earlier
    healthy reading)."""
    def _probe():
        t0 = time.perf_counter()
        float(jnp.sum(jnp.full((128, 128), 2.0, jnp.float32)))
        return time.perf_counter() - t0

    return round(1e3 * min(_probe() for _ in range(3)), 1)


def bench_extra_configs(on_tpu: bool, small: bool) -> None:
    """Compact driver-visible lines for graded configs 2/3/4/5'
    (VERDICT round-3 Weak #6): one JSON line each in the driver schema,
    with vs_baseline measured against the round-3 recorded numbers
    (BASELINE.md) so regressions on the non-headline configs show up in
    BENCH_rNN.json, not only in tests_tpu/. Full-size runs with richer
    detail stay in benchmarks/run_configs.py."""
    import numpy as np

    import decomp_tpu

    tiny = small or not on_tpu
    rng = np.random.default_rng(1)
    # Whole-call-timed configs (2/3/4) carry the rig's dispatch latency
    # in their value (unlike 5'/headline, which time differentially):
    # each line re-probes and stamps it so a slow-tunnel day (observed
    # 25 -> 40 ms) reads as rig state, not a solver regression.

    # --- config 2: batch lasso, whole-solve kernel, time-to-tol -------
    n_prob, n_feat, n_ch = (256, 64, 48) if tiny else (10_000, 512, 256)
    a = rng.normal(size=(n_feat, n_ch)).astype(np.float32)
    x_true = (rng.normal(size=(n_prob, n_feat))
              * (rng.random((n_prob, n_feat)) < 0.05)).astype(np.float32)
    yl = jnp.asarray(x_true @ a
                     + 0.01 * rng.normal(size=(n_prob, n_ch)
                                         ).astype(np.float32))
    ad = jnp.asarray(a)
    pall = (dict(use_pallas=True) if on_tpu
            else dict(use_pallas=True, _pallas_interpret=True))
    # Round-5 re-baseline (BASELINE.md round-5 table): the graded value
    # is the MARGINAL per-solve time (6-chain) — the round-3 whole-call
    # 74 ms carried ~50 ms of tunnel+host overhead that amortises across
    # consecutive calls and swings ~30% with tunnel weather (76 -> 97 ms
    # observed same-day, same code). Baseline = the slow edge of the
    # re-measured marginal's noise envelope (44-47 ms best-of-4), so
    # >= 1.0 means "at the recorded operating point" and a real
    # regression still reads < 1.0. Whole-call kept as a side field.
    w2, t2 = _marginal_wall(lambda: decomp_tpu.lasso.solve(
        yl, ad, 0.1, tol=1e-4, maxiter=4000, method="acc_ista",
        precision="high", per_problem=True, **pall).x)
    base2 = 0.048 if not tiny else None
    print(json.dumps({
        "metric": f"config2 batch-lasso whole-solve time-to-tol, "
                  f"{n_prob}x{n_feat}, marginal per solve (6-chain)",
        "value": round(t2, 4), "unit": "s",
        "vs_baseline": round(base2 / t2, 3) if base2 else None,
        "whole_call_s": round(w2, 4),
        "rig_dispatch_ms": _dispatch_probe_ms()}))

    # --- config 3: dictionary learning, 60 outer iters ----------------
    n_samp, n_atoms, ch = (300, 32, 64) if tiny else (20_000, 256, 64)
    d_true = rng.normal(size=(n_atoms, ch))
    d_true /= np.linalg.norm(d_true, axis=1, keepdims=True)
    xs = rng.normal(size=(n_samp, n_atoms)) * (
        rng.random((n_samp, n_atoms)) < 0.1)
    yd3 = jnp.asarray((xs @ d_true + 0.01 * rng.normal(
        size=(n_samp, ch))).astype(np.float32))
    d03 = jnp.asarray(rng.normal(size=(n_atoms, ch)).astype(np.float32))
    # Marginal like config 2 (same round-5 re-baseline rationale; the
    # BCD row of BASELINE.md measured this config's ~70 ms of rig-bound
    # per-call overhead directly: +65 ms marginal for a second
    # back-to-back solve against a 136 ms whole call).
    w3, t3 = _marginal_wall(lambda: decomp_tpu.dictionary_learning.solve(
        yd3, d03, 0.05, tol=1e-5, maxiter=60, lasso_iter=15,
        precision="high").d)
    base3 = 0.074 if not tiny else None
    print(json.dumps({
        "metric": f"config3 dictionary-learning 60 outer iters, "
                  f"{n_samp}x{ch} {n_atoms} atoms, marginal per solve "
                  f"(6-chain)",
        "value": round(t3, 4), "unit": "s",
        "vs_baseline": round(base3 / t3, 3) if base3 else None,
        "whole_call_s": round(w3, 4),
        "rig_dispatch_ms": _dispatch_probe_ms()}))

    # --- config 4: masked completion preset (mixed + heldout stop) ----
    m4, n4, k4 = (2000, 128, 8) if tiny else (100_000, 1000, 50)
    key = jax.random.PRNGKey(3)
    k1, k2, k3 = jax.random.split(key, 3)
    y4 = (jax.random.uniform(k1, (m4, k4))
          @ jax.random.uniform(k2, (k4, n4))).astype(jnp.float32)
    mask4 = (jax.random.uniform(k3, (m4, n4)) >= 0.3).astype(jnp.float32)
    ym4 = y4 * mask4
    t4 = _best_wall(lambda: decomp_tpu.nmf.masked_completion(
        ym4, mask4, rank=k4, tol=1e-4, maxiter=4000, random_seed=4).d,
        repeats=2)
    base4 = 3.76 if not tiny else None  # round-3 BASELINE.md config 4
    print(json.dumps({
        "metric": f"config4 masked-completion preset time-to-stop, "
                  f"{m4}x{n4} rank-{k4} 30% missing",
        "value": round(t4, 4), "unit": "s",
        "vs_baseline": round(base4 / t4, 3) if base4 else None,
        "rig_dispatch_ms": _dispatch_probe_ms()}))

    # --- config 5': full pod shape out-of-core on one chip ------------
    m5, n5, k5, chunk5 = ((4096, 512, 128, 1024) if tiny
                          else (1_048_576, 10_112, 128, 65_536))
    dt5 = jnp.bfloat16 if on_tpu else jnp.float32

    @jax.jit
    def _dtrue5():
        kd, _ = jax.random.split(jax.random.PRNGKey(7))
        return jax.random.uniform(kd, (k5, n5), dtype=jnp.float32)

    d_true5 = _dtrue5()

    def loader5(lo, hi):
        _, kx = jax.random.split(jax.random.PRNGKey(7))
        kc = jax.random.fold_in(kx, lo)
        xt = jax.random.uniform(kc, (chunk5, k5), dtype=jnp.float32)
        return jnp.maximum(xt @ d_true5, 0.0).astype(dt5)

    kw5 = dict(chunk_rows=chunk5, n_samples=m5, n_channels=n5, dtype=dt5,
               factor_dtype=jnp.float32 if on_tpu else None,
               precision="default" if on_tpu else "highest",
               x_device=True, jit_loader=True, random_seed=11)
    _fence_val(decomp_tpu.nmf.solve_streaming(
        loader5, rank=k5, tol=0.0, maxiter=2, **kw5).d)  # warm
    # Differential timing: the solve call carries ~0.2 s of fixed setup
    # (512 MB x init + head-chunk probes) that a single short run charges
    # to the epoch rate (~10% under-report at 15 iters). Timing a 10-iter
    # and a 50-iter run and dividing the EXTRA iterations by the EXTRA
    # wall time cancels the setup exactly. The 40-iteration gap (~2.7 s)
    # and min-of-3 per point keep the differential above this platform's
    # queueing noise — per-call jitter was measured at up to several
    # hundred ms on busy days, which swamped the previous 15-iteration
    # gap and under-reported the rate by ~40%.
    iters_lo, iters_hi = 10, 50

    def _timed5(iters):
        t0 = time.perf_counter()
        _fence_val(decomp_tpu.nmf.solve_streaming(
            loader5, rank=k5, tol=0.0, maxiter=iters, **kw5).d)
        return time.perf_counter() - t0

    t_lo = t_hi = float("inf")
    for _ in range(3):
        t_lo = min(t_lo, _timed5(iters_lo))
        t_hi = min(t_hi, _timed5(iters_hi))
    if t_hi > t_lo:
        r5 = (iters_hi - iters_lo) / (t_hi - t_lo)
    else:  # pragma: no cover - degenerate timing (noise swamped the gap)
        r5 = iters_hi / t_hi
    # Round-4 differential re-baseline: the round-3 11.1 iters/s charged
    # ~0.28 s of per-call setup to a 15-iter run; the marginal epoch rate
    # of the SAME code, fit over maxiter {5,20,35,50}, is 14.7 iters/s
    # (68 ms/epoch — BASELINE.md round-4 row). Comparing the differential
    # measurement against the whole-call baseline would fake a ~1.3x win.
    base5 = 14.7 if not tiny else None
    print(json.dumps({
        "metric": f"config5' out-of-core streaming NMF, {m5}x{n5} "
                  f"rank-{k5} fused epoch",
        "value": round(r5, 3), "unit": "iters/sec",
        "vs_baseline": round(r5 / base5, 3) if base5 else None}))


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
    parser.add_argument("--headline-only", action="store_true",
                        help="skip the per-config lines")
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

    # Per-config lines first (driver artifacts tail the full stdout);
    # the HEADLINE line stays LAST so a last-JSON-line parser still
    # records the primary metric.
    if not args.headline_only:
        bench_extra_configs(on_tpu, args.small)

    dispatch_ms = _dispatch_probe_ms()

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
        "rig_dispatch_ms": dispatch_ms,
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
