"""Performance-floor tier (SURVEY.md §4 item 5; VERDICT.md round-2
Missing #2 / Next #3): ASSERTED throughput floors on real TPU, so a
Mosaic/XLA regression that halves a fused kernel's throughput fails
pytest instead of only surfacing in benchmark reruns.

Floors are set ~30-50% below the measured round-3 numbers to absorb the
axon platform's queueing noise (single measurements vary ~30%; each
check takes the best of several runs). Shapes are quarter-scale where
that keeps runtime sane. Only runs on calibrated TPU generations (the
kernels' VMEM envelopes are v5e measurements).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from decomp_tpu.ops.pallas_mu import calibrated_tpu

requires_tpu = pytest.mark.skipif(
    not calibrated_tpu(),
    reason="perf floors are calibrated on real v5e-class TPU hardware")


def _fence(v):
    """block_until_ready is unreliable on axon: read a reduction."""
    return float(jnp.asarray(v, jnp.float32).sum())


def _best_wall(fn, fence, repeats=4):
    fence(fn())  # warmup / compile
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fence(fn())
        best = min(best, time.perf_counter() - t0)
    return best


@requires_tpu
def test_fused_mu_headline_floor():
    """Quarter headline slice (100k x 10112 r128, bf16 data / f32
    factors) through the full solve() path must exceed 55% of the
    generation's bf16 peak (measured round 2/3: 76-81%)."""
    from bench import peak_flops

    import decomp_tpu

    m, n, k = 100_000, 10_112, 128
    iters = 40
    y = jax.random.uniform(jax.random.PRNGKey(0), (m, n),
                           dtype=jnp.bfloat16)

    def run():
        return decomp_tpu.nmf.solve(
            y, rank=k, tol=0.0, maxiter=iters, precision="default",
            factor_dtype=jnp.float32, random_seed=1).d

    best = _best_wall(run, _fence)
    flops = (4.0 * m * n * k + 2.0 * m * k * k) * iters
    peak, _ = peak_flops(jax.devices()[0])
    frac = flops / best / peak
    assert frac > 0.55, f"fused MU at {frac:.1%} of peak (floor 55%)"


@requires_tpu
def test_masked_lasso_kernel_beats_jnp():
    """The fused masked-gradient kernel must stay >= 1.1x the jnp dense
    composition at its auto-win shape (measured 1.38x)."""
    import decomp_tpu

    rng = np.random.default_rng(5)
    m, n, f = 100_000, 1024, 128
    a = jnp.asarray(rng.normal(size=(f, n)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(m, n)).astype(np.float32))
    mask = jnp.asarray((rng.random((m, n)) > 0.3).astype(np.float32))
    _fence(y)
    kw = dict(tol=0.0, maxiter=60, method="fista", mask=mask)

    t_kernel = _best_wall(
        lambda: decomp_tpu.lasso.solve(y, a, 0.1, use_pallas=True,
                                       **kw).x, _fence)
    t_jnp = _best_wall(
        lambda: decomp_tpu.lasso.solve(y, a, 0.1, use_pallas=False,
                                       **kw).x, _fence)
    ratio = t_jnp / t_kernel
    assert ratio > 1.1, (f"masked kernel speedup {ratio:.2f}x "
                         "(floor 1.1x)")


@requires_tpu
def test_config2_whole_solve_bound():
    """Whole-solve batched-FISTA kernel at the graded config-2 shape
    (10k problems x 512 features, acc_ista 'high', per-problem stopping)
    must finish under 0.2 s with device-resident inputs (measured
    76 ms; round-2's jnp path: ~250-310 ms at matched semantics)."""
    import decomp_tpu

    rng = np.random.default_rng(1)
    n_prob, n_feat, n_ch = 10_000, 512, 256
    a = rng.normal(size=(n_feat, n_ch)).astype(np.float32)
    xt = (rng.normal(size=(n_prob, n_feat))
          * (rng.random((n_prob, n_feat)) < 0.05)).astype(np.float32)
    y = jnp.asarray(xt @ a
                    + 0.01 * rng.normal(size=(n_prob, n_ch))
                    .astype(np.float32))
    ad = jnp.asarray(a)
    _fence(y)

    def run():
        return decomp_tpu.lasso.solve(
            y, ad, 0.1, tol=1e-4, maxiter=4000, method="acc_ista",
            precision="high", per_problem=True, use_pallas=True).x

    best = _best_wall(run, _fence, repeats=5)
    assert best < 0.2, f"config-2 whole-solve took {best*1e3:.0f} ms " \
                       "(bound 200 ms)"


@requires_tpu
def test_fused_epoch_streaming_floor():
    """The fused streaming epoch (jit_loader + Pallas chunk step) at the
    FULL out-of-core shape (2^20 x 10112 r128 — the config-5 full-shape
    benchmark geometry) must exceed 30% of peak including generation
    cost (measured 46%). Smaller shapes under-amortise this platform's
    per-epoch dispatch and would gate on the rig, not the kernel. The
    persistent compile cache keeps reruns at seconds."""
    from bench import peak_flops

    import decomp_tpu

    # chunk must be 128-aligned for the fused Pallas chunk step
    m, n, k, chunk = 1_048_576, 10_112, 128, 65_536
    key = jax.random.PRNGKey(7)
    kd, kx = jax.random.split(key)
    d_true = jax.random.uniform(kd, (k, n), dtype=jnp.float32)

    def loader(lo, hi):
        del hi
        kc = jax.random.fold_in(kx, lo)
        xt = jax.random.uniform(kc, (chunk, k), dtype=jnp.float32)
        return jnp.maximum(xt @ d_true, 0.0).astype(jnp.bfloat16)

    def run(iters):
        return decomp_tpu.nmf.solve_streaming(
            loader, rank=k, tol=0.0, maxiter=iters, chunk_rows=chunk,
            n_samples=m, n_channels=n, dtype=jnp.bfloat16,
            factor_dtype=jnp.float32, precision="default",
            x_device=True, jit_loader=True, random_seed=3).d

    best = _best_wall(lambda: run(20), _fence, repeats=2)
    flops_per_iter = (4.0 + 2.0) * m * n * k  # solver + generation
    peak, _ = peak_flops(jax.devices()[0])
    frac = flops_per_iter * 20 / best / peak
    assert frac > 0.30, f"fused epoch at {frac:.1%} of peak (floor 30%)"
    # Marginal epoch rate (round-4 methodology correction, BASELINE.md):
    # the whole-call number above carries ~0.28 s of per-call setup; the
    # MARGINAL cost — extra iterations / extra wall time — is what a long
    # production run sees (measured 68 ms/epoch = 60% of peak). Floor at
    # 40% to absorb the differential measurement's larger noise.
    best_lo = _best_wall(lambda: run(5), _fence, repeats=2)
    if best > best_lo:  # pragma: no branch - degenerate only under noise
        frac_marginal = flops_per_iter * 15 / (best - best_lo) / peak
        assert frac_marginal > 0.40, (
            f"marginal epoch rate at {frac_marginal:.1%} of peak "
            "(floor 40%)")


@requires_tpu
def test_sharded_streaming_epoch_parity_floor():
    """The shard_map-wrapped streaming epoch must stay within 1.25x of
    the single-device fused epoch per iteration on a 1-device mesh
    (VERDICT round-3 Missing #2: round 3 measured 3.5x from a
    chunk-loop-inside-shard_map lowering artifact; round 4 re-measured
    both at parity — epoch chains 17.4 ms/iter each at 262k x 10112
    r128 — after fixing a per-call x-init jit rebuild. This floor
    guards the lowering against platform regressions)."""
    import decomp_tpu
    from decomp_tpu import parallel

    m, n, k, chunk = 262_144, 10_112, 128, 65_536
    key = jax.random.PRNGKey(7)
    kd, kx = jax.random.split(key)
    d_true = jax.random.uniform(kd, (k, n), dtype=jnp.float32)

    def loader(lo, hi):
        del hi
        kc = jax.random.fold_in(kx, lo)
        xt = jax.random.uniform(kc, (chunk, k), dtype=jnp.float32)
        return jnp.maximum(xt @ d_true, 0.0).astype(jnp.bfloat16)

    d0 = np.random.default_rng(0).uniform(size=(k, n)).astype(np.float32)
    mesh = parallel.make_mesh((1,), ("rows",))
    iters = 20
    kw = dict(tol=0.0, maxiter=iters, chunk_rows=chunk, n_samples=m,
              n_channels=n, dtype=jnp.bfloat16,
              factor_dtype=jnp.float32, precision="default",
              random_seed=11)

    t_single = _best_wall(
        lambda: decomp_tpu.nmf.solve_streaming(
            loader, d0, x_device=True, jit_loader=True, **kw).d, _fence)
    t_shard = _best_wall(
        lambda: parallel.nmf.solve_streaming(
            loader, d0, mesh=mesh, **kw).d, _fence)
    ratio = t_shard / t_single
    assert ratio < 1.25, (
        f"sharded streaming epoch at {ratio:.2f}x single-device "
        "(floor 1.25x)")


@requires_tpu
def test_hbm_cache_wins_for_expensive_loaders():
    """hbm_cache_chunks with a loader costlier than ~two HBM passes must
    beat the uncached epoch (round-4 segment-static loops: measured
    1.52x at 6/7 cached chunks with a 6-sweep loader, 400k x 1024 bf16
    r128; floor 1.10x on the marginal epoch cost). Guards the
    segmented cache path against a regression back to the per-chunk
    lax.cond source select (which measured 0.79x-0.93x)."""
    import decomp_tpu

    m, n, k, chunk = 409_600, 1024, 128, 65_536
    key = jax.random.PRNGKey(7)
    kd, kx = jax.random.split(key)
    d_true = jax.random.uniform(kd, (k, n), dtype=jnp.float32)

    def loader(lo, hi):
        del hi
        kc = jax.random.fold_in(kx, lo)
        xt = jax.random.uniform(kc, (chunk, k), dtype=jnp.float32
                                ).astype(jnp.bfloat16)
        c = jnp.maximum(
            jax.lax.dot_general(xt, d_true.astype(jnp.bfloat16),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.bfloat16), 0)
        for _ in range(6):   # deliberate extra HBM-scale loader work
            c = jnp.sqrt(c * c + jnp.bfloat16(1e-3))
        return c

    def run(cache, iters):
        return decomp_tpu.nmf.solve_streaming(
            loader, rank=k, tol=0.0, maxiter=iters, chunk_rows=chunk,
            n_samples=m, n_channels=n, dtype=jnp.bfloat16,
            factor_dtype=jnp.float32, precision="default",
            x_device=True, jit_loader=True, random_seed=11,
            hbm_cache_chunks=cache).d

    def marginal(cache):
        lo = _best_wall(lambda: run(cache, 5), _fence)
        hi = _best_wall(lambda: run(cache, 30), _fence)
        if hi <= lo:
            # The 25-iteration differential (~0.2-0.3 s) is the same
            # order as this platform's busy-day dispatch jitter; a
            # non-positive gap is a measurement failure, not a perf
            # signal (a 1e-9 clamp would turn it into a spurious fail
            # or a vacuous pass depending on WHICH side degenerated).
            pytest.skip(f"degenerate differential (wall(30)={hi:.3f} <= "
                        f"wall(5)={lo:.3f}); host too noisy to grade")
        return hi - lo

    m_uncached = marginal(0)
    m_cached = marginal(6)
    ratio = m_uncached / m_cached
    assert ratio > 1.10, (
        f"cached epoch at {ratio:.2f}x uncached with an expensive "
        "loader (floor 1.10x)")


@requires_tpu
def test_split_complex_kernel_beats_jnp_split():
    """The group_fc whole-solve kernel at the config-2-complex scale
    (10k problems x 512 COMPLEX features) must stay >= 1.15x the jnp
    split path (round 4 measured 1.51-1.52x; the win shrinks toward 1x
    at small batches, so the floor runs the graded shape). Also pins the
    auto gate: the default solve_split call must match the explicit
    use_pallas=True path bitwise."""
    import decomp_tpu
    from decomp_tpu.ops import complex_split as cs

    rng = np.random.default_rng(1)
    m, f, c = 10_000, 512, 256
    a = (rng.normal(size=(f, c))
         + 1j * rng.normal(size=(f, c))).astype(np.complex64)
    xt = ((rng.normal(size=(m, f)) + 1j * rng.normal(size=(m, f)))
          * (rng.random((m, f)) < 0.05)).astype(np.complex64)
    y = (xt @ a + 0.01 * (rng.normal(size=(m, c))
                          + 1j * rng.normal(size=(m, c)))
         ).astype(np.complex64)
    ys = cs.SplitComplex(jnp.asarray(y.real), jnp.asarray(y.imag))
    a_s = cs.SplitComplex(jnp.asarray(a.real), jnp.asarray(a.imag))
    _fence(ys.re)
    kw = dict(tol=1e-4, maxiter=3000, method="acc_ista",
              per_problem=True, precision="high")

    r_auto = decomp_tpu.lasso.solve_split(ys, a_s, 0.1, **kw)
    r_kernel = decomp_tpu.lasso.solve_split(ys, a_s, 0.1,
                                            use_pallas=True, **kw)
    np.testing.assert_array_equal(np.asarray(r_auto.niter),
                                  np.asarray(r_kernel.niter))

    t_kernel = _best_wall(
        lambda: decomp_tpu.lasso.solve_split(ys, a_s, 0.1,
                                             use_pallas=True, **kw).x.re,
        _fence, repeats=3)
    t_jnp = _best_wall(
        lambda: decomp_tpu.lasso.solve_split(ys, a_s, 0.1,
                                             use_pallas=False, **kw).x.re,
        _fence, repeats=3)
    ratio = t_jnp / t_kernel
    assert ratio > 1.15, (f"split-complex kernel speedup {ratio:.2f}x "
                          "(floor 1.15x)")


@requires_tpu
def test_mixed_kl_throughput_floor():
    """Mixed-precision KL-NMF (bf16 data / f32 factor iterates) at the
    config-4 shape must stay >= 2x the f32-'highest' reference line per
    iteration (round 4 measured 3.2x) AND track its objective: the final
    generalised-KL objective from 120 mixed iterations must be within 1%
    of the f32 run's (measured 0.011%)."""
    import decomp_tpu

    m, n, k, iters = 100_000, 1000, 50, 120
    key = jax.random.PRNGKey(3)
    k1, k2, k3 = jax.random.split(key, 3)
    y = (jax.random.uniform(k1, (m, k)) @ jax.random.uniform(k2, (k, n))
         ).astype(jnp.float32)
    mask = (jax.random.uniform(k3, (m, n)) >= 0.3).astype(jnp.float32)
    ym = y * mask
    ym16 = ym.astype(jnp.bfloat16)
    mask16 = mask.astype(jnp.bfloat16)
    _fence(ym16)
    rng = np.random.default_rng(5)
    x0 = jnp.asarray(rng.uniform(0.1, 1, (m, k)).astype(np.float32))
    d0 = jnp.asarray(rng.uniform(0.1, 1, (k, n)).astype(np.float32))

    def run_f32():
        return decomp_tpu.nmf.solve(
            ym, d0, x=x0, mask=mask, method="kl-mu", tol=0.0,
            maxiter=iters, precision="highest")

    def run_mixed():
        return decomp_tpu.nmf.solve(
            ym16, d0, x=x0, mask=mask16, method="kl-mu", tol=0.0,
            maxiter=iters, precision="default",
            factor_dtype=jnp.float32)

    t_f32 = _best_wall(lambda: run_f32().d, _fence, repeats=2)
    t_mixed = _best_wall(lambda: run_mixed().d, _fence, repeats=2)
    ratio = t_f32 / t_mixed
    assert ratio > 2.0, f"mixed KL speedup {ratio:.2f}x (floor 2x)"

    @jax.jit
    def _kl_rows(x, d, ym, mask):
        # per-row partial sums on device (f32 over 1000 terms each),
        # f64 host reduction below: pulling ym (400 MB) to the host
        # for an all-f64 evaluation takes tens of minutes through the
        # axon tunnel at its slow times (measured ~0.6 MB/s).
        # ym/mask MUST be arguments, not closure captures: jit lowers
        # closed-over concrete arrays as constants EMBEDDED in the
        # module, and an 800 MB compile payload exceeds the remote-
        # compile tunnel's request-body limit (HTTP 413 — observed).
        r = (x.astype(jnp.float32) @ d.astype(jnp.float32)
             + 1e-15) * mask
        ylogy = jnp.where(ym > 0, ym * jnp.log(ym / (r + 1e-15)), 0.0)
        return jnp.sum(ylogy - ym + r, axis=1)

    def kl_obj(res):
        return float(np.sum(np.asarray(_kl_rows(res.x, res.d, ym, mask),
                                       np.float64)))

    o_f32, o_mixed = kl_obj(run_f32()), kl_obj(run_mixed())
    assert abs(o_mixed - o_f32) / abs(o_f32) < 0.01, (o_f32, o_mixed)


@requires_tpu
def test_kl_streaming_kernel_beats_jnp():
    """The fused KL chunk kernels in the streaming epoch
    (kl_stats_dense; use_pallas=True vs use_pallas=False — the flag IS
    the honest A/B switch) must beat the jnp chunk step by >= 1.05x on
    the MARGINAL epoch cost at 262k x 2048 r128 f32 'highest' chunk
    32768 (measured 1.21x, BASELINE.md round-4 table). Compiling at
    all is part of the floor: this geometry sits just inside the
    scoped-VMEM-stack frontier (n=4096/br=128 dies in the epoch —
    docs/DESIGN.md), so a Mosaic/XLA placement regression fails here
    instead of silently falling back (use_pallas=True raises)."""
    import decomp_tpu

    m, n, k, chunk = 262_144, 2_048, 128, 32_768
    key = jax.random.PRNGKey(3)
    kd, kx = jax.random.split(key)
    d_true = jax.random.uniform(kd, (k, n), dtype=jnp.float32)

    def loader(lo, hi):
        del hi
        kc = jax.random.fold_in(kx, lo)
        xt = jax.random.uniform(kc, (chunk, k), dtype=jnp.float32)
        return jnp.maximum(xt @ d_true, 0.0).astype(jnp.float32)

    def run(use_pallas, iters):
        return decomp_tpu.nmf.solve_streaming(
            loader, rank=k, tol=0.0, maxiter=iters, chunk_rows=chunk,
            n_samples=m, n_channels=n, dtype=jnp.float32,
            method="kl-mu", precision="highest", x_device=True,
            jit_loader=True, random_seed=5, use_pallas=use_pallas).d

    def marginal(use_pallas):
        lo = _best_wall(lambda: run(use_pallas, 8), _fence, repeats=2)
        hi = _best_wall(lambda: run(use_pallas, 32), _fence, repeats=2)
        if hi <= lo:
            pytest.skip(f"degenerate differential (wall(32)={hi:.3f} <= "
                        f"wall(8)={lo:.3f}): host-load noise")
        return (hi - lo) / 24

    m_kernel = marginal(True)
    m_jnp = marginal(False)
    ratio = m_jnp / m_kernel
    assert ratio > 1.05, (
        f"fused KL chunk kernel {ratio:.2f}x vs jnp chunk step "
        f"({1e3 * m_kernel:.1f} vs {1e3 * m_jnp:.1f} ms/iter; "
        "floor 1.05x)")


@requires_tpu
def test_bcd_sweep_kernel_floor():
    """The fused BCD dictionary-sweep kernel (ops.pallas_bcd) must beat
    the jnp fori sweep by >= 2.5x per sweep at config-3 geometry
    (K=256, N=128; measured ~5x: 979 -> 184 us/sweep, BASELINE.md
    round-4 table). A single sweep is ~100x below the tunnel dispatch
    floor, so both sides chain 200 sweeps in one jitted scan. Compiled
    parity (<=1e-5 after 200 chained sweeps) is asserted in the same
    run — this doubles as the compiled-Mosaic oracle for the kernel."""
    from decomp_tpu.models.dictionary_learning import _bcd_dict_update

    k, n, chain = 256, 128, 200
    rng = np.random.default_rng(7)
    x = rng.normal(size=(4 * k, k)).astype(np.float32)
    y = rng.normal(size=(4 * k, n)).astype(np.float32)
    a = jnp.asarray(x.T @ x)
    b = jnp.asarray(x.T @ y)
    d0 = rng.normal(size=(k, n)).astype(np.float32)
    d0 = jnp.asarray(d0 / np.linalg.norm(d0, axis=1, keepdims=True))

    def chained(sweep):
        @jax.jit
        def run(d):
            return jax.lax.scan(lambda d_, _: (sweep(d_), None), d,
                                None, length=chain)[0]
        return run

    with jax.default_matmul_precision("highest"):
        run_jnp = chained(lambda d: _bcd_dict_update(a, b, d))
        run_ker = chained(
            lambda d: _bcd_dict_update(a, b, d, bcd_mode="tpu"))
        out_j = np.asarray(run_jnp(d0))
        out_k = np.asarray(run_ker(d0))
        err = np.abs(out_j - out_k).max() / np.abs(out_j).max()
        assert err < 1e-5, f"compiled sweep diverged: rel {err:.2e}"
        t_jnp = _best_wall(lambda: run_jnp(d0), _fence)
        t_ker = _best_wall(lambda: run_ker(d0), _fence)
    ratio = t_jnp / t_ker
    assert ratio > 2.5, (
        f"BCD sweep kernel {ratio:.2f}x vs jnp fori sweep "
        f"({1e6 * t_ker / chain:.0f} vs {1e6 * t_jnp / chain:.0f} "
        "us/sweep; floor 2.5x)")
