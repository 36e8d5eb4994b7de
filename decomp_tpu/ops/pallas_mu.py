"""Fused Pallas TPU kernels for multiplicative NMF updates.

Mandated rebuild components N3 (masked-matmul kernels, BASELINE.json:5,10)
and the speed-of-light path for the headline benchmark (BASELINE.json:2).

Why fuse (roofline arithmetic, v5e: 197 bf16 TFLOP/s vs 819 GB/s HBM):

- DENSE: one MU iteration costs ~4MNK matmul FLOPs but the naive schedule
  reads the M x N data matrix TWICE (y @ d.T for the x update, then
  x.T @ y for the d update). At rank K=128 in bf16 that is 256 FLOPs per
  byte over two passes = HBM-bound at ~53% of peak. ``mu_update_dense``
  streams each row stripe of y through VMEM ONCE, computing the x update
  and accumulating BOTH d-update sufficient statistics (x_new.T @ y and
  x_new.T @ x_new) in VMEM scratch before the stripe is evicted ->
  compute-bound.

- MASKED: the jnp composition materialises mask * (x @ d) (an M x N array)
  in HBM twice per iteration. ``mu_update_masked`` keeps the masked
  reconstruction entirely in VMEM, touching only my = mask*y and mask in
  HBM once per iteration.

Kernel structure (both): 1-D grid over row stripes of size ``block_rows``;
d (K x N) and the K x K Gram of d stay resident in VMEM across stripes; the
K x N / K x K accumulators live in f32 VMEM scratch and are flushed to the
outputs on the last stripe. TPU grids execute stripes sequentially, which
makes the accumulation race-free. All matmuls specify
preferred_element_type=f32 (MXU accumulation), and the multiplicative
ratio is formed in f32 before casting back to the storage dtype.

Shape contract: callers pre-pad once, outside the iteration loop —
M % block_rows == 0, N % 128 == 0, K % 128 == 0. Zero padding is a fixed
point of the MU update (zero rows/atoms stay zero and contribute nothing
to the statistics); the padding itself lives in the callers
(decomp_tpu.models.nmf._solve_pallas and decomp_tpu.parallel.nmf).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_CALIBRATED_KINDS = ("v5 lite", "v5e")


def calibrated_tpu() -> bool:
    """True when the default backend is a TPU generation these kernels'
    VMEM envelopes were measured on (ADVICE round-2 #1).

    The ``fits_vmem`` / ``auto_wins`` frontiers here and in pallas_lasso /
    pallas_fista encode v5e Mosaic scoped-VMEM measurements; on a
    generation with a different limit a mis-sized kernel config fails to
    COMPILE (VMEM OOM) instead of falling back. ``use_pallas='auto'``
    therefore requires a calibrated generation — unrecognised ones take
    the XLA path, and explicit ``use_pallas=True`` still opts in."""
    if jax.default_backend() != "tpu":
        return False
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:  # pragma: no cover - device enumeration failure
        return False
    return any(k in kind for k in _CALIBRATED_KINDS)


def _dot_precision(dtype):
    """Kernels must pin their dot precision: Mosaic rejects both the
    intermediate 'high' (bf16x3) mode and an fp32 contract precision on
    bf16 operands, so inheriting the caller's default_matmul_precision
    context can crash the Pallas path. f32 operands -> HIGHEST (exact
    passes, matching the library's convergence policy); bf16 operands ->
    DEFAULT (the native single pass)."""
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)

# Default VMEM budget for choosing the stripe height (bytes). Real VMEM is
# ~16 MiB per core; leave headroom for double-buffered pipelines.
_VMEM_BUDGET = 10 * 1024 * 1024


def fits_vmem(n_pad: int, k_pad: int, itemsize: int, masked: bool,
              block_rows: int = None, kl_masked: bool = False,
              kl_dense: bool = False) -> bool:
    """Whether the MU kernel's VMEM envelope fits Mosaic's scoped limit.

    Calibrated against measured compiles on v5e (16M scoped vmem):
    dense bf16 (k=128, n=10112, br=128) fits at ~15.5M; dense f32 at the
    same shape is rejected at 19.94M. Per-column residents: the k x n
    dictionary (itemsize) + f32 accumulator scratch and f32 stat output
    (8 bytes; masked keeps TWO k x n stats -> 16) + the streamed stripe.

    ``block_rows=None`` models the stripe the kernel would actually
    pick (``default_block_rows``) — the gate and the kernel must judge
    the SAME geometry or the gate rejects configs the kernel runs.

    ``kl_dense``/``kl_masked``: the KL kernels carry heavier stat
    residents than their MU shape-twins — dense-KL ~24 bytes/col
    (numd output + accumulator scratch + a stacked copy XLA keeps in
    the observed failures), masked-KL 32 bytes/col (numd + dend, each
    with output AND scratch). Calibrated in-core 2026-08-18 (m=131k
    r128, maxiter=3): dense-KL f32 dies at n=4096 (18.05M reported;
    modeled 18.0M — exact) and compiles at n<=3584 (n=3584 models
    15.75M, marginally above the 15.7M headroom line, so the gate
    conservatively rejects it; n=3072 at 13.5M passes); dense-KL bf16
    n=4096 compiles (modeled 15.0M). Masked-KL f32 n=4096 dies at
    19.95M even at br=64 (modeled 20.0M); n=2048 br=128 compiles at a
    modeled 11.0M and wins 1.19x (BASELINE.md round-4 KL-streaming
    row).
    """
    if block_rows is None:
        block_rows = default_block_rows(
            n_pad, k_pad, itemsize, masked or kl_dense or kl_masked)
    streams = 2 if masked else 1
    stat_bytes = (32 if kl_masked else
                  24 if kl_dense else
                  16 if masked else 8)
    per_col = (k_pad * (itemsize + stat_bytes)
               + block_rows * itemsize * streams)
    return per_col * n_pad <= int(15.7 * 1024 * 1024)


def default_block_rows(n: int, k: int, itemsize: int,
                       masked: bool) -> int:
    """Stripe height: 128 (one full MXU tile in the row dimension) whenever
    the streamed stripes fit the VMEM budget, halving for very wide rows.

    Measured on v5e at 400k x 10112 rank-128 bf16: 128-row stripes reach
    ~77% of peak bf16 matmul FLOPs; 32-row stripes (over-conservative
    budgeting) drop to ~42% because the MXU row dimension runs 1/4 full
    and the K x N accumulator is swept 4x as often.
    """
    block = 128
    streams = 2 if masked else 1  # y (+ mask)
    while block > 8 and block * n * itemsize * 2 * streams > _VMEM_BUDGET:
        block //= 2
    return block


def validate_block_rows(pallas_block_rows):
    """Typed up-front check shared by every entry exposing the stripe
    override: the kernels' stripe height must be a positive multiple of
    8 (the f32 Mosaic row tile); 0/negative/odd values would otherwise
    surface as a raw ZeroDivisionError in a gate or an untyped Mosaic
    error inside a kernel."""
    import numpy as _np

    from decomp_tpu.utils.exceptions import DecompError

    if pallas_block_rows is None:
        return
    if (not isinstance(pallas_block_rows, (int, _np.integer))
            or isinstance(pallas_block_rows, bool)
            or int(pallas_block_rows) < 8
            or int(pallas_block_rows) % 8):
        raise DecompError("pallas_block_rows must be a positive multiple "
                          f"of 8, got {pallas_block_rows!r}")


def _dense_kernel(prec, inner, eps_ref, ddt_ref, y_ref, x_ref, d_ref,
                  xout_ref, numd_ref, gram_ref,
                  numd_acc, gram_acc):
    i = pl.program_id(0)
    n_i = pl.num_programs(0)
    y_i = y_ref[:]
    x_i = x_ref[:]
    eps = eps_ref[0]
    # Compute dtype = the data's dtype. Mixed-precision mode stores the
    # factor iterates in f32 (x_ref/xout_ref) while y/d/ddt stream in
    # bf16: the MXU contracts exact bf16 x bf16 products into f32, and
    # the f32 iterate keeps accumulating updates the bf16 grid would
    # round away (the bf16-stored headline run was measured frozen:
    # benchmarks/headline_convergence.py). Same-dtype callers see no-op
    # casts.
    cdt = y_i.dtype

    # x update: x * (y @ d.T) / (x @ (d d.T) + eps), all f32 accumulation.
    # The expensive numerator is FIXED across inner x refinements
    # (accelerated MU, Gillis & Glineur: it depends on y and d only), so
    # extra inner iterations cost one O(br K^2) denominator matmul each —
    # ~0.6% of the stripe at the headline shape — instead of a data pass.
    num_x = jax.lax.dot_general(
        y_i, d_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    # ddt quantises to the compute dtype at use, matching the jnp path's
    # _update_x_mixed (ddt.astype(cdt)): both paths then run exact
    # products of IDENTICALLY-quantised operands with f32 accumulation,
    # so jnp/Pallas mixed trajectories agree to matmul reduction order
    # (ADVICE round-2 #2). No-op for same-dtype solves.
    ddt_c = ddt_ref[:].astype(cdt)
    x_new_f = x_i.astype(jnp.float32)
    for _ in range(inner):
        den_x = jnp.dot(x_new_f.astype(cdt), ddt_c, precision=prec,
                        preferred_element_type=jnp.float32)
        x_new_f = x_new_f * num_x / (den_x + eps)
    x_new = x_new_f.astype(x_i.dtype)
    xout_ref[:] = x_new
    x_new_c = x_new_f.astype(cdt)

    # d-update sufficient statistics, accumulated across stripes:
    #   numd = x_new.T @ y,  gram = x_new.T @ x_new
    # Zero-init once, then unconditional += so Mosaic can keep the MXU
    # accumulating straight into the scratch instead of a separate VPU add.
    @pl.when(i == 0)
    def _():
        numd_acc[:] = jnp.zeros_like(numd_acc)
        gram_acc[:] = jnp.zeros_like(gram_acc)

    numd_acc[:] += jax.lax.dot_general(
        x_new_c, y_i, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    gram_acc[:] += jax.lax.dot_general(
        x_new_c, x_new_c, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)

    @pl.when(i == n_i - 1)
    def _():
        numd_ref[:] = numd_acc[:]
        gram_ref[:] = gram_acc[:]


def _masked_kernel(prec, eps_ref, my_ref, mask_ref, x_ref, d_ref,
                   xout_ref, numd_ref, dend_ref,
                   numd_acc, dend_acc):
    # No d-Gram shortcut exists under masking: the denominator needs the
    # masked reconstruction itself.
    i = pl.program_id(0)
    n_i = pl.num_programs(0)
    my_i = my_ref[:]
    mask_i = mask_ref[:]
    x_i = x_ref[:]
    d = d_ref[:]
    eps = eps_ref[0]
    cdt = my_i.dtype  # compute dtype; see _dense_kernel on mixed mode

    # x update with the masked reconstruction held in VMEM only:
    #   x * ((mask*y) @ d.T) / ((mask*(x@d)) @ d.T + eps)
    num_x = jax.lax.dot_general(
        my_i, d, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    recon = jnp.dot(x_i.astype(cdt), d, preferred_element_type=jnp.float32,
                    precision=prec)
    recon_m = (mask_i.astype(jnp.float32) * recon).astype(cdt)
    den_x = jax.lax.dot_general(
        recon_m, d, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    x_new_f = x_i.astype(jnp.float32) * num_x / (den_x + eps)
    x_new = x_new_f.astype(x_i.dtype)
    xout_ref[:] = x_new
    x_new_c = x_new_f.astype(cdt)

    # d-update statistics:
    #   numd = x_new.T @ (mask*y),  dend = x_new.T @ (mask*(x_new@d))
    recon2 = jnp.dot(x_new_c, d, preferred_element_type=jnp.float32,
                     precision=prec)
    recon2_m = (mask_i.astype(jnp.float32) * recon2).astype(cdt)

    @pl.when(i == 0)
    def _():
        numd_acc[:] = jnp.zeros_like(numd_acc)
        dend_acc[:] = jnp.zeros_like(dend_acc)

    numd_acc[:] += jax.lax.dot_general(
        x_new_c, my_i, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    dend_acc[:] += jax.lax.dot_general(
        x_new_c, recon2_m, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)

    @pl.when(i == n_i - 1)
    def _():
        numd_ref[:] = numd_acc[:]
        dend_ref[:] = dend_acc[:]


def _kl_dense_kernel(prec, eps_ref, dsum_ref, my_ref, x_ref, d_ref,
                     xout_ref, numd_ref, xsum_ref,
                     numd_acc, xsum_acc):
    """Fused Lee-Seung KL iteration, dense. Per stripe: both
    reconstructions r = x@d + eps and the ratios my/r live only in VMEM;
    numd = x_new^T (my/r_new) and the column sums of x_new accumulate in
    f32 scratch across the (sequential) stripes."""
    i = pl.program_id(0)
    n_i = pl.num_programs(0)
    my_i = my_ref[:]
    x_i = x_ref[:]
    d = d_ref[:]
    eps = eps_ref[0]
    cdt = my_i.dtype

    # x update: x * ((my / (x@d + eps)) @ d.T) / (rowsum(d) + eps)
    r1 = jnp.dot(x_i.astype(cdt), d, preferred_element_type=jnp.float32,
                 precision=prec) + eps
    ratio1 = (my_i.astype(jnp.float32) / r1).astype(cdt)
    num_x = jax.lax.dot_general(
        ratio1, d, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    x_new_f = (x_i.astype(jnp.float32) * num_x
               / (dsum_ref[:].astype(jnp.float32) + eps))
    x_new = x_new_f.astype(x_i.dtype)
    xout_ref[:] = x_new
    x_new_c = x_new_f.astype(cdt)

    # d statistics: numd = x_new^T @ (my / (x_new@d + eps)); den = colsum x
    r2 = jnp.dot(x_new_c, d, preferred_element_type=jnp.float32,
                 precision=prec) + eps
    ratio2 = (my_i.astype(jnp.float32) / r2).astype(cdt)

    @pl.when(i == 0)
    def _():
        numd_acc[:] = jnp.zeros_like(numd_acc)
        xsum_acc[:] = jnp.zeros_like(xsum_acc)

    numd_acc[:] += jax.lax.dot_general(
        x_new_c, ratio2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    xsum_acc[:] += jnp.sum(x_new_f, axis=0, keepdims=True)

    @pl.when(i == n_i - 1)
    def _():
        numd_ref[:] = numd_acc[:]
        xsum_ref[:] = xsum_acc[:]


def _kl_masked_kernel(prec, eps_ref, my_ref, mask_ref, x_ref, d_ref,
                      xout_ref, numd_ref, dend_ref,
                      numd_acc, dend_acc):
    """Fused masked KL iteration: den_x = mask @ d.T and
    dend = x_new^T @ mask join the VMEM-resident ratio computations."""
    i = pl.program_id(0)
    n_i = pl.num_programs(0)
    my_i = my_ref[:]
    mask_i = mask_ref[:]
    x_i = x_ref[:]
    d = d_ref[:]
    eps = eps_ref[0]
    cdt = my_i.dtype

    r1 = jnp.dot(x_i.astype(cdt), d, preferred_element_type=jnp.float32,
                 precision=prec) + eps
    ratio1 = (my_i.astype(jnp.float32) / r1).astype(cdt)
    num_x = jax.lax.dot_general(
        ratio1, d, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    den_x = jax.lax.dot_general(
        mask_i, d, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    x_new_f = x_i.astype(jnp.float32) * num_x / (den_x + eps)
    x_new = x_new_f.astype(x_i.dtype)
    xout_ref[:] = x_new
    x_new_c = x_new_f.astype(cdt)

    r2 = jnp.dot(x_new_c, d, preferred_element_type=jnp.float32,
                 precision=prec) + eps
    ratio2 = (my_i.astype(jnp.float32) / r2).astype(cdt)

    @pl.when(i == 0)
    def _():
        numd_acc[:] = jnp.zeros_like(numd_acc)
        dend_acc[:] = jnp.zeros_like(dend_acc)

    numd_acc[:] += jax.lax.dot_general(
        x_new_c, ratio2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    dend_acc[:] += jax.lax.dot_general(
        x_new_c, mask_i, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)

    @pl.when(i == n_i - 1)
    def _():
        numd_ref[:] = numd_acc[:]
        dend_ref[:] = dend_acc[:]


# NOTE (round 3): the fused HALS x-pass kernel that lived here was
# DELETED after a redesign analysis (VERDICT.md round-2 Weak #4 / Next
# #9). Mosaic has no dynamic_slice on values, so the sequential
# Gauss-Seidel component loop must address columns with one-hot masks —
# ~5 full-width VPU passes per component — and measured 22.2 ms/iter vs
# the XLA composition's 6.9 at 100k x 1k r128 f32. The suggested blocked
# (8-column-group) variant cannot fundamentally win either: the VPU's
# minimum lane tile is 128 wide, so at rank <= 128 a "narrow" 8-column
# pass costs exactly one full-width pass — the one-hot sweeps are
# ALREADY single-tile and the 3.2x deficit is irreducible VPU serial
# work. HALS stays a jnp method (models.nmf._update_x_hals), where XLA's
# composition is the measured fast path; the MU/KL families keep their
# fused kernels (their updates have no sequential component recurrence).


def _check_aligned(m, n, k, block_rows):
    if m % block_rows:
        raise ValueError(f"M={m} must be a multiple of block_rows="
                         f"{block_rows} (pre-pad outside the loop)")
    if n % 128 or k % 128:
        raise ValueError(f"N={n} and K={k} must be multiples of 128 "
                         "(pre-pad outside the loop)")


def mu_update_dense(y, x, d, eps, *, block_rows=None, interpret=False,
                    psum=None, vma=None, d_master=None, inner_iter=1):
    """One fused dense MU iteration. Returns (x_new, d_new).

    Single pass over ``y``; d_new is formed from the kernel's accumulated
    sufficient statistics with an O(KN + K^2 N / tile) epilogue.

    ``psum``: optional collective applied to the d-update sufficient
    statistics between the kernel and the epilogue — under a row-sharded
    ``shard_map``, the kernel computes LOCAL partial statistics on each
    device's row block and ``psum`` (lax.psum over the row axis) turns
    them into the global ones (SURVEY.md §2b N5). The x update is fully
    row-local, so this is the only cross-device point.

    ``vma``: when called inside a ``shard_map`` with vma checking, the set
    of mesh axes the kernel's outputs vary over (e.g. {row_axis}).

    ``d_master``: mixed-precision mode — ``d`` is the compute-dtype (=
    y.dtype, e.g. bf16) copy streamed to the MXU, ``d_master`` the
    full-precision master iterate; the epilogue then updates the master
    (d_new = d_master * numd / (gram @ d_master + eps)) so dictionary
    updates never round through bf16 storage. ``x`` may likewise be f32
    with bf16 ``y`` (in-kernel casts feed the MXU).
    """
    x_new, numd, gram = mu_stats_dense(
        y, x, d, eps, block_rows=block_rows, interpret=interpret,
        vma=vma, inner_iter=inner_iter)
    if psum is not None:
        numd, gram = psum(numd), psum(gram)
    eps32 = jnp.asarray(eps, jnp.float32).reshape(1)
    d_epi = d if d_master is None else d_master
    den_d = jnp.dot(gram, d_epi.astype(jnp.float32),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    d_new = (d_epi.astype(jnp.float32) * numd / (den_d + eps32[0])).astype(
        d_epi.dtype)
    return x_new, d_new


def mu_stats_dense(y, x, d, eps, *, block_rows=None, interpret=False,
                   vma=None, inner_iter=1):
    """The fused dense-MU kernel WITHOUT the d epilogue: one pass over
    ``y`` returns (x_new, numd, gram) where numd = x_new^T y (K, N) and
    gram = x_new^T x_new (K, K) are the d-update sufficient statistics.
    Streaming/out-of-core callers (nmf_streaming's fused epoch)
    accumulate these across chunks and apply one d update per epoch —
    the jnp chunk step would read each chunk TWICE (x-update pass +
    stats pass), which at pod scale is the HBM roofline."""
    m, n = y.shape
    k = d.shape[0]
    if block_rows is None:
        block_rows = default_block_rows(n, k, y.dtype.itemsize, False)
        block_rows = min(block_rows, m)
    _check_aligned(m, n, k, block_rows)
    ddt = jax.lax.dot_general(d, d, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=_dot_precision(d.dtype))
    eps32 = jnp.asarray(eps, jnp.float32).reshape(1)

    grid = (m // block_rows,)
    x_new, numd, gram = pl.pallas_call(
        functools.partial(_dense_kernel, _dot_precision(y.dtype),
                          int(inner_iter)),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                   # eps
            pl.BlockSpec((k, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),                   # ddt
            pl.BlockSpec((block_rows, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),                   # y
            pl.BlockSpec((block_rows, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),                   # x
            pl.BlockSpec((k, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),                   # d
        ],
        out_specs=[
            pl.BlockSpec((block_rows, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, k), x.dtype, vma=vma),
            jax.ShapeDtypeStruct((k, n), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((k, k), jnp.float32, vma=vma),
        ],
        scratch_shapes=[
            pltpu.VMEM((k, n), jnp.float32),
            pltpu.VMEM((k, k), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(4 * m * n * k + 2 * m * k * k),
            bytes_accessed=int((m * n + 2 * m * k) * y.dtype.itemsize
                               + k * n * (y.dtype.itemsize + 4)),
            transcendentals=0,
        ),
        interpret=interpret,
    )(eps32, ddt, y, x, d)
    return x_new, numd, gram


def mu_update_masked(my, mask, x, d, eps, *, block_rows=None,
                     interpret=False, psum=None, vma=None, d_master=None):
    """One fused masked MU iteration. Returns (x_new, d_new).

    ``my`` is the pre-masked data (mask * y, computed once outside the
    loop). The M x N masked reconstructions never leave VMEM.
    ``d_master``: mixed-precision epilogue — see ``mu_update_dense``.
    """
    x_new, numd, dend = mu_stats_masked(
        my, mask, x, d, eps, block_rows=block_rows, interpret=interpret,
        vma=vma)
    if psum is not None:
        numd, dend = psum(numd), psum(dend)
    eps32 = jnp.asarray(eps, jnp.float32).reshape(1)
    d_epi = d if d_master is None else d_master
    d_new = (d_epi.astype(jnp.float32) * numd / (dend + eps32[0])).astype(
        d_epi.dtype)
    return x_new, d_new


def mu_stats_masked(my, mask, x, d, eps, *, block_rows=None,
                    interpret=False, vma=None):
    """The fused masked-MU kernel WITHOUT the d epilogue: one pass over
    (my, mask) returns (x_new, numd, dend) with numd = x_new^T my and
    dend = x_new^T (mask * (x_new @ d)) — the masked d-update sufficient
    statistics. Streaming callers (nmf_streaming's fused epoch)
    accumulate these across chunks for pod-scale masked completion."""
    m, n = my.shape
    k = d.shape[0]
    if block_rows is None:
        block_rows = default_block_rows(n, k, my.dtype.itemsize, True)
        block_rows = min(block_rows, m)
    _check_aligned(m, n, k, block_rows)
    eps32 = jnp.asarray(eps, jnp.float32).reshape(1)

    grid = (m // block_rows,)
    data_spec = pl.BlockSpec((block_rows, n), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    x_new, numd, dend = pl.pallas_call(
        functools.partial(_masked_kernel, _dot_precision(my.dtype)),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                   # eps
            data_spec,                                               # my
            data_spec,                                               # mask
            pl.BlockSpec((block_rows, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),                   # x
            pl.BlockSpec((k, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),                   # d
        ],
        out_specs=[
            pl.BlockSpec((block_rows, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, k), x.dtype, vma=vma),
            jax.ShapeDtypeStruct((k, n), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((k, n), jnp.float32, vma=vma),
        ],
        scratch_shapes=[
            pltpu.VMEM((k, n), jnp.float32),
            pltpu.VMEM((k, n), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(12 * m * n * k),
            bytes_accessed=int(2 * (m * n) * my.dtype.itemsize
                               + 2 * m * k * my.dtype.itemsize
                               + 2 * k * n * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(eps32, my, mask, x, d)
    return x_new, numd, dend


def kl_update_dense(my, x, d, eps, *, block_rows=None, interpret=False,
                    psum=None, vma=None):
    """One fused dense KL-MU iteration. Returns (x_new, d_new).

    Single pass over ``my``: both M x N reconstructions (x@d for the x
    update, x_new@d for the d statistics) and the my/r ratios live only
    in VMEM — the XLA composition materialises them in HBM twice per
    iteration (VERDICT.md round-1 Weak #6). ``psum`` allreduces the
    K x N numerator and K-vector denominator under row sharding.
    """
    x_new, numd, xsum = kl_stats_dense(
        my, x, d, eps, block_rows=block_rows, interpret=interpret,
        vma=vma)
    if psum is not None:
        numd, xsum = psum(numd), psum(xsum)
    eps32 = jnp.asarray(eps, jnp.float32).reshape(1)
    den_d = xsum[0][:, None]  # (K, 1) column sums of x_new
    d_new = (d.astype(jnp.float32) * numd / (den_d + eps32[0])).astype(
        d.dtype)
    return x_new, d_new


def kl_stats_dense(my, x, d, eps, *, block_rows=None, interpret=False,
                   vma=None):
    """The fused dense-KL kernel WITHOUT the d epilogue: one pass over
    ``my`` returns (x_new, numd, xsum) where numd = x_new^T (my /
    (x_new@d + eps)) (K, N) and xsum (1, K) holds x_new's column sums —
    the KL d-update sufficient statistics. Streaming callers
    (nmf_streaming's fused epoch) accumulate these across chunks and
    apply one d update per epoch, exactly as with ``mu_stats_dense``."""
    m, n = my.shape
    k = d.shape[0]
    if block_rows is None:
        block_rows = default_block_rows(n, k, my.dtype.itemsize, True)
        block_rows = min(block_rows, m)
    _check_aligned(m, n, k, block_rows)
    eps32 = jnp.asarray(eps, jnp.float32).reshape(1)
    dsum = jnp.sum(d.astype(jnp.float32), axis=1)[None, :]  # (1, K)

    grid = (m // block_rows,)
    x_new, numd, xsum = pl.pallas_call(
        functools.partial(_kl_dense_kernel, _dot_precision(my.dtype)),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                   # eps
            pl.BlockSpec((1, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),                   # dsum
            pl.BlockSpec((block_rows, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),                   # my
            pl.BlockSpec((block_rows, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),                   # x
            pl.BlockSpec((k, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),                   # d
        ],
        out_specs=[
            pl.BlockSpec((block_rows, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, k), x.dtype, vma=vma),
            jax.ShapeDtypeStruct((k, n), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((1, k), jnp.float32, vma=vma),
        ],
        scratch_shapes=[
            pltpu.VMEM((k, n), jnp.float32),
            pltpu.VMEM((1, k), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(8 * m * n * k),
            bytes_accessed=int(m * n * my.dtype.itemsize
                               + 2 * m * k * my.dtype.itemsize
                               + k * n * (my.dtype.itemsize + 4)),
            transcendentals=0,
        ),
        interpret=interpret,
    )(eps32, dsum, my, x, d)
    return x_new, numd, xsum


def kl_update_masked(my, mask, x, d, eps, *, block_rows=None,
                     interpret=False, psum=None, vma=None):
    """One fused masked KL-MU iteration. Returns (x_new, d_new)."""
    x_new, numd, dend = kl_stats_masked(
        my, mask, x, d, eps, block_rows=block_rows, interpret=interpret,
        vma=vma)
    if psum is not None:
        numd, dend = psum(numd), psum(dend)
    eps32 = jnp.asarray(eps, jnp.float32).reshape(1)
    d_new = (d.astype(jnp.float32) * numd / (dend + eps32[0])).astype(
        d.dtype)
    return x_new, d_new


def kl_stats_masked(my, mask, x, d, eps, *, block_rows=None,
                    interpret=False, vma=None):
    """The fused masked-KL kernel WITHOUT the d epilogue: one pass over
    (my, mask) returns (x_new, numd, dend) with numd = x_new^T (my /
    (x_new@d + eps)) and dend = x_new^T mask — the masked KL d-update
    sufficient statistics, accumulated across chunks by streaming
    callers exactly as with ``mu_stats_masked``."""
    m, n = my.shape
    k = d.shape[0]
    if block_rows is None:
        block_rows = default_block_rows(n, k, my.dtype.itemsize, True)
        block_rows = min(block_rows, m)
    _check_aligned(m, n, k, block_rows)
    eps32 = jnp.asarray(eps, jnp.float32).reshape(1)

    grid = (m // block_rows,)
    data_spec = pl.BlockSpec((block_rows, n), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    x_new, numd, dend = pl.pallas_call(
        functools.partial(_kl_masked_kernel, _dot_precision(my.dtype)),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                   # eps
            data_spec,                                               # my
            data_spec,                                               # mask
            pl.BlockSpec((block_rows, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),                   # x
            pl.BlockSpec((k, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),                   # d
        ],
        out_specs=[
            pl.BlockSpec((block_rows, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, k), x.dtype, vma=vma),
            jax.ShapeDtypeStruct((k, n), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((k, n), jnp.float32, vma=vma),
        ],
        scratch_shapes=[
            pltpu.VMEM((k, n), jnp.float32),
            pltpu.VMEM((k, n), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(10 * m * n * k),
            bytes_accessed=int(2 * m * n * my.dtype.itemsize
                               + 2 * m * k * my.dtype.itemsize
                               + 2 * k * n * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(eps32, my, mask, x, d)
    return x_new, numd, dend
