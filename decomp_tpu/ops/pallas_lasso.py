"""Fused Pallas TPU kernels for MASKED lasso / dictionary-learning
gradients (BASELINE.json:5 "missing-value variants use masked-matmul
Pallas kernels instead of dense mask multiplies"; VERDICT.md round-1
Missing #2).

The dense-composition masked gradient

    g = (mask * (x @ a) - my) @ a^H            (lasso,  g is M x F)
    G = x^H @ (mask * (x @ d) - my)            (dict,   G is K x N)

materialises the M x N masked reconstruction in HBM every iteration —
write x@a (MN), read it back with mask/my for the elementwise residual
(3 MN), write the residual (MN), read it for the second matmul (MN):
~6 MN of HBM traffic for 4 MNF matmul FLOPs. At the masked-config shape
(100k x 1k, BASELINE.json:10) that M x N round trip is the bottleneck the
north star explicitly bans.

These kernels stream each row stripe of (my, mask, x) through VMEM once:
the reconstruction and residual live only in VMEM registers/scratch, so
HBM touches are just the operands and the (much smaller) M x F / K x N
output — ~2 MN total.

Kernel structure mirrors decomp_tpu.ops.pallas_mu: a 1-D grid over row
stripes of height ``block_rows``; the dictionary (F x N or K x N) stays
VMEM-resident across stripes; all dots accumulate in f32 on the MXU
(preferred_element_type). ``masked_grad_dict`` accumulates its K x N
output in f32 VMEM scratch across the sequentially-executed stripes
(TPU grids are sequential, so the accumulation is race-free) and flushes
on the last stripe.

Shape contract (same as pallas_mu): callers pre-pad ONCE, outside the
iteration loop — M % block_rows == 0, N % 128 == 0, F (or K) % 128 == 0.
Zero padding is a fixed point: padded rows/features/channels have zero
mask/data/dictionary entries, contribute nothing, and produce zero
gradient (soft-thresholding then keeps the padded coordinates at 0).
Real dtypes only (complex problems run the split-(re,im) path).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from decomp_tpu.ops.pallas_mu import _dot_precision, _VMEM_BUDGET


# VMEM envelope measured on v5e Mosaic (scoped-vmem limit 16M), 100k x 1k
# f32: (block=512, F=128) fits and is fastest; (512, F=256) requests
# 19.98M and (256, F=512) requests 16.11M — both OOM. The observed usage
# is NOT linear in block x F (Mosaic's scheduling differs per shape), so
# the defaults below encode the measured-safe frontier directly rather
# than a fitted model.
_GRAD_VMEM_BUDGET = 13 * 1024 * 1024


def default_block_rows(n: int, f: int, itemsize: int) -> int:
    """Stripe height for the masked-gradient kernels.

    Unlike the MU kernels (which sweep K x N accumulators per stripe),
    these kernels do tiny per-stripe work at rank-scale F, so the fixed
    per-stripe dispatch overhead dominates with 128-row stripes: measured
    at 100k x 1k F=128 f32 on v5e, 512-row stripes run 3.30 ms/iter vs
    4.04 ms/iter at 128 (jnp dense path: 4.55). 512-row stripes are only
    VMEM-safe up to F=128 (see envelope note above); wider dictionaries
    fall back to 128 rows, halving further for very wide N."""
    block = 512 if f <= 128 else 128
    while block > 8 and block * n * (4 * itemsize + 8) > _GRAD_VMEM_BUDGET:
        block //= 2
    return block


def fits_vmem(n: int, f: int, itemsize: int, block_rows=None) -> bool:
    """Gate for use_pallas='auto': the resident dictionary (F x N) and one
    stripe must fit comfortably in VMEM. When the caller overrides the
    stripe height (``pallas_block_rows``), the gate must judge THAT
    stripe, not the default — otherwise auto admits a configuration the
    kernel then fails to compile instead of falling back to jnp."""
    if f * n * itemsize * 2 >= _VMEM_BUDGET:
        return False
    if block_rows:
        return block_rows * n * (4 * itemsize + 8) <= _GRAD_VMEM_BUDGET
    return True


def auto_wins(n: int, f: int, itemsize: int, block_rows=None) -> bool:
    """Gate for use_pallas='auto': the regimes where the fused kernel
    measurably beats the XLA dense composition on v5e (100k x 1k sweep).

    f32, F<=128 (rank-scale dictionaries): kernel 3.30 ms/iter vs jnp
    4.55 (HBM-bound regime — the M x N round trip dominates). At F>=256
    with f32-'highest' the problem is compute-bound and XLA already runs
    at the f32 matmul speed-of-light (measured 25.6 TF/s ~ peak/8), so
    the kernel only adds stripe-dispatch overhead (F=512: 10.8 vs 8.2
    ms/iter); in bf16 XLA's single-pass matmuls win at every F measured
    (F=128: 1.83 vs 1.95 ms/iter). Explicit use_pallas=True overrides."""
    return (itemsize == 4 and f <= 128
            and fits_vmem(n, f, itemsize, block_rows))


def kernel_alignment(m, n, f, itemsize, block_rows=None):
    """(m_pad, n_pad, f_pad, block_rows) for the gradient kernels: N and
    F ceil to 128 (MXU tiles), the stripe height defaults from the VMEM
    envelope, M ceils to a stripe multiple. One place for the arithmetic
    every caller (single-device and sharded lasso/DL) must agree on."""
    n_pad = -(-n // 128) * 128
    f_pad = -(-f // 128) * 128
    br = block_rows or default_block_rows(n_pad, f_pad, itemsize)
    br = min(br, -(-m // 8) * 8)
    m_pad = -(-m // br) * br
    return m_pad, n_pad, f_pad, br


def pad2(arr, rows, cols):
    """Zero-pad a 2-D array up to (rows, cols). Zero padding is a fixed
    point of every update these kernels serve (see module docstring)."""
    return jnp.pad(arr, ((0, rows - arr.shape[0]),
                         (0, cols - arr.shape[1])))


def pad_alpha(alpha, m_pad, f_pad):
    """Pad per-feature (1-D) / per-sample (2-D) regularisation weights
    alongside the padded solution shape; scalars pass through. Padded
    coordinates stay exactly zero regardless of their threshold, so the
    pad value (0) is arbitrary."""
    alpha = jnp.asarray(alpha)
    if alpha.ndim == 1:
        return jnp.pad(alpha, (0, f_pad - alpha.shape[0]))
    if alpha.ndim == 2:
        return pad2(alpha, m_pad, f_pad)
    return alpha


def _check_aligned(m, n, f, block_rows):
    if m % block_rows:
        raise ValueError(f"M={m} must be a multiple of block_rows="
                         f"{block_rows} (pre-pad outside the loop)")
    if n % 128 or f % 128:
        raise ValueError(f"N={n} and F/K={f} must be multiples of 128 "
                         "(pre-pad outside the loop)")


def _grad_rows_kernel(prec, my_ref, mask_ref, x_ref, a_ref, g_ref):
    my_i = my_ref[:]
    mask_i = mask_ref[:]
    a = a_ref[:]
    # recon and residual exist only in VMEM: (mask * (x@a) - my) @ a^T
    recon = jnp.dot(x_ref[:], a, preferred_element_type=jnp.float32,
                    precision=prec)
    resid = (mask_i.astype(jnp.float32) * recon
             - my_i.astype(jnp.float32)).astype(a.dtype)
    g_ref[:] = jax.lax.dot_general(
        resid, a, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec).astype(g_ref.dtype)


def masked_grad_rows(my, mask, x, a, *, block_rows=None, interpret=False,
                     vma=None):
    """Fused masked lasso gradient  (mask * (x @ a) - my) @ a^T.

    my: (M, N) pre-masked data (mask * y); mask: (M, N); x: (M, F);
    a: (F, N). Returns the (M, F) gradient in x's dtype. One pass over
    (my, mask); the M x N reconstruction never touches HBM.
    """
    m, n = my.shape
    f = a.shape[0]
    if block_rows is None:
        block_rows = min(default_block_rows(n, f, my.dtype.itemsize), m)
    _check_aligned(m, n, f, block_rows)

    grid = (m // block_rows,)
    data_spec = pl.BlockSpec((block_rows, n), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_grad_rows_kernel, _dot_precision(my.dtype)),
        grid=grid,
        in_specs=[
            data_spec,                                               # my
            data_spec,                                               # mask
            pl.BlockSpec((block_rows, f), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),                   # x
            pl.BlockSpec((f, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),                   # a
        ],
        out_specs=pl.BlockSpec((block_rows, f), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, f), x.dtype, vma=vma),
        cost_estimate=pl.CostEstimate(
            flops=int(4 * m * n * f),
            bytes_accessed=int(2 * m * n * my.dtype.itemsize
                               + 2 * m * f * x.dtype.itemsize
                               + f * n * a.dtype.itemsize),
            transcendentals=0,
        ),
        interpret=interpret,
    )(my, mask, x, a)


def _grad_dict_kernel(prec, my_ref, mask_ref, x_ref, d_ref, g_ref, g_acc):
    i = pl.program_id(0)
    n_i = pl.num_programs(0)
    my_i = my_ref[:]
    mask_i = mask_ref[:]
    x_i = x_ref[:]
    recon = jnp.dot(x_i, d_ref[:], preferred_element_type=jnp.float32,
                    precision=prec)
    resid = (mask_i.astype(jnp.float32) * recon
             - my_i.astype(jnp.float32)).astype(d_ref.dtype)

    @pl.when(i == 0)
    def _():
        g_acc[:] = jnp.zeros_like(g_acc)

    g_acc[:] += jax.lax.dot_general(
        x_i, resid, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)

    @pl.when(i == n_i - 1)
    def _():
        g_ref[:] = g_acc[:]


def masked_grad_dict(my, mask, x, d, *, block_rows=None, interpret=False,
                     vma=None):
    """Fused masked dictionary gradient  x^T @ (mask * (x @ d) - my).

    my/mask: (M, N); x: (M, K); d: (K, N). Returns the (K, N) gradient in
    float32 (the accumulator dtype), computed in one pass over (my, mask)
    with the reconstruction VMEM-resident. Under a row-sharded shard_map
    the caller psums this partial like the other Gram statistics.
    """
    m, n = my.shape
    k = d.shape[0]
    if block_rows is None:
        block_rows = min(default_block_rows(n, k, my.dtype.itemsize), m)
    _check_aligned(m, n, k, block_rows)

    grid = (m // block_rows,)
    data_spec = pl.BlockSpec((block_rows, n), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_grad_dict_kernel, _dot_precision(my.dtype)),
        grid=grid,
        in_specs=[
            data_spec,                                               # my
            data_spec,                                               # mask
            pl.BlockSpec((block_rows, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),                   # x
            pl.BlockSpec((k, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),                   # d
        ],
        out_specs=pl.BlockSpec((k, n), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, n), jnp.float32, vma=vma),
        scratch_shapes=[pltpu.VMEM((k, n), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=int(4 * m * n * k),
            bytes_accessed=int(2 * m * n * my.dtype.itemsize
                               + m * k * x.dtype.itemsize
                               + k * n * (d.dtype.itemsize + 4)),
            transcendentals=0,
        ),
        interpret=interpret,
    )(my, mask, x, d)
