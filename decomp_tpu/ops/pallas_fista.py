"""Whole-solve batched proximal-gradient (ISTA/FISTA) Pallas TPU kernel.

VERDICT.md round-2 Missing #1 / Next #1; BASELINE.json:5 ("All update
kernels must hit MXU speed-of-light on the dominant W@H / Gram-matrix
matmuls"). The batch-lasso rows are INDEPENDENT problems sharing one
dictionary (SURVEY.md §2a row 2), yet the jnp solver runs them through a
global lock-step ``lax.while_loop``: every iteration launches one small
(P, F) x (F, F) matmul and drags the full (P, F) iterate set through HBM
six-plus times (x, z in and out, plus the gradient) — measured 8-10
TFLOP/s = ~5% of peak at the graded config-2 shape (BASELINE.md).

This kernel runs the ENTIRE solve for a stripe of rows in one grid step:

- the F x F Gram of the dictionary (and the per-feature step/threshold
  vectors) stay VMEM-resident across stripes;
- a stripe's x / z / t / done / niter state lives in VMEM for ALL of its
  iterations — HBM touches per stripe are one read of (yah, x0, z0) and
  one write of the results, independent of iteration count;
- per-row stopping (the ``per_problem`` semantics of models.lasso):
  converged rows FREEZE bit-exactly at their own stopping iteration, and
  the stripe's while_loop exits as soon as every row is done — stripes
  with easy rows retire early instead of pacing the slowest row of the
  whole batch.

Precision modes (static ``hi_lo``):
- False: f32 operands, ``Precision.HIGHEST`` dots (exact passes) — the
  library's default convergence policy.
- True ('high'): the Gram is pre-split into bf16 (hi, lo) halves and the
  iterate is split per iteration, so each gradient is THREE single-pass
  bf16 MXU matmuls with f32 accumulation (the classic bf16x3
  decomposition XLA uses for precision='high', built manually because
  Mosaic rejects the intermediate precision on TPU). ~f32-quality
  results at ~3x the f32-'highest' matmul rate.

Shape contract (mirrors ops.pallas_mu): callers pre-pad once, outside —
F % 128 == 0, M % block_rows == 0. Padded feature columns carry zero
Gram rows/cols, zero step and zero threshold, so they stay exactly zero;
padded rows carry zero data and START done (done0 = 1), so they neither
iterate nor hold a stripe open. The arithmetic is real f32; COMPLEX
batches run through the ``group_fc`` mode (round 4): columns hold
[re | im] blocks, the Gram is the real 2Fc x 2Fc embedding of the
complex Gram, and the prox is the paired-magnitude (complex)
soft-threshold — ``lasso.solve_split(..., use_pallas=True)`` is the
caller.

Mosaic note (measured on v5e): while_loop carry inits must derive from
loaded refs, not broadcast constants — a constant (rows, 1) init gets a
lane/sublane-replicated layout and the loop-carry relayout from the
body's non-replicated output is rejected ("Invalid relayout ... is
replicated in destination but not in source"). All per-row state
therefore enters through input refs.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from decomp_tpu.ops.pallas_mu import calibrated_tpu  # noqa: F401  (re-export)

# Measured v5e Mosaic scoped-VMEM envelope. Calibration point: fista
# 'highest' at F=512, block_rows=512 reports 17.42M scoped usage against
# a raw resident estimate of 11.5M (Mosaic's own stack/pipeline buffers
# ride on top), i.e. ~1.51x — budget with 1.6x against the 16M limit.
_VMEM_LIMIT = int(15.5 * 1024 * 1024)
_CALIBRATION = 1.6

# Single steps per while-loop exit check (see _kernel.block): per-row
# results are exact regardless; this only coarsens stripe-exit timing.
_CHECK = 8


def _resident_bytes(f: int, momentum: bool, hi_lo: bool,
                    block_rows: int, group: bool = False) -> int:
    """Estimated VMEM residents: the Gram (f32, or two bf16 halves = the
    same 4*F^2 bytes), the (1, F) step/threshold rows, and the stripe's
    streamed/carried state. The while_loop carries (x, z, t, done, nit)
    live alongside the input/output blocks, so the (br, F) planes count
    roughly twice; the whole sum is then scaled by the measured
    _CALIBRATION factor (see above). ``group`` (split-complex prox):
    the magnitude/scale temporaries and the halves concat add ~2 more
    (br, F) planes. Measured at F=1024 hi_lo momentum with the group
    unroll (4 steps per exit check): br=64 compiles and runs (227 ms at
    the config-2-complex shape, the fastest stripe), br=128 is rejected
    by Mosaic — the 1.6x calibration with the +2 planes reproduces
    exactly that frontier. (History: with the full 8-step unroll br=64
    itself OOM'd at 16.11M scoped and each compile took ~20 min through
    the remote helper; the halved unroll fixed both.)"""
    gram = 4 * f * f
    planes = (3 + (2 if momentum else 0))  # yah, x, z carried + x,z out
    if group:
        planes += 2                        # mag/scale halves + concat
    per_row = planes * 2 * 4 * f + 6 * 4   # x2: pipeline in/out + carry
    extra = 2 * block_rows * f * 2 if hi_lo else 0  # per-iter bf16 splits
    raw = gram + block_rows * per_row + extra + 2 * 4 * f
    return int(raw * _CALIBRATION)


def default_block_rows(f: int, momentum: bool = True,
                       hi_lo: bool = False, group: bool = False) -> int:
    """Stripe height: large enough to fill the MXU row dimension, small
    enough that a stripe's whole solver state fits VMEM. Smaller stripes
    also retire earlier under per-row stopping (less lock-step waste), so
    cap at 512 even when more would fit."""
    block = 512
    while block > 16 and _resident_bytes(f, momentum, hi_lo,
                                         block, group) > _VMEM_LIMIT:
        block //= 2
    return block


def fits_vmem(f_pad: int, momentum: bool = True, hi_lo: bool = False,
              block_rows=None, group: bool = False) -> bool:
    """Gate for use_pallas='auto': some viable stripe height must fit."""
    br = block_rows or default_block_rows(f_pad, momentum, hi_lo, group)
    return _resident_bytes(f_pad, momentum, hi_lo, max(br, 16), group) \
        <= _VMEM_LIMIT


def _bitmask_split(gram):
    """f32 -> exact (hi, lo) bf16 halves via bit masking. An astype
    round trip is elided under --xla_allow_excess_precision (lo folds
    to ZERO and bf16x3 silently degrades to single-pass bf16)."""
    g32 = jax.lax.bitcast_convert_type(gram, jnp.uint32)
    hi_f = jax.lax.bitcast_convert_type(g32 & np.uint32(0xFFFF0000),
                                        jnp.float32)
    return hi_f.astype(jnp.bfloat16), (gram - hi_f).astype(jnp.bfloat16)


def _kernel(momentum, restart, maxiter, hi_lo, feat_vecs, group_fc,
            fixed, *refs):
    if feat_vecs:
        (smem_ref, stepsz_ref, thresh_ref, *refs) = refs
        stepsz = stepsz_ref[:]        # (1, F) per-feature step sizes
        thresh = thresh_ref[:]        # (1, F) per-feature thresholds
    else:
        # Scalar fast path: a (1, F) broadcast row costs materialised
        # (br, F) VPU passes per use in Mosaic — measured ~30% of the
        # whole iteration at F=512 — while SMEM scalars broadcast free.
        (smem_ref, *refs) = refs
        stepsz = smem_ref[1]
        thresh = smem_ref[2]
    if hi_lo:
        (ghi_ref, glo_ref, yah_ref,
         x0_ref, z0_ref, t0_ref, done0_ref, nit0_ref,
         x_ref, z_ref, t_ref, done_ref, nit_ref) = refs
    else:
        (gram_ref, yah_ref,
         x0_ref, z0_ref, t0_ref, done0_ref, nit0_ref,
         x_ref, z_ref, t_ref, done_ref, nit_ref) = refs

    yah = yah_ref[:]
    tol = smem_ref[0]
    tiny = jnp.float32(np.finfo(np.float32).tiny)

    if hi_lo:
        ghi = ghi_ref[:]
        glo = glo_ref[:]

        def grad(v):
            # Manual bf16x3: exact bf16 products, f32 accumulation; the
            # lo x lo term (~2^-32 relative) is dropped, as in XLA
            # 'high'. The split MUST be the bitmask truncation, not an
            # f32->bf16->f32 round trip: this platform compiles with
            # --xla_allow_excess_precision=true, which legally elides the
            # round trip (vlo becomes 0 and "3-pass" silently degrades to
            # single-pass bf16 — measured 3.9e-3 rel err vs 3.5e-5 for
            # the masked split, which no optimisation can remove).
            u32 = pltpu.bitcast(v, jnp.uint32)
            hi_f = pltpu.bitcast(u32 & np.uint32(0xFFFF0000), jnp.float32)
            vhi = hi_f.astype(jnp.bfloat16)           # exact conversion
            vlo = (v - hi_f).astype(jnp.bfloat16)     # bits 9-16
            p = jnp.dot(vhi, ghi, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.DEFAULT)
            p = p + jnp.dot(vhi, glo, preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.DEFAULT)
            p = p + jnp.dot(vlo, ghi, preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.DEFAULT)
            return p - yah
    else:
        gram = gram_ref[:]

        def grad(v):
            return jnp.dot(v, gram, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST) - yah

    def prox(v):
        u = v - stepsz * grad(v)
        if group_fc:
            # Split-complex GROUP soft-threshold (round 4, VERDICT
            # round-3 Missing #4): columns are [re block | im block] of
            # group_fc complex features each; the l1 penalty is on the
            # complex MAGNITUDE, so the prox shrinks |u| and keeps the
            # phase: u * max(1 - t/|u|, 0). Halves are static slices
            # (128-aligned), so Mosaic lowers them as plain lane tiles.
            ure = jax.lax.slice_in_dim(u, 0, group_fc, axis=1)
            uim = jax.lax.slice_in_dim(u, group_fc, 2 * group_fc, axis=1)
            mag = jnp.sqrt(ure * ure + uim * uim)
            th = (jax.lax.slice_in_dim(thresh, 0, group_fc, axis=1)
                  if feat_vecs else thresh)
            scale = jnp.maximum(1.0 - th / jnp.maximum(mag, tiny), 0.0)
            return jnp.concatenate([ure * scale, uim * scale], axis=1)
        return jnp.sign(u) * jnp.maximum(jnp.abs(u) - thresh, 0.0)

    def row_sumsq(v):
        return jnp.sum(v * v, axis=1, keepdims=True)     # (br, 1)

    if fixed:
        # FIXED-BUDGET mode (static ``fixed=True``; callers engage it when
        # the Python value of tol is <= 0): at tol = 0 the convergence
        # test ``num/den < tol`` can never fire, so the whole per-
        # iteration freeze/stopping lattice (two row reductions, sqrt,
        # divide, compare, and five ``where`` passes) is dead code — a
        # large share of the serial VPU chain that makes this solver
        # VPU-bound at F <= ~2000 (see DESIGN.md's roofline). The loop
        # becomes a STATIC-trip fori of bare proximal steps; per-row
        # results are bit-identical to the exact kernel at tol = 0
        # (frozen-on-entry rows are restored by one trailing ``where``).
        # This is exactly dictionary learning's inner-coding regime: a
        # short fixed lasso_iter budget with no early exit to exploit.
        def fstep(carry):
            if momentum:
                x, z, t = carry
                x_cand = prox(z)
                t_cand = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
                z_cand = x_cand + ((t - 1.0) / t_cand) * (x_cand - x)
                if restart:
                    do = jnp.sum((z - x_cand) * (x_cand - x), axis=1,
                                 keepdims=True) > 0
                    t_cand = jnp.where(do, 1.0, t_cand)
                    z_cand = jnp.where(do, x_cand, z_cand)
                return (x_cand, z_cand, t_cand)
            return (prox(carry[0]),)

        x0 = x0_ref[:]
        done0 = done0_ref[:]
        nit0 = nit0_ref[:]
        carry = ((x0, z0_ref[:], t0_ref[:]) if momentum else (x0,))
        # maxiter = q full unrolled blocks + r statically-unrolled steps:
        # exact trip count with Mosaic-friendly static unrolling (a
        # dynamic fori bound blocks unrolling — measured ~60% slower).
        check = _CHECK // 2 if group_fc else _CHECK
        q, r = divmod(int(maxiter), check)
        if q:
            carry = jax.lax.fori_loop(
                0, q,
                lambda i, c: jax.lax.fori_loop(
                    0, check, lambda j, cc: fstep(cc), c, unroll=True),
                carry)
        for _ in range(r):
            carry = fstep(carry)
        # Rows that ENTER done (resume of previously-converged rows;
        # padding rows) stay frozen bit-exactly, as in the exact kernel.
        keep = done0 > 0.5
        if momentum:
            x, z, t = carry
            z_ref[:] = jnp.where(keep, z0_ref[:], z)
            t_ref[:] = jnp.where(keep, t0_ref[:], t)
        else:
            x = carry[0]
            z_ref[:] = jnp.where(keep, x0, x)
            t_ref[:] = t0_ref[:]
        x_ref[:] = jnp.where(keep, x0, x)
        done_ref[:] = done0
        nit_ref[:] = (nit0 + jnp.where(keep, 0.0, float(maxiter))).astype(
            jnp.int32)
        return

    def body(carry):
        # Scalar activity gate: steps past maxiter are exact no-ops, so
        # the surrounding block can run a STATIC number of steps (a
        # dynamic fori trip count blocks Mosaic's unrolling — measured
        # ~60% slower per iteration).
        if momentum:
            it, x, z, t, done, nit = carry
            active = it < maxiter
            x_cand = prox(z)
            t_cand = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
            z_cand = x_cand + ((t - 1.0) / t_cand) * (x_cand - x)
            if restart:
                # Row-local adaptive gradient restart (O'Donoghue &
                # Candes), mirroring models.lasso.momentum_step.
                do = jnp.sum((z - x_cand) * (x_cand - x), axis=1,
                             keepdims=True) > 0
                t_cand = jnp.where(do, 1.0, t_cand)
                z_cand = jnp.where(do, x_cand, z_cand)
        else:
            it, x, done, nit = carry
            active = it < maxiter
            x_cand = prox(x)
        keep = jnp.logical_or(done > 0.5, jnp.logical_not(active))
        # Division form, NOT num < tol * den: tol * tiny is subnormal and
        # TPUs flush subnormals to zero (see models.lasso.row_done).
        num = jnp.sqrt(row_sumsq(x_cand - x))
        den = jnp.maximum(jnp.sqrt(row_sumsq(x_cand)), tiny)
        newly = (num / den < tol).astype(jnp.float32)
        x_new = jnp.where(keep, x, x_cand)
        done_new = jnp.where(active, jnp.maximum(done, newly), done)
        # niter carried in f32 (exact to 2^24; Mosaic layouts favour one
        # vector dtype in the carry), materialised as int32 at the end.
        nit_new = nit + jnp.where(keep, 0.0, 1.0)
        if momentum:
            z_new = jnp.where(keep, z, z_cand)
            t_new = jnp.where(keep, t, t_cand)
            return (it + 1, x_new, z_new, t_new, done_new, nit_new)
        return (it + 1, x_new, done_new, nit_new)

    # Exit checks are grouped: each while iteration runs `check` single
    # steps (frozen rows and past-maxiter steps are exact no-ops, so
    # per-row results and niter are IDENTICAL to checking every step —
    # only the stripe's exit is up to check-1 no-op iterations later).
    # This amortises the scalar all-done reduction between steps, and the
    # STATIC trip count lets Mosaic unroll the block. Group mode halves
    # the unroll: its per-step body is ~2x the ops (half-slices, the
    # magnitude prox, the concat) and the 8-step unroll at 2Fc=1024 both
    # blows the scoped-VMEM stack and multiplies the (already ~20 min)
    # remote-compile time.
    check = _CHECK // 2 if group_fc else _CHECK

    def block(carry):
        return jax.lax.fori_loop(0, check, lambda j, c: body(c), carry,
                                 unroll=True)

    def cond(carry):
        return jnp.logical_and(carry[0] < maxiter,
                               jnp.min(carry[-2]) < 0.5)

    x0 = x0_ref[:]
    done0 = done0_ref[:]
    nit0 = nit0_ref[:]
    if momentum:
        init = (jnp.int32(0), x0, z0_ref[:], t0_ref[:], done0, nit0)
        _, x, z, t, done, nit = jax.lax.while_loop(cond, block, init)
        z_ref[:] = z
        t_ref[:] = t
    else:
        init = (jnp.int32(0), x0, done0, nit0)
        _, x, done, nit = jax.lax.while_loop(cond, block, init)
        z_ref[:] = x
        t_ref[:] = t0_ref[:]
    x_ref[:] = x
    done_ref[:] = done
    nit_ref[:] = nit.astype(jnp.int32)


def solve_rows(yah, gram, x0, z0, t0, done0, nit0, stepsz, thresh, tol, *,
               momentum, restart, maxiter, block_rows=None, hi_lo=False,
               interpret=False, vma=None, group_fc=0, fixed=False):
    """Run the whole batched proximal-gradient solve on device.

    yah:   (M, F) f32 — precomputed y @ a^T (pre-masked data never enters;
           this kernel serves the UNMASKED Gram-form iteration).
    gram:  (F, F) f32 — a @ a^T, Hermitian PSD.
    x0/z0: (M, F) f32 — warm start and extrapolation point (z0 = x0 for a
           fresh solve; z0/t0 from a previous aux for exact resume).
    t0:    (M, 1) f32 momentum scalars (ones for a fresh solve).
    done0: (M, 1) f32 0/1 per-row done mask (resume: previously-converged
           rows stay frozen; padding rows pass 1 so they never iterate).
    nit0:  (M, 1) f32 per-row iteration counts already consumed (resume).
    stepsz/thresh: SCALARS (ride SMEM, broadcast free) or (1, F) f32
           per-feature vectors (parallel_cd steps / feature-weighted
           alpha; padded features pass 0 in both). Scalars are
           measurably cheaper: a (1, F) row broadcast materialises
           (br, F) VPU passes per use in Mosaic.
    tol:   scalar relative-change stopping threshold (per row).
    fixed: static flag — the caller asserts the PYTHON value of tol is
           <= 0, so no row can stop before maxiter and the kernel elides
           the whole per-iteration freeze/stopping lattice (a static-trip
           fori of bare proximal steps; bit-identical results, see
           _kernel). niter comes back as nit0 + maxiter on non-done rows.
    group_fc: split-complex mode — F must equal 2*group_fc with columns
           laid out [re block | im block] of group_fc (128-aligned)
           complex features, ``gram`` the real 2Fc x 2Fc embedding
           [[Gre, Gim], [-Gim, Gre]] of the complex Gram, and the prox
           becomes the paired-magnitude (complex) soft-threshold.
           Per-feature step/thresh vectors must repeat identically in
           both halves.

    Returns (x, z, t, done, niter_int32) with shapes
    ((M, F), (M, F), (M, 1), (M, 1), (M, 1)).
    """
    m, f = yah.shape
    if block_rows is None:
        block_rows = min(default_block_rows(f, momentum, hi_lo,
                                            bool(group_fc)), m)
    if m % block_rows:
        raise ValueError(f"M={m} must be a multiple of block_rows="
                         f"{block_rows} (pre-pad outside)")
    if f % 128:
        raise ValueError(f"F={f} must be a multiple of 128 (pre-pad "
                         "outside)")
    if group_fc and (2 * group_fc != f or group_fc % 128):
        raise ValueError(f"group_fc={group_fc} requires F == 2*group_fc "
                         "with 128-aligned halves")

    f32 = jnp.float32
    stepsz = jnp.asarray(stepsz, f32)
    thresh = jnp.asarray(thresh, f32)
    feat_vecs = stepsz.ndim == 2 or thresh.ndim == 2
    if feat_vecs:
        stepsz = jnp.broadcast_to(stepsz.reshape(1, -1), (1, f))
        thresh = jnp.broadcast_to(thresh.reshape(1, -1), (1, f))
        smem = jnp.asarray(tol, f32).reshape(1)
    else:
        smem = jnp.stack([jnp.asarray(tol, f32), stepsz.reshape(()),
                          thresh.reshape(())]).astype(f32)
    gram = gram.astype(f32)
    if hi_lo:
        ghi, glo = _bitmask_split(gram)
        g_in = [ghi, glo]
        g_specs = [pl.BlockSpec((f, f), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)] * 2
    else:
        g_in = [gram]
        g_specs = [pl.BlockSpec((f, f), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)]

    row_f = pl.BlockSpec((block_rows, f), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    row_1 = pl.BlockSpec((block_rows, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    feat = pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM)

    grid = (m // block_rows,)
    # Cost estimate: the per-stripe trip count is data-dependent; expose
    # a large-but-bounded figure (cap the trip count so a huge maxiter
    # cannot overflow the estimate's int64).
    flops_per_iter = (6 if hi_lo else 2) * m * f * f
    est_iters = min(max(int(maxiter), 1), 100_000)
    feat_in = [stepsz, thresh] if feat_vecs else []
    feat_specs = [feat, feat] if feat_vecs else []
    outs = pl.pallas_call(
        functools.partial(_kernel, momentum, restart, int(maxiter),
                          hi_lo, feat_vecs, int(group_fc), bool(fixed)),
        grid=grid,
        in_specs=(
            [pl.BlockSpec(memory_space=pltpu.SMEM)]  # tol(+step+thresh)
            + feat_specs                             # per-feature vectors
            + g_specs                                # gram (halves)
            + [row_f, row_f, row_f, row_1, row_1, row_1]     # yah x0 z0 t0
        ),                                                   # done0 nit0
        out_specs=[row_f, row_f, row_1, row_1, row_1],
        out_shape=[
            jax.ShapeDtypeStruct((m, f), f32, vma=vma),      # x
            jax.ShapeDtypeStruct((m, f), f32, vma=vma),      # z
            jax.ShapeDtypeStruct((m, 1), f32, vma=vma),      # t
            jax.ShapeDtypeStruct((m, 1), f32, vma=vma),      # done
            jax.ShapeDtypeStruct((m, 1), jnp.int32, vma=vma),  # niter
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(flops_per_iter * est_iters),
            bytes_accessed=int(4 * (3 * m * f + 2 * m * f + 2 * f * f)),
            transcendentals=0,
        ),
        interpret=interpret,
    )(smem, *feat_in, *g_in,
      yah.astype(f32), x0.astype(f32), z0.astype(f32), t0.astype(f32),
      done0.astype(f32), nit0.astype(f32))
    return tuple(outs)
