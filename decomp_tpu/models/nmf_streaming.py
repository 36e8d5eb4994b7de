"""Out-of-core ("serial") NMF: data larger than device memory.

Capability parity: the reference's serial/minibatch variants exist because
matrices can exceed one device pass (SURVEY.md §2a row 3). The TPU-native
answer for the deterministic "serial" case: keep ``y`` (and ``x``) in host
memory, stream fixed-size row chunks through the device each iteration, and
accumulate the d-update sufficient statistics on device. The x update is
row-local, so chunking is EXACT: the streamed trajectory equals the
full-batch trajectory bit-for-bit up to matmul reduction order (tested).

This is a host-driven loop by necessity (host<->device transfers cannot
live inside one jit), so unlike ``nmf.solve`` there is one device sync per
chunk. Use it when y does not fit HBM (e.g. the 1M x 10k f32 pod config on
a single 16 GB chip); otherwise ``nmf.solve`` is strictly faster.
"""

import functools
import weakref

from decomp_tpu.utils.weakcache import LoaderKeyedCache
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from decomp_tpu.models.nmf import (
    _mixed_dot,
    _update_x,
    _update_x_kl,
    _update_x_kl_mixed,
    _update_x_mixed,
    _validate_inner_iter,
)
from decomp_tpu.utils import assertion
from decomp_tpu.utils.exceptions import DecompError
from decomp_tpu.utils.result import NMFResult


def _chunk_kernel_gate(use_pallas, *, on_tpu, method, mixed,
                       record_objective, chunk_rows, n_channels, rank,
                       y_itemsize, masked, block_rows=None, inner_iter=1):
    """Resolve the streaming chunk-kernel gate (shared by the
    single-device and sharded streamers). ``use_pallas`` semantics
    mirror ``nmf.solve``: 'auto' engages the fused chunk kernels when
    the platform is calibrated and every geometry requirement holds;
    ``False`` disables them; ``True`` forces them, raising DecompError
    naming the first unsatisfied requirement instead of silently
    falling back."""
    from decomp_tpu.ops import pallas_mu as _pmu

    if use_pallas is False:
        return False
    reqs = (
        (method == "mu" or (method == "kl-mu" and not mixed),
         "method must be 'mu', or 'kl-mu' without factor_dtype (the "
         "fused KL chunk kernels carry no mixed-precision convention, "
         "exactly like the in-core use_pallas gate)"),
        (not record_objective,
         "record_objective is unsupported (the fused chunk kernels do "
         "not emit the data-fit term)"),
        (inner_iter == 1 or (method == "mu" and not masked),
         "inner_iter > 1 is supported by the fused chunk kernels only "
         "for dense method='mu' (the accelerated-MU x refinements reuse "
         "the kernel's numerator; masked/KL denominators need fresh "
         "data passes — same contract as nmf.solve's kernel gate)"),
        (chunk_rows % 128 == 0, "chunk_rows must be a multiple of 128"),
        (n_channels % 128 == 0, "n_channels must be a multiple of 128"),
        (rank % 128 == 0, "rank must be a multiple of 128"),
        (block_rows is None or chunk_rows % block_rows == 0,
         "chunk_rows must be a multiple of pallas_block_rows"),
        (_pmu.fits_vmem(n_channels, rank, y_itemsize,
                        masked or method == "kl-mu",
                        kl_masked=(masked and method == "kl-mu"),
                        kl_dense=(not masked and method == "kl-mu"),
                        **({"block_rows": block_rows}
                           if block_rows else {})),
         "the kernel's per-stripe residents exceed scoped VMEM at this "
         "(n_channels, rank, dtype)"),
    )
    if use_pallas == "auto":
        return on_tpu and all(cond for cond, _ in reqs)
    if not use_pallas:
        return False
    for cond, why in reqs:
        if not cond:
            raise DecompError(f"use_pallas=True: {why}")
    return True


def _make_epoch_runner(mk_epochs, use_pallas_chunk, gate_auto, heldout,
                       warn_prefix):
    """Shared auto-gate compile-fallback wrapper for the fused epochs
    (single-device AND sharded streamers — one state machine, two
    warning prefixes). ``mk_epochs(upc) -> (epoch, epoch_val)``. When
    ``gate_auto`` (the kernel gate engaged via 'auto', non-interpret),
    the FIRST dispatch of each epoch variant is probed inside
    try/except: XLA's memory-space assignment can stack chunk-sized
    kernel values in scoped VMEM in a whole-program-dependent way
    (docs/DESIGN.md frontier table), so a failing config is discovered
    by the compile itself; the runner then warns, rebuilds both epochs
    with the jnp chunk step, and retries on the SAME (x, d) — the
    inputs are untouched by the poisoned dispatch. Explicit
    use_pallas=True callers pass gate_auto=False so errors propagate."""
    state = {"fns": mk_epochs(use_pallas_chunk), "auto": gate_auto,
             "pending": {"plain": True, "val": heldout}}

    def run_epoch(val, xx, dd):
        fn = state["fns"][1 if val else 0]
        key = "val" if val else "plain"
        if not (state["auto"] and state["pending"][key]):
            return fn(xx, dd)
        state["pending"][key] = False
        try:
            out = fn(xx, dd)
            float(out[2])  # diff_dev: force the compile to surface
            return out
        except Exception as err:  # noqa: BLE001 - filtered below
            # Only jax/XLA/Mosaic failures are compile fallbacks; a
            # user loader raising (e.g. FileNotFoundError) at trace
            # time is re-raised untouched instead of being
            # misattributed to the kernel (code-review round 4).
            # Compile failures can carry arbitrary exception TYPES
            # (observed: KeyError from the lowering cache), so classify
            # by the RAISING FRAME: jax/jaxlib internals -> fallback,
            # anything else (the loader's own code, numpy, ...) ->
            # re-raise.
            tb = err.__traceback__
            while tb is not None and tb.tb_next is not None:
                tb = tb.tb_next
            fname = ("" if tb is None
                     else tb.tb_frame.f_code.co_filename)
            if not ("/jax/" in fname or "/jaxlib/" in fname
                    or "/jax_" in fname):
                raise
            import warnings

            warnings.warn(
                f"{warn_prefix}: the auto-gated Pallas chunk kernel "
                "failed to compile on this platform "
                f"({type(err).__name__}); falling back to the jnp "
                "chunk step. Pass use_pallas=False to silence, or "
                "use_pallas=True to raise.", RuntimeWarning)
            state["auto"] = False
            state["fns"] = mk_epochs(False)
            return state["fns"][1 if val else 0](xx, dd)

    return run_epoch


from decomp_tpu.ops.pallas_mu import (  # noqa: E402 - shared validator
    validate_block_rows as _validate_block_rows)


def solve_streaming(
    y,
    d=None,
    *,
    rank: Optional[int] = None,
    x=None,
    tol=1e-4,
    maxiter: int = 100,
    method: str = "mu",
    mask=None,
    chunk_rows: int = 65536,
    random_seed: int = 0,
    eps: float = 1e-15,
    precision: str = "highest",
    factor_dtype=None,
    inner_iter: int = 1,
    callback: Optional[Callable] = None,
    n_samples: Optional[int] = None,
    n_channels: Optional[int] = None,
    dtype=None,
    x_device: bool = False,
    record_objective: bool = False,
    jit_loader: bool = False,
    use_pallas="auto",
    pallas_block_rows: Optional[int] = None,
    hbm_cache_chunks: int = 0,
    stop: str = "rel_change",
    heldout_frac: float = 0.05,
    check_every: int = 5,
    _pallas_interpret: bool = False,
) -> NMFResult:
    """Out-of-core ``y ≈ x @ d`` with nonnegative factors.

    Parameters are as in ``decomp_tpu.nmf.solve`` except:

    y : host array (numpy ndarray / memmap), shape (n_samples,
        n_channels) — streamed in ``chunk_rows`` blocks, never
        materialised on device — OR a CALLABLE data loader
        ``y(lo, hi) -> (hi - lo, n_channels) array`` (host or device;
        e.g. a file reader, database cursor, or on-device generator).
        With a callable, pass ``n_samples``/``n_channels``/``dtype``
        explicitly, and ``mask`` may likewise be a callable
        ``mask(lo, hi)``. The loader must be deterministic across
        iterations (each outer iteration re-reads every chunk).
    x : optional warm start; returned in kind (host numpy array, or a
        device array with ``x_device``).
    chunk_rows : rows per device pass. Pick so that
        chunk_rows * n_channels * itemsize fits comfortably in HBM.
    factor_dtype : as in ``nmf.solve`` — keep the x/d iterates in this
        wider dtype (e.g. f32 over streamed bf16 chunks) while the MXU
        contracts in y's dtype; methods 'mu' and 'kl-mu'.
    inner_iter : as in ``nmf.solve`` — x refinements per d update
        (accelerated MU, Gillis & Glineur). Out of core this is where
        the acceleration pays MOST: each outer iteration costs a full
        pass over the data (the HBM/loader roofline at pod scale), while
        an extra x refinement reuses the chunk already on device — in
        the fused dense-'mu' kernel it reuses the stripe's y @ d.T
        numerator in VMEM for one O(M_c K^2) matmul, a ~1% epoch-cost
        increment for the in-core-measured ~1.4x reduction in wall time
        to equal quality. The chunked trajectory equals ``nmf.solve``'s
        at the same ``inner_iter``. With ``use_pallas=True``,
        inner_iter > 1 requires dense method='mu' (as in-core).
    callback : optional ``callback(it, diff)`` host-side observability
        hook, called once per outer iteration — except under
        ``stop='heldout'``, where it fires only on validation-check
        epochs (every ``check_every``-th iteration): non-check epochs
        are dispatched asynchronously with NO host sync, which is the
        point of the amortised stopping rule, and a per-epoch callback
        would reintroduce one round trip per iteration.
    x_device : keep the (n_samples, rank) activation matrix resident in
        device HBM and update it chunk-wise in place. At pod-scale
        shapes x is small (1M x 128 f32 = 512 MB) while y is not
        (20 GB); device-resident x removes ALL per-iteration host
        traffic when the loader also yields device chunks.
    record_objective : record the data-fit term per outer iteration
        (0.5 * ||mask*(y - x @ d)||^2, evaluated chunk-wise with the
        freshly-updated x against the PRE-update d — one extra
        reconstruction matmul per chunk). Returned in
        ``NMFResult.objective`` as a host-assembled (niter,) array.
    jit_loader : the loader is JIT-TRACEABLE (pure jax ops on a traced
        ``lo``; e.g. an on-device generator, or reads from a resident
        buffer): the WHOLE pass over all chunks then compiles into ONE
        dispatched call per outer iteration (lax.fori_loop over chunks,
        x updated in place via dynamic_update_slice) instead of ~6
        host-driven dispatches per chunk — on a high-latency control
        link the host-driven loop is dispatch-bound at pod scale
        (measured ~50 ms/chunk on the axon tunnel vs ~4 ms of compute).
        Requires a callable ``y`` and ``x_device=True``; the loader sees
        a TRACED ``lo`` and a chunk size that is static by construction.
        ``n_samples`` need NOT divide ``chunk_rows``: the trailing chunk
        reads a clamped loader window [n_samples - chunk_rows,
        n_samples) and masks the rows already covered (ragged tails;
        requires chunk_rows <= n_samples).

        CACHING PITFALL: the compiled epoch is cached per LOADER
        IDENTITY (plus geometry/flags). Pass the SAME loader callable
        across repeated calls (resume, chunked budgets, benchmarking) —
        a fresh closure per call (e.g. an inline ``lambda lo, hi: ...``)
        defeats the cache and re-traces + re-compiles the whole epoch
        every call (tens of seconds at pod scale). ``epoch_cache_info()``
        in this module reports hits/misses for debugging.
    use_pallas : True / False / 'auto' (jit_loader mode). The fused
        Pallas chunk kernels (``mu_stats_dense/masked``,
        ``kl_stats_dense/masked``) read each chunk ONCE per epoch where
        the jnp chunk step reads it twice — at pod scale the chunk
        round trips ARE the HBM roofline. 'auto' engages them exactly
        like ``nmf.solve``'s kernel gate (calibrated TPU generation,
        128-aligned chunk_rows/n_channels/rank, VMEM fit, non-mixed for
        'kl-mu', no record_objective); ``True`` forces them, raising
        DecompError naming the unmet requirement instead of silently
        falling back; ``False`` keeps the jnp chunk step. Under 'auto',
        a kernel epoch that FAILS TO COMPILE (XLA occasionally assigns
        chunk-sized values to Mosaic's scoped-VMEM stack in a
        whole-program-dependent way) falls back to the jnp chunk step
        with a RuntimeWarning instead of raising.
    pallas_block_rows : override the chunk kernels' stripe height
        (rows per grid step; must divide chunk_rows). Smaller stripes
        (e.g. 64) shrink the kernel's VMEM working set — the measured
        escape hatch for wide-row f32 configs where the default
        128-row stripe exceeds the scoped-VMEM stack.
    stop : 'rel_change' (default) or 'heldout' (jit_loader + masked
        only): as in ``nmf.solve`` — a ``heldout_frac`` fraction of each
        chunk's observed entries is reserved (drawn deterministically
        per chunk from ``random_seed``, so every epoch sees the same
        validation set), training runs on the remainder, and iteration
        stops when the validation error plateaus: its relative
        improvement between CHECK epochs (every ``check_every``-th
        epoch; checks cost one extra reconstruction per chunk) drops
        below ``tol``. ``aux['heldout_rel_err']`` carries the final
        validation error. This is the usable stopping rule for
        POD-SCALE mixed-precision masked completion, where the
        rel-change floor fires too early (BASELINE.md).
    check_every : (jit_loader mode) epochs between host-side convergence
        checks — validation passes under ``stop='heldout'``, rel-change
        scalar reads under ``stop='rel_change'`` with ``tol > 0``. The
        epochs between checks are enqueued with NO host round trip
        (they chain asynchronously on device), so convergence may be
        detected up to ``check_every - 1`` epochs late; ``niter``
        counts the epochs actually executed. The callback fires on
        check epochs only. Set ``check_every=1`` for per-epoch checks.
    hbm_cache_chunks : (jit_loader mode) keep the FIRST this-many chunks
        resident in a read-only HBM buffer, prefetched once before the
        first epoch: those chunks skip the loader entirely on every
        subsequent pass. Size it to spare HBM (each cached chunk costs
        chunk_rows * n_channels * itemsize); the biggest wins come when
        the loader crosses a host link or regenerates data. The mask
        loader (if any) is cached alongside.

    Returns NMFResult with ``x`` as a host numpy array (or device array
    with ``x_device``) and ``d`` on device.
    """
    if method not in ("mu", "kl-mu"):
        raise DecompError(f"method must be 'mu' or 'kl-mu', got {method!r}")
    # Mode flags are validated up front, NOT inside the jit_loader branch:
    # stop='heldout' or an HBM cache on the host-array path must raise, not
    # silently fall back to the rel-change rule (ADVICE round-3 #1).
    if stop not in ("rel_change", "heldout"):
        raise DecompError(f"stop must be 'rel_change' or 'heldout', "
                          f"got {stop!r}")
    if use_pallas not in (True, False, "auto"):
        raise DecompError(f"use_pallas must be True, False or 'auto', "
                          f"got {use_pallas!r}")
    inner_iter = _validate_inner_iter(inner_iter)
    _validate_block_rows(pallas_block_rows)
    if not jit_loader:
        if use_pallas is True:
            raise DecompError("use_pallas=True requires jit_loader=True "
                              "(the fused chunk kernels live in the "
                              "jitted epoch; the host-array path streams "
                              "through the jnp chunk step)")
        if stop == "heldout":
            raise DecompError("stop='heldout' requires jit_loader=True "
                              "(the validation split is drawn inside the "
                              "fused epoch)")
        if hbm_cache_chunks:
            raise DecompError("hbm_cache_chunks requires jit_loader=True "
                              "(the cache is read inside the fused epoch)")
    if callable(y):
        if n_samples is None or n_channels is None or dtype is None:
            raise DecompError("a callable y requires explicit n_samples, "
                              "n_channels and dtype")
        y_loader = y
        y = None
        n_samples, n_channels = int(n_samples), int(n_channels)
        y_dtype = jnp.dtype(dtype)
        if mask is not None and not callable(mask):
            raise DecompError("with a callable y, mask must also be a "
                              "callable (lo, hi) -> chunk")
        mask_loader = mask
        mask = None
    else:
        y = np.asarray(y)
        assertion.assert_ndim("y", y, 2)
        assertion.assert_inexact("y", y)
        if np.iscomplexobj(y):
            from decomp_tpu.utils.exceptions import DtypeError
            raise DtypeError("y must be real-valued for NMF")
        n_samples, n_channels = y.shape
        y_dtype = y.dtype
        y_loader = None
        mask_loader = None
    if factor_dtype is not None:
        factor_dtype = jnp.dtype(factor_dtype)
        if factor_dtype == y_dtype:
            factor_dtype = None
    if factor_dtype is not None:
        if method not in ("mu", "kl-mu"):
            raise DecompError("factor_dtype supports methods 'mu' and "
                              "'kl-mu' only")
        if jnp.finfo(factor_dtype).bits < jnp.finfo(jnp.dtype(y_dtype)).bits:
            raise DecompError("factor_dtype must be at least as wide as "
                              "y's dtype")
    fdt = y_dtype if factor_dtype is None else factor_dtype
    if d is None and rank is None:
        raise DecompError("provide an initial dictionary `d` or a `rank`")
    rng = np.random.default_rng(random_seed)
    masked = mask is not None or mask_loader is not None

    def load_y(lo, hi):
        if y_loader is not None:
            return jnp.asarray(y_loader(lo, hi))
        return jnp.asarray(y[lo:hi])

    def load_mask(lo, hi, cdt):
        if mask_loader is not None:
            return jnp.asarray(mask_loader(lo, hi), cdt)
        if mask is not None:
            return jnp.asarray(mask[lo:hi], cdt)
        return None

    def _init_scale(k):
        # Mean over OBSERVED entries of the leading rows: missing entries
        # may hold arbitrary finite values (same contract as nmf.solve).
        # Loader calls run under the solve's matmul precision, like the
        # prefill and the traced epochs (generator loaders may contain
        # matmuls).
        with jax.default_matmul_precision(precision):
            head = load_y(0, min(n_samples, 4096))
            mh = load_mask(0, min(n_samples, 4096), head.dtype)
        acc = jnp.promote_types(jnp.float32, head.dtype)
        if mh is not None:
            total = float(jnp.sum((head * mh).astype(acc)))
            count = max(float(jnp.sum(mh.astype(acc))), 1.0)
            mean_y = max(total / count, 1e-30)
        else:
            mean_y = max(float(jnp.mean(head.astype(acc))), 1e-30)
        return np.sqrt(2.0 * mean_y / k)

    if d is None:
        scale = _init_scale(rank)
        d = (scale * rng.uniform(size=(rank, n_channels))).astype(fdt)
    else:
        # Typed entry checks (same as the sharded streamer and
        # nmf.solve): a wrong-width or 1-D warm d otherwise dies as a
        # cryptic XLA shape mismatch deep inside the jitted epoch.
        assertion.assert_ndim("d", d, 2)
        assertion.assert_axis_size("d", d, 1, n_channels, "n_channels")
        if rank is not None and d.shape[0] != rank:
            raise DecompError(
                f"rank={rank} inconsistent with d.shape[0]={d.shape[0]}")
    d = jnp.asarray(d, fdt)
    rank = d.shape[0]
    if x is None:
        scale = _init_scale(rank)
        if x_device:
            # Generate on device (a 1M-row random init should not ride
            # the host link), through a cached jit: eager op-by-op
            # generation costs several tunnel dispatches per call.
            kx = jax.random.PRNGKey(np.uint32(random_seed))
            x = _x_init_device(int(n_samples), int(rank),
                               jnp.dtype(fdt).name)(
                kx, jnp.float32(scale))
        else:
            x = (scale * rng.uniform(size=(n_samples, rank))).astype(fdt)
    else:
        assertion.assert_axis_size("x", x, 0, n_samples, "n_samples")
        assertion.assert_axis_size("x", x, 1, rank, "rank")
        x = jnp.asarray(x, fdt) if x_device else np.array(
            x, dtype=fdt, copy=True)
    if mask is not None:
        mask = np.asarray(mask)
        assertion.assert_same_shape("mask", mask, "y", y)
    chunk_rows = int(chunk_rows)
    if chunk_rows < 1:
        raise DecompError("chunk_rows must be >= 1")

    # Pre-masked host copy avoided: mask applied chunk-wise on device.
    bounds = list(range(0, n_samples, chunk_rows))
    eps_f = float(eps)
    tol_f = float(tol)

    # Accumulate statistics at >= f32 precision, and at f64 when the data
    # itself is f64 so the streamed trajectory matches full-batch exactly.
    acc_dt = np.promote_types(np.float32, y_dtype)
    obj_curve = (np.full((maxiter,), np.nan, np.float64)
                 if record_objective else None)
    niter, converged, diff = 0, False, np.inf

    if jit_loader:
        if y_loader is None:
            raise DecompError("jit_loader=True requires a callable y")
        if not x_device:
            raise DecompError("jit_loader=True requires x_device=True "
                              "(x lives in the fused epoch's carry)")
        if chunk_rows > n_samples:
            raise DecompError(
                f"chunk_rows={chunk_rows} exceeds n_samples={n_samples}; "
                "reduce chunk_rows (the fused epoch reads fixed-size "
                "loader windows inside the data)")
        # Ragged tails are handled by the epoch itself: the trailing
        # chunk reads a clamped loader window and masks the rows at/after
        # n_samples (zero rows are MU fixed points), so n_samples need
        # NOT divide chunk_rows. x is padded to the chunk grid and
        # sliced back on return.
        n_chunks = -(-n_samples // chunk_rows)
        n_pad = n_chunks * chunk_rows
        if n_pad != n_samples:
            x = jnp.concatenate(
                [jnp.asarray(x, fdt),
                 jnp.zeros((n_pad - n_samples, rank), fdt)], axis=0)
        mixed = factor_dtype is not None
        # Fused-kernel chunk step: the Pallas dense-MU stats kernel reads
        # each chunk ONCE (x update + both d statistics in one pass)
        # where the jnp step reads it twice — at pod scale the chunk
        # round trips ARE the HBM roofline. Auto-gated exactly like
        # nmf.solve's kernel path.
        from decomp_tpu.ops import pallas_mu as _pmu

        use_pallas_chunk = _chunk_kernel_gate(
            use_pallas,
            on_tpu=(_pmu.calibrated_tpu() or _pallas_interpret),
            method=method, mixed=mixed,
            record_objective=record_objective, chunk_rows=chunk_rows,
            n_channels=n_channels, rank=rank,
            y_itemsize=jnp.dtype(y_dtype).itemsize, masked=masked,
            block_rows=pallas_block_rows, inner_iter=inner_iter)
        heldout = stop == "heldout"
        if heldout:
            if not masked:
                raise DecompError("stop='heldout' requires a mask loader")
            if record_objective:
                raise DecompError("stop='heldout' is incompatible with "
                                  "record_objective")
            if not 0.0 < float(heldout_frac) < 1.0:
                raise DecompError("heldout_frac must be in (0, 1)")
        n_cache = max(0, min(int(hbm_cache_chunks), n_chunks))
        cache = mcache = None
        if n_cache:
            # Prefill once; the epoch treats the buffers as read-only
            # inputs (no donation, no in-loop writes -> no copies).
            # Cached windows use the same CLAMPED offsets the epoch
            # would pass to the loader (identical for aligned chunks).
            # Stored as one stacked 3-D buffer read by dynamic_slice
            # inside the (rolled) cache-segment loop. A zero-copy
            # variant — tuple of per-chunk arrays as DIRECT operands of
            # unrolled chunk steps — was built and measured 2026-08-17:
            # at the full config-5' shape Mosaic assigns the top-level
            # (un-looped) kernel instance's outputs to the scoped VMEM
            # stack and the compile dies at 17.39M/16M, the same
            # allocation quirk as the config-2 br=64/128 stripes
            # (docs/DESIGN.md); inside fori_loop the outputs stay in
            # HBM, so the rolled form with one slice copy per cached
            # chunk is what this platform admits.
            offs = [min(i * chunk_rows, n_samples - chunk_rows)
                    for i in range(n_cache)]
            # Prefill under the SAME matmul precision the epoch traces
            # its loader calls with: a matmul-containing loader (e.g. a
            # low-rank generator) run eagerly at the ambient default
            # would cache values that differ from what the loader
            # segment regenerates, silently breaking the documented
            # cached == uncached trajectory identity.
            with jax.default_matmul_precision(precision):
                cache = jnp.stack([
                    jnp.asarray(y_loader(lo, lo + chunk_rows), y_dtype)
                    for lo in offs])
                if mask_loader is not None:
                    mcache = jnp.stack([
                        jnp.asarray(mask_loader(lo, lo + chunk_rows),
                                    y_dtype)
                        for lo in offs])
        # Cached per (loader, geometry, flags): repeat solve_streaming
        # calls (resume, chunked budgets, benchmarking) reuse the traced
        # + compiled epoch instead of re-jitting a fresh closure.
        hd_key = (float(heldout_frac), int(random_seed)) if heldout \
            else None
        n_true = n_samples if n_pad != n_samples else None

        _brows = (None if pallas_block_rows is None
                  else int(pallas_block_rows))

        def _mk_epochs(upc):
            e0 = _fused_epoch(
                y_loader, mask_loader, int(chunk_rows), int(n_chunks),
                int(rank), int(n_channels), method, masked, mixed,
                bool(record_objective), jnp.dtype(y_dtype), float(eps_f),
                precision, upc, bool(_pallas_interpret),
                n_cache, hd_key, False, n_true, None, None, _brows,
                inner_iter)
            e0v = (None if not heldout else _fused_epoch(
                y_loader, mask_loader, int(chunk_rows), int(n_chunks),
                int(rank), int(n_channels), method, masked, mixed,
                bool(record_objective), jnp.dtype(y_dtype), float(eps_f),
                precision, upc, bool(_pallas_interpret),
                n_cache, hd_key, True, n_true, None, None, _brows,
                inner_iter))
            if n_cache:
                return (lambda xx, dd: e0(xx, dd, cache, mcache),
                        (None if e0v is None else
                         lambda xx, dd: e0v(xx, dd, cache, mcache)))
            return e0, e0v

        _run_epoch = _make_epoch_runner(
            _mk_epochs, use_pallas_chunk,
            (use_pallas == "auto" and use_pallas_chunk
             and not _pallas_interpret),
            heldout, "fused streaming epoch")

        # tol == 0 with no callback: nothing needs the host per
        # iteration, so the loop just ENQUEUES epochs — on a
        # high-latency control link the per-iteration float(diff) sync
        # otherwise dominates (each read is a full round trip). With
        # tol > 0 the same amortisation applies through check_every:
        # the rel-change scalar is only READ on check epochs, so the
        # epochs in between chain asynchronously (VERDICT round-3
        # Missing #5; measured ~25 ms per non-chained dispatch on the
        # axon tunnel vs a 90 ms full-shape epoch).
        need_diff = (not heldout) and (tol_f > 0.0 or callback is not None)
        ce = max(1, int(check_every))
        # warm-up floor clamped to the budget: with maxiter < 3 check
        # blocks the fixed 'checks >= 3' could never fire (ADVICE
        # round-3 #3's clamp, applied to the streaming drivers —
        # code-review round-4 finding #4); two checks is the minimum
        # that can compare a validation pair
        _warmup = min(3, max(2, int(maxiter) // ce))
        objs_dev = []
        prev_e, last_e, checks = None, None, 0
        with jax.default_matmul_precision(precision):
            for it in range(1, maxiter + 1):
                if heldout and it % ce == 0:
                    x, d, diff_dev, obj_dev, verr, vnorm = _run_epoch(
                        True, x, d)
                    e = float(verr) / max(float(vnorm), 1e-300)
                    last_e = e
                    checks += 1
                    if callback is not None:
                        callback(it, float(diff_dev))
                    niter = it
                    # warm-up: no plateau verdict before the 3rd check
                    # ("no progress YET" is not "no progress ANYMORE")
                    if prev_e is not None and checks >= _warmup and (
                            (prev_e - e) / max(prev_e, 1e-300) < tol_f):
                        converged = True  # validation plateaued
                        break
                    prev_e = e
                    continue
                x, d, diff_dev, obj_dev = _run_epoch(False, x, d)
                if record_objective:
                    objs_dev.append(obj_dev)
                niter = it
                if need_diff and (it % ce == 0 or it == maxiter):
                    diff = float(diff_dev)  # one sync per CHECK epoch
                    if callback is not None:
                        callback(it, diff)
                    if diff < tol_f:
                        converged = True
                        break
        if record_objective:
            # ONE batched device->host transfer: per-scalar float() reads
            # would cost one ~25 ms tunnel round trip PER EPOCH here
            # (code-review round 4).
            for i, o in enumerate(jax.device_get(objs_dev)):
                obj_curve[i] = float(o)
        objective = (jnp.asarray(obj_curve[:], jnp.float64
                                 if acc_dt == np.float64 else jnp.float32)
                     if record_objective else jnp.zeros((0,), jnp.float32))
        aux = (None if last_e is None
               else {"heldout_rel_err": jnp.asarray(np.sqrt(last_e),
                                                    jnp.float32)})
        if n_pad != n_samples:
            x = x[:n_samples]
        return NMFResult(
            x=x, d=d, niter=jnp.asarray(niter, jnp.int32),
            converged=jnp.asarray(converged), objective=objective,
            aux=aux)

    with jax.default_matmul_precision(precision):
        for it in range(1, maxiter + 1):
            d_old = d
            num = jnp.zeros((rank, n_channels), acc_dt)
            den = (jnp.zeros((rank, rank), acc_dt) if not masked
                   and method == "mu"
                   else jnp.zeros((rank, n_channels), acc_dt))
            obj_it = jnp.zeros((), acc_dt)
            for lo in bounds:
                hi = min(lo + chunk_rows, n_samples)
                yc = load_y(lo, hi)
                mc = load_mask(lo, hi, yc.dtype)
                xc = x[lo:hi] if x_device else jnp.asarray(x[lo:hi])
                xc, num_c, den_c, obj_c = _chunk_step(
                    yc, xc, d, mc, eps_f, method=method,
                    masked=masked,
                    mixed=factor_dtype is not None,
                    with_obj=record_objective,
                    inner_iter=inner_iter)
                if x_device:
                    x = x.at[lo:hi].set(xc)
                else:
                    x[lo:hi] = np.asarray(xc)
                num = num + num_c
                den = den + den_c
                if record_objective:
                    obj_it = obj_it + obj_c
            d = _d_from_stats(d, num, den, eps_f, method=method,
                              masked=masked,
                              mixed=factor_dtype is not None)
            # One scalar sync per outer iteration (not per chunk).
            diff = float(_rel_diff(d_old, d))
            if record_objective:
                # data-fit after the x update, against the pre-update d
                # (the chunk pass evaluates it for free-ish; see
                # _chunk_step)
                obj_curve[it - 1] = float(obj_it)
            niter = it
            if callback is not None:
                callback(it, diff)
            if diff < tol_f:
                converged = True
                break

    objective = (jnp.asarray(obj_curve[:], jnp.float64
                             if acc_dt == np.float64 else jnp.float32)
                 if record_objective else jnp.zeros((0,), jnp.float32))
    return NMFResult(
        x=x, d=d, niter=jnp.asarray(niter, jnp.int32),
        converged=jnp.asarray(converged),
        objective=objective,
    )


def epoch_cache_info():
    """Hits/misses of the fused-epoch compile cache (debug hook for the
    loader-identity pitfall: a fresh loader closure per call shows up
    here as one miss per call)."""
    return _EPOCH_CACHE.cache_info()


@functools.lru_cache(maxsize=16)
def _x_init_device(n_rows, rank, fdt_name):
    """Cached jitted device-resident x initialiser (a per-call jit or
    eager generation costs tunnel dispatches / persistent-cache round
    trips on every solve call)."""
    @jax.jit
    def init(key, scale):
        return (scale * jax.random.uniform(key, (n_rows, rank))
                ).astype(jnp.dtype(fdt_name))

    return init


_EPOCH_CACHE = LoaderKeyedCache(maxsize=32)


def _fused_epoch(y_loader, mask_loader, *geom):
    """Loader-identity + geometry cache front for ``_build_fused_epoch``
    (shared with the sharded streamer). The cache holds the loaders
    WEAKLY and self-evicts their compiled epochs when they are
    collected — see ``utils.weakcache`` for why a plain lru_cache here
    pinned every array a dropped loader captured."""
    return _EPOCH_CACHE.get(
        (y_loader, mask_loader), geom,
        lambda wy, wm: _build_fused_epoch(wy, wm, *geom))


def _build_fused_epoch(y_loader, mask_loader, chunk_rows, n_chunks, rank,
                       n_channels, method, masked, mixed, record_objective,
                       y_dtype, eps_f, precision, use_pallas_chunk=False,
                       pallas_interpret=False, n_cache=0, heldout=None,
                       with_val=False, n_true=None, mesh=None,
                       row_axis=None, block_rows=None, inner_iter=1):
    """Build the jitted fused-epoch function for jit_loader
    mode: one dispatched call runs the x updates and d-statistics over
    ALL chunks (lax.fori_loop + dynamic_update_slice on the resident x).
    Cached by ``_fused_epoch`` on loader identity and geometry so repeat
    calls reuse the compiled executable.

    ``n_true``: the true global sample count when it is NOT a multiple
    of the (per-device) chunk grid — the trailing chunk(s) then read a
    clamped loader window [n_true - chunk_rows, n_true), roll it back
    into x alignment, and zero the rows at/after ``n_true`` (zero rows
    are MU fixed points: their x stays 0 and they contribute nothing to
    the d statistics — the library's standard padding argument).

    ``mesh``/``row_axis``: sharded mode. ``x`` is row-sharded over the
    mesh (padded to n_dev * n_chunks * chunk_rows rows), ``d``
    replicated; each device streams its global row range (the loader is
    called with GLOBAL offsets) and the K-sized d statistics (plus the
    objective / validation scalars) are the only psum traffic. The d
    update runs replicated on every device, so sharded and single-device
    trajectories agree to psum reduction order.
    """
    acc_j = jnp.promote_types(jnp.float32, y_dtype)
    if mesh is None:
        n_dev = 1
    else:
        from decomp_tpu.parallel.mesh import validate_axis
        n_dev = validate_axis(mesh, row_axis, "row_axis")
    n_local = n_chunks * chunk_rows          # padded rows per device
    ragged = n_true is not None and int(n_true) < n_dev * n_local
    if heldout is not None:
        hd_frac = jnp.float32(heldout[0])
        # same derivation root as nmf._solve (the _HELDOUT_SALT keeps
        # the validation stream clear of user keys split from the same
        # seed — see nmf._solve)
        from decomp_tpu.models.nmf import _HELDOUT_SALT
        hd_key = jax.random.fold_in(
            jax.random.PRNGKey(np.uint32(heldout[1])), _HELDOUT_SALT)
    if mesh is not None:
        # fori carry types must be loop-invariant under shard_map's vma
        # checking: the stats become device-varying after one chunk (the
        # loader offset depends on axis_index), so the zero inits are
        # marked varying up front.
        vaxes = functools.partial(jax.lax.pcast, axis_name=row_axis,
                                  to="varying")
    else:
        def vaxes(t):
            return t

    def local_pass(x_l, d, cache, mcache, row0):
        """x updates + local d statistics over this device's chunks."""
        num0 = vaxes(jnp.zeros((rank, n_channels), acc_j))
        if method == "mu" and not masked:
            den_shape = (rank, rank)             # Gram
        elif (method == "kl-mu" and not masked and use_pallas_chunk):
            # kernel path: (K,1) column sums of x (the jnp path keeps
            # its broadcast (K,N) form; sums of broadcasts equal the
            # broadcast of sums, so _d_from_stats_impl sees identical
            # values either way)
            den_shape = (rank, 1)
        else:
            den_shape = (rank, n_channels)
        den0 = vaxes(jnp.zeros(den_shape, acc_j))
        obj0 = vaxes(jnp.zeros((), acc_j))

        db = d.astype(y_dtype) if use_pallas_chunk else None

        def body(i, carry, *, use_cache):
            x_, num, den, obj = carry[:4]
            lo_local = i * chunk_rows        # x offset (device-local)
            # default int dtype (int64 under x64, int32 otherwise):
            # loaders combine lo with python literals, which must
            # promote consistently
            lo = row0 + jnp.asarray(lo_local, jnp.asarray(0).dtype)
            if ragged:
                # tail chunk: clamp the loader window into the true
                # data (NOT just a one-chunk shift: with a sharded grid
                # the padding can exceed one chunk, and a chunk whose
                # offset lies entirely past n_true must still read an
                # in-range window — its rows are then fully masked),
                # realign below
                lo_eff = jnp.clip(lo, 0, n_true - chunk_rows)
                s = lo - lo_eff
                is_tail = s > 0
                valid = (jax.lax.broadcasted_iota(
                    jnp.int32, (chunk_rows, 1), 0)
                    < jnp.asarray(chunk_rows, jnp.int32)
                    - s.astype(jnp.int32))
            else:
                lo_eff = lo

            def load(buf, loader):
                # Source selection is SEGMENT-static, not a per-chunk
                # lax.cond: the cond form measured 0.79x at the full
                # config-5' shape (BASELINE.md round-4 table) — the
                # conditional read defeats XLA's chunk prefetch
                # pipelining in BOTH segments.
                if use_cache and buf is not None:
                    return jax.lax.dynamic_slice(
                        buf, (i, 0, 0),
                        (1, chunk_rows, n_channels))[0]
                return jnp.asarray(loader(lo_eff, lo_eff + chunk_rows),
                                   y_dtype)

            def tail_align(c):
                # Roll the clamped window into x alignment and zero the
                # rows at/after n_true. Guarded by lax.cond so aligned
                # chunks pay nothing. The cond wraps the data, not the
                # kernel: a per-tail kernel instance would buy nothing
                # (the roll/where is VPU-trivial next to the chunk
                # matmuls) while doubling compile time per segment.
                if not ragged:
                    return c
                return jax.lax.cond(
                    is_tail,
                    lambda t: jnp.where(valid, jnp.roll(t, -s, axis=0),
                                        jnp.zeros_like(t)),
                    lambda t: t, c)

            yc = tail_align(load(cache, y_loader))
            mc = (None if mask_loader is None
                  else tail_align(load(mcache, mask_loader)
                                  .astype(yc.dtype)))
            val_c = None
            if heldout is not None:
                # Deterministic per chunk and EPOCH-INDEPENDENT (keyed
                # by the ALIGNED global offset lo, identical between the
                # sharded and single-device epochs): every pass reserves
                # the same entries. val_c <= mc elementwise, so tail
                # rows (mc = 0) reserve nothing.
                kv = jax.random.fold_in(hd_key, lo.astype(jnp.uint32))
                val_c = ((jax.random.uniform(
                    kv, (chunk_rows, n_channels)) < hd_frac)
                    .astype(yc.dtype) * mc)
                mc = mc - val_c      # train only on the remainder
            xc_prev = jax.lax.dynamic_slice(x_, (lo_local, 0),
                                            (chunk_rows, rank))
            if use_pallas_chunk:
                from decomp_tpu.ops import pallas_mu

                eps32 = jnp.asarray(eps_f, jnp.float32)
                if method == "kl-mu":
                    # single-pass KL chunks: both ratio reconstructions
                    # stay in VMEM (the jnp chunk step materialises two
                    # M_c x N intermediates in HBM per chunk)
                    if masked:
                        xc, nc, dc = pallas_mu.kl_stats_masked(
                            mc * yc, mc, xc_prev, db, eps32,
                            block_rows=block_rows,
                            interpret=pallas_interpret)
                    else:
                        xc, nc, dc = pallas_mu.kl_stats_dense(
                            yc, xc_prev, db, eps32,
                            block_rows=block_rows,
                            interpret=pallas_interpret)
                        dc = dc.T   # (1,K) colsums -> (K,1) accumulator
                elif masked:
                    xc, nc, dc = pallas_mu.mu_stats_masked(
                        mc * yc, mc, xc_prev, db, eps32,
                        block_rows=block_rows,
                        interpret=pallas_interpret)
                else:
                    # inner_iter > 1 reaches only this branch (gate):
                    # the extra x refinements reuse the stripe's
                    # y @ d.T numerator in VMEM, exactly as in-core.
                    xc, nc, dc = pallas_mu.mu_stats_dense(
                        yc, xc_prev, db, eps32,
                        block_rows=block_rows,
                        interpret=pallas_interpret,
                        inner_iter=inner_iter)
                nc = nc.astype(acc_j)
                dc = dc.astype(acc_j)
                oc = jnp.zeros((), acc_j)
            else:
                xc, nc, dc, oc = _chunk_step_impl(
                    yc, xc_prev, d, mc, jnp.asarray(
                        eps_f, acc_j if mixed else y_dtype),
                    method=method, masked=masked, mixed=mixed,
                    with_obj=record_objective, inner_iter=inner_iter)
            if ragged:
                # tail rows' x must keep its (zero-padded) previous
                # values: their update ran against zeroed data
                xc = jax.lax.cond(
                    is_tail,
                    lambda a, b: jnp.where(valid, a, b),
                    lambda a, b: a, xc, xc_prev)
            x_ = jax.lax.dynamic_update_slice(x_, xc, (lo_local, 0))
            if not with_val:
                return (x_, num + nc, den + dc, obj + oc)
            # Validation check (with_val epochs only): reconstruction
            # error on the reserved entries, evaluated with the
            # freshly-updated xc against the pre-update d — quantised
            # compute-dtype products, f32 accumulation, matching the
            # update path's convention.
            verr, vnorm = carry[4], carry[5]
            cdt_v = yc.dtype
            recon_v = jax.lax.dot_general(
                xc.astype(cdt_v), d.astype(cdt_v),
                (((1,), (0,)), ((), ())),
                preferred_element_type=acc_j)
            yv = (val_c * yc).astype(acc_j)
            rv = yv - val_c.astype(acc_j) * recon_v
            verr = verr + jnp.sum(rv * rv)
            vnorm = vnorm + jnp.sum(yv * yv)
            return (x_, num + nc, den + dc, obj + oc, verr, vnorm)

        if with_val:
            init = (x_l, num0, den0, obj0, vaxes(jnp.zeros((), acc_j)),
                    vaxes(jnp.zeros((), acc_j)))
        else:
            init = (x_l, num0, den0, obj0)
        # Two SEGMENTED (rolled) chunk loops instead of one loop with a
        # per-chunk lax.cond on the source (the cond form measured
        # 0.79x at the full config-5' shape). The duplicated loop
        # bodies — including a second instance of the Pallas chunk
        # kernel — now compile on this platform: the remote-compile-
        # helper crash recorded at commit 36196ce no longer reproduces
        # (re-probed 2026-08-17). Both segments stay fori_loops: a
        # fully-unrolled zero-copy cache segment was tried and dies in
        # Mosaic's scoped-VMEM stack allocator (see the cache-build
        # comment in solve_streaming).
        body_loader = functools.partial(body, use_cache=False)
        n_c = 0 if cache is None else min(n_cache, n_chunks)
        if n_c == 0:
            return jax.lax.fori_loop(0, n_chunks, body_loader, init)
        carry = jax.lax.fori_loop(0, n_c,
                                  functools.partial(body, use_cache=True),
                                  init)
        if n_c == n_chunks:
            return carry
        return jax.lax.fori_loop(n_c, n_chunks, body_loader, carry)

    def finish(d, num, den):
        d_new = _d_from_stats_impl(d, num, den,
                                   jnp.asarray(eps_f, acc_j),
                                   method=method, masked=masked,
                                   mixed=mixed)
        return d_new, _rel_diff_impl(d, d_new)

    if mesh is None:
        @jax.jit
        def epoch(x, d, cache=None, mcache=None):
            with jax.default_matmul_precision(precision):
                row0 = jnp.asarray(0, jnp.asarray(0).dtype)
                out = local_pass(x, d, cache, mcache, row0)
                x, num, den, obj = out[:4]
                d_new, rd = finish(d, num, den)
                if with_val:
                    return (x, d_new, rd, obj, out[4], out[5])
                return x, d_new, rd, obj

        return epoch

    from jax.sharding import PartitionSpec as P

    def body_shard(x_l, d_r, cache_l=None, mcache_l=None):
        int_dt = jnp.asarray(0).dtype
        row0 = (jax.lax.axis_index(row_axis) * n_local).astype(int_dt)
        out = local_pass(x_l, d_r, cache_l, mcache_l, row0)
        x_l, num, den, obj = out[:4]
        # The ONLY cross-device traffic: K-sized statistics (+ scalars).
        num = jax.lax.psum(num, row_axis)
        den = jax.lax.psum(den, row_axis)
        obj = jax.lax.psum(obj, row_axis)
        d_new, rd = finish(d_r, num, den)
        if with_val:
            verr = jax.lax.psum(out[4], row_axis)
            vnorm = jax.lax.psum(out[5], row_axis)
            return x_l, d_new, rd, obj, verr, vnorm
        return x_l, d_new, rd, obj

    cache_spec = P(row_axis, None, None)
    in_specs = (P(row_axis, None), P(None, None))
    out_specs = (P(row_axis, None), P(None, None), P(), P())
    if with_val:
        out_specs = out_specs + (P(), P())

    @jax.jit
    def sharded_epoch(x, d, cache=None, mcache=None):
        with jax.default_matmul_precision(precision):
            specs = in_specs
            args = (x, d)
            if cache is not None:
                specs = specs + (cache_spec,)
                args = args + (cache,)
            if mcache is not None:
                specs = specs + (cache_spec,)
                args = args + (mcache,)
            return jax.shard_map(
                body_shard, mesh=mesh, in_specs=specs,
                out_specs=out_specs,
                check_vma=not use_pallas_chunk,
            )(*args)

    return sharded_epoch


@functools.partial(jax.jit,
                   static_argnames=("method", "masked", "mixed",
                                    "with_obj", "inner_iter"))
def _chunk_step(yc, xc, d, mc, eps, *, method, masked, mixed=False,
                with_obj=False, inner_iter=1):
    return _chunk_step_impl(yc, xc, d, mc, eps, method=method,
                            masked=masked, mixed=mixed, with_obj=with_obj,
                            inner_iter=inner_iter)


def _chunk_step_impl(yc, xc, d, mc, eps, *, method, masked, mixed=False,
                     with_obj=False, inner_iter=1):
    """x update for one row chunk + its d-update statistic contributions.

    For 'mu':    num += x_new.T @ (mask*y);
                 den += x_new.T @ x_new (unmasked, K x K Gram)
                     or x_new.T @ (mask*(x_new @ d)) (masked, K x N)
    For 'kl-mu': num += x_new.T @ (mask*y / (x_new @ d + eps));
                 den += column-sum/mask statistics (K x N broadcastable)
    mixed: factor iterates are wider than the data — MXU operands cast to
    the data's dtype (see models.nmf._update_x_mixed).
    with_obj: additionally return the chunk's 0.5*||mask*(y - x_new@d)||^2
    (one extra reconstruction matmul; a zero scalar otherwise).
    """
    acc_dt = jnp.promote_types(jnp.float32, yc.dtype)
    eps = jnp.asarray(eps, acc_dt if mixed else yc.dtype)
    myc = yc if mc is None else mc * yc
    if mixed:
        upd = _update_x_mixed if method == "mu" else _update_x_kl_mixed
    else:
        upd = _update_x if method == "mu" else _update_x_kl
    for _ in range(inner_iter):  # accelerated MU: see nmf.solve
        xc = upd(myc, xc, d, mc, eps)
    cdt = yc.dtype
    xc_c = xc.astype(cdt)
    if method == "mu":
        num = jax.lax.dot_general(xc_c, myc, (((0,), (0,)), ((), ())),
                                  preferred_element_type=acc_dt)
        if not masked:
            den = jax.lax.dot_general(xc_c, xc_c, (((0,), (0,)), ((), ())),
                                      preferred_element_type=acc_dt)
        else:
            recon = (mc.astype(acc_dt)
                     * jax.lax.dot_general(
                         xc_c, d.astype(cdt), (((1,), (0,)), ((), ())),
                         preferred_element_type=acc_dt)).astype(cdt)
            den = jax.lax.dot_general(xc_c, recon, (((0,), (0,)), ((), ())),
                                      preferred_element_type=acc_dt)
    elif mixed:
        # mixed KL statistics: the ratio forms in f32, MXU operands
        # quantise to the compute dtype (see nmf._update_x_kl_mixed)
        r = _mixed_dot(xc_c, d.astype(cdt), ((1,), (0,))) + eps
        ratio = (myc.astype(jnp.float32) / r).astype(cdt)
        num = jax.lax.dot_general(xc_c, ratio, (((0,), (0,)), ((), ())),
                                  preferred_element_type=acc_dt)
        if not masked:
            den = jnp.broadcast_to(
                jnp.sum(xc.astype(acc_dt), axis=0)[:, None],
                (xc.shape[1], d.shape[1]))
        else:
            den = jax.lax.dot_general(
                xc_c, mc.astype(cdt), (((0,), (0,)), ((), ())),
                preferred_element_type=acc_dt)
    else:
        r = xc @ d + eps
        num = jax.lax.dot_general(xc, myc / r, (((0,), (0,)), ((), ())),
                                  preferred_element_type=acc_dt)
        if not masked:
            den = jnp.broadcast_to(
                jnp.sum(xc, axis=0, dtype=acc_dt)[:, None],
                (xc.shape[1], d.shape[1]))
        else:
            den = jax.lax.dot_general(xc, mc, (((0,), (0,)), ((), ())),
                                      preferred_element_type=acc_dt)
    obj_c = jnp.zeros((), acc_dt)
    if with_obj:
        cdt = yc.dtype
        recon_o = jax.lax.dot_general(
            xc.astype(cdt), d.astype(cdt), (((1,), (0,)), ((), ())),
            preferred_element_type=acc_dt)
        if mc is not None:
            recon_o = mc.astype(acc_dt) * recon_o
        resid = myc.astype(acc_dt) - recon_o
        obj_c = 0.5 * jnp.sum(resid * resid)
    return xc, num, den, obj_c


@functools.partial(jax.jit, static_argnames=("method", "masked", "mixed"))
def _d_from_stats(d, num, den, eps, *, method, masked, mixed=False):
    return _d_from_stats_impl(d, num, den, eps, method=method,
                              masked=masked, mixed=mixed)


def _d_from_stats_impl(d, num, den, eps, *, method, masked, mixed=False):
    acc_dt = num.dtype
    eps = jnp.asarray(eps, acc_dt)
    d_acc = d.astype(acc_dt)
    if method == "mu" and not masked:
        if mixed:
            # exact-f32 epilogue, matching _update_d_mixed / the kernels
            den_full = jax.lax.dot_general(
                den, d_acc, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=acc_dt)
        else:
            den_full = den @ d_acc    # (K,K) Gram @ d, ambient precision
    else:
        den_full = den
    return (d_acc * num / (den_full + eps)).astype(d.dtype)


@jax.jit
def _rel_diff(d_old, d_new):
    return _rel_diff_impl(d_old, d_new)


def _rel_diff_impl(d_old, d_new):
    acc_dt = jnp.promote_types(jnp.float32, d_old.dtype)
    num = jnp.linalg.norm((d_new - d_old).astype(acc_dt))
    den = jnp.maximum(jnp.linalg.norm(d_old.astype(acc_dt)),
                      jnp.asarray(jnp.finfo(acc_dt).tiny, acc_dt))
    return num / den


def masked_completion_streaming(y, mask, rank=None, d=None, x=None, *,
                                n_samples, n_channels, dtype,
                                chunk_rows=65536, tol=1e-4,
                                maxiter=4000, heldout_frac=0.05,
                                check_every=25, random_seed=0,
                                mixed="auto", mesh=None,
                                row_axis="rows", **kwargs):
    """Out-of-core matrix-completion preset: the ``nmf.masked_completion``
    recipe (mixed operating point + held-out plateau stopping) over
    CALLABLE chunk loaders — single-device fused epochs, or sharded over
    a ``mesh`` (then in heldout LOCKSTEP with the single-device run).

    ``y``/``mask`` are jit-traceable loaders ``(lo, hi) -> chunk``
    (``y`` pre-masked: missing entries zero, as everywhere in the
    library); ``n_samples``/``n_channels``/``dtype`` are the loader
    contract. On TPU with f32 chunks the mixed point casts each chunk to
    bf16 INSIDE the epoch (wrapping the loader) and keeps f32 factor
    iterates — the measured completion operating point (BASELINE.md).
    Loaders that already yield bf16 pass through unchanged.

    NOTE the wrapped loader is cached per (your loader, mixed) identity:
    pass the same callables across calls (see the cache-key pitfall in
    ``solve_streaming``).
    """
    dtype = jnp.dtype(dtype)
    if mixed == "auto":
        mixed = (jax.default_backend() == "tpu"
                 and dtype == jnp.float32)
    y_loader, mask_loader = y, mask
    if mixed and dtype == jnp.float32:
        y_loader = _bf16_wrap(y)
        mask_loader = _bf16_wrap(mask)
        dtype = jnp.dtype(jnp.bfloat16)
    if mixed:
        kwargs.setdefault("factor_dtype", jnp.float32)
        kwargs.setdefault("precision", "default")
    common = dict(rank=rank, x=x, mask=mask_loader, tol=tol,
                  maxiter=maxiter, method="mu", stop="heldout",
                  heldout_frac=heldout_frac, check_every=check_every,
                  random_seed=random_seed, chunk_rows=chunk_rows,
                  n_samples=n_samples, n_channels=n_channels,
                  dtype=dtype, **kwargs)
    if mesh is not None:
        from decomp_tpu.parallel import nmf_streaming as _pns

        return _pns.solve_streaming(y_loader, d, mesh=mesh,
                                    row_axis=row_axis, **common)
    return solve_streaming(y_loader, d, x_device=True, jit_loader=True,
                           **common)


_BF16_WRAPS = {}  # id(loader) -> (weakref(loader), wrapped)


def _bf16_wrap(loader):
    """Cached bf16-casting loader wrapper (cached so repeat preset calls
    with the same user loader reuse the compiled epoch).

    The cache must NOT pin the user's loader: closures passed here
    routinely capture multi-GB device-resident arrays, and a strong
    cache (the obvious ``lru_cache``) would keep that HBM alive for the
    process lifetime after the caller drops the loader. So entries are
    keyed by loader id, hold the loader WEAKLY — including inside the
    wrapper itself — and self-evict when the loader is collected. The
    wrapper only runs while ``masked_completion_streaming`` holds the
    loader argument alive, so the deref cannot observe a dead ref in
    normal use; non-weakref-able callables get an uncached wrapper
    (correct, just recompiles the epoch per call)."""
    key = id(loader)
    ent = _BF16_WRAPS.get(key)
    if ent is not None and ent[0]() is loader:
        return ent[1]

    try:
        loader_ref = weakref.ref(
            loader, lambda _r, _k=key: _BF16_WRAPS.pop(_k, None))
    except TypeError:
        def wrapped_strong(lo, hi):
            return jnp.asarray(loader(lo, hi)).astype(jnp.bfloat16)

        return wrapped_strong

    def wrapped(lo, hi):
        ldr = loader_ref()
        if ldr is None:  # pragma: no cover - caller dropped the loader
            raise RuntimeError("the loader wrapped by "
                               "masked_completion_streaming was garbage-"
                               "collected; pass a live loader")
        return jnp.asarray(ldr(lo, hi)).astype(jnp.bfloat16)

    _BF16_WRAPS[key] = (loader_ref, wrapped)
    return wrapped
