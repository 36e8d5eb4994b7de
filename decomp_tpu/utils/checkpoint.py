"""Lightweight checkpoint/resume (SURVEY.md §5 'Checkpoint / resume').

The reference's resume contract is its warm-start arguments — pass the
factors back in (SURVEY.md §5). This module keeps that contract and adds
the mandated orbax-free persistence layer for long pod-scale runs: factor
snapshots as atomic .npz files, plus ``checkpointed_solve``, which runs any
decomp_tpu solver in fixed-iteration chunks, snapshotting the warm-start
fields between chunks so an interrupted run resumes where it stopped.
"""

import inspect
import os
import tempfile
from typing import Callable, Dict, Sequence, Tuple

import numpy as np

_STEP_KEY = "__decomp_tpu_step__"
_AUX_PREFIX = "__decomp_tpu_aux_"


class CheckpointManager:
    """Atomic .npz snapshots of a {name: array} state dict at ``path``."""

    def __init__(self, path: str):
        if not str(path).endswith(".npz"):
            path = str(path) + ".npz"
        self.path = str(path)

    def exists(self) -> bool:
        return os.path.exists(self.path)

    def save(self, step: int, state: Dict[str, np.ndarray]) -> None:
        """Write atomically (tmp file + rename) so a crash mid-save can
        never corrupt the previous snapshot."""
        payload = {k: np.asarray(v) for k, v in state.items()}
        payload[_STEP_KEY] = np.asarray(int(step))
        directory = os.path.dirname(os.path.abspath(self.path))
        fd, tmp = tempfile.mkstemp(suffix=".npz.tmp", dir=directory)
        try:
            with os.fdopen(fd, "wb") as f:
                np.savez(f, **payload)
            os.replace(tmp, self.path)
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise

    def load(self) -> Tuple[int, Dict[str, np.ndarray]]:
        with np.load(self.path) as data:
            state = {k: data[k] for k in data.files if k != _STEP_KEY}
            step = int(data[_STEP_KEY])
        return step, state


def checkpointed_solve(
    solve_fn: Callable,
    *args,
    manager: CheckpointManager,
    chunk_iters: int = 100,
    maxiter: int = 1000,
    warm_fields: Sequence[str] = ("x", "d"),
    **kwargs,
):
    """Run ``solve_fn`` in chunks of ``chunk_iters``, checkpointing between.

    ``solve_fn`` is any decomp_tpu ``solve`` (nmf / lasso /
    dictionary_learning, single-device or sharded); ``warm_fields`` names
    the result fields that are both returned and accepted as warm-start
    kwargs (the reference's resume contract). If the manager's file exists,
    the run resumes from it: completed iterations count against
    ``maxiter``.

    Chunking is exact for solvers whose state is exactly the warm-start
    fields (MU-NMF, ISTA, coordinate descent). Momentum methods (FISTA /
    acc_ista) are ALSO exact when ``solve_fn`` supports the
    ``return_state``/``momentum_state`` contract (``decomp_tpu.lasso``):
    the (z, t) acceleration state is checkpointed alongside the factors
    and threaded between chunks, so the chunked run reproduces the
    uninterrupted trajectory bit-for-bit. Solvers without that contract
    restart their acceleration at each chunk boundary — still convergent,
    marginally slower.

    Returns (last_result, total_iterations_run_across_all_sessions).
    """
    if chunk_iters < 1:
        raise ValueError("chunk_iters must be >= 1")
    total = 0
    warm: Dict[str, np.ndarray] = {}
    aux: Dict[str, np.ndarray] = {}
    if manager.exists():
        total, state = manager.load()
        warm = {k: v for k, v in state.items()
                if not k.startswith(_AUX_PREFIX)}
        aux = {k[len(_AUX_PREFIX):]: v for k, v in state.items()
               if k.startswith(_AUX_PREFIX)}

    try:
        params = inspect.signature(solve_fn).parameters
        supports_state = "return_state" in params
    except (TypeError, ValueError):  # pragma: no cover - exotic callables
        supports_state = False
    # Don't inject return_state when the caller set it explicitly, or in
    # modes the solver rejects it for (per_problem).
    supports_state = (supports_state and "return_state" not in kwargs
                      and not kwargs.get("per_problem"))

    result = None
    while total < maxiter:
        it = min(chunk_iters, maxiter - total)
        call_kwargs = dict(kwargs)
        call_kwargs.update(warm)
        if supports_state:
            call_kwargs["return_state"] = True
            if aux and "x" in warm:
                call_kwargs["momentum_state"] = (aux["z"], aux["t"])
        result = solve_fn(*args, maxiter=it, **call_kwargs)
        # per_problem solvers return per-row counts; the chunk's wall
        # budget consumption is the slowest row's count.
        total += int(np.max(np.asarray(result.niter)))
        warm = {f: np.asarray(getattr(result, f)) for f in warm_fields}
        res_aux = getattr(result, "aux", None)
        aux = ({k: np.asarray(v) for k, v in res_aux.items()}
               if res_aux is not None else {})
        manager.save(total, {**warm,
                             **{_AUX_PREFIX + k: v for k, v in aux.items()}})
        if bool(np.all(np.asarray(result.converged))):
            break
    if result is None:
        raise RuntimeError(
            f"checkpoint at {manager.path} already holds {total} >= "
            f"maxiter={maxiter} iterations; raise maxiter to continue, or "
            "read the factors directly via manager.load()")
    return result, total
