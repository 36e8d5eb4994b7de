"""Ahead-of-time compiled solver artifacts (serving story).

The reference is a live-Python library: every process pays import + trace
+ compile before the first ``solve()`` (SURVEY.md §3.4 — and on this
platform a cold remote compile of a large solve is tens of seconds). For
production serving the rebuild adds an AOT path on top of the public
entries, which are jit-composable by construction (one traced
``lax.while_loop`` per solve, no host syncs — SURVEY.md §3.5):

    from decomp_tpu.utils import aot
    art = aot.export_solver(decomp_tpu.nmf.solve, y, d0,
                            tol=1e-4, maxiter=2000)   # traced + lowered
    art.save("nmf_400kx10k.dtaot")                    # portable bytes

    # ... in a serving process (same device kind):
    art = aot.load_solver("nmf_400kx10k.dtaot")
    res = art(y, d0)          # NMFResult; no Python tracing, no decomp_tpu
                              # solver code on the hot path

Built on ``jax.export`` (StableHLO serialization): the artifact pins the
input shapes/dtypes and the solver configuration (every kwarg is baked
in at trace time, exactly like a jit closure), and reloads in any process
whose backend can run the lowered module — including processes that never
import the solver modules. Custom-kernel (Pallas/Mosaic) paths serialize
as platform custom calls, so artifacts that engaged a TPU kernel gate run
on matching TPU generations only; pass ``platforms=("tpu", "cpu")`` to
lower a multi-platform artifact instead.

Keep multi-GB data out of baked constants: arrays closed over (or passed
as non-example kwargs) are embedded in the lowered module, and this
platform's remote-compile transport rejects outsized request bodies
(measured: an ~800 MB constant payload fails with HTTP 413). Per-request
data belongs in ``example_args``.

Result NamedTuples are converted to plain dicts at the export boundary
(``jax.export`` serializes only standard container pytrees) and rebuilt
into the right ``*Result`` class at call time, so callers see the normal
library surface.

Sharded solves (``decomp_tpu.parallel.*``) export too: the artifact pins
the mesh topology, must be reloaded in a process with a matching device
count, and must be CALLED with inputs ``jax.device_put`` onto the mesh
(e.g. ``NamedSharding(mesh, P("rows", None))`` for the data) — a
single-device numpy call context raises jax's "exported for N devices"
error by design.

In-process AOT (same process, avoid re-trace only) needs none of this:
jitted solves are cached by geometry, and the persistent compilation
cache (``jax.config.update("jax_compilation_cache_dir", ...)`` — used by
bench.py) already makes fresh-process compiles cheap on one machine. The
artifact path is for fleets: compile once, ship bytes.
"""

import io
import json

import jax
import jax.numpy as jnp

from decomp_tpu.ops.complex_split import SplitComplex
from decomp_tpu.utils import result as _result
from decomp_tpu.utils.exceptions import DecompError

# SplitComplex crosses the export boundary (solve_split artifacts carry
# it in both inputs and the result's x); jax.export serializes custom
# pytree types only once registered.
try:
    jax.export.register_namedtuple_serialization(
        SplitComplex, serialized_name="decomp_tpu.SplitComplex")
except ValueError:
    pass  # already registered (repeat import paths)

_MAGIC = b"DTAOT1\n"
_RESULT_CLASSES = {
    "LassoResult": _result.LassoResult,
    "NMFResult": _result.NMFResult,
    "DictionaryLearningResult": _result.DictionaryLearningResult,
}


def _spec(a):
    """ShapeDtypeStructs for an example arg (arrays pass shape+dtype
    only; existing ShapeDtypeStructs pass through, keeping any
    sharding). Pytree args (e.g. SplitComplex) keep their structure,
    specs applied leaf-wise."""

    def leaf(v):
        if isinstance(v, jax.ShapeDtypeStruct):
            return v
        arr = jnp.asarray(v)
        return jax.ShapeDtypeStruct(arr.shape, arr.dtype)

    return jax.tree.map(leaf, a)


class AotSolver:
    """A compiled, serializable solve. Call it with the pinned positional
    arrays; returns the family's Result NamedTuple."""

    def __init__(self, exported, result_cls_name: str):
        if result_cls_name not in _RESULT_CLASSES:
            raise DecompError(
                f"unknown result class {result_cls_name!r} in AOT artifact "
                f"(supported: {sorted(_RESULT_CLASSES)})")
        self._exported = exported
        self._result_cls_name = result_cls_name

    @property
    def in_avals(self):
        """The pinned input ShapeDtypeStructs (call contract)."""
        return self._exported.in_avals

    @property
    def platforms(self):
        """Lowering platforms of the artifact (e.g. ('tpu',))."""
        return tuple(self._exported.platforms)

    def __call__(self, *arrays):
        out = self._exported.call(*arrays)
        cls = _RESULT_CLASSES[self._result_cls_name]
        return cls(**out)

    def serialize(self) -> bytes:
        header = json.dumps({
            "result_cls": self._result_cls_name,
            "format": 1,
        }).encode() + b"\n"
        return _MAGIC + header + self._exported.serialize()

    def save(self, path) -> None:
        with open(path, "wb") as f:
            f.write(self.serialize())


def export_solver(solve_fn, *example_args, platforms=None,
                  **solve_kwargs) -> AotSolver:
    """Trace + lower ``solve_fn(*example_args, **solve_kwargs)`` into a
    serializable artifact.

    ``solve_fn``: a solve entry whose positional arguments are arrays and
    whose keyword arguments are static configuration — every public
    ``decomp_tpu`` solve qualifies (pass warm starts / masks positionally
    via a wrapper lambda is NOT needed: pass them as example args only if
    they are arrays the caller will supply per request; configuration like
    ``tol``/``maxiter``/``method`` goes in ``solve_kwargs`` and is baked
    into the artifact).

    ``example_args``: concrete arrays or ``jax.ShapeDtypeStruct``s pinning
    each request-time input's shape/dtype.

    ``platforms``: optional tuple of lowering platforms for a
    multi-platform artifact (default: the current backend).
    """

    def _traced(*arrays):
        res = solve_fn(*arrays, **solve_kwargs)
        return dict(res._asdict())

    specs = [_spec(a) for a in example_args]
    res_shape = jax.eval_shape(
        lambda *a: solve_fn(*a, **solve_kwargs), *specs)
    cls_name = type(res_shape).__name__
    if cls_name not in _RESULT_CLASSES:
        raise DecompError(
            f"{getattr(solve_fn, '__name__', solve_fn)!r} returned "
            f"{cls_name}, not a decomp_tpu Result pytree; export_solver "
            "wraps the public solve() entries")
    kw = {} if platforms is None else {"platforms": tuple(platforms)}
    exported = jax.export.export(jax.jit(_traced), **kw)(*specs)
    return AotSolver(exported, cls_name)


def load_solver(src) -> AotSolver:
    """Reload an artifact from ``save()``/``serialize()`` output.

    ``src``: a path, a file-like object, or bytes.
    """
    if isinstance(src, (bytes, bytearray)):
        buf = io.BytesIO(bytes(src))
    elif hasattr(src, "read"):
        buf = src
    else:
        buf = open(src, "rb")
    data = buf.read()
    if not data.startswith(_MAGIC):
        raise DecompError("not a decomp_tpu AOT artifact (bad magic)")
    rest = data[len(_MAGIC):]
    header_line, _, blob = rest.partition(b"\n")
    try:
        header = json.loads(header_line.decode())
        cls_name = header["result_cls"]
    except (ValueError, KeyError) as e:
        raise DecompError(f"corrupt AOT artifact header: {e}") from e
    if cls_name not in _RESULT_CLASSES:
        raise DecompError(
            f"unknown result class {cls_name!r} in AOT artifact "
            f"(supported: {sorted(_RESULT_CLASSES)})")
    try:
        exported = jax.export.deserialize(blob)
    except Exception as e:
        raise DecompError(f"corrupt AOT artifact payload: {e}") from e
    return AotSolver(exported, cls_name)
