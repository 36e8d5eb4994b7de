"""Mesh construction and data-placement helpers.

Hierarchical (multi-slice) meshes: every ``parallel.*`` solver accepts a
TUPLE of mesh axis names wherever it takes a row/sample axis (e.g.
``row_axis=('slice', 'rows')``). The sample dimension then shards over
the combined extent of those axes — the pod-of-pods layout where an
outer axis spans DCN-connected slices and the inner axis spans the ICI
ring within each slice. Nothing else changes: the K-sized Gram-statistic
``psum`` simply names both axes and XLA lowers it hierarchically
(ICI-local reduce-scatter/all-gather within each slice, then the small
cross-slice exchange over DCN), which is exactly the traffic shape a
multi-slice run wants. Validated like every sharded path: tuple-axis
solves equal flat-axis and single-device solves to fp tolerance
(tests/test_sharded.py multi-slice tier). One caveat measured there:
the hierarchical psum's two-stage reduction order differs from the
flat sum, so a stopping rule sitting exactly at a plateau boundary can
fire one check interval earlier/later than the single-device run — the
devices WITHIN a tuple-axis run always stop together (the stopping
scalar is allreduced).
"""

from typing import Optional, Sequence, Tuple, Union

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from decomp_tpu.utils.exceptions import DecompError

#: An axis argument: one mesh axis name or a tuple of names (hierarchical
#: sharding over their combined extent, outermost first).
AxisSpec = Union[str, Tuple[str, ...]]


def axis_tuple(axis: AxisSpec) -> Tuple[str, ...]:
    """Normalise an axis spec (name or sequence of names) to a tuple.

    Raises the library's typed DecompError for non-string, non-sequence
    arguments (None, ints, ...) instead of leaking a bare TypeError."""
    if isinstance(axis, str):
        return (axis,)
    try:
        names = tuple(axis)
    except TypeError:
        raise DecompError(
            f"axis must be a mesh axis name or a sequence of names, "
            f"got {axis!r}") from None
    if not all(isinstance(nm, str) for nm in names):
        raise DecompError(
            f"axis must name mesh axes (strings), got {axis!r}")
    return names


def validate_axis(mesh: Mesh, axis: AxisSpec, what: str = "axis") -> int:
    """Check every name in ``axis`` against ``mesh`` and return the
    combined extent (product of the named axis sizes). Tuple axes must
    not repeat a name."""
    names = axis_tuple(axis)
    if len(names) == 0:
        raise DecompError(f"{what} must name at least one mesh axis")
    if len(set(names)) != len(names):
        raise DecompError(f"{what} {axis!r} repeats a mesh axis name")
    for name in names:
        if name not in mesh.axis_names:
            raise DecompError(f"{what} {axis!r}: {name!r} not in mesh "
                              f"axes {mesh.axis_names}")
    size = 1
    for name in names:
        size *= mesh.shape[name]
    return size


def make_mesh(shape: Optional[Sequence[int]] = None,
              axis_names: Tuple[str, ...] = ("rows", "cols"),
              devices=None) -> Mesh:
    """Build a mesh over the available devices.

    Default: all devices along the first ('rows') axis, size-1 trailing
    axes — row-sharding is the natural layout for tall-matrix
    factorisations (SURVEY.md §5 'Long-context' row: the analog of scaling
    sequence length here is scaling the sample axis). For a multi-slice
    layout pass e.g. ``shape=(n_slices, devs_per_slice)``,
    ``axis_names=('slice', 'rows')`` and hand the solvers
    ``row_axis=('slice', 'rows')`` (see the module docstring).
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    if int(np.prod(shape)) != len(devices):
        raise ValueError(
            f"mesh shape {tuple(shape)} does not match device count "
            f"{len(devices)}"
        )
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


def make_multislice_mesh(n_slices: Optional[int] = None,
                         axis_names: Tuple[str, str] = ("slice", "rows"),
                         devices=None) -> Mesh:
    """Mesh for a multi-slice deployment: outer axis over DCN-connected
    slices, inner axis over each slice's ICI-connected devices.

    Devices are grouped by their ``slice_index`` attribute (multi-slice
    TPU runtimes expose it; fall back to ``process_index`` elsewhere, as
    on a multi-host CPU/GPU fleet brought up via
    ``jax.distributed.initialize``) and laid out so every column of the
    mesh's inner axis stays inside one slice's ICI domain — hand the
    solvers ``row_axis=axis_names`` (the tuple) and the statistic psums
    ride ICI within each slice plus one small cross-slice DCN exchange.

    ``n_slices``: explicit override splitting the device list evenly in
    order — for simulating a multi-slice layout on virtual devices (the
    test/dryrun path), or when every device reports the same slice. By
    default the grouping is inferred; a ragged grouping (unequal slice
    sizes) raises.

    Multi-host note: call ``jax.distributed.initialize()`` first on each
    host, then build this mesh from the GLOBAL ``jax.devices()`` on every
    process (identically), and pass each process's local shard of the
    data (e.g. via ``jax.make_array_from_process_local_data``). Nothing
    in the solvers is host-aware: the mesh is the only contract.
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    if len(axis_names) != 2:
        raise DecompError("make_multislice_mesh uses exactly two axes "
                          "(outer slice axis, inner intra-slice axis); "
                          "build custom layouts with make_mesh")
    if n_slices is None:
        groups = {}
        for d in devices:
            key = getattr(d, "slice_index", None)
            if key is None:
                key = d.process_index
            groups.setdefault(key, []).append(d)
        sizes = {len(g) for g in groups.values()}
        if len(sizes) != 1:
            counts = {k: len(v) for k, v in sorted(groups.items())}
            raise DecompError(
                f"devices group into unequal slices {counts}; pass "
                "n_slices to split explicitly")
        ordered = [d for _, g in sorted(groups.items()) for d in g]
        n_slices = len(groups)
    else:
        n_slices = int(n_slices)
        if n_slices < 1 or len(devices) % n_slices:
            raise DecompError(
                f"n_slices={n_slices} does not divide device count "
                f"{len(devices)}")
        ordered = devices
    per_slice = len(ordered) // n_slices
    arr = np.asarray(ordered).reshape(n_slices, per_slice)
    return Mesh(arr, tuple(axis_names))


def shard_rows(arr, mesh: Mesh, axis: AxisSpec = "rows"):
    """Place ``arr`` with its leading axis sharded over ``mesh[axis]``
    (one axis name, or a tuple of names for hierarchical sharding)."""
    if not isinstance(axis, str):
        axis = axis_tuple(axis)
    spec = P(axis, *([None] * (arr.ndim - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))
