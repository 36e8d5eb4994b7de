"""Mesh construction and data-placement helpers."""

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Sequence[int]] = None,
              axis_names: Tuple[str, ...] = ("rows", "cols"),
              devices=None) -> Mesh:
    """Build a mesh over the available devices.

    Default: all devices along the first ('rows') axis, size-1 trailing
    axes — row-sharding is the natural layout for tall-matrix
    factorisations (SURVEY.md §5 'Long-context' row: the analog of scaling
    sequence length here is scaling the sample axis).
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


def shard_rows(arr, mesh: Mesh, axis: str = "rows"):
    """Place ``arr`` with its leading axis sharded over ``mesh[axis]``."""
    spec = P(axis, *([None] * (arr.ndim - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))
