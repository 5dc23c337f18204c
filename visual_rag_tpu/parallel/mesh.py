"""Mesh helpers: serving and training meshes over local or pod devices."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    axis_sizes: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("data",),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a mesh; default = all local devices on one 'data' axis.

    For serving, the corpus shards over 'data' (ICI all-gather merges).
    For training, pass e.g. axis_sizes=(2, 4), axis_names=('dp', 'tp').
    """
    devices = list(devices if devices is not None else jax.devices())
    if axis_sizes is None:
        axis_sizes = (len(devices),)
    n = int(np.prod(axis_sizes))
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    dev_array = np.array(devices[:n]).reshape(tuple(axis_sizes))
    return Mesh(dev_array, tuple(axis_names))


def mesh_axis_size(mesh: Mesh, axis: str) -> int:
    return int(mesh.shape[axis])


def pad_to_shards(n_items: int, n_shards: int) -> Tuple[int, int]:
    """(per-shard count, padded total) for an even contiguous partition."""
    per = -(-n_items // n_shards)
    return per, per * n_shards
