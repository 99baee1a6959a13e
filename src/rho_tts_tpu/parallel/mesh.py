"""Mesh construction helpers.

Axis convention:
  * ``data``  — batch/data parallelism (segments, texts, validation clips)
  * ``model`` — tensor parallelism (attention heads / FFN columns)

On a v5e pod slice the ``model`` axis should map to the minor (fast ICI)
dimension; ``mesh_utils.create_device_mesh`` handles the physical layout.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
from jax.experimental import mesh_utils
from jax.sharding import Mesh


def default_mesh_shape(n_devices: int, model_parallel: Optional[int] = None) -> Tuple[int, int]:
    """Pick (data, model) sizes for ``n_devices``.

    Model parallelism defaults to the largest power of two ≤ 4 that divides
    the device count (a 1.7B-class model rarely benefits from TP > 4; the
    rest goes to batch parallelism).
    """
    if model_parallel is None:
        model_parallel = 1
        for cand in (4, 2):
            if n_devices % cand == 0:
                model_parallel = cand
                break
    return n_devices // model_parallel, model_parallel


def create_mesh(
    n_devices: Optional[int] = None,
    model_parallel: Optional[int] = None,
    axis_names: Sequence[str] = ("data", "model"),
    devices=None,
) -> Mesh:
    """Create a 2-D (data, model) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    dp, mp = default_mesh_shape(n_devices, model_parallel)
    mesh_devices = mesh_utils.create_device_mesh((dp, mp), devices=devices)
    return Mesh(mesh_devices, axis_names=tuple(axis_names))
