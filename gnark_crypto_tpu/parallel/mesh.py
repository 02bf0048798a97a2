"""Device-mesh helpers — the net-new distributed layer (SURVEY.md §2.8: the
reference's only parallel axis is goroutine fork-join; here ICI/DCN collectives
via shard_map over a jax Mesh replace it)."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_batch(mesh: Mesh, arr, axis_name: str = "data", batch_axis: int = 1):
    """Place a (n_limbs, N, ...) array with the batch axis sharded."""
    spec = [None] * arr.ndim
    spec[batch_axis] = axis_name
    return jax.device_put(arr, NamedSharding(mesh, P(*spec)))


def make_mesh_2d(n_window: int, n_data: int,
                 axes: tuple[str, str] = ("window", "data")) -> Mesh:
    """(window x data) mesh for the 2-D MSM layout (SURVEY.md §2.8 P3)."""
    devs = jax.devices()
    assert len(devs) >= n_window * n_data, "not enough devices"
    arr = np.array(devs[: n_window * n_data]).reshape(n_window, n_data)
    return Mesh(arr, axes)
