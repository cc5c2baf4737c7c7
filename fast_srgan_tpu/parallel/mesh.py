"""Device mesh construction and sharding specs for data parallelism.

Scaling recipe (the "How to Scale Your Model" pattern): build a 1-D mesh over
all devices, annotate the batch dimension with the mesh axis and parameters as
replicated, and let XLA insert the collectives — per-shard gradients are
all-reduced with `psum` over ICI automatically when the jitted train step's
output shardings require replicated updated parameters. Multi-host runs use
the same code after `jax.distributed.initialize` (the global mesh spans all
processes; each host feeds its local batch shard).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_devices: Optional[int] = None, axis_name: str = "data"
) -> Mesh:
    """A 1-D mesh over the first `num_devices` devices (default: all)."""
    devices = jax.devices()
    if num_devices is not None:
        if num_devices > len(devices):
            raise ValueError(
                f"requested {num_devices} devices, have {len(devices)}"
            )
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated (parameters, optimizer state, RNG keys)."""
    return NamedSharding(mesh, P())


def shard_batch(batch: np.ndarray, mesh: Mesh, axis_name: str = "data"):
    """Place a host batch onto the mesh, sharded along the batch dim.

    Single-process: `batch` is the global batch, placed directly. Multi-host
    (after jax.distributed.initialize): `batch` is this process's LOCAL
    shard — the per-host loaders produce global_batch/process_count items
    each (see train.py) — and the global array is assembled across hosts.
    """
    sharding = batch_sharding(mesh, axis_name)
    if jax.process_count() > 1:
        global_shape = (batch.shape[0] * jax.process_count(),) + batch.shape[1:]
        return jax.make_array_from_process_local_data(
            sharding, batch, global_shape
        )
    return jax.device_put(batch, sharding)
