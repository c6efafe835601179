"""Mesh construction and sharding annotations (data-parallel over ICI).

TPU-native replacement for the reference's Lightning `DDPPlugin` wiring
(reference src/train.py:9,62-65): a 1-D device mesh whose single axis carries
the batch (training) or the depth-as-batch slice axis of a volume (evaluation,
the workload's natural "sequence parallelism" — SURVEY.md §2.7/§5). Parameters
are replicated; XLA emits the psum for gradients, riding ICI.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def local_mesh(n_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    """1-D mesh over the first `n_devices` local devices (all by default)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(x, multiple: int, axis: int = 0):
    """Pad `axis` up to a multiple (edge-replicate) so a batch divides evenly
    across the mesh; returns (padded, original_size). Keeps jitted shapes
    static across volumes of different depth (SURVEY.md §7 'dynamic shapes').
    Works on host numpy arrays and device jax.Arrays alike."""
    n = x.shape[axis]
    target = ((n + multiple - 1) // multiple) * multiple
    if target == n:
        return x, n
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - n)
    xp = np if isinstance(x, np.ndarray) else jnp
    return xp.pad(x, pad, mode="edge"), n


def shard_batch(batch: dict, mesh: Mesh, axis: str = DATA_AXIS) -> dict:
    """Device-put every array in the batch with its leading axis sharded."""
    sh = batch_sharding(mesh, axis)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}
