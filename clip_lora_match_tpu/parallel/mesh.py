"""Device mesh + sharding helpers.

The reference is single-device (SURVEY §2.4); parallelism here follows the
BASELINE.json north star: data-parallel contrastive training over ICI with
global-batch negatives, sharded index builds, and a mesh abstraction that
leaves tensor-parallel axes available without requiring them at ViT-B/32 size.

Axes convention: ``data`` (batch / index rows), ``model`` (reserved for TP).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh over available devices. Defaults to pure DP."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    use = devices[: n_data * n_model]
    arr = np.array(use).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, rank: int = 1) -> NamedSharding:
    """Shard the leading axis over the data axis; replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (rank - 1))))


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Place a host batch dict onto the mesh with leading-axis data sharding."""
    return {
        k: jax.device_put(v, data_sharded(mesh, rank=np.ndim(v)))
        for k, v in batch.items()
    }


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int = 0) -> tuple[np.ndarray, int]:
    """Pad axis to a multiple (even shards per device). Returns (padded, orig_len)."""
    n = x.shape[axis]
    target = -(-n // multiple) * multiple
    if target == n:
        return x, n
    pad_width = [(0, 0)] * x.ndim
    pad_width[axis] = (0, target - n)
    return np.pad(x, pad_width), n
