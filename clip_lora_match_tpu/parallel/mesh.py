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


def compat_shard_map(f, mesh, in_specs, out_specs, check_rep=False,
                     axis_names=None):
    """shard_map across the jax 0.8 API rename (check_rep → check_vma).

    ``axis_names``: optional subset of mesh axes to run MANUAL; the rest
    stay GSPMD-auto inside the body (the seam that lets the shard_map
    executors — PP ticks, SP ring — compose with annotation-driven TP:
    params stay sharded over the auto ``model`` axis and GSPMD inserts the
    Megatron psums inside the manual region)."""
    try:
        from jax import shard_map as _sm  # jax ≥ 0.8

        kw = {}
        if axis_names is not None:
            kw["axis_names"] = frozenset(axis_names)
        return _sm(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=check_rep, **kw,
        )
    except ImportError:  # pragma: no cover - older jax
        if axis_names is not None:
            raise NotImplementedError(
                "partial-manual shard_map (axis_names) needs jax >= 0.8"
            )
        from jax.experimental.shard_map import shard_map as _sm

        return _sm(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_rep=check_rep,
        )


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


# --- Multi-host placement -------------------------------------------------
#
# ``shard_batch``/``jax.device_put`` assume every mesh device is addressable
# by this process. On a multi-host mesh (jax.distributed.initialize, DCN or
# multi-slice — SURVEY §2.4/§5) each process only owns its local chips, so
# global arrays must be assembled from per-process pieces. The helpers below
# work on BOTH single- and multi-process meshes; tests exercise them with two
# real OS processes over gloo (tests/test_multihost.py).


def _make_global(x, sharding: NamedSharding):
    """Build a global array for ``sharding``; this process fills the shards it
    can address from the FULL host value ``x`` (identical on all processes)."""
    import jax.numpy as jnp

    if isinstance(x, jax.Array) and jnp.issubdtype(x.dtype, jax.dtypes.prng_key):
        impl = jax.random.key_impl(x)
        data = np.asarray(jax.random.key_data(x))
        g = jax.make_array_from_callback(data.shape, sharding, lambda idx: data[idx])
        return jax.random.wrap_key_data(g, impl=impl)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


def global_put(mesh: Mesh, x, spec) -> jax.Array:
    """Place one host array onto a (possibly multi-process) mesh with an
    arbitrary PartitionSpec; every process must hold the full value."""
    return _make_global(x, NamedSharding(mesh, spec))


def global_replicated(mesh: Mesh, tree):
    """Replicate a host pytree onto a (possibly multi-process) mesh.

    Every process must hold the same host values (e.g. same-seed init) —
    the multi-host analogue of ``jax.device_put(tree, replicated(mesh))``.
    """
    rep = replicated(mesh)
    return jax.tree.map(lambda x: _make_global(x, rep), tree)


def global_shard_batch(mesh: Mesh, batch: dict) -> dict:
    """``shard_batch`` for meshes that may span processes.

    Every process holds the FULL global batch; each contributes the rows its
    devices own. Leading dims must divide the data-axis size.
    """
    return {
        k: _make_global(v, data_sharded(mesh, rank=np.ndim(v)))
        for k, v in batch.items()
    }


def global_batch_from_local(mesh: Mesh, local_batch: dict) -> dict:
    """Assemble a global batch where each process holds ONLY its rows.

    The real multi-host input-pipeline path: host i loads rows
    ``[i*B_local, (i+1)*B_local)`` and never sees the rest. Global leading
    dim = local leading dim × process_count; processes must pass equal-sized
    locals in process-index order.
    """
    out = {}
    for k, v in local_batch.items():
        v = np.asarray(v)
        sharding = data_sharded(mesh, rank=v.ndim)
        gshape = (v.shape[0] * jax.process_count(),) + v.shape[1:]
        out[k] = jax.make_array_from_process_local_data(sharding, v, gshape)
    return out
