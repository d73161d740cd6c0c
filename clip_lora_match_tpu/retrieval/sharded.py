"""Multi-chip sharded top-k retrieval.

The BASELINE.json retrieval target is framed at pod scale ("≥100k queries/sec
on v5e-8"): the index rows are sharded over the mesh's ``data`` axis, each
chip runs the single-chip exact retrieval over its local shard (the fused
two-pass path at HBM scale, ops/retrieval_topk.py), and the per-shard (Q, k)
candidates are all-gathered over ICI and merged with one tiny exact top-k —
the classic distributed-top-k reduction. Communication is O(Q·k·n_dev),
independent of N.

The reference has no distributed anything (SURVEY §2.4); this replaces its
single-process ``sims = q @ E.T; torch.topk`` (ref:src/embedding/search.py:96-99)
at index sizes a single chip can't hold.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from clip_lora_match_tpu.parallel.mesh import DATA_AXIS
from clip_lora_match_tpu.ops.retrieval_topk import (
    topk_retrieve_q8,
    topk_retrieve_reference,
    topk_retrieve_twopass,
)


def shard_index(mesh: Mesh, index) -> jax.Array:
    """Place (N, D) index rows sharded over the data axis (N must divide
    evenly; use parallel.mesh.pad_to_multiple first).

    On a multi-process mesh ``device_put`` cannot reach remote shards; the
    rows each process owns are filled from its (full) host copy instead.
    """
    sharding = NamedSharding(mesh, P(DATA_AXIS, None))
    if jax.process_count() > 1:
        from clip_lora_match_tpu.parallel.mesh import global_put

        return global_put(mesh, index, P(DATA_AXIS, None))
    return jax.device_put(index, sharding)


def sharded_topk_retrieve(
    queries,
    index: jax.Array,
    k: int = 10,
    mesh: Mesh | None = None,
    n_valid: int | None = None,
    use_kernel: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Exact top-k over an index sharded on ``mesh``'s data axis.

    queries: (Q, D) host or device array (replicated).
    index:   (N_padded, D) placed via ``shard_index`` (rows % n_dev == 0;
             each shard must hold ≥ k rows).
    n_valid: true row count when the index was padded.
    """
    from clip_lora_match_tpu.parallel.mesh import compat_shard_map

    if mesh is None:
        mesh = index.sharding.mesh  # type: ignore[union-attr]
    if n_valid is None:
        n_valid = index.shape[0]
    if use_kernel is None:
        use_kernel = jax.default_backend() == "tpu"

    NEG = jnp.float32(-3.4e38)
    # all pad rows sit at the END of the last shard; the static bound lets
    # the two-pass kernel size its tile-selection slack without masking the
    # fused pass-1 scores
    max_pad = index.shape[0] - int(n_valid)

    def local(q, idx_shard):
        shard = jax.lax.axis_index(DATA_AXIS)
        shard_n = idx_shard.shape[0]
        # Rows at/past n_valid are zero padding from pad_to_multiple. They
        # must never enter the local top-k — a zero row scores 0, which
        # outranks genuinely negative candidates and would silently evict
        # them from the local k (caught by the adversarial all-negative
        # test below).
        local_valid = jnp.clip(n_valid - shard * shard_n, 0, shard_n)
        if use_kernel:
            s, i = topk_retrieve_twopass(
                q, idx_shard, k, n_valid=local_valid, max_pad=max_pad
            )
        else:
            s, i = topk_retrieve_reference(q, idx_shard, k)
            s = jnp.where(i < local_valid, s, NEG)
            order = jnp.argsort(-s, axis=1)
            s = jnp.take_along_axis(s, order, axis=1)
            i = jnp.take_along_axis(i, order, axis=1)
        i = i + shard * shard_n
        s_all = jax.lax.all_gather(s, DATA_AXIS, axis=1, tiled=True)
        i_all = jax.lax.all_gather(i, DATA_AXIS, axis=1, tiled=True)
        fs, pos = jax.lax.top_k(s_all, k)
        return fs, jnp.take_along_axis(i_all, pos, axis=1)

    fn = compat_shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS, None)),
        out_specs=(P(), P()),
        check_rep=False,
    )
    return jax.jit(fn)(jnp.asarray(queries), index)


def shard_index_q8(mesh: Mesh, values, scales) -> tuple[jax.Array, jax.Array]:
    """Place an int8-quantized index (values (N, D) int8, scales (N, 1) fp32
    from ops.retrieval_topk.quantize_index_int8) row-sharded over the data
    axis. At 16M rows/chip (8 GB int8) a v5e-8 holds a 128M-row index."""
    return shard_index(mesh, values), shard_index(mesh, scales)


def sharded_topk_retrieve_q8(
    queries,
    values: jax.Array,
    scales: jax.Array,
    k: int = 10,
    mesh: Mesh | None = None,
    n_valid: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Top-k over a row-sharded int8-quantized index: per-shard q8 two-pass
    (selection exact over the quantized scores — see ops/retrieval_topk.py),
    (Q, k) candidates all-gathered over ICI, one tiny exact merge. Same
    distributed-top-k shape as ``sharded_topk_retrieve``."""
    from clip_lora_match_tpu.parallel.mesh import compat_shard_map

    if mesh is None:
        mesh = values.sharding.mesh  # type: ignore[union-attr]
    if n_valid is None:
        n_valid = values.shape[0]
    max_pad = values.shape[0] - int(n_valid)

    def local(q, vq_shard, sc_shard):
        shard = jax.lax.axis_index(DATA_AXIS)
        shard_n = vq_shard.shape[0]
        # pad rows (zero values AND zero scales) score exactly 0 in the q8
        # scorer; local_valid masks them out of the local k the same way as
        # the fp32 path
        local_valid = jnp.clip(n_valid - shard * shard_n, 0, shard_n)
        s, i = topk_retrieve_q8(
            q, vq_shard, sc_shard, k, n_valid=local_valid, max_pad=max_pad
        )
        i = i + shard * shard_n
        s_all = jax.lax.all_gather(s, DATA_AXIS, axis=1, tiled=True)
        i_all = jax.lax.all_gather(i, DATA_AXIS, axis=1, tiled=True)
        fs, pos = jax.lax.top_k(s_all, k)
        return fs, jnp.take_along_axis(i_all, pos, axis=1)

    fn = compat_shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS, None), P(DATA_AXIS, None)),
        out_specs=(P(), P()),
        check_rep=False,
    )
    return jax.jit(fn)(jnp.asarray(queries), values, scales)
