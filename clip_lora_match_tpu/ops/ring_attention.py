"""Ring attention: exact attention over a sequence-sharded KV ring.

The sequence-parallel core (parallel/sp.py): each device on the ``seq`` mesh
axis holds its local query rows plus one rotating KV block. A ``lax.scan``
over the axis size runs the flash-style ONLINE softmax — running row max,
running denominator, rescaled accumulator — against the current KV block,
then hands the block to the next device with ``lax.ppermute`` (one neighbor
hop per step, riding ICI like the PP schedule). After n steps every query
row has seen every key exactly once; the result equals exact softmax
attention up to fp reassociation.

Built the TPU way: the per-block compute is plain jnp einsum in fp32 — XLA
fuses the exp/max/rescale chain into the matmuls — and the only
communication is the ppermute, which XLA overlaps with the next block's
compute. AD through the scan+ppermute derives the backward ring
automatically (ppermute transposes to the reverse permutation), so the op
is differentiable without a hand-written reverse schedule.

The reference has no analogue (single-device torch, S=77 max —
ref:src/models/clip_model.py); this exists so the framework's attention
scales to sequence lengths that do not fit one chip, mirroring how
parallel/tp.py and parallel/pp.py cover width and depth.

Must be called INSIDE a shard_map whose mesh has ``axis_name``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

# finfo.min-style additive masks stay NaN-free through the online softmax:
# a fully-masked (padded) query row keeps m at _MASK_FLOOR and l at 0; the
# final divide is guarded so such rows emit 0 instead of 0/0.
# A plain Python float on purpose: jnp.float32(...) at module scope creates
# a device array and INITIALIZES THE BACKEND at import time, which breaks
# multi-host runs (jax.distributed.initialize must come first — caught by
# tests/test_parallel.py::test_package_import_does_not_initialize_backend).
_MASK_FLOOR = -3.4e38


def ring_attention(
    qh: jnp.ndarray,
    kh: jnp.ndarray,
    vh: jnp.ndarray,
    axis_name: str,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Exact attention with KV rotating around ``axis_name``.

    qh/kh/vh: (B, S_loc, H, hd) — the LOCAL sequence shard (same layout as
        the in-tower XLA path in nn/layers.py::attention).
    mask: additive bias broadcastable to (B, 1, S_loc, S_global) — local
        query rows × ALL key columns (the caller shards rows, not columns;
        the ring slices the column block belonging to each step's KV
        origin). None means dense attention.
    scale: defaults to hd ** -0.5.

    Returns (B, S_loc, H, hd).
    """
    B, S_loc, H, hd = qh.shape
    if scale is None:
        scale = hd ** -0.5
    n = lax.axis_size(axis_name)
    me = lax.axis_index(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]

    q32 = (qh * scale).astype(jnp.float32)

    def accumulate(k_blk, v_blk, m, l, acc, r):
        """Fold one KV block into the online-softmax state at ring step r."""
        # after r hops this device holds the KV block that ORIGINATED on
        # device (me - r) mod n; its key columns sit at src*S_loc globally
        src = (me - r) % n
        # (B, H, S_loc_q, S_loc_k) scores in fp32
        s = jnp.einsum(
            "bqhd,bkhd->bhqk", q32, k_blk.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        if mask is not None:
            mblk = lax.dynamic_slice_in_dim(
                mask.astype(jnp.float32), src * S_loc, S_loc, axis=3
            )
            s = s + mblk
        blk_max = jnp.max(s, axis=-1, keepdims=True)  # (B, H, Q, 1)
        # new_m >= _MASK_FLOOR always (the init), so neither exp below ever
        # sees a positive-infinite argument
        new_m = jnp.maximum(m, blk_max)
        alpha = jnp.exp(m - new_m)
        p = jnp.exp(s - new_m)
        if mask is not None:
            # invariant: a FULLY-masked row (every logit at the floor) keeps
            # l == 0 across all steps -- without this guard its p would be
            # exp(0)=1 per column (s == new_m == floor), giving pad rows a
            # finite garbage denominator that is NaN-prone under AD
            p = jnp.where(s <= _MASK_FLOOR * 0.5, 0.0, p)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.einsum(
            "bhqk,bkhd->bhqd", p, v_blk.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        return new_m, l, acc

    def step(carry, r):
        k_blk, v_blk, m, l, acc = carry
        m, l, acc = accumulate(k_blk, v_blk, m, l, acc, r)
        k_blk = lax.ppermute(k_blk, axis_name, perm)
        v_blk = lax.ppermute(v_blk, axis_name, perm)
        return (k_blk, v_blk, m, l, acc), None

    m0 = jnp.full((B, H, S_loc, 1), _MASK_FLOOR, jnp.float32)
    l0 = jnp.zeros((B, H, S_loc, 1), jnp.float32)
    acc0 = jnp.zeros((B, H, S_loc, hd), jnp.float32)
    # scan the first n-1 steps (each ends with the KV hop), then fold the
    # final block WITHOUT rotating it onward: the last ppermute pair's
    # result would be discarded, and XLA cannot elide a send inside the
    # fixed scan body
    (k_blk, v_blk, m, l, acc), _ = lax.scan(
        step, (kh, vh, m0, l0, acc0), jnp.arange(n - 1)
    )
    _, l, acc = accumulate(k_blk, v_blk, m, l, acc, n - 1)
    # guard fully-masked (padded) query rows: 0 instead of 0/0
    out = acc / jnp.where(l > 0.0, l, 1.0)
    return out.transpose(0, 2, 1, 3).astype(qh.dtype)


def ring_attention_oracle(
    qh: jnp.ndarray,
    kh: jnp.ndarray,
    vh: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Single-device exact reference with the same NaN-free guard for
    fully-masked rows (matches nn/layers.py's XLA path elsewhere)."""
    hd = qh.shape[-1]
    if scale is None:
        scale = hd ** -0.5
    s = jnp.einsum(
        "bqhd,bkhd->bhqk", (qh * scale).astype(jnp.float32),
        kh.astype(jnp.float32), preferred_element_type=jnp.float32,
    )
    if mask is not None:
        s = s + mask.astype(jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    if mask is not None:
        p = jnp.where(s <= _MASK_FLOOR * 0.5, 0.0, p)
    l = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum(
        "bhqk,bkhd->bhqd", p, vh.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ) / jnp.where(l > 0.0, l, 1.0)
    return out.transpose(0, 2, 1, 3).astype(qh.dtype)
