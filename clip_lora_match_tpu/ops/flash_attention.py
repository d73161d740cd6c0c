"""Pallas fused (flash) attention for the CLIP towers.

At CLIP's sequence lengths (50 vision / 77 text tokens) attention is tiny —
the win here is fusing QK^T → mask → online-softmax → PV into one kernel so
the (B, H, S, S) score tensor never round-trips through HBM, while keeping
the structure blockwise over KV so the same kernel scales to long sequences
(SURVEY §5: "write attention as a Pallas flash-attention block kernel anyway;
do NOT build ring/Ulysses machinery the reference lacks").

Layout: inputs (B, H, S, d); batch·head pairs are processed ``group`` at a
time per grid step (batched dot_generals over the leading axis) — without
grouping, B·H tiny kernel launches serialize and dominate at small S.
Grid (BH/group, S_q blocks, KV blocks); KV streamed with running
(max, denom) online-softmax state in VMEM scratch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(np.finfo(np.float32).min)


def _kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, m_scr, d_scr, acc, *, scale, n_kv):
    kv_step = pl.program_id(2)

    @pl.when(kv_step == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        d_scr[:] = jnp.zeros_like(d_scr)
        acc[:] = jnp.zeros_like(acc)

    q = q_ref[:].astype(jnp.float32) * scale  # (G, bq, d)
    k = k_ref[:].astype(jnp.float32)  # (G, bkv, d)
    v = v_ref[:].astype(jnp.float32)  # (G, bkv, d)
    # batched over the group axis: (G, bq, bkv)
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    s = s + mask_ref[:].astype(jnp.float32)

    m_prev = m_scr[:]  # (G, bq, 128); column 0 is live
    m_cur = jnp.max(s, axis=2, keepdims=True)  # (G, bq, 1)
    m_new = jnp.maximum(m_prev[:, :, :1], m_cur)
    alpha = jnp.exp(m_prev[:, :, :1] - m_new)
    p = jnp.exp(s - m_new)  # (G, bq, bkv)
    d_new = d_scr[:, :, :1] * alpha + jnp.sum(p, axis=2, keepdims=True)
    pv = jax.lax.dot_general(
        p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (G, bq, d)
    acc[:] = acc[:] * alpha + pv
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    d_scr[:] = jnp.broadcast_to(d_new, d_scr.shape)

    @pl.when(kv_step == n_kv - 1)
    def _():
        o_ref[:] = (acc[:] / d_scr[:, :, :1]).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_kv", "group", "interpret")
)
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    scale: float | None = None,
    block_q: int = 128,
    block_kv: int = 128,
    group: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, H, S, d) fused attention with additive mask (B|1, 1, S, S)."""
    B, H, S, d = q.shape
    scale = float(scale if scale is not None else d ** -0.5)
    # Mosaic-rule-asserting planner (ops/geometry.py) — caller-supplied
    # block_q/block_kv that would only crash on real-TPU lowering raise here
    # on every backend
    from clip_lora_match_tpu.ops.geometry import plan_flash_attention

    plan = plan_flash_attention(B, H, S, d, block_q, block_kv, group)
    bq, bkv, sq, skv, G = plan.bq, plan.bkv, plan.sq, plan.skv, plan.G
    BH = B * H

    if mask is None:
        mask = jnp.zeros((1, 1, S, S), jnp.float32)
    mask = jnp.broadcast_to(mask, (B, 1, S, S))
    # pad: padded KV columns masked to -inf; padded Q rows produce garbage
    # rows that are sliced off
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, sq - S), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, skv - S), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, skv - S), (0, 0)))
    mp = jnp.pad(
        mask, ((0, 0), (0, 0), (0, sq - S), (0, skv - S)), constant_values=NEG_INF
    )

    qf = qp.reshape(BH, sq, d)
    kf = kp.reshape(BH, skv, d)
    vf = vp.reshape(BH, skv, d)
    mf = jnp.broadcast_to(mp, (B, H, sq, skv)).reshape(BH, sq, skv)

    n_kv = skv // bkv
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, n_kv=n_kv),
        grid=(BH // G, sq // bq, n_kv),
        in_specs=[
            pl.BlockSpec((G, bq, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, bkv, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, bkv, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, bq, bkv), lambda b, i, j: (b, i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (G, bq, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((BH, sq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((G, bq, 128), jnp.float32),
            pltpu.VMEM((G, bq, 128), jnp.float32),
            pltpu.VMEM((G, bq, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * BH * sq * skv * d,
            bytes_accessed=BH * (sq + 2 * skv) * d * 4 + BH * sq * skv * 4,
            transcendentals=BH * sq * skv,
        ),
        interpret=interpret,
    )(qf, kf, vf, mf)
    return out.reshape(B, H, sq, d)[:, :, :S]


def attention_reference(q, k, v, mask=None, scale=None):
    """jnp oracle (same math as nn/layers.attention core)."""
    d = q.shape[-1]
    scale = float(scale if scale is not None else d ** -0.5)
    s = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k, preferred_element_type=jnp.float32)
    if mask is not None:
        s = s + mask.astype(s.dtype)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", p, v, preferred_element_type=jnp.float32
    ).astype(q.dtype)
