"""Pallas fused transformer MLP: y = quick_gelu(x @ W1 + b1) @ W2 + b2.

XLA cannot fuse across two matmuls, so the (M, 4d) hidden activation
round-trips HBM between fc1 and fc2 (at the image tower's serving geometry —
M = 96·50, d = 768 — that is a 29.5 MB bf16 tensor written and re-read every
layer). This kernel keeps the hidden block entirely in VMEM: each grid step
computes one row-block's fc1 → quick-gelu → fc2 chain, so HBM traffic drops
to weights + x + y.

Two variants, picked by weight size:

- ``resident``: both weight matrices live in VMEM across the whole grid
  (constant BlockSpec index → fetched once). Feasible at ViT-B/32 width
  (W1 + W2 bf16 ≈ 9 MB); the hidden chunk is a per-step VMEM temporary.
- ``streamed``: grid (M/bm, H/bh) with the hidden dim tiled; fc2 partials
  accumulate in an fp32 scratch. Used when the weights don't fit (wider
  models) — weight traffic multiplies by the number of row blocks, so bm is
  chosen large.

Numerics: fp32 accumulation in both dots; bias add + quick-gelu in fp32,
hidden cast to the input dtype (bf16 in production) before fc2 — at least as
accurate as the XLA fallback, which applies gelu on a bf16 fc1 output
(nn/layers.mlp). No LoRA: the reference recipe adapts only attention
projections (ref:config/lora_config.yaml target_modules), so serving MLPs are
base-weight matmuls; the dispatch site falls back when an MLP adapter exists.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from clip_lora_match_tpu.ops.geometry import plan_mlp_fused

# Above this many weight bytes (bf16) the resident variant would blow the
# ~12-13 MB per-step VMEM budget (CLAUDE.md Mosaic notes); stream instead.
_RESIDENT_MAX_WEIGHT_BYTES = 10 * 1024 * 1024


def _gelu_f32(h: jnp.ndarray) -> jnp.ndarray:
    return h * jax.nn.sigmoid(1.702 * h)


def _kernel_resident(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    h = jnp.dot(x_ref[:], w1_ref[:], preferred_element_type=jnp.float32)
    h = _gelu_f32(h + b1_ref[:].astype(jnp.float32)).astype(x_ref.dtype)
    y = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    o_ref[:] = (y + b2_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _kernel_streamed(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, acc, *, n_h):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    h = jnp.dot(x_ref[:], w1_ref[:], preferred_element_type=jnp.float32)
    h = _gelu_f32(h + b1_ref[:].astype(jnp.float32)).astype(x_ref.dtype)
    acc[:] += jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)

    @pl.when(j == n_h - 1)
    def _():
        o_ref[:] = (acc[:] + b2_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _pad_axis(v: jnp.ndarray, mult: int, axis: int) -> jnp.ndarray:
    target = -(-v.shape[axis] // mult) * mult
    if target == v.shape[axis]:
        return v
    pads = [(0, 0)] * v.ndim
    pads[axis] = (0, target - v.shape[axis])
    return jnp.pad(v, pads)


def _mlp_fused_impl(x, w1, b1, w2, b2, block_m, block_h, interpret):
    M, K = x.shape
    H = w1.shape[1]
    N = w2.shape[1]
    weight_bytes = (w1.size + w2.size) * w1.dtype.itemsize
    plan = plan_mlp_fused(
        M, K, H, N, block_m, block_h,
        resident=weight_bytes <= _RESIDENT_MAX_WEIGHT_BYTES,
    )
    bm = plan.bm
    x_p = _pad_axis(x, bm, 0)
    Mp = x_p.shape[0]
    b1r = b1.reshape(1, H)
    b2r = b2.reshape(1, N)
    flops = 2 * Mp * H * (K + N)
    if weight_bytes <= _RESIDENT_MAX_WEIGHT_BYTES:
        out = pl.pallas_call(
            _kernel_resident,
            grid=(Mp // bm,),
            in_specs=[
                pl.BlockSpec((bm, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((K, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((H, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (bm, N), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((Mp, N), x.dtype),
            cost_estimate=pl.CostEstimate(
                flops=flops,
                bytes_accessed=(Mp * K + Mp * N + w1.size + w2.size)
                * x.dtype.itemsize,
                transcendentals=Mp * H,
            ),
            interpret=interpret,
        )(x_p, w1, b1r, w2, b2r)
        return out[:M]
    bh = plan.bh
    w1_p = _pad_axis(w1, bh, 1)
    b1_p = _pad_axis(b1r, bh, 1)
    w2_p = _pad_axis(w2, bh, 0)
    Hp = w1_p.shape[1]
    n_h = Hp // bh
    out = pl.pallas_call(
        functools.partial(_kernel_streamed, n_h=n_h),
        grid=(Mp // bm, n_h),
        in_specs=[
            pl.BlockSpec((bm, K), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, bh), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bh), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bh, N), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, N), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, N), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(
                Mp * K + Mp * N + (Mp // bm) * (w1_p.size + w2_p.size)
            )
            * x.dtype.itemsize,
            transcendentals=Mp * Hp,
        ),
        interpret=interpret,
    )(x_p, w1_p, b1_p, w2_p, b2r)
    return out[:M]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _mlp_fused(x, w1, b1, w2, b2, block_m, block_h, interpret):
    return _mlp_fused_impl(x, w1, b1, w2, b2, block_m, block_h, interpret)


def _mlp_fused_fwd(x, w1, b1, w2, b2, block_m, block_h, interpret):
    y = _mlp_fused_impl(x, w1, b1, w2, b2, block_m, block_h, interpret)
    return y, (x, w1, b1, w2, b2)


def _mlp_fused_bwd(block_m, block_h, interpret, res, g):
    """Backward as plain XLA matmuls (recomputes the hidden — remat-style).

    Weight/bias cotangents are dead code under LoRA training (frozen base
    enters the trace as a constant) and get DCE'd; only dx survives.
    """
    x, w1, b1, w2, b2 = res
    f32 = jnp.float32
    hpre = jnp.dot(x, w1, preferred_element_type=f32) + b1.astype(f32)
    sig = jax.nn.sigmoid(1.702 * hpre)
    h = (hpre * sig).astype(x.dtype)
    dgelu = sig * (1.0 + 1.702 * hpre * (1.0 - sig))
    dh = (jnp.dot(g, w2.T, preferred_element_type=f32) * dgelu).astype(x.dtype)
    dx = jnp.dot(dh, w1.T, preferred_element_type=f32).astype(x.dtype)
    dw1 = jnp.dot(x.T, dh, preferred_element_type=f32).astype(w1.dtype)
    db1 = jnp.sum(dh.astype(f32), axis=0).astype(b1.dtype)
    dw2 = jnp.dot(h.T, g, preferred_element_type=f32).astype(w2.dtype)
    db2 = jnp.sum(g.astype(f32), axis=0).astype(b2.dtype)
    return dx, dw1, db1, dw2, db2


_mlp_fused.defvjp(_mlp_fused_fwd, _mlp_fused_bwd)


@functools.partial(
    jax.jit, static_argnames=("block_m", "block_h", "interpret")
)
def mlp_fused(
    x: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    block_m: int = 128,
    block_h: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """x: (M, K); w1: (K, H); b1: (H,); w2: (H, N); b2: (N,) → (M, N).

    Differentiable: forward runs the fused Pallas kernel; backward is a
    custom_vjp of standard matmul gradients (hidden recomputed, so nothing
    extra is saved from the kernel), mirroring ops/lora_matmul.py.
    """
    return _mlp_fused(x, w1, b1, w2, b2, block_m, block_h, interpret)


def mlp_fused_reference(x, w1, b1, w2, b2):
    """jnp oracle mirroring nn/layers.mlp's bf16 tail semantics."""
    h = jnp.dot(x, w1, preferred_element_type=jnp.float32)
    h = _gelu_f32(h + b1.astype(jnp.float32)).astype(x.dtype)
    y = jnp.dot(h, w2, preferred_element_type=jnp.float32)
    return (y + b2.astype(jnp.float32)).astype(x.dtype)
