"""Pallas fused LoRA matmul: y = x @ W + s·(x @ A) @ B in ONE kernel.

The BASELINE.json north star asks for "the LoRA delta (x@A@B, scaled by α/r)
fused into the base projection matmuls as single Pallas kernels". The XLA
fallback (nn/layers.linear) issues three matmuls with x read twice from HBM;
this kernel reads each x tile once, accumulating BOTH the base product and the
(x@A) rank-r product in VMEM scratch, then applies B on the final K step —
one pass over the activation stream.

Layout: A is padded to (K, R_PAD) and B to (R_PAD, N) with R_PAD=128 (lane
width); zero columns/rows are mathematically inert. Grid (M/bm, N/bn, K/bk),
K innermost for accumulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from clip_lora_match_tpu.ops.geometry import plan_lora_matmul

R_PAD = 128


def _kernel(x_ref, w_ref, a_ref, b_ref, o_ref, acc, ab_acc, *, scaling, n_k):
    k_step = pl.program_id(2)

    @pl.when(k_step == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
        ab_acc[:] = jnp.zeros_like(ab_acc)

    x = x_ref[:]
    acc[:] += jnp.dot(x, w_ref[:], preferred_element_type=jnp.float32)
    ab_acc[:] += jnp.dot(x, a_ref[:], preferred_element_type=jnp.float32)

    @pl.when(k_step == n_k - 1)
    def _():
        delta = jnp.dot(
            ab_acc[:].astype(x.dtype), b_ref[:], preferred_element_type=jnp.float32
        )
        o_ref[:] = (acc[:] + scaling * delta).astype(o_ref.dtype)


def _lora_matmul_impl(
    x: jnp.ndarray,
    w: jnp.ndarray,
    a: jnp.ndarray,
    b: jnp.ndarray,
    scaling: float,
    block_m: int,
    block_n: int,
    block_k: int,
    interpret: bool,
) -> jnp.ndarray:
    M, K = x.shape
    N = w.shape[1]
    r = a.shape[1]
    plan = plan_lora_matmul(M, N, K, block_m, block_n, block_k, R_PAD)
    bm, bn, bk = plan.bm, plan.bn, plan.bk

    def pad_to(v, mult, axis):
        target = -(-v.shape[axis] // mult) * mult
        if target == v.shape[axis]:
            return v
        pads = [(0, 0)] * v.ndim
        pads[axis] = (0, target - v.shape[axis])
        return jnp.pad(v, pads)

    a_p = pad_to(a, R_PAD, 1)  # (K, R_PAD)
    b_p = pad_to(b, R_PAD, 0)  # (R_PAD, N)
    x_p = pad_to(pad_to(x, bm, 0), bk, 1)
    w_p = pad_to(pad_to(w, bk, 0), bn, 1)
    a_p = pad_to(a_p, bk, 0)
    b_p = pad_to(b_p, bn, 1)
    Mp, Kp = x_p.shape
    Np = w_p.shape[1]
    n_k = Kp // bk

    out = pl.pallas_call(
        functools.partial(_kernel, scaling=scaling, n_k=n_k),
        grid=(Mp // bm, Np // bn, n_k),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, R_PAD), lambda i, j, k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R_PAD, bn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bm, bn), jnp.float32),
            pltpu.VMEM((bm, R_PAD), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * Kp + 2 * Mp * R_PAD * (Kp + Np),
            bytes_accessed=(Mp * Kp + Kp * Np + Mp * Np) * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_p, w_p, a_p, b_p)
    return out[:M, :N]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _lora_matmul(x, w, a, b, scaling, block_m, block_n, block_k, interpret):
    return _lora_matmul_impl(
        x, w, a, b, scaling, block_m, block_n, block_k, interpret
    )


def _lora_matmul_fwd(x, w, a, b, scaling, block_m, block_n, block_k, interpret):
    y = _lora_matmul_impl(
        x, w, a, b, scaling, block_m, block_n, block_k, interpret
    )
    return y, (x, w, a, b)


def _lora_matmul_bwd(scaling, block_m, block_n, block_k, interpret, res, g):
    """Backward as plain XLA matmuls (fp32 accumulation).

    Cotangents for frozen inputs (the base ``w`` during LoRA training, where
    it enters the traced function as a constant) are dead code and get DCE'd
    by XLA — only the live adapter/activation gradients survive compilation.
    """
    x, w, a, b = res
    f32 = jnp.float32
    gb = jnp.dot(g, b.T, preferred_element_type=f32).astype(x.dtype)  # (M, r)
    dx = (
        jnp.dot(g, w.T, preferred_element_type=f32)
        + scaling * jnp.dot(gb, a.T, preferred_element_type=f32)
    ).astype(x.dtype)
    dw = jnp.dot(x.T, g, preferred_element_type=f32).astype(w.dtype)
    da = (scaling * jnp.dot(x.T, gb, preferred_element_type=f32)).astype(a.dtype)
    xa = jnp.dot(x, a, preferred_element_type=f32).astype(x.dtype)  # (M, r)
    db = (scaling * jnp.dot(xa.T, g, preferred_element_type=f32)).astype(b.dtype)
    return dx, dw, da, db


_lora_matmul.defvjp(_lora_matmul_fwd, _lora_matmul_bwd)


@functools.partial(
    jax.jit, static_argnames=("scaling", "block_m", "block_n", "block_k", "interpret")
)
def lora_matmul(
    x: jnp.ndarray,
    w: jnp.ndarray,
    a: jnp.ndarray,
    b: jnp.ndarray,
    scaling: float = 1.0,
    block_m: int = 256,
    block_n: int = 256,
    block_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """x: (M, K), w: (K, N), a: (K, r), b: (r, N) → (M, N) fp32-accumulated.

    r is padded to 128 lanes internally; callers pass the true rank-r factors.
    Differentiable: forward runs the fused Pallas kernel, backward is defined
    via custom_vjp as standard matmul gradients, so the fused path is safe
    under ``jax.grad`` (train steps with lora_dropout=0 take it).
    """
    return _lora_matmul(
        x, w, a, b, float(scaling), block_m, block_n, block_k, interpret
    )


def lora_matmul_reference(x, w, a, b, scaling=1.0):
    """jnp oracle with the identical contract."""
    base = jnp.dot(x, w, preferred_element_type=jnp.float32)
    delta = jnp.dot(
        jnp.dot(x, a, preferred_element_type=jnp.float32).astype(x.dtype),
        b,
        preferred_element_type=jnp.float32,
    )
    return (base + scaling * delta).astype(x.dtype)
