"""Int8 (W8A8) quantized serving path for the CLIP towers.

TPU-native rationale: the v5e MXU runs int8×int8→int32 matmuls at 2× the
bf16 rate (394 vs 197 TOP/s), and the transformer blocks' six linears carry
~97% of a tower forward's FLOPs. This module derives an int8 "qparams" tree
from the fp32 params once at load time; ``nn.layers.linear`` dispatches on
the presence of ``kernel_q`` so the towers, scan/unroll machinery, and LoRA
composition are untouched (the adapter delta stays bf16, added after the
dequantized base output — adapters remain exact).

Scheme (standard dynamic W8A8, serving only — training keeps bf16):
- weights: symmetric per-OUTPUT-channel scale, ``wq = round(W / s_w)``;
- activations: symmetric per-TOKEN (row) dynamic scale computed on the fly,
  ``xq = round(x / s_x)`` — per-row scaling absorbs ViT's high-norm outlier
  tokens that would sink a per-tensor scheme;
- ``y = (xq @ wq) · (s_x ⊗ s_w) + b`` with the int32→fp32 dequant and bias
  fused into the matmul epilogue by XLA.

What stays high precision: patch embedding + final projections (<3% of
FLOPs, first/last-layer sensitivity), LayerNorms, softmax/attention core,
and L2 normalization.

The reference has no quantized path (eager fp32 torch throughout,
ref:models/clip_model.py:31-35 — dtype knob defaulting to float32); this is
an addition for TPU serving throughput with measured accuracy deltas
(tests/test_quant.py, bench extras).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

Params = dict[str, Any]

# linears inside a transformer block that get quantized
_BLOCK_LINEARS = (
    ("attn", "q_proj"),
    ("attn", "k_proj"),
    ("attn", "v_proj"),
    ("attn", "out_proj"),
    ("mlp", "fc1"),
    ("mlp", "fc2"),
)


def quantize_linear_params(p: Params) -> Params:
    """{kernel (in,out), bias?} → {kernel_q int8, w_scale f32 (out,), bias?}.

    Symmetric per-output-channel: s_w[o] = max|W[:,o]| / 127. Stacked
    (layer-axis-leading) kernels quantize per (layer, out) pair.
    """
    w = jnp.asarray(p["kernel"], jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=-2, keepdims=True)
    s_w = jnp.maximum(amax, 1e-8) / 127.0
    wq = jnp.clip(jnp.round(w / s_w), -127, 127).astype(jnp.int8)
    out = {"kernel_q": wq, "w_scale": jnp.squeeze(s_w, axis=-2)}
    if p.get("bias") is not None:
        out["bias"] = p["bias"]
    return out


def dequantize_linear_params(qp: Params) -> Params:
    """Inverse of quantize_linear_params (up to rounding) — for tests."""
    w = qp["kernel_q"].astype(jnp.float32) * qp["w_scale"][..., None, :]
    out = {"kernel": w}
    if qp.get("bias") is not None:
        out["bias"] = qp["bias"]
    return out


def _quantize_blocks(blocks: Params) -> Params:
    out = jax.tree_util.tree_map(lambda x: x, blocks)  # shallow structural copy
    for grp, name in _BLOCK_LINEARS:
        out[grp] = dict(out[grp])
        out[grp][name] = quantize_linear_params(blocks[grp][name])
    return out


def quantize_clip_params(params: Params) -> Params:
    """Full CLIP param tree → mixed tree with int8 transformer-block linears.

    Everything outside the blocks (patch embed, token/pos embeddings,
    LayerNorms, projections, logit_scale) passes through unchanged.
    """
    q = dict(params)
    for tower in ("visual", "text"):
        t = dict(params[tower])
        t["blocks"] = _quantize_blocks(params[tower]["blocks"])
        q[tower] = t
    return q


def is_quantized(p: Params) -> bool:
    return "kernel_q" in p


def int8_matmul(
    x: jnp.ndarray, wq: jnp.ndarray, w_scale: jnp.ndarray
) -> jnp.ndarray:
    """Dynamic per-row activation quant + int8 MXU dot + fp32 dequant.

    x: (..., in) float; wq: (in, out) int8; w_scale: (out,) f32.
    Returns (..., out) float32.
    """
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    s_x = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
    xq = jnp.round(x32 / s_x).astype(jnp.int8)
    yi = jax.lax.dot_general(
        xq,
        wq,
        ((((x.ndim - 1),), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return yi.astype(jnp.float32) * (s_x * w_scale)
