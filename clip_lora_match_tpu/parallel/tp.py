"""Tensor parallelism for the CLIP towers (Megatron-style, via GSPMD).

The reference is single-device (no TP exists upstream — SURVEY §2.4); this
module adds the TPU-native scale-out story: shard every transformer block's
weight matrices over the mesh ``model`` axis and let the GSPMD partitioner
derive the activation shardings and collectives. No hand-written comms:

- **column-parallel** (q/k/v projections, mlp fc1): kernel sharded on the
  OUTPUT dim. The fused QKV concat (nn/layers.py::attention) concatenates
  three column-sharded kernels along the sharded axis, so the (B,S,3D)
  activation comes out sharded on its last dim; the (B,S,D)→(B,S,H,hd)
  head split keeps the sharding on the HEAD axis (head-major layout, and
  ``n_model`` must divide the head count) — per-device attention runs on a
  contiguous slice of heads with zero communication.
- **row-parallel** (attn out_proj, mlp fc2): kernel sharded on the INPUT
  dim. The contraction over the sharded dim yields partial sums; GSPMD
  inserts the ``psum`` over ``model`` (the Megatron g-operator) before the
  result feeds the replicated residual/LayerNorm.
- LoRA adapters mirror the base sharding: column-parallel targets shard
  ``b`` on its output dim (``a`` replicated), row-parallel targets shard
  ``a`` on its input dim (``b`` replicated) — the low-rank bottleneck
  (r=8) stays replicated, so the adapter adds no extra collectives beyond
  the base layer's psum.

Everything else (LayerNorms, embeddings, projection heads, biases of
row-parallel layers) is replicated: at ViT-B/32 scale those are <2% of
params and sharding them would trade ICI latency for nothing.

Works under ``lax.scan`` over the stacked (L, ...) layer axis — specs carry
the leading layer dim unsharded and GSPMD propagates through the scan body.

Not supported with TP (documented, asserted off): the Pallas serving kernels
(single-device programs; use ``set_kernel_flags`` defaults) and the int8
path (per-channel scales would need re-sharding; quant is a single-chip
serving optimization).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from clip_lora_match_tpu.core.config import ClipArchConfig
from clip_lora_match_tpu.parallel.mesh import MODEL_AXIS

Params = dict[str, Any]

# projections whose OUTPUT dim is sharded (Megatron column-parallel)
_COLUMN_PARALLEL = ("q_proj", "k_proj", "v_proj", "fc1")
# projections whose INPUT dim is sharded (Megatron row-parallel)
_ROW_PARALLEL = ("out_proj", "fc2")


def check_tp_divisibility(arch: ClipArchConfig, n_model: int) -> None:
    """TP requires the sharded dims to split evenly: attention HEADS (the
    qkv output sharding lands on the head axis after the (B,S,D)→(B,S,H,hd)
    reshape) and the MLP hidden dim."""
    for name, heads, mlp in (
        ("vision", arch.vision_heads, arch.vision_mlp_dim),
        ("text", arch.text_heads, arch.text_mlp_dim),
    ):
        if heads % n_model:
            raise ValueError(
                f"{name} tower has {heads} heads, not divisible by "
                f"model-axis size {n_model}"
            )
        if mlp % n_model:
            raise ValueError(
                f"{name} tower mlp_dim {mlp} not divisible by "
                f"model-axis size {n_model}"
            )


def _path_names(path) -> list[str]:
    out = []
    for entry in path:
        key = getattr(entry, "key", None)
        out.append(str(key) if key is not None else str(entry))
    return out


def _base_leaf_spec(names: list[str], leaf) -> P:
    """PartitionSpec for one base-param leaf, by tree path."""
    proj = next((n for n in names if n in _COLUMN_PARALLEL + _ROW_PARALLEL), None)
    if proj is None:
        return P()
    nd = np.ndim(leaf)
    leafname = names[-1]
    if proj in _COLUMN_PARALLEL:
        # kernel (L, in, out), bias (L, out), int8 kernel_q/w_scale: shard
        # the trailing (output/channel) dim
        if leafname in ("kernel", "bias", "kernel_q", "w_scale"):
            return P(*([None] * (nd - 1)), MODEL_AXIS)
        return P()
    # row-parallel: kernel (L, in, out) sharded on in; bias replicated
    # (it adds to the post-psum replicated output)
    if leafname in ("kernel", "kernel_q") and nd >= 2:
        return P(*([None] * (nd - 2)), MODEL_AXIS, None)
    return P()


def _lora_leaf_spec(names: list[str], leaf) -> P:
    """PartitionSpec for one LoRA leaf: mirror the base layer's split."""
    proj = next((n for n in names if n in _COLUMN_PARALLEL + _ROW_PARALLEL), None)
    if proj is None:
        return P()
    nd = np.ndim(leaf)
    leafname = names[-1]
    if proj in _COLUMN_PARALLEL and leafname == "b":
        # b: (L, r, out) — shard the output dim with the base kernel
        return P(*([None] * (nd - 1)), MODEL_AXIS)
    if proj in _ROW_PARALLEL and leafname == "a":
        # a: (L, in, r) — shard the input dim; x@a partial-sums psum with
        # the base row-parallel contraction
        return P(*([None] * (nd - 2)), MODEL_AXIS, None)
    return P()


def clip_tp_pspecs(params: Params) -> Params:
    """PartitionSpec tree (same structure as ``params``) for TP sharding."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _base_leaf_spec(_path_names(path), leaf), params
    )


def lora_tp_pspecs(lora: Params) -> Params:
    """PartitionSpec tree for the LoRA mirror tree."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _lora_leaf_spec(_path_names(path), leaf), lora
    )


def shard_params_tp(params: Params, mesh: Mesh) -> Params:
    """Place base params on the mesh with Megatron TP shardings."""
    specs = clip_tp_pspecs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def shard_lora_tp(lora: Params, mesh: Mesh) -> Params:
    """Place a LoRA tree on the mesh with the mirrored TP shardings."""
    specs = lora_tp_pspecs(lora)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), lora, specs
    )


def init_tp_train_state(
    sharded_lora: Params,
    tx,
    seed: int = 42,
    rng_impl: Optional[str] = None,
):
    """TrainState whose optimizer moments carry the LoRA TP shardings.

    Delegates to ``parallel.state.init_sharded_train_state`` (shared with
    the PP path) with the LoRA TP spec tree; see that module for why jit
    sharding-propagation can't place zero-initialized moments."""
    from clip_lora_match_tpu.parallel.state import init_sharded_train_state

    return init_sharded_train_state(
        sharded_lora, tx, lora_tp_pspecs(sharded_lora), seed=seed,
        rng_impl=rng_impl,
    )
