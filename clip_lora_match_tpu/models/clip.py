"""From-scratch CLIP ViT-B/32 dual-tower model in functional JAX.

Replaces the reference's HF dependency (``transformers.CLIPModel`` in
ref:models/clip_model.py:37-82) with a TPU-first implementation:

- patch embedding as an explicit unfold + matmul (a (B,49,3072)@(3072,768)
  MXU matmul instead of a conv — identical math for non-overlapping patches);
- stacked transformer layers run under ``lax.scan`` (see nn/layers.py);
- text tower with causal+padding additive mask and EOT-argmax pooling;
- L2-normalized 512-d embeddings, matching ``encode_image``/``encode_text``
  semantics of ref:models/clip_model.py:89-150.

Params are a nested dict pytree; LoRA adapters live in a SEPARATE mirror tree
(see lora/adapter.py) so the frozen base and trainable adapters never mix.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from clip_lora_match_tpu.core.config import ClipArchConfig
from clip_lora_match_tpu.nn.layers import (
    layer_norm,
    linear,
    stack_blocks,
    transformer,
)

Params = dict[str, Any]


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------


def _init_linear(key, d_in, d_out, std, bias=True):
    kkey, _ = jax.random.split(key)
    p = {"kernel": jax.random.normal(kkey, (d_in, d_out), jnp.float32) * std}
    if bias:
        p["bias"] = jnp.zeros((d_out,), jnp.float32)
    return p


def _init_ln(d):
    return {"scale": jnp.ones((d,), jnp.float32), "bias": jnp.zeros((d,), jnp.float32)}


def _init_block(key, width, mlp_dim, n_layers):
    """CLIP-paper init: attn std w^-0.5, proj std scaled by depth."""
    ks = jax.random.split(key, 6)
    attn_std = width ** -0.5
    proj_std = (width ** -0.5) * ((2 * n_layers) ** -0.5)
    fc_std = (2 * width) ** -0.5
    return {
        "ln_1": _init_ln(width),
        "attn": {
            "q_proj": _init_linear(ks[0], width, width, attn_std),
            "k_proj": _init_linear(ks[1], width, width, attn_std),
            "v_proj": _init_linear(ks[2], width, width, attn_std),
            "out_proj": _init_linear(ks[3], width, width, proj_std),
        },
        "ln_2": _init_ln(width),
        "mlp": {
            "fc1": _init_linear(ks[4], width, mlp_dim, fc_std),
            "fc2": _init_linear(ks[5], mlp_dim, width, proj_std),
        },
    }


def init_params(key: jax.Array, arch: ClipArchConfig | None = None) -> Params:
    """Random-initialize the full CLIP param tree (ViT-B/32 by default)."""
    arch = arch or ClipArchConfig()
    keys = jax.random.split(key, 9)
    patch_dim = arch.patch_size * arch.patch_size * 3
    vw, tw = arch.vision_width, arch.text_width

    vision_blocks = stack_blocks(
        [
            _init_block(k, vw, arch.vision_mlp_dim, arch.vision_layers)
            for k in jax.random.split(keys[0], arch.vision_layers)
        ]
    )
    text_blocks = stack_blocks(
        [
            _init_block(k, tw, arch.text_mlp_dim, arch.text_layers)
            for k in jax.random.split(keys[1], arch.text_layers)
        ]
    )
    return {
        "visual": {
            "patch_embed": {
                "kernel": jax.random.normal(keys[2], (patch_dim, vw), jnp.float32)
                * (vw ** -0.5)
            },
            "class_embedding": jax.random.normal(keys[3], (vw,), jnp.float32)
            * (vw ** -0.5),
            "pos_embedding": jax.random.normal(
                keys[4], (arch.vision_seq_len, vw), jnp.float32
            )
            * 0.01,
            "ln_pre": _init_ln(vw),
            "blocks": vision_blocks,
            "ln_post": _init_ln(vw),
            "proj": {"kernel": jax.random.normal(keys[5], (vw, arch.projection_dim), jnp.float32) * (vw ** -0.5)},
        },
        "text": {
            "token_embedding": jax.random.normal(
                keys[6], (arch.vocab_size, tw), jnp.float32
            )
            * 0.02,
            "pos_embedding": jax.random.normal(
                keys[7], (arch.max_text_length, tw), jnp.float32
            )
            * 0.01,
            "blocks": text_blocks,
            "ln_final": _init_ln(tw),
            "proj": {"kernel": jax.random.normal(keys[8], (tw, arch.projection_dim), jnp.float32) * (tw ** -0.5)},
        },
        "logit_scale": jnp.asarray(arch.logit_scale_init, jnp.float32),
    }


# ---------------------------------------------------------------------------
# Forward passes
# ---------------------------------------------------------------------------


def _patchify(pixel_values: jnp.ndarray, patch: int) -> jnp.ndarray:
    """(B, H, W, 3) NHWC → (B, (H/p)*(W/p), p*p*3) patch rows.

    Equivalent to the reference conv patch-embed (stride==kernel) but lowered
    as reshape+transpose so the projection is one big MXU matmul.
    Channel ordering inside a patch matches Conv2d weight layout
    (C, ph, pw) flattened — the converter flattens HF conv kernels the same way.
    """
    B, H, W, C = pixel_values.shape
    gh, gw = H // patch, W // patch
    x = pixel_values.reshape(B, gh, patch, gw, patch, C)
    # → (B, gh, gw, C, ph, pw): channel-major inside the patch, like torch conv
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(B, gh * gw, C * patch * patch)


def encode_image_features(
    params: Params,
    pixel_values: jnp.ndarray,
    arch: ClipArchConfig,
    lora: Optional[Params] = None,
    lora_scaling: float = 1.0,
    compute_dtype: Optional[jnp.dtype] = None,
    remat: bool | str = False,
    lora_dropout: float = 0.0,
    dropout_rng=None,
    unroll: int | bool = 1,
    transformer_fn=None,
) -> jnp.ndarray:
    """(B, H, W, 3) → (B, projection_dim) UN-normalized image features.

    ``transformer_fn``: alternate stacked-transformer executor with
    ``nn.layers.transformer``'s signature — the injection point for the
    pipeline-parallel schedule (parallel/pp.py::make_pipeline_transformer).
    """
    p = params["visual"]
    x = _patchify(pixel_values, arch.patch_size)
    x = linear(p["patch_embed"], x, compute_dtype=compute_dtype)
    cls = jnp.broadcast_to(
        p["class_embedding"].astype(x.dtype), (x.shape[0], 1, x.shape[-1])
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = x + p["pos_embedding"].astype(x.dtype)
    x = layer_norm(p["ln_pre"], x, arch.layer_norm_eps)
    x = (transformer_fn or transformer)(
        p["blocks"],
        x,
        arch.vision_heads,
        lora_blocks=None if lora is None else lora["visual"]["blocks"],
        lora_scaling=lora_scaling,
        eps=arch.layer_norm_eps,
        compute_dtype=compute_dtype,
        remat=remat,
        lora_dropout=lora_dropout,
        dropout_rng=dropout_rng,
        unroll=unroll,
    )
    pooled = layer_norm(p["ln_post"], x[:, 0], arch.layer_norm_eps)
    return linear(p["proj"], pooled, compute_dtype=compute_dtype)


def _text_mask(attention_mask: Optional[jnp.ndarray], S: int, dtype) -> jnp.ndarray:
    """Additive causal (+ padding) mask, (B|1, 1, S, S)."""
    neg = jnp.finfo(jnp.float32).min
    causal = jnp.triu(jnp.full((S, S), neg, jnp.float32), k=1)[None, None]
    if attention_mask is None:
        return causal
    pad = (1.0 - attention_mask.astype(jnp.float32))[:, None, None, :] * neg
    return causal + pad


def encode_text_features(
    params: Params,
    input_ids: jnp.ndarray,
    arch: ClipArchConfig,
    attention_mask: Optional[jnp.ndarray] = None,
    eot_id: Optional[int] = None,
    lora: Optional[Params] = None,
    lora_scaling: float = 1.0,
    compute_dtype: Optional[jnp.dtype] = None,
    remat: bool | str = False,
    lora_dropout: float = 0.0,
    dropout_rng=None,
    unroll: int | bool = 1,
    transformer_fn=None,
) -> jnp.ndarray:
    """(B, S) int ids → (B, projection_dim) UN-normalized text features.

    Pooling takes the hidden state at the FIRST EOT position (argmax over the
    ``ids == eot_id`` mask); with eot_id None, falls back to argmax of ids —
    valid because EOT is the largest id in both the real CLIP vocab and the
    fallback vocab, and padding uses the EOT token itself.

    ``attention_mask`` contract: rows must be SUFFIX-PADDED (a contiguous
    prefix of ones followed by zeros), matching the wire format the
    preprocessor emits (pad-to-77 at the end; ref:src/preprocessing/
    clip_preprocess.py:51-57). The default executor describes the mask
    structurally to the small-attention kernel as causal + per-row key
    lengths (``mask.sum(-1)``); a non-prefix mask (zeros mid-sequence) would
    be honored by the additive-mask dispatch paths but NOT by the structural
    one — don't pass one.

    ``transformer_fn``: alternate stacked-transformer executor (see
    ``encode_image_features``).
    """
    p = params["text"]
    B, S = input_ids.shape
    x = p["token_embedding"][input_ids]
    if compute_dtype is not None:
        # run the residual stream in the compute dtype like the vision tower
        # (whose patch_embed linear already casts): keeps the two towers in
        # ONE kernel-geometry/dtype class (the r4 TPU crash was fp32-S=77
        # only) and halves the text tower's HBM residual traffic under bf16
        x = x.astype(compute_dtype)
    x = x + p["pos_embedding"][:S].astype(x.dtype)
    mask = _text_mask(attention_mask, S, x.dtype)
    extra = {}
    if transformer_fn is None:
        # structural mask description for the in-kernel small-attention mode
        # (ops/attention_small.py): causal + contiguous-prefix key lengths
        # (the wire contract pads text at the END, so attention_mask rows are
        # prefixes and sum == length). Alternate executors (SP ring, PP) own
        # their mask semantics and only receive the additive form.
        extra = dict(
            causal=True,
            key_lengths=None if attention_mask is None
            else attention_mask.astype(jnp.int32).sum(-1),
        )
    x = (transformer_fn or transformer)(
        p["blocks"],
        x,
        arch.text_heads,
        mask=mask,
        lora_blocks=None if lora is None else lora["text"]["blocks"],
        lora_scaling=lora_scaling,
        eps=arch.layer_norm_eps,
        compute_dtype=compute_dtype,
        remat=remat,
        lora_dropout=lora_dropout,
        dropout_rng=dropout_rng,
        unroll=unroll,
        **extra,
    )
    x = layer_norm(p["ln_final"], x, arch.layer_norm_eps)
    if eot_id is None:
        eot_pos = jnp.argmax(input_ids, axis=-1)
    else:
        eot_pos = jnp.argmax((input_ids == eot_id).astype(jnp.int32), axis=-1)
    pooled = jnp.take_along_axis(x, eot_pos[:, None, None], axis=1)[:, 0]
    return linear(p["proj"], pooled, compute_dtype=compute_dtype)


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    n = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=axis, keepdims=True))
    return (x.astype(jnp.float32) / jnp.maximum(n, eps)).astype(x.dtype)


def clip_forward(
    params: Params,
    pixel_values: jnp.ndarray,
    input_ids: jnp.ndarray,
    arch: ClipArchConfig,
    attention_mask: Optional[jnp.ndarray] = None,
    eot_id: Optional[int] = None,
    lora: Optional[Params] = None,
    lora_scaling: float = 1.0,
    compute_dtype: Optional[jnp.dtype] = None,
    remat: bool = False,
) -> dict[str, jnp.ndarray]:
    """Joint forward: normalized features + contrastive logits (both ways)."""
    img = encode_image_features(
        params, pixel_values, arch, lora, lora_scaling, compute_dtype, remat
    )
    txt = encode_text_features(
        params,
        input_ids,
        arch,
        attention_mask,
        eot_id,
        lora,
        lora_scaling,
        compute_dtype,
        remat,
    )
    img_n = l2_normalize(img)
    txt_n = l2_normalize(txt)
    scale = jnp.exp(params["logit_scale"].astype(jnp.float32))
    logits_per_image = scale * jnp.dot(
        img_n.astype(jnp.float32), txt_n.astype(jnp.float32).T
    )
    return {
        "image_embeds": img_n,
        "text_embeds": txt_n,
        "logits_per_image": logits_per_image,
        "logits_per_text": logits_per_image.T,
        "logit_scale": scale,
    }
