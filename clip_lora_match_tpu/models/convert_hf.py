"""HF ``CLIPModel`` checkpoint → param-pytree converter.

The reference loads ``openai/clip-vit-base-patch32`` through transformers
(ref:models/clip_model.py:44-60). This converter maps an HF torch state_dict
onto the from-scratch pytree of models/clip.py so real pretrained weights (or
any torch CLIP checkpoint) drop straight in. torch is an optional dependency
used ONLY here and in legacy .pt index IO — never on the compute path.

Layout notes:
- torch Linear stores (out, in); our kernels are (in, out) → transpose;
- the patch conv (768, 3, 32, 32) flattens to (3*32*32, 768) with channel-major
  patch ordering, matching models/clip._patchify;
- per-layer tensors are stacked along a leading layer axis (scan layout).
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from clip_lora_match_tpu.core.config import ClipArchConfig
from clip_lora_match_tpu.nn.layers import stack_blocks

Params = dict[str, Any]


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def _linear(sd: Mapping, prefix: str) -> Params:
    p = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        p["bias"] = _np(sd[f"{prefix}.bias"])
    return p


def _ln(sd: Mapping, prefix: str) -> Params:
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def _blocks(sd: Mapping, prefix: str, n_layers: int) -> Params:
    blocks = []
    for i in range(n_layers):
        b = f"{prefix}.layers.{i}"
        blocks.append(
            {
                "ln_1": _ln(sd, f"{b}.layer_norm1"),
                "attn": {
                    "q_proj": _linear(sd, f"{b}.self_attn.q_proj"),
                    "k_proj": _linear(sd, f"{b}.self_attn.k_proj"),
                    "v_proj": _linear(sd, f"{b}.self_attn.v_proj"),
                    "out_proj": _linear(sd, f"{b}.self_attn.out_proj"),
                },
                "ln_2": _ln(sd, f"{b}.layer_norm2"),
                "mlp": {
                    "fc1": _linear(sd, f"{b}.mlp.fc1"),
                    "fc2": _linear(sd, f"{b}.mlp.fc2"),
                },
            }
        )
    return stack_blocks(blocks)


def infer_arch_from_state_dict(
    sd: Mapping,
    vision_heads: int | None = None,
    text_heads: int | None = None,
) -> ClipArchConfig:
    """Derive the full ClipArchConfig from an HF CLIPModel state_dict, so any
    CLIP checkpoint (B/32, B/16, L/14, custom) self-describes — no manual
    geometry bookkeeping (the reference delegated this to the HF hub,
    ref:models/clip_model.py:44-60).

    Head counts are NOT recoverable from tensor shapes. Pass ``vision_heads``
    / ``text_heads`` explicitly (e.g. from the HF config's
    ``num_attention_heads``) when available; otherwise they default to
    OpenAI's fixed 64-dim-per-head convention (ViT-B: 768/64=12,
    ViT-L: 1024/64=16, text 512/64=8 … matching every released CLIP) and a
    loud warning records that the grouping was inferred — a checkpoint with a
    non-64-dim head would otherwise convert silently to wrong embeddings.
    """
    import re
    import warnings

    if vision_heads is None or text_heads is None:
        warnings.warn(
            "infer_arch_from_state_dict: head counts inferred by the "
            "64-dim-per-head convention (not recoverable from shapes). If "
            "this checkpoint's num_attention_heads differs, pass "
            "vision_heads/text_heads explicitly from its HF config.",
            stacklevel=2,
        )

    patch_w = _np(sd["vision_model.embeddings.patch_embedding.weight"])
    vw, _, ph, _ = patch_w.shape
    vis_pos = _np(sd["vision_model.embeddings.position_embedding.weight"])
    image_size = int(round((vis_pos.shape[0] - 1) ** 0.5)) * ph
    tok = _np(sd["text_model.embeddings.token_embedding.weight"])
    txt_pos = _np(sd["text_model.embeddings.position_embedding.weight"])

    def n_layers(prefix):
        pat = re.compile(rf"{prefix}\.encoder\.layers\.(\d+)\.")
        idx = [int(m.group(1)) for k in sd if (m := pat.match(k))]
        return max(idx) + 1

    return ClipArchConfig(
        image_size=image_size,
        patch_size=ph,
        vision_width=vw,
        vision_layers=n_layers("vision_model"),
        vision_heads=vision_heads if vision_heads is not None else max(1, vw // 64),
        vision_mlp_dim=_np(sd["vision_model.encoder.layers.0.mlp.fc1.weight"]).shape[0],
        vocab_size=tok.shape[0],
        max_text_length=txt_pos.shape[0],
        text_width=tok.shape[1],
        text_layers=n_layers("text_model"),
        text_heads=text_heads if text_heads is not None else max(1, tok.shape[1] // 64),
        text_mlp_dim=_np(sd["text_model.encoder.layers.0.mlp.fc1.weight"]).shape[0],
        projection_dim=_np(sd["text_projection.weight"]).shape[0],
    )


def convert_hf_clip_state_dict(
    sd: Mapping, arch: ClipArchConfig | None = None
) -> Params:
    """HF CLIPModel state_dict (torch tensors or ndarrays) → our pytree."""
    arch = arch or infer_arch_from_state_dict(sd)
    sd = {k: v for k, v in sd.items()}
    patch_w = _np(sd["vision_model.embeddings.patch_embedding.weight"])
    vw = patch_w.shape[0]
    # (vw, C, ph, pw) → (C*ph*pw, vw), channel-major patch layout
    patch_kernel = patch_w.reshape(vw, -1).T

    return {
        "visual": {
            "patch_embed": {"kernel": patch_kernel},
            "class_embedding": _np(sd["vision_model.embeddings.class_embedding"]),
            "pos_embedding": _np(
                sd["vision_model.embeddings.position_embedding.weight"]
            ),
            "ln_pre": _ln(sd, "vision_model.pre_layrnorm"),  # sic: HF typo
            "blocks": _blocks(sd, "vision_model.encoder", arch.vision_layers),
            "ln_post": _ln(sd, "vision_model.post_layernorm"),
            "proj": {"kernel": _np(sd["visual_projection.weight"]).T},
        },
        "text": {
            "token_embedding": _np(sd["text_model.embeddings.token_embedding.weight"]),
            "pos_embedding": _np(
                sd["text_model.embeddings.position_embedding.weight"]
            ),
            "blocks": _blocks(sd, "text_model.encoder", arch.text_layers),
            "ln_final": _ln(sd, "text_model.final_layer_norm"),
            "proj": {"kernel": _np(sd["text_projection.weight"]).T},
        },
        "logit_scale": _np(sd["logit_scale"]),
    }


def convert_hf_clip_model(model, arch: ClipArchConfig | None = None) -> Params:
    """Convenience: HF CLIPModel instance → pytree. Unlike the raw
    state_dict path, the model instance carries its config, so head counts
    come from ``num_attention_heads`` — no convention-based inference."""
    if arch is None:
        cfg = getattr(model, "config", None)
        vh = getattr(getattr(cfg, "vision_config", None), "num_attention_heads", None)
        th = getattr(getattr(cfg, "text_config", None), "num_attention_heads", None)
        arch = infer_arch_from_state_dict(
            model.state_dict(), vision_heads=vh, text_heads=th
        )
    return convert_hf_clip_state_dict(model.state_dict(), arch)
