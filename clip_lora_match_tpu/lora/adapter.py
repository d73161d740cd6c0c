"""Native LoRA adapters for the CLIP towers.

Replaces the reference's PEFT wrapper (ref:models/lora_adapter.py:21-56) with
explicit low-rank param trees that MIRROR the base param pytree's stacked-block
layout, so the same ``lax.scan`` drives base+adapter in one fused pass and the
frozen base / trainable adapter split is a pytree partition, not a module
wrapper.

Math: ``y = x@W + (α/r) · (x@A)@B`` with A: (in, r), B: (r, out), B zero-init
(x@A@B convention per BASELINE.json; PEFT's (r,in)/(out,r) tensors are
transposed on import by peft_io.py). Merge: ``W' = W + (α/r)·A@B``
(the capability the reference's empty scripts/export_lora.py never delivered).

Target modules default to q/k/v/out_proj of BOTH towers, matching the shipped
config (ref:config/lora_config.yaml) — the reference's PEFT call wraps every
module whose name matches, which for CLIPModel is both towers' attention
projections (ref:scripts/train_lora.py:131-132).
"""

from __future__ import annotations

import json
import os
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from clip_lora_match_tpu.core.config import ClipArchConfig, LoraConfig
from clip_lora_match_tpu.core.logging import get_logger
from clip_lora_match_tpu.models.io import load_params, save_params

Params = dict[str, Any]
log = get_logger("lora")

_ATTN_PROJS = ("q_proj", "k_proj", "v_proj", "out_proj")
_MLP_PROJS = ("fc1", "fc2")


def _proj_dims(arch: ClipArchConfig, tower: str, name: str) -> tuple[int, int]:
    width = arch.vision_width if tower == "visual" else arch.text_width
    mlp = arch.vision_mlp_dim if tower == "visual" else arch.text_mlp_dim
    if name in _ATTN_PROJS:
        return width, width
    if name == "fc1":
        return width, mlp
    if name == "fc2":
        return mlp, width
    raise ValueError(f"unknown target module {name}")


def _init_ab(key, layers: int, d_in: int, d_out: int, r: int) -> Params:
    """A: kaiming-uniform (bound 1/sqrt(d_in), PEFT convention), B: zeros —
    the adapter starts as an exact no-op."""
    bound = 1.0 / np.sqrt(d_in)
    a = jax.random.uniform(key, (layers, d_in, r), jnp.float32, -bound, bound)
    return {"a": a, "b": jnp.zeros((layers, r, d_out), jnp.float32)}


def init_lora(
    key: jax.Array,
    arch: ClipArchConfig | None = None,
    cfg: LoraConfig | None = None,
    towers: Sequence[str] = ("visual", "text"),
) -> Params:
    """Build a zero-effect LoRA tree for the configured target modules."""
    arch = arch or ClipArchConfig()
    cfg = cfg or LoraConfig()
    tree: Params = {}
    for tower in towers:
        layers = arch.vision_layers if tower == "visual" else arch.text_layers
        attn: Params = {}
        mlp: Params = {}
        for name in cfg.target_modules:
            key, sub = jax.random.split(key)
            d_in, d_out = _proj_dims(arch, tower, name)
            entry = _init_ab(sub, layers, d_in, d_out, cfg.r)
            if name in _ATTN_PROJS:
                attn[name] = entry
            else:
                mlp[name] = entry
        blocks: Params = {}
        if attn:
            blocks["attn"] = attn
        if mlp:
            blocks["mlp"] = mlp
        tree[tower] = {"blocks": blocks}
    n = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))
    log.info(
        "LoRA adapter: r=%d alpha=%d targets=%s trainable params=%s",
        cfg.r, cfg.alpha, list(cfg.target_modules), f"{n:,}",
    )
    return tree


def merge_lora(params: Params, lora: Params, scaling: float) -> Params:
    """Fold adapters into base kernels: W' = W + scaling · A@B (per layer).

    Returns a NEW params tree; the input is untouched (functional update).
    Implements the merge path BASELINE.json ties to the reference's empty
    scripts/export_lora.py.
    """
    import copy

    merged = copy.deepcopy(jax.device_get(params))
    for tower, tree in lora.items():
        for group_name, group in tree["blocks"].items():
            for proj, ab in group.items():
                base = merged[tower]["blocks"][group_name][proj]
                delta = scaling * jnp.einsum(
                    "lir,lro->lio", ab["a"], ab["b"],
                    preferred_element_type=jnp.float32,
                )
                base["kernel"] = np.asarray(
                    jnp.asarray(base["kernel"], jnp.float32) + delta
                )
    return merged


def lora_param_count(lora: Params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(lora))


# -- persistence (native format) ------------------------------------------------


def save_lora(path: str, lora: Params, cfg: LoraConfig) -> None:
    """Native format: npz weights + lora_config.json sidecar."""
    os.makedirs(path, exist_ok=True)
    save_params(os.path.join(path, "lora_weights.npz"), lora)
    with open(os.path.join(path, "lora_config.json"), "w") as f:
        json.dump(
            {
                "r": cfg.r,
                "alpha": cfg.alpha,
                "dropout": cfg.dropout,
                "target_modules": list(cfg.target_modules),
                "base_model_name": cfg.base_model_name,
            },
            f,
        )


def load_lora(path: str) -> tuple[Params, float]:
    """Load a native adapter dir OR a PEFT adapter dir. Returns (tree, scaling)."""
    native = os.path.join(path, "lora_weights.npz")
    if os.path.exists(native):
        with open(os.path.join(path, "lora_config.json")) as f:
            meta = json.load(f)
        return load_params(native), meta["alpha"] / meta["r"]
    peft_file = os.path.join(path, "adapter_model.safetensors")
    if os.path.exists(peft_file):
        from clip_lora_match_tpu.lora.peft_io import load_peft_adapter

        return load_peft_adapter(path)
    raise FileNotFoundError(f"no LoRA adapter found under {path}")
