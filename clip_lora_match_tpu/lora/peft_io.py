"""PEFT adapter checkpoint interop.

The reference trains with PEFT and saves per-epoch adapter dirs containing
``adapter_model.safetensors`` + ``adapter_config.json``
(ref:scripts/train_lora.py:243-247, ref:scripts/verify_data_structure.py:96-110).
This module converts between that format and the native stacked-block LoRA
pytree:

- PEFT key: ``base_model.model.{text|vision}_model.encoder.layers.{i}.
  self_attn.{q,k,v,out}_proj.lora_{A,B}.weight`` with A: (r, in), B: (out, r);
- ours: ``{tower}/blocks/attn/{proj}/{a,b}`` with a: (L, in, r), b: (L, r, out)
  (transposed, stacked on the layer axis).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any

import numpy as np

from clip_lora_match_tpu.core.config import ClipArchConfig, LoraConfig

Params = dict[str, Any]

_KEY_RE = re.compile(
    r"(?:base_model\.model\.)?(text|vision)_model\.encoder\.layers\.(\d+)\."
    r"(self_attn|mlp)\.(q_proj|k_proj|v_proj|out_proj|fc1|fc2)\."
    r"lora_(A|B)\.weight"
)

_TOWER = {"vision": "visual", "text": "text"}
_TOWER_INV = {"visual": "vision_model", "text": "text_model"}


def load_peft_adapter(
    path: str, arch: ClipArchConfig | None = None
) -> tuple[Params, float]:
    """PEFT adapter dir → (native LoRA tree, scaling = alpha/r)."""
    from safetensors.numpy import load_file

    arch = arch or ClipArchConfig()
    with open(os.path.join(path, "adapter_config.json")) as f:
        cfg = json.load(f)
    scaling = cfg["lora_alpha"] / cfg["r"]
    flat = load_file(os.path.join(path, "adapter_model.safetensors"))

    # collect per (tower, group, proj, a|b): {layer: array}
    slots: dict[tuple[str, str, str, str], dict[int, np.ndarray]] = {}
    for key, arr in flat.items():
        m = _KEY_RE.match(key)
        if not m:
            continue
        tower_hf, layer, group_hf, proj, ab = m.groups()
        tower = _TOWER[tower_hf]
        group = "attn" if group_hf == "self_attn" else "mlp"
        # PEFT A (r, in) → (in, r); B (out, r) → (r, out)
        slots.setdefault((tower, group, proj, ab.lower()), {})[int(layer)] = arr.T

    tree: Params = {}
    for (tower, group, proj, ab), per_layer in slots.items():
        n_layers = (
            arch.vision_layers if tower == "visual" else arch.text_layers
        )
        sample = next(iter(per_layer.values()))
        stacked = np.zeros((n_layers,) + sample.shape, np.float32)
        for i, arr in per_layer.items():
            stacked[i] = arr
        tree.setdefault(tower, {"blocks": {}})["blocks"].setdefault(group, {}).setdefault(
            proj, {}
        )[ab] = stacked
    return tree, scaling


def save_peft_adapter(
    path: str,
    lora: Params,
    cfg: LoraConfig,
) -> None:
    """Native LoRA tree → PEFT-compatible adapter dir (safetensors + config).

    Fills the role of the reference's EMPTY scripts/export_lora.py so
    PEFT-consuming tooling can load adapters trained here.
    """
    import jax
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    lora = jax.device_get(lora)
    flat: dict[str, np.ndarray] = {}
    for tower, tree in lora.items():
        hf_tower = _TOWER_INV[tower]
        for group, projs in tree["blocks"].items():
            group_hf = "self_attn" if group == "attn" else "mlp"
            for proj, ab in projs.items():
                a, b = np.asarray(ab["a"]), np.asarray(ab["b"])
                for i in range(a.shape[0]):
                    base = (
                        f"base_model.model.{hf_tower}.encoder.layers.{i}."
                        f"{group_hf}.{proj}"
                    )
                    flat[f"{base}.lora_A.weight"] = np.ascontiguousarray(a[i].T)
                    flat[f"{base}.lora_B.weight"] = np.ascontiguousarray(b[i].T)
    save_file(flat, os.path.join(path, "adapter_model.safetensors"))
    with open(os.path.join(path, "adapter_config.json"), "w") as f:
        json.dump(
            {
                "peft_type": "LORA",
                "task_type": cfg.task_type,
                "base_model_name_or_path": cfg.base_model_name,
                "r": cfg.r,
                "lora_alpha": cfg.alpha,
                "lora_dropout": cfg.dropout,
                "bias": cfg.bias,
                "target_modules": list(cfg.target_modules),
                "fan_in_fan_out": False,
                "inference_mode": True,
            },
            f,
            indent=2,
        )
