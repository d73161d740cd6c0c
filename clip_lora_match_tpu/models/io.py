"""Param pytree persistence as flat .npz archives.

Simple, dependency-free model weight files (training checkpoints with
optimizer state use orbax in train/checkpoint.py; this is for standalone
model weights and converted HF checkpoints).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np

Params = dict[str, Any]
_SEP = "/"


def flatten_params(tree: Params, prefix: str = "") -> dict[str, np.ndarray]:
    flat = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            flat.update(flatten_params(v, f"{prefix}{k}{_SEP}"))
    elif isinstance(tree, (list, tuple)):
        # lists flatten under numbered keys; unflatten_params restores them
        # as {"0": ..} dicts — consumers with list-shaped trees (YOLO c2f
        # "m", head "levels"/"cv2"/"cv3") normalize via sorted-int access
        for i, v in enumerate(tree):
            flat.update(flatten_params(v, f"{prefix}{i}{_SEP}"))
    else:
        flat[prefix.rstrip(_SEP)] = np.asarray(tree)
    return flat


def unflatten_params(flat: dict[str, np.ndarray]) -> Params:
    tree: Params = {}
    for key, value in flat.items():
        parts = key.split(_SEP)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def save_params(path: str, params: Params) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = flatten_params(jax.device_get(params))
    np.savez(path, **flat)


def load_params(path: str) -> Params:
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    return unflatten_params(flat)
