"""Embedding index store: device-resident matrix + sidecar metadata.

The reference keeps the index as a torch-saved dict of
``{embeddings (N,512), image_paths|image_path [N], texts|text [N]}`` re-read
from disk on every query (ref:src/embedding/search.py:24-68,
ref:src/embedding/seeker_service.py:183). Here:

- the embedding matrix lives ON DEVICE (HBM) between queries; disk formats are
  a native ``.npz`` + JSON sidecar, with read/write compatibility for legacy
  ``.pt`` files (torch optional, key-tolerant like ref:search.py:41-56);
- appends are O(1) amortized via a capacity-doubling device arena instead of
  the reference's full-index rewrite per insert (ref:finder_service.py:171-185);
- rows are L2-renormalized on load, mirroring ref:search.py:68.
"""

from __future__ import annotations

import json
import os
import threading
import warnings
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from clip_lora_match_tpu.core.logging import get_logger

log = get_logger("index")


def _l2norm_rows(x: np.ndarray, eps: float = 1e-12) -> np.ndarray:
    n = np.linalg.norm(x, axis=-1, keepdims=True)
    return x / np.maximum(n, eps)


# Donating the arena lets the row write reuse its buffer instead of copying
# the whole arena per insert — true O(1) device append. Donation INVALIDATES
# the previous array object, so a concurrent reader that grabbed
# ``index.embeddings`` just before the donation would dispatch against a
# deleted buffer. Every arena reader/writer therefore synchronizes on
# ``EmbeddingIndex.lock`` (an RLock: the finder's own write lock may already
# be held), holding it from taking the reference through materializing
# results.
_arena_set_row = jax.jit(
    lambda arena, row, i: arena.at[i].set(row), donate_argnums=(0,)
)


class EmbeddingIndex:
    """In-memory (device-backed) embedding index with metadata."""

    def __init__(
        self,
        embeddings: Optional[np.ndarray] = None,
        image_paths: Optional[Sequence[str]] = None,
        texts: Optional[Sequence[str]] = None,
        dim: int = 512,
        normalize: bool = True,
        capacity: int = 0,
        storage_dtype: str = "float32",
    ):
        """storage_dtype="bfloat16" halves the arena's HBM footprint and the
        retrieval kernel's bandwidth (scores still accumulate in fp32 —
        cosine error ~1e-3, negligible for ranking); metadata and disk
        formats remain fp32."""
        if embeddings is None:
            embeddings = np.zeros((0, dim), np.float32)
        embeddings = np.asarray(embeddings, np.float32)
        if embeddings.ndim != 2:
            raise ValueError(f"embeddings must be (N, D), got {embeddings.shape}")
        if normalize and embeddings.shape[0]:
            embeddings = _l2norm_rows(embeddings)
        self.dim = embeddings.shape[1]
        self.size = embeddings.shape[0]
        self.image_paths = list(image_paths or [])
        self.texts = list(texts or [])
        self._warn_on_mismatch()
        cap = max(capacity, self.size, 1)
        arena = np.zeros((cap, self.dim), np.float32)
        arena[: self.size] = embeddings
        self._storage_dtype = jnp.dtype(storage_dtype)
        # device-resident arena; queries slice [:size]. ``lock`` guards the
        # donation in append() against concurrent readers (see _arena_set_row)
        self.lock = threading.RLock()
        self._arena = jnp.asarray(arena).astype(self._storage_dtype)

    def _warn_on_mismatch(self):
        # tolerate metadata count mismatches with a warning (ref:search.py:58-62)
        for name, meta in (("image_paths", self.image_paths), ("texts", self.texts)):
            if meta and len(meta) != self.size:
                warnings.warn(
                    f"index metadata '{name}' has {len(meta)} entries for "
                    f"{self.size} embedding rows"
                )

    # -- access ----------------------------------------------------------------

    @property
    def embeddings(self) -> jnp.ndarray:
        """(N, D) device array view of the live rows."""
        return self._arena[: self.size]

    def embeddings_np(self) -> np.ndarray:
        with self.lock:
            return np.asarray(self.embeddings.astype(jnp.float32))

    def metadata(self, i: int) -> tuple[Optional[str], Optional[str]]:
        """Safe metadata lookup (ref:search.py:104-105)."""
        path = self.image_paths[i] if i < len(self.image_paths) else None
        text = self.texts[i] if i < len(self.texts) else None
        return path, text

    def __len__(self) -> int:
        return self.size

    # -- mutation ---------------------------------------------------------------

    def append(
        self,
        embedding: np.ndarray,
        image_path: Optional[str] = None,
        text: Optional[str] = None,
        normalize: bool = True,
    ) -> int:
        """Append one row; grows the device arena geometrically. Returns row id."""
        vec = np.asarray(embedding, np.float32).reshape(-1)
        if vec.shape[0] != self.dim:
            raise ValueError(f"embedding dim {vec.shape[0]} != index dim {self.dim}")
        if normalize:
            vec = _l2norm_rows(vec[None])[0]
        with self.lock:
            cap = self._arena.shape[0]
            if self.size >= cap:
                host = np.asarray(self._arena.astype(jnp.float32))
                arena = np.zeros((max(2 * cap, 8), self.dim), np.float32)
                arena[: self.size] = host[: self.size]
                arena[self.size] = vec
                self._arena = jnp.asarray(arena).astype(self._storage_dtype)
            else:
                self._arena = _arena_set_row(
                    self._arena,
                    jnp.asarray(vec).astype(self._storage_dtype),
                    jnp.asarray(self.size),
                )
            self.image_paths.append(image_path or "")
            self.texts.append(text or "")
            self.size += 1
            return self.size - 1

    # -- persistence -------------------------------------------------------------

    def _snapshot(self) -> tuple[np.ndarray, list, list]:
        """Atomic (embeddings, image_paths, texts) snapshot: holding the lock
        across all three reads keeps a concurrent append() from skewing the
        sidecar row count vs the embedding matrix."""
        with self.lock:
            return (
                np.asarray(self.embeddings.astype(jnp.float32)),
                list(self.image_paths),
                list(self.texts),
            )

    def save(self, path: str) -> None:
        """Save as native .npz (embeddings) + .json sidecar, or legacy .pt."""
        if path.endswith(".pt"):
            self._save_pt(path)
            return
        emb, image_paths, texts = self._snapshot()
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        np.savez(path, embeddings=emb)
        side = path[:-4] if path.endswith(".npz") else path
        with open(side + ".json", "w") as f:
            json.dump(
                {"image_paths": image_paths, "texts": texts}, f,
                ensure_ascii=False,
            )

    def _save_pt(self, path: str) -> None:
        """Legacy torch dict format, plural keys like ref:finder_service.py:93-103."""
        import torch

        emb, image_paths, texts = self._snapshot()
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        torch.save(
            {
                "embeddings": torch.from_numpy(emb.copy()),
                "image_paths": image_paths,
                "texts": texts,
            },
            path,
        )

    @classmethod
    def load(cls, path: str, dim: int = 512) -> "EmbeddingIndex":
        """Load .npz(+json) or legacy .pt; missing file → empty index
        (mirrors ref:finder_service.py:74-91's start-empty behavior)."""
        if path.endswith(".pt"):
            if os.path.exists(path):
                return cls._load_pt(path)
            log.info("index %s not found; starting empty", path)
            return cls(dim=dim)
        npz = path if path.endswith(".npz") else path + ".npz"
        if not os.path.exists(npz):
            log.info("index %s not found; starting empty", npz)
            return cls(dim=dim)
        with np.load(npz) as data:
            emb = data["embeddings"]
        side = npz[:-4] + ".json"
        image_paths, texts = [], []
        if os.path.exists(side):
            with open(side) as f:
                meta = json.load(f)
            image_paths = meta.get("image_paths", meta.get("image_path", []))
            texts = meta.get("texts", meta.get("text", []))
        return cls(emb, image_paths, texts)

    @classmethod
    def _load_pt(cls, path: str) -> "EmbeddingIndex":
        """Key-tolerant legacy loader (ref:search.py:41-56 accepts both
        image_paths/image_path and texts/text spellings)."""
        import torch

        data = torch.load(path, map_location="cpu", weights_only=False)
        if not isinstance(data, dict) or "embeddings" not in data:
            raise ValueError(f"unrecognized index file {path}")
        emb = data["embeddings"]
        emb = emb.numpy() if hasattr(emb, "numpy") else np.asarray(emb)
        image_paths = data.get("image_paths", data.get("image_path", []))
        texts = data.get("texts", data.get("text", []))
        return cls(emb, list(image_paths), list(texts))


# -- quantized-index persistence -------------------------------------------------


def save_index_q8(
    path: str,
    values,
    scales,
    image_paths: Optional[Sequence[str]] = None,
    texts: Optional[Sequence[str]] = None,
) -> None:
    """Persist an int8-quantized index (ops.retrieval_topk.quantize_index_int8
    output) as .npz + .json sidecar. At HBM scale the fp32 source may not fit
    anywhere to re-quantize from (16M rows = 32 GB fp32), so the quantized
    form is the durable artifact."""
    v = np.asarray(values)
    s = np.asarray(scales, np.float32)
    if v.dtype != np.int8 or v.ndim != 2 or s.shape != (v.shape[0], 1):
        raise ValueError(
            f"expected (N, D) int8 values + (N, 1) scales, got "
            f"{v.dtype}{v.shape} / {s.shape}"
        )
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, values=v, scales=s)
    side = path[:-4] if path.endswith(".npz") else path
    with open(side + ".json", "w") as f:
        json.dump(
            {"image_paths": list(image_paths or []), "texts": list(texts or [])},
            f, ensure_ascii=False,
        )


def load_index_q8(path: str):
    """Load a save_index_q8 artifact → (values (N, D) int8 device array,
    scales (N, 1) fp32 device array, image_paths, texts)."""
    npz = path if path.endswith(".npz") else path + ".npz"
    with np.load(npz) as data:
        values = jnp.asarray(data["values"])
        scales = jnp.asarray(data["scales"])
    side = npz[:-4] + ".json"
    image_paths: list = []
    texts: list = []
    if os.path.exists(side):
        with open(side) as f:
            meta = json.load(f)
        image_paths = meta.get("image_paths", [])
        texts = meta.get("texts", [])
    return values, scales, image_paths, texts
