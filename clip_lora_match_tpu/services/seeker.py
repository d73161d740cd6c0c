"""SeekerService — the search (read) path.

Behavior parity with ref:src/embedding/seeker_service.py:49-186:
- multimodal query: text-only / image-only / both;
- fusion = w_text·t + w_img·i then renormalize, defaults 0.5/0.5 (ref L87-157);
- optional YOLO crop of the query image, using crop[0], falling back to the
  original image on any crop error (ref L121-138);
- raises when neither text nor image is given.

TPU-native fix: the reference reloads the whole .pt index from disk on EVERY
search (ref L183). Here the index stays device-resident; when finder and
seeker share a process they share the same EmbeddingIndex object, and a
cross-process freshness check reloads only when the index file's mtime moves.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional

import numpy as np

from clip_lora_match_tpu.core.logging import get_logger
from clip_lora_match_tpu.index.store import EmbeddingIndex
from clip_lora_match_tpu.models.encoder import ClipEncoder
from clip_lora_match_tpu.retrieval.search import SearchIndex, SearchResult

log = get_logger("seeker")


@dataclass
class SeekerConfig:
    """Mirrors ref:src/embedding/seeker_service.py:16-33."""

    index_path: str = "data/index/custom_items_index.npz"
    top_k: int = 5
    text_weight: float = 0.5
    image_weight: float = 0.5
    use_yolo_crop: bool = False
    # serving fast path: detector box → device-side crop+resize+normalize →
    # encoder, skipping the reference's crop-file → reopen → preprocess disk
    # round trip (ref:seeker_service.py:121-146 + yolo_cropper.py:117-122).
    # Embeddings match the disk path within resample tolerance
    # (tests/test_device_crop.py); disk mode stays the behavior-parity
    # default and the fallback whenever the cropper has no live detector.
    use_device_crop: bool = False
    watch_index_file: bool = True
    # "int8": serve searches from the quantized index (SearchIndex
    # quantize="int8" — half/quarter HBM, int8 MXU pass 1; selection exact
    # over quantized scores). The quantized artifact is cached on the
    # service's SearchIndex and re-built only when the row count changes
    # (finder appends / reloads), so steady-state searches pay nothing.
    index_quantize: str = "none"


class SeekerService:
    def __init__(
        self,
        encoder: ClipEncoder,
        config: Optional[SeekerConfig] = None,
        cropper=None,
        index: Optional[EmbeddingIndex] = None,
    ):
        self.cfg = config or SeekerConfig()
        self.encoder = encoder
        self.cropper = cropper if self.cfg.use_yolo_crop else None
        self._shared_index = index is not None
        self.index = (
            index
            if index is not None
            else EmbeddingIndex.load(self.cfg.index_path)
        )
        self._mtime = self._index_mtime()
        # persistent search front-end: keeps the q8 artifact (and any future
        # per-index caches) alive across searches instead of rebuilding per
        # query like the per-call construction the reference implies
        self._search = SearchIndex(
            self.index, self.encoder, quantize=self.cfg.index_quantize
        )

    def _index_mtime(self) -> float:
        path = self.cfg.index_path
        npz = path if path.endswith((".npz", ".pt")) else path + ".npz"
        try:
            return os.path.getmtime(npz)
        except OSError:
            return 0.0

    def _maybe_reload(self) -> None:
        """Cross-process freshness: reload only when the file changed (the
        reference reloaded unconditionally per query, ref L183)."""
        if self._shared_index or not self.cfg.watch_index_file:
            return
        m = self._index_mtime()
        if m > self._mtime:
            self.index = EmbeddingIndex.load(self.cfg.index_path)
            self._mtime = m
            self._search = SearchIndex(
                self.index, self.encoder, quantize=self.cfg.index_quantize
            )
            log.info("reloaded index (%d rows)", len(self.index))

    def _device_crop_embed(self, image_path: str) -> Optional[np.ndarray]:
        """Device-side detect → crop → embed (no crop-file round trip).
        Returns None to signal the caller to take the disk-parity path
        (no live detector, or any failure — matching the reference's
        fall-back-to-original semantics, ref L137-138)."""
        from clip_lora_match_tpu.models.yolo.cropper import NullDetector

        detector = getattr(self.cropper, "detector", None)
        if detector is None or isinstance(detector, NullDetector):
            return None
        try:
            from PIL import Image

            from clip_lora_match_tpu.models.yolo.device_crop import (
                crop_embed_pipeline,
            )

            img = Image.open(image_path).convert("RGB")
            emb, _ = crop_embed_pipeline(
                detector, self.encoder, img, k_best=1,
                conf=self.cropper.cfg.conf_threshold,
                iou=self.cropper.cfg.iou_threshold,
            )
            return np.asarray(emb[0])
        except Exception as e:
            log.warning("device crop failed (%s); disk-path fallback", e)
            return None

    def _build_query_embedding(
        self,
        description: Optional[str],
        image_path: Optional[str],
    ) -> np.ndarray:
        """ref:seeker_service.py:84-157."""
        if not description and not image_path:
            raise ValueError("provide a description, an image, or both")
        text_emb = image_emb = None
        if description:
            text_emb = self.encoder.encode_text(description)
        if image_path:
            emb = None
            if self.cropper is not None and self.cfg.use_device_crop:
                emb = self._device_crop_embed(image_path)
            if emb is not None:
                image_emb = emb
            else:
                query_img = image_path
                if self.cropper is not None:
                    try:
                        crops = self.cropper.crop_image(image_path)
                        if crops:
                            query_img = crops[0]  # crop[0] like ref L129
                    except Exception as e:  # fall back to original (ref L137-138)
                        log.warning("query crop failed (%s); using original", e)
                image_emb = self.encoder.encode_image(query_img)
        if text_emb is None:
            return image_emb
        if image_emb is None:
            return text_emb
        fused = self.cfg.text_weight * text_emb + self.cfg.image_weight * image_emb
        norm = np.linalg.norm(fused)
        return fused / max(norm, 1e-12)

    def search_items(
        self,
        description: Optional[str] = None,
        image_path: Optional[str] = None,
        k: Optional[int] = None,
    ) -> list[SearchResult]:
        """ref:seeker_service.py:159-186."""
        self._maybe_reload()
        # explicit k=0 means "no results, thanks" — `k or default` would
        # silently turn it into the default
        k = self.cfg.top_k if k is None else k
        if k < 0:
            raise ValueError(f"top_k must be >= 0, got {k}")
        if k == 0:
            return []
        query = self._build_query_embedding(description, image_path)
        return self._search.search_with_embedding(query, k)
