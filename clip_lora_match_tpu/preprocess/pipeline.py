"""Unified image+text preprocessor.

API mirror of the reference's ``ClipPreprocessor``
(ref:src/preprocessing/clip_preprocess.py:13-80): ``preprocess_image``,
``preprocess_text``, ``preprocess_pair`` — but backed by the from-scratch
tokenizer and numpy image pipeline, and emitting XLA-ready numpy batches
(static shapes: text always padded to 77, ref lines 51-57).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
from PIL import Image

from clip_lora_match_tpu.core.config import ClipConfig, load_clip_config
from clip_lora_match_tpu.preprocess.image import preprocess_image, preprocess_image_batch
from clip_lora_match_tpu.tokenizer import ClipTokenizer


class ClipPreprocessor:
    """Image+text preprocessing front-end for the CLIP encoders."""

    def __init__(
        self,
        config_path: Optional[str] = None,
        config: Optional[ClipConfig] = None,
        tokenizer: Optional[ClipTokenizer] = None,
    ):
        self.cfg = config or load_clip_config(config_path)
        self.pre = self.cfg.preprocess
        self.tokenizer = tokenizer or ClipTokenizer.from_dir(
            self.cfg.tokenizer_dir, max_length=self.pre.max_text_length
        )

    def preprocess_image(self, img: str | Image.Image) -> np.ndarray:
        """→ (1, H, W, 3) float32 (batch-of-one, like ref L35-44's (1,3,H,W))."""
        return preprocess_image(img, self.pre)[None]

    def preprocess_images(self, imgs: Sequence[str | Image.Image]) -> np.ndarray:
        # all-path batches route through the native C++ loader when built
        # (JPEG decode + resample in native threads; PIL fallback per-row)
        if imgs and all(isinstance(i, str) for i in imgs):
            from clip_lora_match_tpu.data.native_loader import (
                native_available,
                preprocess_image_batch_native,
            )

            if native_available():
                return preprocess_image_batch_native(list(imgs), self.pre)
        return preprocess_image_batch(imgs, self.pre)

    def preprocess_text(self, text: str | Sequence[str]) -> dict[str, np.ndarray]:
        """→ {"input_ids": (B,77), "attention_mask": (B,77)} — always padded to
        max length for uniform batching (ref L46-58)."""
        return self.tokenizer(
            text,
            max_length=self.pre.max_text_length,
            pad_to_max=True,
            truncate=self.pre.truncate,
        )

    def preprocess_pair(
        self, img: str | Image.Image, text: str
    ) -> dict[str, np.ndarray]:
        """→ {"pixel_values": (1,H,W,3), "input_ids": (1,77), "attention_mask": (1,77)}
        (ref L60-80)."""
        out = self.preprocess_text(text)
        out["pixel_values"] = self.preprocess_image(img)
        return out
