from clip_lora_match_tpu.preprocess.image import (
    preprocess_image,
    preprocess_image_batch,
    preprocess_pil,
)
from clip_lora_match_tpu.preprocess.pipeline import ClipPreprocessor
from clip_lora_match_tpu.preprocess.augment import ImageAugmenter, default_augmenter

__all__ = [
    "preprocess_image",
    "preprocess_image_batch",
    "preprocess_pil",
    "ClipPreprocessor",
    "ImageAugmenter",
    "default_augmenter",
]
