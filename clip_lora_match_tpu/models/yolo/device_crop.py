"""Device-side batched crop + resize — detector boxes straight to CLIP input.

SURVEY §2.1 maps the reference's PIL crop loop (save file → reopen → resize,
ref:src/preprocessing/yolo_cropper.py:117-122 feeding
ref:src/embedding/embed_image.py) to "batched crop+resize feeding the embed
pipeline without host round-trip". This module does that: images stay on
device, each detector box is cropped and resampled to the CLIP input size by
``jax.image.scale_and_translate`` (cubic kernel — same family as the host
pipeline), then CLIP-normalized. One jit per (batch, output size).

The file-writing cropper (models/yolo/cropper.py) remains the
behavior-parity path (crop artifacts on disk, filename pattern); this is the
serving fast path used by ``crop_embed_pipeline``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from clip_lora_match_tpu.core.config import CLIP_IMAGE_MEAN, CLIP_IMAGE_STD


@functools.partial(jax.jit, static_argnames=("out_size", "antialias"))
def crop_resize_batch(
    images: jnp.ndarray,
    boxes: jnp.ndarray,
    out_size: int = 224,
    antialias: bool = True,
) -> jnp.ndarray:
    """Crop each image to its box and resize to (out_size, out_size).

    images: (B, H, W, 3) float in [0, 1];
    boxes:  (B, 4) xyxy in pixel coords (clamped by the caller or valid).
    Returns (B, out_size, out_size, 3).

    Uses scale_and_translate: output pixel grid maps onto the box region —
    scale = out/box_extent, translation = -x1·scale (the affine sending box
    corner to output origin).
    """
    B, H, W, C = images.shape

    def one(img, box):
        x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
        bw = jnp.maximum(x2 - x1, 1.0)
        bh = jnp.maximum(y2 - y1, 1.0)
        scale = jnp.stack([out_size / bh, out_size / bw])
        translation = jnp.stack([-y1 * out_size / bh, -x1 * out_size / bw])
        return jax.image.scale_and_translate(
            img,
            (out_size, out_size, C),
            (0, 1),
            scale,
            translation,
            method="cubic",
            antialias=antialias,
        )

    return jax.vmap(one)(images.astype(jnp.float32), boxes.astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("out_size",))
def crop_resize_normalize(
    images: jnp.ndarray, boxes: jnp.ndarray, out_size: int = 224
) -> jnp.ndarray:
    """crop_resize_batch + CLIP mean/std normalization (encoder-ready)."""
    crops = crop_resize_batch(images, boxes, out_size=out_size)
    mean = jnp.asarray(CLIP_IMAGE_MEAN, jnp.float32)
    std = jnp.asarray(CLIP_IMAGE_STD, jnp.float32)
    return (jnp.clip(crops, 0.0, 1.0) - mean) / std


def crop_embed_pipeline(
    detector, encoder, image, k_best: int = 1,
    conf: float = 0.25, iou: float = 0.45,
):
    """Two-stage serving fast path: detect → device crop → CLIP embed.

    image: PIL image. Returns (embeddings (n, D), detections list) where n =
    min(k_best, detections) or 1 with the full-image fallback (semantics of
    ref:seeker_service.py:121-138 — crop[0] on success, whole image on none).
    """
    import numpy as np

    from clip_lora_match_tpu.preprocess.image import preprocess_pil

    dets = detector.detect(
        image, conf=conf, iou=iou, max_det=max(k_best, 1)
    )
    if not dets:
        pix = preprocess_pil(image, image_size=encoder.arch.image_size)
        return encoder.encode_image_batch(pix[None]), []
    raw = np.asarray(image.convert("RGB"), np.float32)[None] / 255.0
    boxes = np.asarray([d.box for d in dets[:k_best]], np.float32)
    imgs = jnp.broadcast_to(
        jnp.asarray(raw), (boxes.shape[0],) + raw.shape[1:]
    )
    pix = crop_resize_normalize(
        imgs, jnp.asarray(boxes), out_size=encoder.arch.image_size
    )
    return encoder.encode_image_batch(np.asarray(pix)), dets[:k_best]
