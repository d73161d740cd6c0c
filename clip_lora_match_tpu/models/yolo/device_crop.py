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


def make_fused_search(
    detector,
    encoder,
    index: "jnp.ndarray",
    k: int = 5,
    conf: float = 0.25,
    iou: float = 0.45,
):
    """ONE-dispatch two-stage search: detect → NMS → device crop → CLIP
    embed → fused top-k, all inside a single jit program.

    The staged pipeline (detector.detect → python Detection list →
    crop_embed_pipeline → topk) crosses host↔device 7-9 times per query;
    through the axon relay each crossing costs a full RTT, measured ~297 ms
    per query end-to-end. Fusing the whole read path into one program
    leaves ONE dispatch + ONE readback regardless of relay latency — and on
    a co-located TPU VM it is simply the minimal program.

    Semantics match the staged path: highest-confidence box, or the full
    image when nothing detects (ref:seeker_service.py:121-138's crop[0] /
    fallback behavior), letterbox geometry identical to
    ``yolov8.letterbox``.

    Returns ``search(image_u8: (H, W, 3) uint8 np.ndarray) ->
    (scores (k,), ids (k,), box_xyxy (4,), detected: bool)``; one compile
    per distinct input geometry.
    """
    import functools

    import numpy as np

    from clip_lora_match_tpu.models import clip as clip_model
    from clip_lora_match_tpu.models.yolo import yolov8
    from clip_lora_match_tpu.models.yolo.postprocess import nms_fixed
    from clip_lora_match_tpu.ops.retrieval_topk import (
        topk_retrieve_auto,
        topk_retrieve_reference,
    )

    use_kernel = jax.default_backend() == "tpu"
    det_size = detector.cfg.imgsz
    arch = encoder.arch
    det_params = detector._params_c
    clip_params = encoder.params
    lora = encoder.lora

    @functools.partial(jax.jit, static_argnames=("H", "W"))
    def _search(det_params, clip_params, lora, index, img_u8, H, W):
        img = img_u8.astype(jnp.float32) / 255.0  # (H, W, 3)
        # device letterbox (geometry mirrors yolov8.letterbox)
        scale = min(det_size / W, det_size / H)
        nw, nh = int(round(W * scale)), int(round(H * scale))
        px, py = (det_size - nw) // 2, (det_size - nh) // 2
        resized = jax.image.resize(img, (nh, nw, 3), method="bilinear")
        canvas = jnp.full((det_size, det_size, 3), 114.0 / 255.0, jnp.float32)
        canvas = jax.lax.dynamic_update_slice(canvas, resized, (py, px, 0))
        outs = yolov8.forward(
            det_params, canvas[None].astype(detector.compute_dtype)
        )
        boxes, probs = yolov8.decode_predictions(outs)
        scores = jnp.max(probs, axis=-1)[0]
        classes = jnp.argmax(probs, axis=-1)[0].astype(jnp.int32)
        b, s, c, valid = nms_fixed(
            boxes[0], scores, classes, conf, iou,
            max_det=detector.cfg.max_det,
        )
        detected = valid[0]
        # best box back to original coords, clamped; full image on no-detect
        bb = (b[0] - jnp.asarray([px, py, px, py], jnp.float32)) / scale
        bb = jnp.clip(bb, 0.0, jnp.asarray([W, H, W, H], jnp.float32))
        bb = jnp.where(detected, bb, jnp.asarray([0.0, 0.0, W, H]))
        pix = crop_resize_normalize(
            img[None], bb[None], out_size=arch.image_size
        )
        feats = clip_model.encode_image_features(
            clip_params, pix, arch,
            lora=lora, lora_scaling=encoder.lora_scaling,
            compute_dtype=encoder.compute_dtype,
        )
        q = clip_model.l2_normalize(feats).astype(jnp.float32)
        if use_kernel:
            top_s, top_i = topk_retrieve_auto(q, index, k)
        else:  # CPU (tests): jnp oracle — Pallas needs interpret mode there
            top_s, top_i = topk_retrieve_reference(q, index, k)
        return top_s[0], top_i[0], bb, detected

    def search(image_u8: "np.ndarray"):
        H, W = int(image_u8.shape[0]), int(image_u8.shape[1])
        s, i, bb, det = _search(
            det_params, clip_params, lora, index, jnp.asarray(image_u8), H, W
        )
        return (
            np.asarray(s), np.asarray(i), np.asarray(bb), bool(det)
        )

    return search


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
