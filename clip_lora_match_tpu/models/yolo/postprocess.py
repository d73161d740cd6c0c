"""Detector box post-processing under jit: decode + fixed-size NMS.

The reference delegates to ultralytics' dynamic-shape NMS
(ref:src/preprocessing/yolo_cropper.py:83-92: conf=0.25, iou=0.45, max_det=5).
XLA requires static shapes, so NMS here is the standard O(max_det·N) masked
suppression loop producing EXACTLY ``max_det`` slots with a validity mask —
padded, sorted, jit-compilable (SURVEY §7: "NMS under jit (fixed max_det
padding)").
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """IoU matrix between (N, 4) and (M, 4) xyxy boxes."""
    area_a = jnp.maximum(a[:, 2] - a[:, 0], 0) * jnp.maximum(a[:, 3] - a[:, 1], 0)
    area_b = jnp.maximum(b[:, 2] - b[:, 0], 0) * jnp.maximum(b[:, 3] - b[:, 1], 0)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


@partial(jax.jit, static_argnames=("max_det", "agnostic"))
def nms_fixed(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    classes: jnp.ndarray,
    conf_threshold: float = 0.25,
    iou_threshold: float = 0.45,
    max_det: int = 5,
    agnostic: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Greedy NMS with static output shapes.

    boxes (N, 4) xyxy, scores (N,), classes (N,) int32 →
    (boxes (max_det, 4), scores (max_det,), classes (max_det,), valid (max_det,) bool),
    sorted by descending score; invalid slots zeroed.
    """
    scores = jnp.where(scores >= conf_threshold, scores, 0.0)
    # Greedy NMS needs only the SELECTED boxes' IoU rows — max_det·N work.
    # The full (N, N) IoU matrix is ~282 MB at N=8400 and dominated the whole
    # detect path (measured 35 of 43 ms at B=16 on v5e before this fix).
    area = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0) * jnp.maximum(
        boxes[:, 3] - boxes[:, 1], 0
    )

    def pick_one(carry, _):
        live_scores, = carry
        best = jnp.argmax(live_scores)
        best_score = live_scores[best]
        keep = best_score > 0.0
        bb = boxes[best]
        lt = jnp.maximum(boxes[:, :2], bb[:2])
        rb = jnp.minimum(boxes[:, 2:], bb[2:])
        wh = jnp.maximum(rb - lt, 0)
        inter = wh[:, 0] * wh[:, 1]
        iou_row = inter / jnp.maximum(area + area[best] - inter, 1e-9)
        # suppress overlapping boxes of the same class (and self)
        suppress = iou_row >= iou_threshold
        if not agnostic:
            suppress = suppress & (classes == classes[best])
        live_scores = jnp.where(suppress, 0.0, live_scores)
        live_scores = live_scores.at[best].set(0.0)
        return (live_scores,), (best, best_score, keep)

    (_,), (idx, kept_scores, valid) = jax.lax.scan(
        pick_one, (scores,), None, length=max_det
    )
    out_boxes = jnp.where(valid[:, None], boxes[idx], 0.0)
    out_scores = jnp.where(valid, kept_scores, 0.0)
    out_classes = jnp.where(valid, classes[idx], -1)
    return out_boxes, out_scores, out_classes, valid


def decode_boxes(xywh: jnp.ndarray) -> jnp.ndarray:
    """(N, 4) center-xywh → xyxy."""
    cx, cy, w, h = xywh[:, 0], xywh[:, 1], xywh[:, 2], xywh[:, 3]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=1)


def clamp_boxes(boxes: jnp.ndarray, width: int, height: int) -> jnp.ndarray:
    """Clamp xyxy to image bounds (ref:yolo_cropper.py:111-115)."""
    return jnp.stack(
        [
            jnp.clip(boxes[:, 0], 0, width),
            jnp.clip(boxes[:, 1], 0, height),
            jnp.clip(boxes[:, 2], 0, width),
            jnp.clip(boxes[:, 3], 0, height),
        ],
        axis=1,
    )
