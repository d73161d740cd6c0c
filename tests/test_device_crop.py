"""Device-side crop+resize vs the host PIL pipeline, and the two-stage
detect→crop→embed fast path."""

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from clip_lora_match_tpu.models.yolo.cropper import Detection
from clip_lora_match_tpu.models.yolo.device_crop import (
    crop_embed_pipeline,
    crop_resize_batch,
    crop_resize_normalize,
)
from tests.test_index_retrieval import TINY, tiny_encoder  # noqa: F401


def test_identity_box_is_resize():
    """Box == full image ⇒ pure resize; compare vs PIL bicubic resize."""
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)
    img = arr.astype(np.float32) / 255.0
    out = np.asarray(
        crop_resize_batch(
            jnp.asarray(img[None]), jnp.asarray([[0, 0, 96, 64]], np.float32),
            out_size=32,
        )
    )[0]
    pil = (
        np.asarray(
            Image.fromarray(arr, "RGB").resize((32, 32), Image.Resampling.BICUBIC),
            dtype=np.float32,
        )
        / 255.0
    )
    # different-but-related cubic resamplers: close, not bit-equal
    assert np.abs(out - pil).mean() < 0.02
    assert out.shape == (32, 32, 3)


def test_crop_region_content():
    """Cropping a solid-color region must return that color."""
    img = np.zeros((100, 100, 3), np.float32)
    img[20:60, 30:80] = [0.8, 0.2, 0.4]
    out = np.asarray(
        crop_resize_batch(
            jnp.asarray(img[None]),
            jnp.asarray([[30, 20, 80, 60]], np.float32),
            out_size=16,
        )
    )[0]
    center = out[4:12, 4:12]
    np.testing.assert_allclose(
        center.mean(axis=(0, 1)), [0.8, 0.2, 0.4], atol=0.05
    )


def test_batched_boxes_differ():
    rng = np.random.default_rng(1)
    img = rng.random((50, 50, 3)).astype(np.float32)
    imgs = jnp.asarray(np.stack([img, img]))
    boxes = jnp.asarray([[0, 0, 25, 25], [25, 25, 50, 50]], np.float32)
    out = np.asarray(crop_resize_batch(imgs, boxes, out_size=16))
    assert out.shape == (2, 16, 16, 3)
    assert np.abs(out[0] - out[1]).mean() > 0.01


def test_normalize_matches_constants():
    img = np.full((40, 40, 3), 0.5, np.float32)
    out = np.asarray(
        crop_resize_normalize(
            jnp.asarray(img[None]), jnp.asarray([[0, 0, 40, 40]], np.float32),
            out_size=8,
        )
    )[0]
    from clip_lora_match_tpu.core.config import CLIP_IMAGE_MEAN, CLIP_IMAGE_STD

    expected = (0.5 - np.asarray(CLIP_IMAGE_MEAN)) / np.asarray(CLIP_IMAGE_STD)
    np.testing.assert_allclose(out[4, 4], expected, atol=1e-3)


class _OneBox:
    def detect(self, image, conf, iou, max_det, classes=None, agnostic=False):
        w, h = image.size
        return [Detection((w * 0.25, h * 0.25, w * 0.75, h * 0.75), 0.9, 0)]


class _NoBox:
    def detect(self, *a, **k):
        return []


def test_crop_embed_pipeline(tiny_encoder):  # noqa: F811
    rng = np.random.default_rng(2)
    image = Image.fromarray(
        rng.integers(0, 255, (80, 120, 3), dtype=np.uint8), "RGB"
    )
    emb, dets = crop_embed_pipeline(_OneBox(), tiny_encoder, image)
    assert emb.shape == (1, TINY.projection_dim) and len(dets) == 1
    assert np.linalg.norm(emb[0]) == pytest.approx(1.0, abs=1e-4)
    # full-image fallback on zero detections
    emb2, dets2 = crop_embed_pipeline(_NoBox(), tiny_encoder, image)
    assert emb2.shape == (1, TINY.projection_dim) and dets2 == []
