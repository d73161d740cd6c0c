"""YOLOv8 detector tests: NMS behavior, decode math, architecture shapes,
cropper semantics (clamp / filename pattern / full-image fallback), and the
two-stage crop→embed→search pipeline."""

import os

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from clip_lora_match_tpu.core.config import YoloConfig
from clip_lora_match_tpu.models.yolo import YoloCropper, decode_boxes, nms_fixed
from clip_lora_match_tpu.models.yolo.cropper import Detection, NullDetector
from clip_lora_match_tpu.models.yolo.postprocess import box_iou
from clip_lora_match_tpu.models.yolo import yolov8


def test_box_iou():
    a = jnp.asarray([[0, 0, 10, 10]], jnp.float32)
    b = jnp.asarray([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]], jnp.float32)
    iou = np.asarray(box_iou(a, b))[0]
    assert iou[0] == pytest.approx(1.0)
    assert iou[1] == pytest.approx(25 / 175, abs=1e-5)
    assert iou[2] == 0.0


def test_nms_suppresses_overlaps_and_sorts():
    boxes = jnp.asarray(
        [[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60], [0, 0, 9, 9]],
        jnp.float32,
    )
    scores = jnp.asarray([0.9, 0.8, 0.7, 0.3], jnp.float32)
    classes = jnp.zeros(4, jnp.int32)
    b, s, c, v = nms_fixed(boxes, scores, classes, 0.25, 0.45, max_det=5)
    v = np.asarray(v)
    assert v.sum() == 2  # overlapping 0.8 and 0.3 suppressed
    assert np.asarray(s)[0] == pytest.approx(0.9)
    assert np.asarray(s)[1] == pytest.approx(0.7)
    # static shapes regardless of how many survive
    assert b.shape == (5, 4) and s.shape == (5,)


def test_nms_class_aware_vs_agnostic():
    boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 11, 11]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8], jnp.float32)
    classes = jnp.asarray([0, 1], jnp.int32)
    _, _, _, v1 = nms_fixed(boxes, scores, classes, 0.25, 0.45, max_det=4)
    assert np.asarray(v1).sum() == 2  # different classes → both kept
    _, _, _, v2 = nms_fixed(
        boxes, scores, classes, 0.25, 0.45, max_det=4, agnostic=True
    )
    assert np.asarray(v2).sum() == 1


def test_cropper_min_box_frac_guard(tmp_path):
    """min_box_frac drops degenerate tiny boxes (opt-in; 0.0 default keeps
    the reference's crop-everything behavior)."""
    rng = np.random.default_rng(0)
    src = tmp_path / "img.jpg"
    Image.fromarray(
        rng.integers(0, 255, (100, 100, 3), dtype=np.uint8), "RGB"
    ).save(src)

    class TinyAndBig:
        def detect(self, image, conf, iou, max_det, classes=None, agnostic=False):
            return [
                Detection((0.0, 0.0, 3.0, 3.0), 0.9, 0),     # 9 px² — degenerate
                Detection((10.0, 10.0, 60.0, 60.0), 0.8, 0),  # 25% of image
            ]

    base = dict(crop_save_dir=str(tmp_path / "c"))
    paths = YoloCropper(TinyAndBig(), YoloConfig(**base)).crop_image(str(src))
    assert len(paths) == 2  # default: reference parity, everything cropped
    paths = YoloCropper(
        TinyAndBig(), YoloConfig(min_box_frac=0.01, **base)
    ).crop_image(str(src))
    assert len(paths) == 1
    assert Image.open(paths[0]).size == (50, 50)


def test_decode_boxes():
    xywh = jnp.asarray([[10, 20, 4, 6]], jnp.float32)
    xyxy = np.asarray(decode_boxes(xywh))[0]
    np.testing.assert_allclose(xyxy, [8, 17, 12, 23])


def test_dfl_decode_math():
    """A reg map concentrated on bin b must decode to distance b*stride."""
    H = W = 2
    reg = np.full((1, H, W, 4 * yolov8.REG_MAX), -20.0, np.float32)
    target_bins = [3, 5, 2, 7]  # l, t, r, b
    for d, bin_idx in enumerate(target_bins):
        reg[..., d * yolov8.REG_MAX + bin_idx] = 20.0
    cls = np.zeros((1, H, W, yolov8.NUM_CLASSES), np.float32)
    boxes, probs = yolov8.decode_predictions(
        [(jnp.asarray(reg), jnp.asarray(cls))], strides=(8,)
    )
    boxes = np.asarray(boxes)[0]
    # cell (0,0): anchor (0.5, 0.5): x1 = (0.5-3)*8, y1 = (0.5-5)*8 ...
    np.testing.assert_allclose(
        boxes[0], [(0.5 - 3) * 8, (0.5 - 5) * 8, (0.5 + 2) * 8, (0.5 + 7) * 8],
        atol=1e-3,
    )
    assert probs.shape == (1, H * W, yolov8.NUM_CLASSES)


@pytest.mark.slow
@pytest.mark.slow
def test_yolov8_forward_shapes():
    params = yolov8.init_params(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 320, 320, 3), jnp.float32)
    outs = yolov8.forward(params, x)
    assert len(outs) == 3
    for (reg, cls), stride in zip(outs, yolov8.STRIDES):
        hw = 320 // stride
        assert reg.shape == (1, hw, hw, 4 * yolov8.REG_MAX)
        assert cls.shape == (1, hw, hw, yolov8.NUM_CLASSES)
    boxes, probs = yolov8.decode_predictions(outs)
    n = sum((320 // s) ** 2 for s in yolov8.STRIDES)
    assert boxes.shape == (1, n, 4) and probs.shape == (1, n, yolov8.NUM_CLASSES)


def test_letterbox_geometry():
    img = Image.new("RGB", (320, 160), (255, 0, 0))
    arr, scale, (px, py) = yolov8.letterbox(img, 640)
    assert arr.shape == (640, 640, 3)
    assert scale == pytest.approx(2.0)
    assert (px, py) == (0, 160)
    # padding rows are gray 114
    assert arr[0, 0, 0] == pytest.approx(114 / 255, abs=1e-3)
    assert arr[320, 320, 0] == pytest.approx(1.0)


class _FixedDetector:
    def __init__(self, dets):
        self.dets = dets

    def detect(self, image, conf, iou, max_det, classes=None, agnostic=False):
        return self.dets


@pytest.fixture()
def sample_image(tmp_path):
    p = tmp_path / "scene.jpg"
    arr = np.zeros((100, 200, 3), np.uint8)
    arr[20:80, 50:150] = [200, 30, 30]
    Image.fromarray(arr, "RGB").save(p)
    return str(p)


def test_cropper_saves_crops_with_pattern(sample_image, tmp_path):
    dets = [
        Detection((50, 20, 150, 80), 0.9, 0),
        Detection((-10, -10, 500, 500), 0.5, 1),  # clamps to bounds
    ]
    cropper = YoloCropper(
        _FixedDetector(dets), YoloConfig(crop_save_dir=str(tmp_path / "crops"))
    )
    paths = cropper.crop_image(sample_image)
    assert [os.path.basename(p) for p in paths] == [
        "scene_crop_0.jpg", "scene_crop_1.jpg",
    ]
    assert Image.open(paths[0]).size == (100, 60)
    assert Image.open(paths[1]).size == (200, 100)  # clamped to full image


def test_cropper_full_image_fallback(sample_image, tmp_path):
    cropper = YoloCropper(
        NullDetector(), YoloConfig(crop_save_dir=str(tmp_path / "crops"))
    )
    paths = cropper.crop_image(sample_image)
    assert len(paths) == 1 and paths[0].endswith("scene_crop_0.jpg")
    assert Image.open(paths[0]).size == (200, 100)


def test_crop_folder(tmp_path):
    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(3):
        Image.new("RGB", (30, 30)).save(d / f"{i}.jpg")
    (d / "not_an_image.txt").write_text("x")
    cropper = YoloCropper(
        NullDetector(), YoloConfig(crop_save_dir=str(tmp_path / "crops"))
    )
    results = cropper.crop_folder(str(d))
    assert len(results) == 3
    assert all(len(v) == 1 for v in results.values())


def test_two_stage_crop_then_search(sample_image, tmp_path):
    """demo_search_image_yolo_custom path: crop → embed → search."""
    from tests.test_index_retrieval import TINY
    from clip_lora_match_tpu.core.config import ClipConfig, PreprocessConfig
    from clip_lora_match_tpu.models import clip as jclip
    from clip_lora_match_tpu.models.encoder import ClipEncoder
    from clip_lora_match_tpu.index.store import EmbeddingIndex
    from clip_lora_match_tpu.retrieval import SearchIndex

    enc = ClipEncoder(
        jclip.init_params(jax.random.PRNGKey(0), TINY), arch=TINY,
        config=ClipConfig(arch=TINY, preprocess=PreprocessConfig(image_size=32)),
    )
    cropper = YoloCropper(
        _FixedDetector([Detection((50, 20, 150, 80), 0.9, 0)]),
        YoloConfig(crop_save_dir=str(tmp_path / "crops")),
    )
    crops = cropper.crop_image(sample_image)
    emb = enc.encode_image(crops[0])
    index = EmbeddingIndex(dim=TINY.projection_dim)
    index.append(emb, image_path=sample_image, text="red box item")
    res = SearchIndex(index, enc).search_by_image(crops[0], k=1)
    assert res[0].score == pytest.approx(1.0, abs=1e-4)
