"""YOLO object cropper — the region-extraction preprocessing stage.

Behavior parity with ref:src/preprocessing/yolo_cropper.py:18-170:
- predict with conf/iou/max_det from config (defaults 0.25/0.45/5);
- clamp boxes to image bounds (ref L111-115);
- save each crop as ``{stem}_crop_{idx}.jpg`` under ``save_dir`` (ref L117-122);
- **fall back to saving the full image as crop_0 when nothing detects**
  (ref L124-129);
- ``crop_folder`` batch variant (ref L133-170).

The detector is pluggable: a JAX YOLOv8 (models/yolo/yolov8.py) when weights
are available, else ``NullDetector`` (no detections → full-image fallback,
keeping the two-stage pipeline runnable end-to-end; the reference API itself
ships with YOLO disabled, ref:src/api/main.py:34).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional, Protocol, Sequence

from PIL import Image

from clip_lora_match_tpu.core.config import YoloConfig, load_yolo_config
from clip_lora_match_tpu.core.logging import get_logger

log = get_logger("yolo")


@dataclass
class Detection:
    box: tuple[float, float, float, float]  # xyxy in original image coords
    score: float
    class_id: int


class Detector(Protocol):
    def detect(
        self, image: Image.Image, conf: float, iou: float, max_det: int,
        classes: Optional[Sequence[int]] = None, agnostic: bool = False,
    ) -> list[Detection]: ...


class NullDetector:
    """Detects nothing — exercises the reference's full-image fallback."""

    def detect(self, image, conf, iou, max_det, classes=None, agnostic=False):
        return []


class YoloCropper:
    def __init__(
        self,
        detector: Optional[Detector] = None,
        config: Optional[YoloConfig] = None,
    ):
        self.cfg = config or YoloConfig()
        self.detector = detector or NullDetector()

    def _crop_path(self, image_path: str, idx: int, save_dir: Optional[str]) -> str:
        stem = os.path.splitext(os.path.basename(image_path))[0]
        name = self.cfg.filename_pattern.format(stem=stem, idx=idx)
        return os.path.join(save_dir or self.cfg.crop_save_dir, name)

    def crop_image(
        self, image_path: str, save_dir: Optional[str] = None
    ) -> list[str]:
        """→ list of saved crop paths; [full_image_as_crop_0] when no
        detections (ref L62-131)."""
        img = Image.open(image_path).convert("RGB")
        w, h = img.size
        detections = self.detector.detect(
            img,
            conf=self.cfg.conf_threshold,
            iou=self.cfg.iou_threshold,
            max_det=self.cfg.max_det,
            classes=self.cfg.classes,
            agnostic=self.cfg.agnostic_nms,
        )
        out_dir = save_dir or self.cfg.crop_save_dir
        os.makedirs(out_dir, exist_ok=True)
        paths: list[str] = []
        min_area = self.cfg.min_box_frac * w * h
        for idx, det in enumerate(detections):
            x1, y1, x2, y2 = det.box
            # clamp to bounds (ref L111-115)
            x1, y1 = max(0, int(x1)), max(0, int(y1))
            x2, y2 = min(w, int(x2)), min(h, int(y2))
            if x2 <= x1 or y2 <= y1:
                continue
            if (x2 - x1) * (y2 - y1) < min_area:
                # opt-in degenerate-crop guard (see YoloConfig.min_box_frac);
                # default 0.0 preserves reference behavior
                continue
            path = self._crop_path(image_path, idx, save_dir)
            img.crop((x1, y1, x2, y2)).save(path)
            paths.append(path)
        if not paths:  # full-image fallback (ref L124-129)
            path = self._crop_path(image_path, 0, save_dir)
            img.save(path)
            paths.append(path)
            log.info("no detections for %s; saved full image", image_path)
        return paths

    def crop_folder(
        self,
        folder: str,
        save_dir: Optional[str] = None,
        extensions: Sequence[str] = (".jpg", ".jpeg", ".png", ".webp"),
    ) -> dict[str, list[str]]:
        """Crop every image in a folder (ref L133-170)."""
        results: dict[str, list[str]] = {}
        for name in sorted(os.listdir(folder)):
            if os.path.splitext(name)[1].lower() not in extensions:
                continue
            path = os.path.join(folder, name)
            try:
                results[path] = self.crop_image(path, save_dir)
            except Exception as e:
                log.warning("crop failed for %s: %s", path, e)
                results[path] = []
        return results


# default weight locations probed in order when the config's weights_path is
# absent: the synthetic-corpus-trained checkpoints committed by
# scripts/train_yolo.py (the zero-egress stand-in for the reference's
# downloaded yolov8s, ref:models/yolo_model.py:20-39)
DEFAULT_WEIGHT_PATHS = (
    "models/yolo_synth/yolov8s_synth.npz",
    "models/yolo_synth/yolov8n_synth.npz",
)


def _repo_relative(path: str) -> str:
    """Resolve a default weight path against the package's repo root too, so
    croppers constructed from other working directories still find the
    committed weights."""
    if os.path.exists(path):
        return path
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
    return os.path.join(root, path)


def load_yolo_cropper(
    config_path: Optional[str] = None,
    weights_path: Optional[str] = None,
) -> YoloCropper:
    """Build a cropper; loads the JAX YOLOv8 detector from the first
    available weights (explicit arg → config path → committed synthetic
    checkpoints), else a NullDetector (full-image fallback path, like the
    reference running with YOLO disabled)."""
    cfg = load_yolo_config(config_path)
    candidates = [weights_path or cfg.weights_path]
    candidates += [_repo_relative(p) for p in DEFAULT_WEIGHT_PATHS]
    detector: Detector = NullDetector()
    for weights in candidates:
        if weights and os.path.exists(weights):
            try:
                from clip_lora_match_tpu.models.yolo.yolov8 import load_detector

                detector = load_detector(weights, cfg)
                log.info("YOLO detector loaded from %s", weights)
                break
            except Exception as e:
                log.warning("YOLO weights load failed at %s (%s)", weights, e)
    else:
        log.info(
            "no YOLO weights at %s; NullDetector (full-image crops)", candidates
        )
    return YoloCropper(detector, cfg)
