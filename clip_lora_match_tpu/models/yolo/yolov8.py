"""From-scratch JAX YOLOv8-s detector (backbone + PAN neck + decoupled head).

Replaces the reference's ``ultralytics.YOLO`` dependency
(ref:models/yolo_model.py:20-39) with a functional JAX implementation of the
published YOLOv8 architecture at the -s scale (depth 0.33, width 0.50):

- backbone: Conv(3→32,s2) → Conv(s2) → C2f ×{1,2,2,1} over P2..P5 → SPPF;
- neck: top-down + bottom-up PAN with C2f fusion blocks;
- head: anchor-free decoupled reg(DFL, 16 bins)/cls branches at strides
  8/16/32;
- decode: DFL softmax-expectation → ltrb distances from grid anchors;
- NMS: static-shape masked suppression (postprocess.nms_fixed).

All convs run NHWC (TPU-native layout) with BatchNorm FOLDED into conv
weights at conversion time (inference-only detector — the reference never
trains YOLO either). The converter consumes ultralytics state_dict key names
(``model.{i}.conv.weight`` / ``model.{i}.bn.*`` …) from an .npz export so
real yolov8s weights drop in without the ultralytics package.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from clip_lora_match_tpu.core.config import YoloConfig
from clip_lora_match_tpu.models.yolo.cropper import Detection
from clip_lora_match_tpu.models.yolo.postprocess import nms_fixed

Params = dict[str, Any]

# YOLOv8-s geometry
WIDTHS = {"P1": 32, "P2": 64, "P3": 128, "P4": 256, "P5": 512}
DEPTHS = {"c2f_2": 1, "c2f_4": 2, "c2f_6": 2, "c2f_8": 1, "neck": 1}
REG_MAX = 16
NUM_CLASSES = 80
STRIDES = (8, 16, 32)


def silu(x):
    return x * jax.nn.sigmoid(x)


def conv(p: Params, x: jnp.ndarray, stride: int = 1) -> jnp.ndarray:
    """Fused Conv(+folded BN)+SiLU. kernel (kh, kw, cin, cout), NHWC."""
    kh = p["kernel"].shape[0]
    pad = kh // 2
    y = jax.lax.conv_general_dilated(
        x,
        p["kernel"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return silu(y + p["bias"].astype(x.dtype))


def conv_plain(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """1x1/3x3 conv + bias, NO activation (detect head final layers)."""
    kh = p["kernel"].shape[0]
    pad = kh // 2
    y = jax.lax.conv_general_dilated(
        x,
        p["kernel"].astype(x.dtype),
        window_strides=(1, 1),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["bias"].astype(x.dtype)


def bottleneck(p: Params, x: jnp.ndarray, shortcut: bool) -> jnp.ndarray:
    y = conv(p["cv2"], conv(p["cv1"], x))
    return x + y if shortcut else y


def _mlist(p: Params) -> list:
    """Bottleneck list; tolerates the numbered-dict form produced by
    round-tripping through models/io flat .npz archives."""
    m = p["m"]
    if isinstance(m, dict):
        return [m[k] for k in sorted(m, key=int)]
    return m


def c2f(p: Params, x: jnp.ndarray, shortcut: bool) -> jnp.ndarray:
    """Cross-stage partial with n bottlenecks; splits cv1 output in two and
    concatenates every intermediate."""
    y = conv(p["cv1"], x)
    a, b = jnp.split(y, 2, axis=-1)
    outs = [a, b]
    for bp in _mlist(p):
        outs.append(bottleneck(bp, outs[-1], shortcut))
    return conv(p["cv2"], jnp.concatenate(outs, axis=-1))


def sppf(p: Params, x: jnp.ndarray, k: int = 5) -> jnp.ndarray:
    y = conv(p["cv1"], x)
    pool = lambda v: jax.lax.reduce_window(
        v, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, 1, 1, 1),
        [(0, 0), (k // 2, k // 2), (k // 2, k // 2), (0, 0)],
    )
    p1 = pool(y)
    p2 = pool(p1)
    p3 = pool(p2)
    return conv(p["cv2"], jnp.concatenate([y, p1, p2, p3], axis=-1))


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    B, H, W, C = x.shape
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def detect_head(p: Params, feats: Sequence[jnp.ndarray]) -> list[tuple[jnp.ndarray, jnp.ndarray]]:
    """Per level: (reg (B,H,W,4*REG_MAX), cls (B,H,W,NC)) raw outputs."""
    levels = p["levels"]
    if isinstance(levels, dict):  # npz round-trip form
        levels = [levels[k] for k in sorted(levels, key=int)]
    outs = []
    for level, x in enumerate(feats):
        pl = levels[level]
        cv2 = pl["cv2"] if not isinstance(pl["cv2"], dict) else [
            pl["cv2"][k] for k in sorted(pl["cv2"], key=int)
        ]
        cv3 = pl["cv3"] if not isinstance(pl["cv3"], dict) else [
            pl["cv3"][k] for k in sorted(pl["cv3"], key=int)
        ]
        reg = conv_plain(cv2[2], conv(cv2[1], conv(cv2[0], x)))
        cls = conv_plain(cv3[2], conv(cv3[1], conv(cv3[0], x)))
        outs.append((reg, cls))
    return outs


def forward(params: Params, images: jnp.ndarray) -> list[tuple[jnp.ndarray, jnp.ndarray]]:
    """(B, H, W, 3) normalized [0,1] → per-level (reg, cls) raw maps."""
    b = params["backbone"]
    x = conv(b["0"], images, 2)            # P1/2
    x = conv(b["1"], x, 2)                 # P2/4
    x = c2f(b["2"], x, True)
    x = conv(b["3"], x, 2)                 # P3/8
    p3 = c2f(b["4"], x, True)
    x = conv(b["5"], p3, 2)                # P4/16
    p4 = c2f(b["6"], x, True)
    x = conv(b["7"], p4, 2)                # P5/32
    x = c2f(b["8"], x, True)
    p5 = sppf(b["9"], x)

    n = params["neck"]
    u4 = jnp.concatenate([upsample2x(p5), p4], axis=-1)
    t4 = c2f(n["12"], u4, False)
    u3 = jnp.concatenate([upsample2x(t4), p3], axis=-1)
    t3 = c2f(n["15"], u3, False)           # → stride 8 feature
    d4 = jnp.concatenate([conv(n["16"], t3, 2), t4], axis=-1)
    o4 = c2f(n["18"], d4, False)           # → stride 16
    d5 = jnp.concatenate([conv(n["19"], o4, 2), p5], axis=-1)
    o5 = c2f(n["21"], d5, False)           # → stride 32

    return detect_head(params["head"], (t3, o4, o5))


def decode_predictions(
    level_outputs: Sequence[tuple[jnp.ndarray, jnp.ndarray]],
    strides: Sequence[int] = STRIDES,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Raw maps → (boxes (B, N, 4) xyxy in input pixels, cls_probs (B, N, NC)).

    DFL: softmax over REG_MAX bins, expectation = distance in stride units;
    anchors at cell centers (+0.5).
    """
    all_boxes, all_probs = [], []
    bins = jnp.arange(REG_MAX, dtype=jnp.float32)
    for (reg, cls), stride in zip(level_outputs, strides):
        B, H, W, _ = reg.shape
        dist = reg.reshape(B, H * W, 4, REG_MAX)
        dist = jnp.sum(jax.nn.softmax(dist, axis=-1) * bins, axis=-1)  # (B,HW,4) ltrb
        ys, xs = jnp.meshgrid(
            jnp.arange(H, dtype=jnp.float32) + 0.5,
            jnp.arange(W, dtype=jnp.float32) + 0.5,
            indexing="ij",
        )
        anchors = jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1)  # (HW, 2)
        lt, rb = dist[..., :2], dist[..., 2:]
        x1y1 = (anchors[None] - lt) * stride
        x2y2 = (anchors[None] + rb) * stride
        all_boxes.append(jnp.concatenate([x1y1, x2y2], axis=-1))
        all_probs.append(jax.nn.sigmoid(cls.reshape(B, H * W, -1)))
    return jnp.concatenate(all_boxes, axis=1), jnp.concatenate(all_probs, axis=1)


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------


def _init_conv(key, kh, cin, cout):
    bound = 1.0 / np.sqrt(kh * kh * cin)
    k1, _ = jax.random.split(key)
    return {
        "kernel": jax.random.uniform(k1, (kh, kh, cin, cout), jnp.float32, -bound, bound),
        "bias": jnp.zeros((cout,), jnp.float32),
    }


def _init_bottleneck(key, c):
    k1, k2 = jax.random.split(key)
    return {"cv1": _init_conv(k1, 3, c, c), "cv2": _init_conv(k2, 3, c, c)}


def _init_c2f(key, cin, cout, n):
    half = cout // 2
    ks = jax.random.split(key, n + 2)
    return {
        "cv1": _init_conv(ks[0], 1, cin, cout),
        "m": [_init_bottleneck(ks[2 + i], half) for i in range(n)],
        "cv2": _init_conv(ks[1], 1, (2 + n) * half, cout),
    }


# width plan for the -n scale (width_mult 0.25 vs -s 0.50); same depth plan.
# An honest scaled VARIANT of the same architecture for the synthetic-corpus
# detector (ref runs -s; -n capacity is ample for the 10-class shape corpus
# and keeps the committed weights small)
WIDTHS_N = {"P1": 16, "P2": 32, "P3": 64, "P4": 128, "P5": 256}


def init_params(
    key: jax.Array,
    widths: Optional[dict] = None,
    depths: Optional[dict] = None,
    num_classes: int = NUM_CLASSES,
) -> Params:
    """Random-init YOLOv8 param tree. Defaults to the exact -s channel plan;
    pass ``widths=WIDTHS_N`` / ``num_classes=10`` for the synthetic-corpus
    variant. ``forward`` is shape-agnostic (reads all geometry from the
    param tree), so any consistent plan works."""
    ks = iter(jax.random.split(key, 64))
    W = dict(widths or WIDTHS)
    DEPTHS_ = dict(depths or DEPTHS)
    backbone = {
        "0": _init_conv(next(ks), 3, 3, W["P1"]),
        "1": _init_conv(next(ks), 3, W["P1"], W["P2"]),
        "2": _init_c2f(next(ks), W["P2"], W["P2"], DEPTHS_["c2f_2"]),
        "3": _init_conv(next(ks), 3, W["P2"], W["P3"]),
        "4": _init_c2f(next(ks), W["P3"], W["P3"], DEPTHS_["c2f_4"]),
        "5": _init_conv(next(ks), 3, W["P3"], W["P4"]),
        "6": _init_c2f(next(ks), W["P4"], W["P4"], DEPTHS_["c2f_6"]),
        "7": _init_conv(next(ks), 3, W["P4"], W["P5"]),
        "8": _init_c2f(next(ks), W["P5"], W["P5"], DEPTHS_["c2f_8"]),
        "9": {
            "cv1": _init_conv(next(ks), 1, W["P5"], W["P5"] // 2),
            "cv2": _init_conv(next(ks), 1, W["P5"] * 2, W["P5"]),
        },
    }
    neck = {
        "12": _init_c2f(next(ks), W["P5"] + W["P4"], W["P4"], DEPTHS_["neck"]),
        "15": _init_c2f(next(ks), W["P4"] + W["P3"], W["P3"], DEPTHS_["neck"]),
        "16": _init_conv(next(ks), 3, W["P3"], W["P3"]),
        "18": _init_c2f(next(ks), W["P3"] + W["P4"], W["P4"], DEPTHS_["neck"]),
        "19": _init_conv(next(ks), 3, W["P4"], W["P4"]),
        "21": _init_c2f(next(ks), W["P4"] + W["P5"], W["P5"], DEPTHS_["neck"]),
    }
    # head channel plan (ultralytics Detect):
    # c2 = max(16, ch0//4, 4*REG_MAX); c3 = max(ch0, min(nc, 100))
    c2 = max(16, W["P3"] // 4, 4 * REG_MAX)
    c3 = max(W["P3"], min(num_classes, 100))
    levels = []
    for ch in (W["P3"], W["P4"], W["P5"]):
        levels.append(
            {
                "cv2": [
                    _init_conv(next(ks), 3, ch, c2),
                    _init_conv(next(ks), 3, c2, c2),
                    _init_conv(next(ks), 1, c2, 4 * REG_MAX),
                ],
                "cv3": [
                    _init_conv(next(ks), 3, ch, c3),
                    _init_conv(next(ks), 3, c3, c3),
                    _init_conv(next(ks), 1, c3, num_classes),
                ],
            }
        )
    return {"backbone": backbone, "neck": neck, "head": {"levels": levels}}


# ---------------------------------------------------------------------------
# ultralytics state_dict conversion (BN folding)
# ---------------------------------------------------------------------------


def _fold_bn(conv_w, gamma, beta, mean, var, eps=1e-3):
    """Conv(no-bias)+BN → fused conv kernel/bias. conv_w torch layout
    (cout, cin, kh, kw) → (kh, kw, cin, cout)."""
    scale = gamma / np.sqrt(var + eps)
    w = conv_w * scale[:, None, None, None]
    bias = beta - mean * scale
    return np.transpose(w, (2, 3, 1, 0)), bias


def convert_ultralytics_state_dict(sd: dict) -> Params:
    """Flat ultralytics ``model.{i}...`` arrays → our param tree.

    Accepts numpy arrays (e.g. from an .npz export of the torch state_dict).
    Detect head biases/weights without BN pass through directly.
    """
    sd = {k.replace("model.model.", "model."): np.asarray(v) for k, v in sd.items()}

    def fused(prefix):
        return dict(
            zip(
                ("kernel", "bias"),
                _fold_bn(
                    sd[f"{prefix}.conv.weight"],
                    sd[f"{prefix}.bn.weight"],
                    sd[f"{prefix}.bn.bias"],
                    sd[f"{prefix}.bn.running_mean"],
                    sd[f"{prefix}.bn.running_var"],
                ),
            )
        )

    def plain(prefix):
        w = sd[f"{prefix}.weight"]
        return {
            "kernel": np.transpose(w, (2, 3, 1, 0)),
            "bias": sd.get(f"{prefix}.bias", np.zeros(w.shape[0], np.float32)),
        }

    def conv_block(i):
        return fused(f"model.{i}")

    def c2f_block(i, n):
        return {
            "cv1": fused(f"model.{i}.cv1"),
            "cv2": fused(f"model.{i}.cv2"),
            "m": [
                {
                    "cv1": fused(f"model.{i}.m.{j}.cv1"),
                    "cv2": fused(f"model.{i}.m.{j}.cv2"),
                }
                for j in range(n)
            ],
        }

    backbone = {
        "0": conv_block(0),
        "1": conv_block(1),
        "2": c2f_block(2, DEPTHS["c2f_2"]),
        "3": conv_block(3),
        "4": c2f_block(4, DEPTHS["c2f_4"]),
        "5": conv_block(5),
        "6": c2f_block(6, DEPTHS["c2f_6"]),
        "7": conv_block(7),
        "8": c2f_block(8, DEPTHS["c2f_8"]),
        "9": {"cv1": fused("model.9.cv1"), "cv2": fused("model.9.cv2")},
    }
    neck = {
        "12": c2f_block(12, DEPTHS["neck"]),
        "15": c2f_block(15, DEPTHS["neck"]),
        "16": conv_block(16),
        "18": c2f_block(18, DEPTHS["neck"]),
        "19": conv_block(19),
        "21": c2f_block(21, DEPTHS["neck"]),
    }
    levels = []
    for lv in range(3):
        levels.append(
            {
                "cv2": [
                    fused(f"model.22.cv2.{lv}.0"),
                    fused(f"model.22.cv2.{lv}.1"),
                    plain(f"model.22.cv2.{lv}.2"),
                ],
                "cv3": [
                    fused(f"model.22.cv3.{lv}.0"),
                    fused(f"model.22.cv3.{lv}.1"),
                    plain(f"model.22.cv3.{lv}.2"),
                ],
            }
        )
    return {"backbone": backbone, "neck": neck, "head": {"levels": levels}}


# ---------------------------------------------------------------------------
# Detector wrapper (letterbox preprocessing + jit inference + NMS)
# ---------------------------------------------------------------------------


def letterbox(img: Image.Image, size: int = 640) -> tuple[np.ndarray, float, tuple[int, int]]:
    """Aspect-preserving resize onto a (size, size) gray canvas.
    Returns (array [0,1], scale, (pad_x, pad_y))."""
    w, h = img.size
    scale = min(size / w, size / h)
    nw, nh = int(round(w * scale)), int(round(h * scale))
    resized = img.resize((nw, nh), Image.Resampling.BILINEAR)
    canvas = Image.new("RGB", (size, size), (114, 114, 114))
    px, py = (size - nw) // 2, (size - nh) // 2
    canvas.paste(resized, (px, py))
    arr = np.asarray(canvas, dtype=np.float32) / 255.0
    return arr, scale, (px, py)


class YoloV8Detector:
    """Detector-protocol implementation backed by the JAX model.

    ``compute_dtype``: inference precision for the conv stack. Defaults to
    bf16 on TPU (measured +20-25% detect throughput at 640², B=16-32 on
    v5e: 1,422 → 1,712 and 1,461 → 1,830 img/s, interleaved median-of-5;
    box deltas vs fp32 are sub-pixel) and fp32 elsewhere."""

    def __init__(
        self,
        params: Params,
        cfg: Optional[YoloConfig] = None,
        compute_dtype=None,
    ):
        self.params = params
        self.cfg = cfg or YoloConfig()
        if compute_dtype is None:
            compute_dtype = (
                jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
            )
        self.compute_dtype = jnp.dtype(compute_dtype)
        self._params_c = (
            params
            if self.compute_dtype == jnp.float32
            else jax.tree.map(
                lambda x: jnp.asarray(x).astype(self.compute_dtype), params
            )
        )

        @functools.partial(jax.jit, static_argnames=("max_det", "agnostic"))
        def _infer(params, images, conf, iou, max_det, agnostic):
            outs = forward(params, images.astype(self.compute_dtype))
            boxes, probs = decode_predictions(outs)
            scores = jnp.max(probs, axis=-1)
            classes = jnp.argmax(probs, axis=-1).astype(jnp.int32)
            return jax.vmap(
                lambda b, s, c: nms_fixed(
                    b, s, c, conf, iou, max_det=max_det, agnostic=agnostic
                )
            )(boxes, scores, classes)

        self._infer = _infer

    def detect(
        self, image: Image.Image, conf: float, iou: float, max_det: int,
        classes=None, agnostic: bool = False,
    ) -> list[Detection]:
        size = self.cfg.imgsz
        arr, scale, (px, py) = letterbox(image, size)
        boxes, scores, cls_ids, valid = self._infer(
            self._params_c, jnp.asarray(arr[None]), conf, iou, max_det, agnostic
        )
        boxes = np.asarray(boxes[0])
        scores = np.asarray(scores[0])
        cls_ids = np.asarray(cls_ids[0])
        valid = np.asarray(valid[0])
        w, h = image.size
        out = []
        for b, s, c, v in zip(boxes, scores, cls_ids, valid):
            if not v:
                continue
            if classes is not None and int(c) not in classes:
                continue
            x1 = (b[0] - px) / scale
            y1 = (b[1] - py) / scale
            x2 = (b[2] - px) / scale
            y2 = (b[3] - py) / scale
            x1, y1 = max(0.0, x1), max(0.0, y1)
            x2, y2 = min(float(w), x2), min(float(h), y2)
            if x2 > x1 and y2 > y1:
                out.append(Detection((x1, y1, x2, y2), float(s), int(c)))
        return out


def load_detector(weights_path: str, cfg: Optional[YoloConfig] = None) -> YoloV8Detector:
    """Load from an .npz of ultralytics state_dict arrays, or a native .npz
    param tree (models/io format; fp16 storage upcast to fp32 for compute).

    A ``meta.json`` sidecar (written by scripts/train_yolo.py) next to the
    weights overrides the config's imgsz so inference letterboxes to the
    trained resolution."""
    import json

    from clip_lora_match_tpu.models.io import unflatten_params

    with np.load(weights_path) as data:
        keys = list(data.files)
        flat = {k: np.asarray(data[k], np.float32) for k in keys}
    if any(k.startswith("model.") for k in keys):
        params = convert_ultralytics_state_dict(flat)
    else:
        params = unflatten_params(flat)
    meta = os.path.join(os.path.dirname(weights_path), "meta.json")
    if os.path.exists(meta):
        with open(meta) as f:
            imgsz = json.load(f).get("imgsz")
        if imgsz:
            import dataclasses

            cfg = dataclasses.replace(cfg or YoloConfig(), imgsz=int(imgsz))
    return YoloV8Detector(params, cfg)
