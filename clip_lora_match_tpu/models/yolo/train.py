"""YOLOv8 detection training in JAX — the weights-earning path.

The reference never trains YOLO (it downloads a pretrained ultralytics
yolov8s, ref:models/yolo_model.py:20-39); zero egress makes that impossible
here, so the JAX port earns real weights by training on the synthetic
detection corpus whose ground-truth boxes are exact by construction
(scripts/generate_fashion_corpus.py --detect).

Implements the YOLOv8 training recipe as one jit-compiled train step:

- **Task-aligned assignment (TAL)**: per GT, candidate anchors are those
  whose center lies inside the box; alignment metric
  ``score^alpha * IoU^beta`` (alpha 0.5, beta 6.0 — the ultralytics
  defaults); top-k (10) candidates per GT become positives; anchors claimed
  by several GTs resolve to the highest-IoU one.
- **Losses** (ultralytics weighting box 7.5 / cls 0.5 / dfl 1.5):
  - cls: BCE over all anchors; positive targets are IoU-scaled
    (task-aligned soft labels), normalized by the summed target scores;
  - box: CIoU on positives;
  - dfl: distribution focal loss — cross-entropy of the ltrb distance
    (stride units) against its two adjacent integer bins.

Everything is static-shape: GT boxes arrive padded to ``max_boxes`` with a
validity mask, the assignment is dense (M, N) masked math — no dynamic
gather/scatter, XLA-friendly.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np
import optax

from clip_lora_match_tpu.models.yolo.yolov8 import REG_MAX, STRIDES, forward

Params = dict[str, Any]

# ultralytics defaults
TAL_ALPHA = 0.5
TAL_BETA = 6.0
TAL_TOPK = 10
W_BOX, W_CLS, W_DFL = 7.5, 0.5, 1.5


# ---------------------------------------------------------------------------
# geometry
# ---------------------------------------------------------------------------


def make_anchors(imgsz: int, strides=STRIDES) -> tuple[jnp.ndarray, jnp.ndarray]:
    """→ (anchor centers (N, 2) in pixels, stride per anchor (N,))."""
    pts, sts = [], []
    for s in strides:
        g = imgsz // s
        ys, xs = np.meshgrid(
            (np.arange(g) + 0.5) * s, (np.arange(g) + 0.5) * s, indexing="ij"
        )
        pts.append(np.stack([xs.reshape(-1), ys.reshape(-1)], -1))
        sts.append(np.full(g * g, s, np.float32))
    return jnp.asarray(np.concatenate(pts), jnp.float32), jnp.asarray(
        np.concatenate(sts)
    )


def plain_iou(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """(M, N) IoU, xyxy (assignment metric — no gradient needed)."""
    iw = jnp.maximum(
        jnp.minimum(pred[None, :, 2], gt[:, None, 2])
        - jnp.maximum(pred[None, :, 0], gt[:, None, 0]),
        0,
    )
    ih = jnp.maximum(
        jnp.minimum(pred[None, :, 3], gt[:, None, 3])
        - jnp.maximum(pred[None, :, 1], gt[:, None, 1]),
        0,
    )
    inter = iw * ih
    pa = jnp.maximum(pred[:, 2] - pred[:, 0], 0) * jnp.maximum(
        pred[:, 3] - pred[:, 1], 0
    )
    ga = jnp.maximum(gt[:, 2] - gt[:, 0], 0) * jnp.maximum(gt[:, 3] - gt[:, 1], 0)
    return inter / jnp.maximum(pa[None] + ga[:, None] - inter, 1e-9)


# ---------------------------------------------------------------------------
# task-aligned assignment (single image; vmapped over batch)
# ---------------------------------------------------------------------------


def assign_tal(
    pred_boxes: jnp.ndarray,   # (N, 4) xyxy pixels (decoded, stop-grad ok)
    pred_scores: jnp.ndarray,  # (N, C) sigmoid probs
    anchors: jnp.ndarray,      # (N, 2) centers
    gt_boxes: jnp.ndarray,     # (M, 4) xyxy, padded
    gt_cls: jnp.ndarray,       # (M,) int32
    gt_valid: jnp.ndarray,     # (M,) bool
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """→ (fg_mask (N,), assigned_gt (N,) int, target_score (N,),
    assigned_iou (N,)). target_score is the task-aligned soft label value
    for the assigned class."""
    M, N = gt_boxes.shape[0], anchors.shape[0]
    # candidates: anchor center strictly inside the GT box
    in_gt = (
        (anchors[None, :, 0] > gt_boxes[:, 0, None])
        & (anchors[None, :, 0] < gt_boxes[:, 2, None])
        & (anchors[None, :, 1] > gt_boxes[:, 1, None])
        & (anchors[None, :, 1] < gt_boxes[:, 3, None])
    ) & gt_valid[:, None]                                     # (M, N)
    iou = plain_iou(pred_boxes, gt_boxes)                     # (M, N)
    cls_score = jnp.take_along_axis(
        pred_scores.T, jnp.clip(gt_cls, 0, pred_scores.shape[1] - 1)[:, None], 0
    )  # pred_scores.T is (C, N); picks the GT class row → (M, N)
    metric = (cls_score**TAL_ALPHA) * (iou**TAL_BETA)
    metric = jnp.where(in_gt, metric, 0.0)
    # top-k per GT (dense masked form); strictly-positive metric only — the
    # kth value can be 0 when a GT has <k candidates, and a fixed epsilon
    # floor would drop real candidates early in training when IoU^6 is tiny
    k = min(TAL_TOPK, N)
    thresh = jax.lax.top_k(metric, k)[0][:, -1:]              # (M, 1) kth value
    is_topk = (metric >= thresh) & (metric > 0) & in_gt       # (M, N)
    # resolve multi-GT anchors by max IoU
    iou_masked = jnp.where(is_topk, iou, -1.0)
    assigned_gt = jnp.argmax(iou_masked, axis=0)              # (N,)
    fg = jnp.max(is_topk, axis=0)                             # (N,)
    best = jnp.take_along_axis(iou_masked, assigned_gt[None], 0)[0]
    fg = fg & (best >= 0)
    a_iou = jnp.take_along_axis(iou, assigned_gt[None], 0)[0]
    a_metric = jnp.take_along_axis(metric, assigned_gt[None], 0)[0]
    # normalize: per GT, scale so max metric anchor gets the GT's max IoU
    # (ultralytics norm_align_metric)
    pos_metric = jnp.where(is_topk, metric, 0.0)
    pos_iou = jnp.where(is_topk, iou, 0.0)
    gt_max_metric = jnp.max(pos_metric, axis=1, keepdims=True)  # (M, 1)
    gt_max_iou = jnp.max(pos_iou, axis=1, keepdims=True)
    norm = gt_max_iou / jnp.maximum(gt_max_metric, 1e-9)        # (M, 1)
    a_norm = norm[assigned_gt, 0]
    target_score = jnp.where(fg, a_metric * a_norm, 0.0)
    return fg, assigned_gt, target_score, jnp.where(fg, a_iou, 0.0)


# ---------------------------------------------------------------------------
# loss
# ---------------------------------------------------------------------------


def _decode_dense(level_outputs, anchors, strides_per_anchor):
    """Raw maps → (boxes (B, N, 4) pixels xyxy, cls_logits (B, N, C),
    dfl_logits (B, N, 4, REG_MAX)) — training-path decode that keeps logits."""
    regs, clss = [], []
    for reg, cls in level_outputs:
        B, H, W, _ = reg.shape
        regs.append(reg.reshape(B, H * W, 4, REG_MAX))
        clss.append(cls.reshape(B, H * W, cls.shape[-1]))
    dfl_logits = jnp.concatenate(regs, axis=1)
    cls_logits = jnp.concatenate(clss, axis=1)
    bins = jnp.arange(REG_MAX, dtype=jnp.float32)
    dist = jnp.sum(jax.nn.softmax(dfl_logits, axis=-1) * bins, axis=-1)  # (B,N,4)
    lt = anchors[None] - dist[..., :2] * strides_per_anchor[None, :, None]
    rb = anchors[None] + dist[..., 2:] * strides_per_anchor[None, :, None]
    return jnp.concatenate([lt, rb], axis=-1), cls_logits, dfl_logits


def detection_loss(
    params: Params,
    images: jnp.ndarray,      # (B, S, S, 3) in [0, 1]
    gt_boxes: jnp.ndarray,    # (B, M, 4) xyxy pixels (padded)
    gt_cls: jnp.ndarray,      # (B, M) int32
    gt_valid: jnp.ndarray,    # (B, M) bool
    anchors: jnp.ndarray,
    strides_per_anchor: jnp.ndarray,
) -> tuple[jnp.ndarray, dict]:
    outs = forward(params, images)
    boxes, cls_logits, dfl_logits = _decode_dense(outs, anchors, strides_per_anchor)
    probs = jax.nn.sigmoid(cls_logits)

    fg, a_gt, t_score, _ = jax.vmap(
        functools.partial(assign_tal, anchors=anchors)
    )(
        jax.lax.stop_gradient(boxes),
        jax.lax.stop_gradient(probs),
        gt_boxes=gt_boxes,
        gt_cls=gt_cls,
        gt_valid=gt_valid,
    )
    B, N, C = cls_logits.shape
    a_boxes = jnp.take_along_axis(gt_boxes, a_gt[..., None], axis=1)  # (B,N,4)
    a_cls = jnp.take_along_axis(gt_cls, a_gt, axis=1)                 # (B,N)

    # cls: BCE with task-aligned soft targets, normalized by target sum
    onehot = jax.nn.one_hot(a_cls, C, dtype=cls_logits.dtype)
    targets = onehot * t_score[..., None] * fg[..., None]
    per = optax.sigmoid_binary_cross_entropy(cls_logits, targets)
    norm = jnp.maximum(jnp.sum(t_score), 1.0)
    loss_cls = jnp.sum(per) / norm

    # box: CIoU on positives, weighted by target score
    ciou = _diag_ciou(boxes, a_boxes)
    w = t_score * fg
    loss_box = jnp.sum((1.0 - ciou) * w) / norm

    # dfl: ltrb distances in stride units vs adjacent-bin cross-entropy
    lt = (anchors[None] - a_boxes[..., :2]) / strides_per_anchor[None, :, None]
    rb = (a_boxes[..., 2:] - anchors[None]) / strides_per_anchor[None, :, None]
    dist = jnp.clip(
        jnp.concatenate([lt, rb], axis=-1), 0.0, REG_MAX - 1 - 1e-3
    )  # (B, N, 4)
    lo = jnp.floor(dist)
    hi = lo + 1
    wl = hi - dist
    logp = jax.nn.log_softmax(dfl_logits, axis=-1)  # (B, N, 4, REG_MAX)
    pick = lambda idx: jnp.take_along_axis(
        logp, idx.astype(jnp.int32)[..., None], axis=-1
    )[..., 0]
    ce = -(pick(lo) * wl + pick(jnp.minimum(hi, REG_MAX - 1)) * (1 - wl))
    loss_dfl = jnp.sum(jnp.mean(ce, axis=-1) * w) / norm

    total = W_BOX * loss_box + W_CLS * loss_cls + W_DFL * loss_dfl
    aux = {
        "loss": total,
        "box": loss_box,
        "cls": loss_cls,
        "dfl": loss_dfl,
        "num_fg": jnp.sum(fg) / B,
    }
    return total, aux


def _diag_ciou(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Elementwise CIoU over matched (B, N, 4) pred/GT pairs → (B, N)."""
    px1, py1, px2, py2 = [pred[..., i] for i in range(4)]
    gx1, gy1, gx2, gy2 = [gt[..., i] for i in range(4)]
    iw = jnp.maximum(jnp.minimum(px2, gx2) - jnp.maximum(px1, gx1), 0)
    ih = jnp.maximum(jnp.minimum(py2, gy2) - jnp.maximum(py1, gy1), 0)
    inter = iw * ih
    pa = jnp.maximum(px2 - px1, 0) * jnp.maximum(py2 - py1, 0)
    ga = jnp.maximum(gx2 - gx1, 0) * jnp.maximum(gy2 - gy1, 0)
    iou = inter / jnp.maximum(pa + ga - inter, 1e-9)
    cw = jnp.maximum(px2, gx2) - jnp.minimum(px1, gx1)
    ch = jnp.maximum(py2, gy2) - jnp.minimum(py1, gy1)
    c2 = cw**2 + ch**2 + 1e-9
    rho2 = ((px1 + px2 - gx1 - gx2) / 2) ** 2 + ((py1 + py2 - gy1 - gy2) / 2) ** 2
    pw, ph = jnp.maximum(px2 - px1, 1e-9), jnp.maximum(py2 - py1, 1e-9)
    gw, gh = jnp.maximum(gx2 - gx1, 1e-9), jnp.maximum(gy2 - gy1, 1e-9)
    v = (4 / jnp.pi**2) * (jnp.arctan(gw / gh) - jnp.arctan(pw / ph)) ** 2
    alpha = v / jnp.maximum(1 - iou + v, 1e-9)
    return iou - rho2 / c2 - jax.lax.stop_gradient(alpha) * v


# ---------------------------------------------------------------------------
# train step + loop
# ---------------------------------------------------------------------------


def init_detect_biases(params: Params, imgsz: int) -> Params:
    """Prior-bias init of the detect head (the ultralytics recipe): reg
    final-layer bias 1.0; cls final-layer bias log(5/nc/(imgsz/stride)²) so
    the initial objectness prior is ~5 objects/image — without it the BCE
    over every anchor×class starts at ~0.7 and dominates early training."""
    import math

    levels = params["head"]["levels"]
    for lv, stride in zip(levels, STRIDES):
        nc = lv["cv3"][2]["bias"].shape[0]
        lv["cv2"][2]["bias"] = jnp.ones_like(lv["cv2"][2]["bias"])
        lv["cv3"][2]["bias"] = jnp.full_like(
            lv["cv3"][2]["bias"], math.log(5 / nc / (imgsz / stride) ** 2)
        )
    return params


@jax.tree_util.register_dataclass
@dataclass
class YoloTrainState:
    params: Params
    opt_state: Any
    step: jnp.ndarray


def make_yolo_train_step(
    imgsz: int, tx: optax.GradientTransformation
) -> Callable[[YoloTrainState, dict], tuple[YoloTrainState, dict]]:
    anchors, strides_pa = make_anchors(imgsz)

    @jax.jit
    def _step(state: YoloTrainState, batch: dict):
        def loss_fn(p):
            return detection_loss(
                p,
                batch["images"].astype(jnp.float32) / 255.0,
                batch["boxes"],
                batch["classes"],
                batch["valid"],
                anchors,
                strides_pa,
            )

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            YoloTrainState(params, opt_state, state.step + 1),
            {**aux, "grad_norm": optax.global_norm(grads)},
        )

    return _step


def load_detect_csv(csv_path: str, max_boxes: int = 4):
    """boxes_{split}.csv → (paths, boxes (n, M, 4) f32, cls (n, M) i32,
    valid (n, M) bool)."""
    import csv as _csv

    paths, boxes, cls, valid = [], [], [], []
    with open(csv_path) as f:
        for row in _csv.DictReader(f):
            entries = [e for e in row["boxes"].split(";") if e.strip()]
            b = np.zeros((max_boxes, 4), np.float32)
            c = np.zeros((max_boxes,), np.int32)
            v = np.zeros((max_boxes,), bool)
            for i, e in enumerate(entries[:max_boxes]):
                x1, y1, x2, y2, k = e.split()
                b[i] = [float(x1), float(y1), float(x2), float(y2)]
                c[i] = int(k)
                v[i] = True
            paths.append(row["image_path"])
            boxes.append(b)
            cls.append(c)
            valid.append(v)
    return paths, np.stack(boxes), np.stack(cls), np.stack(valid)


class DetectDataset:
    """Whole-corpus-in-RAM detection dataset with hflip augmentation.

    At imgsz 320 the full 3k-image corpus is <1 GB of uint8 — decoding once
    and batching from RAM keeps the single host core from starving the TPU
    (CLAUDE.md: pytest/decode contention on the 1-core host)."""

    def __init__(self, csv_path: str, imgsz: int, max_boxes: int = 4):
        from PIL import Image

        self.imgsz = imgsz
        self.paths, self.boxes, self.cls, self.valid = load_detect_csv(
            csv_path, max_boxes
        )
        imgs = []
        for p in self.paths:
            im = Image.open(p).convert("RGB")
            if im.size != (imgsz, imgsz):
                im = im.resize((imgsz, imgsz), Image.Resampling.BILINEAR)
            imgs.append(np.asarray(im, np.uint8))
        self.images = np.stack(imgs)

    def __len__(self):
        return len(self.paths)

    def batches(
        self, batch_size: int, rng: np.random.Generator, hflip_p: float = 0.5
    ) -> Iterator[dict]:
        """One epoch of shuffled, static-shape batches (drop-last)."""
        order = rng.permutation(len(self.paths))
        S = self.imgsz
        for i in range(0, len(order) - batch_size + 1, batch_size):
            idx = order[i : i + batch_size]
            imgs = self.images[idx].copy()
            boxes = self.boxes[idx].copy()
            flip = rng.random(batch_size) < hflip_p
            imgs[flip] = imgs[flip, :, ::-1]
            x1 = boxes[flip, :, 0].copy()
            boxes[flip, :, 0] = S - boxes[flip, :, 2]
            boxes[flip, :, 2] = S - x1
            yield {
                "images": imgs,
                "boxes": boxes,
                "classes": self.cls[idx],
                "valid": self.valid[idx],
            }
