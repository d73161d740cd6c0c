"""Evaluate the trained JAX YOLOv8 detector against generator ground truth.

Metrics over boxes_val.csv (held-out images from
``generate_fashion_corpus.py --detect``):
- detection rate @ IoU 0.5 (recall): fraction of GT boxes matched by a
  detection with IoU >= 0.5;
- mean IoU of matched pairs;
- classification accuracy among matched pairs;
- precision: fraction of detections that match some GT at IoU >= 0.5.

The reference never evaluates its detector (it trusts pretrained
ultralytics, ref:models/yolo_model.py:20-39); this closes the loop for the
earned-from-scratch weights.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def box_iou_np(a, b):
    import numpy as np

    ix1 = max(a[0], b[0])
    iy1 = max(a[1], b[1])
    ix2 = min(a[2], b[2])
    iy2 = min(a[3], b[3])
    inter = max(0.0, ix2 - ix1) * max(0.0, iy2 - iy1)
    aa = max(0.0, a[2] - a[0]) * max(0.0, a[3] - a[1])
    bb = max(0.0, b[2] - b[0]) * max(0.0, b[3] - b[1])
    return inter / max(aa + bb - inter, 1e-9)


def evaluate(detector, csv_path, cfg, limit=None):
    from PIL import Image

    from clip_lora_match_tpu.models.yolo.train import load_detect_csv

    paths, boxes, cls, valid = load_detect_csv(csv_path)
    if limit:
        paths, boxes, cls, valid = (
            paths[:limit], boxes[:limit], cls[:limit], valid[:limit]
        )
    n_gt = n_matched = n_cls_ok = n_det = n_det_matched = 0
    iou_sum = 0.0
    for p, bs, cs, vs in zip(paths, boxes, cls, valid):
        img = Image.open(p).convert("RGB")
        dets = detector.detect(
            img, conf=cfg.conf_threshold, iou=cfg.iou_threshold,
            max_det=cfg.max_det,
        )
        n_det += len(dets)
        used = set()
        for b, c, v in zip(bs, cs, vs):
            if not v:
                continue
            n_gt += 1
            best, best_iou = None, 0.0
            for i, d in enumerate(dets):
                if i in used:
                    continue
                iou = box_iou_np(b, d.box)
                if iou > best_iou:
                    best, best_iou = i, iou
            if best is not None and best_iou >= 0.5:
                used.add(best)
                n_matched += 1
                iou_sum += best_iou
                n_cls_ok += int(dets[best].class_id == int(c))
        n_det_matched += len(used)
    return {
        "num_images": len(paths),
        "num_gt": n_gt,
        "recall@0.5": float(n_matched / max(n_gt, 1)),
        "mean_matched_iou": float(iou_sum / max(n_matched, 1)),
        "cls_accuracy": float(n_cls_ok / max(n_matched, 1)),
        "precision@0.5": float(n_det_matched / max(n_det, 1)),
        "detections": n_det,
    }


def main():
    p = argparse.ArgumentParser(description="Evaluate JAX YOLOv8 vs GT boxes")
    p.add_argument("--data", default="data/detect_synth")
    p.add_argument("--weights", default="models/yolo_synth/yolov8n_synth.npz")
    p.add_argument("--split", default="val")
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--out", default=None, help="optional JSON output path")
    args = p.parse_args()

    from clip_lora_match_tpu.core.config import YoloConfig
    from clip_lora_match_tpu.models.yolo.yolov8 import load_detector

    det = load_detector(args.weights, YoloConfig())
    metrics = evaluate(
        det, os.path.join(args.data, f"boxes_{args.split}.csv"), det.cfg,
        limit=args.limit,
    )
    print(json.dumps(metrics, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(metrics, f, indent=2)


if __name__ == "__main__":
    main()
