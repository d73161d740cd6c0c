"""Leave-photos-out detector evaluation on the real labeled photos
(VERDICT r4 next-step #4).

The r4 `models/yolo_real` number (recall@0.5 = 0.7) was train-on-test: the
detector was fine-tuned on augmented variants of the SAME 10 photos it was
scored on. This script produces the honest read: K deterministic folds over
the UNIQUE photos (the duplicated kaca_mata_pink_gk_1.jpg entry — present in
both data/reported and data/custom — is grouped as one photo so its twin
never leaks into train), each fold fine-tuning from the synth weights on
augmented variants of the in-fold photos only and evaluating on the held-out
untouched originals. Every unique photo is held out exactly once; the pooled
metrics over all held-out photos are the committed number.

    python scripts/eval_real_detect_heldout.py \
        --out results/real_detect_eval_heldout.json

Scope stays per-item-class grounding (bag/glasses/shoe on lost-and-found
photos); 9 unique photos cannot teach open-world detection and we don't
claim they do. Ref capability: the reference's COCO-pretrained yolov8s crops
arbitrary items out of the box (ref:models/yolo_model.py:20-39,
ref:src/preprocessing/yolo_cropper.py:62-131).
"""

import argparse
import json
import os
import random
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from make_real_detect_corpus import augment_one  # noqa: E402


def unique_photos(labels):
    """Group label entries by file basename → list of (key, entries)."""
    groups = {}
    for entry in labels["images"]:
        groups.setdefault(os.path.basename(entry["path"]), []).append(entry)
    return sorted(groups.items())


def make_folds(keys_with_classes, n_folds=3, seed=0):
    """Deterministic stratified folds: shuffle within class, deal round-robin
    so each fold's holdout mixes classes."""
    byc = {}
    for key, cls in keys_with_classes:
        byc.setdefault(cls, []).append(key)
    rng = random.Random(seed)
    folds = [[] for _ in range(n_folds)]
    i = 0
    for cls in sorted(byc):
        ks = sorted(byc[cls])
        rng.shuffle(ks)
        for k in ks:
            folds[i % n_folds].append(k)
            i += 1
    return folds


def main():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--labels", default="data/real_labels/real_boxes.json")
    p.add_argument("--reference-root", default="/root/reference")
    p.add_argument("--init-weights", default="models/yolo_synth/yolov8n_synth.npz")
    p.add_argument("--out", default="results/real_detect_eval_heldout.json")
    p.add_argument("--imgsz", type=int, default=320)
    p.add_argument("--per-image", type=int, default=200)
    p.add_argument("--epochs", type=int, default=8)
    p.add_argument("--folds", type=int, default=3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--workdir", default=None, help="fold corpora dir (tmp)")
    args = p.parse_args()

    from PIL import Image

    with open(args.labels) as f:
        labels = json.load(f)
    classes = labels["classes"]
    photos = unique_photos(labels)
    folds = make_folds(
        [(k, es[0]["boxes"][0]["class"]) for k, es in photos],
        n_folds=args.folds, seed=args.seed,
    )
    print(f"[heldout] {len(photos)} unique photos "
          f"({len(labels['images'])} label entries), folds: {folds}")

    work = args.workdir or tempfile.mkdtemp(prefix="clm_heldout_")
    totals = dict(num_images=0, num_gt=0, matched=0, iou_sum=0.0, cls_ok=0,
                  det=0, det_matched=0)
    per_fold = []
    for fi, holdout in enumerate(folds):
        fold_dir = os.path.join(work, f"fold{fi}")
        img_dir = os.path.join(fold_dir, "images")
        os.makedirs(img_dir, exist_ok=True)
        with open(os.path.join(fold_dir, "classes.txt"), "w") as f:
            f.write("\n".join(classes) + "\n")
        rng = random.Random(args.seed + fi)
        train_rows, val_rows, n = [], [], 0
        for key, entries in photos:
            entry = entries[0]
            src = os.path.join(args.reference_root, entry["path"])
            b = entry["boxes"][0]
            cid = classes.index(b["class"])
            if key in holdout:
                val_rows.append(
                    f"{src},{' '.join(str(round(v, 1)) for v in b['xyxy'])} {cid}"
                )
                continue
            img = Image.open(src).convert("RGB")
            for _ in range(args.per_image):
                out, (x1, y1, x2, y2) = augment_one(
                    img, b["xyxy"], rng, args.imgsz
                )
                pth = os.path.join(img_dir, f"{n:05d}.jpg")
                out.save(pth, quality=90)
                train_rows.append(f"{pth},{x1:.1f} {y1:.1f} {x2:.1f} {y2:.1f} {cid}")
                n += 1
        rng.shuffle(train_rows)
        for name, rows in (("train", train_rows), ("val", val_rows)):
            with open(os.path.join(fold_dir, f"boxes_{name}.csv"), "w") as f:
                f.write("image_path,boxes\n" + "\n".join(rows) + "\n")

        out_dir = os.path.join(fold_dir, "weights")
        cmd = [
            sys.executable, "scripts/train_yolo.py",
            "--data", fold_dir, "--out", out_dir,
            "--imgsz", str(args.imgsz), "--epochs", str(args.epochs),
            "--init-weights", args.init_weights,
            "--tag", f"heldout{fi}", "--seed", str(args.seed),
        ]
        print(f"[heldout] fold {fi}: train on {len(train_rows)} variants of "
              f"{len(photos) - len(holdout)} photos, hold out {holdout}")
        subprocess.run(cmd, check=True)

        from clip_lora_match_tpu.core.config import YoloConfig
        from clip_lora_match_tpu.models.yolo.yolov8 import load_detector

        from eval_yolo import evaluate

        det = load_detector(
            os.path.join(out_dir, f"yolov8n_heldout{fi}.npz"), YoloConfig()
        )
        m = evaluate(det, os.path.join(fold_dir, "boxes_val.csv"), det.cfg)
        m["holdout"] = holdout
        per_fold.append(m)
        print(f"[heldout] fold {fi}: {json.dumps(m)}")
        totals["num_images"] += m["num_images"]
        totals["num_gt"] += m["num_gt"]
        totals["matched"] += round(m["recall@0.5"] * m["num_gt"])
        totals["iou_sum"] += m["mean_matched_iou"] * round(
            m["recall@0.5"] * m["num_gt"]
        )
        totals["cls_ok"] += round(
            m["cls_accuracy"] * m["recall@0.5"] * m["num_gt"]
        )
        totals["det"] += m["detections"]
        totals["det_matched"] += round(m["precision@0.5"] * m["detections"])

    pooled = {
        "protocol": (
            "leave-photos-out over unique photos (duplicate file grouped); "
            f"{args.folds} folds, fine-tune from synth weights on augmented "
            "variants of in-fold photos only, eval on held-out originals"
        ),
        "num_unique_photos": len(photos),
        "num_images": totals["num_images"],
        "num_gt": totals["num_gt"],
        "recall@0.5": totals["matched"] / max(totals["num_gt"], 1),
        "mean_matched_iou": totals["iou_sum"] / max(totals["matched"], 1),
        "cls_accuracy": totals["cls_ok"] / max(totals["matched"], 1),
        "precision@0.5": totals["det_matched"] / max(totals["det"], 1),
        "detections": totals["det"],
        "folds": per_fold,
        "epochs": args.epochs,
        "per_image_variants": args.per_image,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(pooled, f, indent=2)
    print(f"[heldout] pooled: recall@0.5 {pooled['recall@0.5']:.2f}, "
          f"precision {pooled['precision@0.5']:.2f}, "
          f"cls {pooled['cls_accuracy']:.2f} -> {args.out}")


if __name__ == "__main__":
    main()
