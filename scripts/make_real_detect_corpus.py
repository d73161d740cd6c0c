"""Build a real-image detection corpus from the hand-labeled reference photos.

VERDICT r3 #7: the synthetic-corpus detector was only ever scored against
programmatic ground truth. This script turns the hand-labeled boxes in
``data/real_labels/real_boxes.json`` (the reference's 7 reported photos +
3 custom item photos, ref:data/reported/images, labeled by visual
inspection this round) into a train/val pair for ``train_yolo.py``:

- **val** = the untouched original photos with their hand boxes — the honest
  target: letterboxed detection on real camera photos;
- **train** = N augmented variants per photo: random zoom windows around the
  object (box kept inside, GT recomputed exactly), horizontal flips, and
  brightness/contrast/color jitter, rendered at --imgsz.

Scope is per-item grounding (the lost-and-found use case: find THESE
reported items in query photos), not open-world detection — 10 photos
cannot teach the latter and we don't claim they do.
"""

import argparse
import json
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def augment_one(img, box, rng, imgsz):
    """One augmented variant: zoom window containing the box → resize to
    imgsz² (square stretch, same as DetectDataset's loader) → jitter.
    Returns (PIL image, (x1, y1, x2, y2)) in output coords."""
    from PIL import Image, ImageEnhance

    w, h = img.size
    x1, y1, x2, y2 = box
    bw, bh = x2 - x1, y2 - y1
    # window: the box plus random margins, clamped to the photo
    mx1 = rng.uniform(0.02, 0.6) * bw
    mx2 = rng.uniform(0.02, 0.6) * bw
    my1 = rng.uniform(0.02, 0.6) * bh
    my2 = rng.uniform(0.02, 0.6) * bh
    wx1 = max(0.0, x1 - mx1)
    wy1 = max(0.0, y1 - my1)
    wx2 = min(float(w), x2 + mx2)
    wy2 = min(float(h), y2 + my2)
    crop = img.crop((int(wx1), int(wy1), int(wx2), int(wy2)))
    cw, ch = crop.size
    # GT in window coords → output coords
    ox1 = (x1 - wx1) * imgsz / cw
    oy1 = (y1 - wy1) * imgsz / ch
    ox2 = (x2 - wx1) * imgsz / cw
    oy2 = (y2 - wy1) * imgsz / ch
    out = crop.resize((imgsz, imgsz), Image.Resampling.BILINEAR)
    if rng.random() < 0.5:
        out = out.transpose(Image.Transpose.FLIP_LEFT_RIGHT)
        ox1, ox2 = imgsz - ox2, imgsz - ox1
    for enh, lo, hi in (
        (ImageEnhance.Brightness, 0.7, 1.3),
        (ImageEnhance.Contrast, 0.75, 1.25),
        (ImageEnhance.Color, 0.6, 1.4),
    ):
        out = enh(out).enhance(rng.uniform(lo, hi))
    clamp = lambda v: max(0.0, min(float(imgsz), v))
    return out, (clamp(ox1), clamp(oy1), clamp(ox2), clamp(oy2))


def main():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--labels", default="data/real_labels/real_boxes.json")
    p.add_argument("--reference-root", default="/root/reference")
    p.add_argument("--out", default="data/real_detect")
    p.add_argument("--imgsz", type=int, default=320)
    p.add_argument("--per-image", type=int, default=200)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    from PIL import Image

    with open(args.labels) as f:
        labels = json.load(f)
    classes = labels["classes"]
    rng = random.Random(args.seed)

    img_dir = os.path.join(args.out, "images")
    os.makedirs(img_dir, exist_ok=True)
    with open(os.path.join(args.out, ".gitignore"), "w") as f:
        f.write("images/\n*.csv\n")
    with open(os.path.join(args.out, "classes.txt"), "w") as f:
        f.write("\n".join(classes) + "\n")

    train_rows, val_rows, n = [], [], 0
    for entry in labels["images"]:
        src = os.path.join(args.reference_root, entry["path"])
        img = Image.open(src).convert("RGB")
        assert img.size == (entry["width"], entry["height"]), entry["path"]
        b = entry["boxes"][0]
        cid = classes.index(b["class"])
        val_rows.append(
            f"{src},{' '.join(str(round(v, 1)) for v in b['xyxy'])} {cid}"
        )
        for _ in range(args.per_image):
            out, (ox1, oy1, ox2, oy2) = augment_one(
                img, b["xyxy"], rng, args.imgsz
            )
            pth = os.path.join(img_dir, f"{n:05d}.jpg")
            out.save(pth, quality=90)
            train_rows.append(
                f"{pth},{ox1:.1f} {oy1:.1f} {ox2:.1f} {oy2:.1f} {cid}"
            )
            n += 1

    rng.shuffle(train_rows)
    for name, rows in (("train", train_rows), ("val", val_rows)):
        csv_path = os.path.join(args.out, f"boxes_{name}.csv")
        with open(csv_path, "w") as f:
            f.write("image_path,boxes\n")
            f.write("\n".join(rows) + "\n")
        print(f"[real-detect] wrote {csv_path} ({len(rows)} rows)")


if __name__ == "__main__":
    main()
