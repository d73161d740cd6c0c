"""Dataset prep from the Kaggle fashion catalogue
(ref:scripts/build_fashion_csv.py:13-95): caption template
"{productDisplayName}, {baseColour} {articleType} for {gender}, category
{masterCategory}/{subCategory}", filter to existing images, 90/10 split with
seed 42."""

import argparse
import csv
import os
import random


def build_caption(row: dict) -> str:
    """ref:build_fashion_csv.py:58-66 template."""
    return (
        f"{row.get('productDisplayName', '')}, "
        f"{row.get('baseColour', '')} {row.get('articleType', '')} "
        f"for {row.get('gender', '')}, "
        f"category {row.get('masterCategory', '')}/{row.get('subCategory', '')}"
    )


def main():
    p = argparse.ArgumentParser(description="Build train/val fashion CSVs")
    p.add_argument("--styles-csv", default="data/external/fashion/styles.csv")
    p.add_argument("--images-dir", default="data/external/fashion/images")
    p.add_argument("--out-train", default="data/text/train_fashion.csv")
    p.add_argument("--out-val", default="data/text/val_fashion.csv")
    p.add_argument("--val-frac", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args()

    rows = []
    with open(args.styles_csv, newline="", encoding="utf-8", errors="replace") as f:
        for row in csv.DictReader(f):
            img = os.path.join(args.images_dir, f"{row.get('id', '')}.jpg")
            if os.path.exists(img):
                rows.append({"image_path": img, "text": build_caption(row)})
    random.Random(args.seed).shuffle(rows)
    n_val = int(len(rows) * args.val_frac)
    splits = {args.out_val: rows[:n_val], args.out_train: rows[n_val:]}
    for out, split in splits.items():
        os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
        with open(out, "w", newline="", encoding="utf-8") as f:
            w = csv.DictWriter(f, fieldnames=["image_path", "text"])
            w.writeheader()
            w.writerows(split)
        print(f"[build_fashion_csv] {len(split)} rows -> {out}")


if __name__ == "__main__":
    main()
