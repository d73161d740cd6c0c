"""Pre-flight data/config checks (ref:scripts/verify_data_structure.py:21-135):
CSVs exist with required columns, adapter epoch dirs contain weights, configs
present. Exit code 1 on any failure."""

import argparse
import csv
import os
import sys


def check(label: str, ok: bool, detail: str = "") -> bool:
    print(f"  [{'OK' if ok else 'MISSING'}] {label}" + (f" — {detail}" if detail else ""))
    return ok


def main():
    p = argparse.ArgumentParser(description="Verify data/config structure")
    p.add_argument("--lora-dir", default="models/saved/clip-lora")
    p.add_argument("--epochs", type=int, nargs="*", default=[1])
    args = p.parse_args()
    ok = True

    print("[verify] configs:")
    for cfg in (
        "config/clip_config.yaml",
        "config/lora_config.yaml",
        "config/yolo_config.yaml",
        "config/evaluation_config.yaml",
    ):
        ok &= check(cfg, os.path.exists(cfg))

    print("[verify] CSVs:")
    for path in ("data/text/train_fashion.csv", "data/text/val_fashion.csv",
                 "data/custom/my_items.csv"):
        if not os.path.exists(path):
            ok &= check(path, False)
            continue
        with open(path, newline="", encoding="utf-8") as f:
            cols = csv.DictReader(f).fieldnames or []
        ok &= check(path, "image_path" in cols, f"columns={cols[:4]}")

    print("[verify] adapters:")
    for k in args.epochs:
        d = os.path.join(args.lora_dir, f"epoch_{k}")
        has = os.path.exists(os.path.join(d, "adapter_model.safetensors")) or (
            os.path.exists(os.path.join(d, "lora_weights.npz"))
        )
        ok &= check(d, has, "adapter_model.safetensors | lora_weights.npz")

    print("[verify] " + ("ALL OK" if ok else "FAILURES FOUND"))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
