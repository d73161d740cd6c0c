"""YOLO crop-stage walkthrough — fills the reference's empty
``notebook/02_yolo_crop_test.ipynb`` placeholder.

Runs the crop stage over a folder (real detector when weights are present,
full-image fallback otherwise) and prints what was produced.

Run: python examples/02_yolo_crop_test.py [--folder data/custom/images]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--folder", default="data/custom/images")
    p.add_argument("--save-dir", default="data/cropped")
    p.add_argument("--yolo-config", default="config/yolo_config.yaml")
    p.add_argument("--weights", default=None)
    args = p.parse_args()

    from clip_lora_match_tpu.models.yolo import load_yolo_cropper

    cropper = load_yolo_cropper(args.yolo_config, weights_path=args.weights)
    print(f"detector: {type(cropper.detector).__name__}")
    results = cropper.crop_folder(args.folder, save_dir=args.save_dir)
    for src, crops in results.items():
        print(f"{os.path.basename(src)} -> {len(crops)} crop(s)")
        for c in crops:
            from PIL import Image

            with Image.open(c) as im:
                print(f"   {os.path.basename(c)}  {im.size[0]}x{im.size[1]}")


if __name__ == "__main__":
    main()
