"""Two-stage YOLO-crop → CLIP-embed image search
(ref:scripts/demo_search_image_yolo_custom.py:17-97: crop, print before/after
paths, embed crop[0], search)."""

import argparse

from _common import DEFAULT_YOLO_CONFIG, add_encoder_args, build_encoder, print_results


def main():
    p = argparse.ArgumentParser(description="YOLO-crop + CLIP image search")
    p.add_argument("--index", default="data/index/custom_items_index.npz")
    p.add_argument("--yolo-config", default=DEFAULT_YOLO_CONFIG)
    p.add_argument("--yolo-weights", default=None)
    p.add_argument("--k", type=int, default=5)
    p.add_argument("--image", required=True)
    p.add_argument(
        "--fused", action="store_true",
        help="run the ONE-dispatch fused program (detect→crop→embed→top-k "
        "in a single jit; needs a live detector) instead of the staged "
        "crop-file pipeline",
    )
    add_encoder_args(p)
    args = p.parse_args()

    from clip_lora_match_tpu.models.yolo import load_yolo_cropper
    from clip_lora_match_tpu.retrieval import SearchIndex

    cropper = load_yolo_cropper(args.yolo_config, weights_path=args.yolo_weights)
    si = SearchIndex.from_file(args.index, build_encoder(args))
    print(f"[demo] original: {args.image}")

    if args.fused:
        from clip_lora_match_tpu.models.yolo.cropper import NullDetector

        if isinstance(cropper.detector, NullDetector):
            raise SystemExit("[demo] --fused needs trained detector weights")
        import numpy as np
        from PIL import Image

        import jax.numpy as jnp

        from clip_lora_match_tpu.models.yolo.device_crop import make_fused_search

        search = make_fused_search(
            cropper.detector, si.encoder,
            jnp.asarray(si.index.embeddings_np()), k=args.k,
            conf=cropper.cfg.conf_threshold, iou=cropper.cfg.iou_threshold,
        )
        u8 = np.asarray(Image.open(args.image).convert("RGB"), np.uint8)
        scores, ids, box, detected = search(u8)
        print(f"[demo] fused: detected={detected} box={box.round(1).tolist()}")
        for rank, (s, i) in enumerate(zip(scores, ids), 1):
            path, text = si.index.metadata(int(i))
            print(f"  {rank}. [{s:.4f}] {text}  ({path})")
        return

    try:
        crops = cropper.crop_image(args.image)
    except Exception as e:
        print(f"[demo] crop failed ({e}); using original image")
        crops = [args.image]
    query = crops[0] if crops else args.image
    print(f"[demo] query crop: {query}")
    print_results(si.search_by_image(query, args.k))


if __name__ == "__main__":
    main()
