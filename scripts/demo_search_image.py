"""Interactive image search (ref:scripts/demo_search_image.py:17-97; `sample`
pulls a random val row like ref L53-66)."""

import argparse
import random

from _common import add_encoder_args, build_encoder, print_results


def main():
    p = argparse.ArgumentParser(description="Interactive image search")
    p.add_argument("--index", default="data/index/fashion_text_index.npz")
    p.add_argument("--val-csv", default="data/text/val_fashion.csv")
    p.add_argument("--k", type=int, default=5)
    p.add_argument("--image", default=None, help="one-shot image path")
    add_encoder_args(p)
    args = p.parse_args()

    from clip_lora_match_tpu.eval import load_eval_csv
    from clip_lora_match_tpu.retrieval import SearchIndex

    si = SearchIndex.from_file(args.index, build_encoder(args))
    print(f"[demo] loaded {len(si.index)} items from {args.index}")

    def run(path):
        print_results(si.search_by_image(path, args.k))

    if args.image:
        run(args.image)
        return
    while True:
        try:
            q = input("image path (or 'sample')> ").strip()
        except (EOFError, KeyboardInterrupt):
            break
        if not q or q.lower() in ("q", "quit", "exit"):
            break
        if q == "sample":
            data = load_eval_csv(args.val_csv, require_images=True)
            if not data.image_paths:
                print("no val images available")
                continue
            q = random.choice(data.image_paths)
            print(f"sampled: {q}")
        run(q)


if __name__ == "__main__":
    main()
