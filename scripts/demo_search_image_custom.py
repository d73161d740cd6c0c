"""Interactive image search over the custom index
(ref:scripts/demo_search_image_custom.py:17-71)."""

import argparse

from _common import add_encoder_args, build_encoder, print_results


def main():
    p = argparse.ArgumentParser(description="Custom-index image search")
    p.add_argument("--index", default="data/index/custom_items_index.npz")
    p.add_argument("--k", type=int, default=5)
    p.add_argument("--image", default=None)
    add_encoder_args(p)
    args = p.parse_args()

    from clip_lora_match_tpu.retrieval import SearchIndex

    si = SearchIndex.from_file(args.index, build_encoder(args))
    print(f"[demo] loaded {len(si.index)} items from {args.index}")
    if args.image:
        print_results(si.search_by_image(args.image, args.k))
        return
    while True:
        try:
            q = input("image path> ").strip()
        except (EOFError, KeyboardInterrupt):
            break
        if not q or q.lower() in ("q", "quit", "exit"):
            break
        print_results(si.search_by_image(q, args.k))


if __name__ == "__main__":
    main()
