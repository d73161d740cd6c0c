"""Interactive multimodal seeker demo (ref:scripts/demo_seeker.py:17-73:
prompts for optional text and/or image, fused search)."""

import argparse

from _common import add_encoder_args, build_encoder, print_results


def main():
    p = argparse.ArgumentParser(description="Multimodal seeker demo")
    p.add_argument("--index", default="data/index/custom_items_index.npz")
    p.add_argument("--k", type=int, default=5)
    p.add_argument("--description", default=None)
    p.add_argument("--image", default=None)
    add_encoder_args(p)
    args = p.parse_args()

    from clip_lora_match_tpu.services import SeekerConfig, SeekerService

    seeker = SeekerService(
        build_encoder(args), SeekerConfig(index_path=args.index, top_k=args.k)
    )
    if args.description or args.image:
        print_results(
            seeker.search_items(description=args.description, image_path=args.image)
        )
        return
    while True:
        try:
            desc = input("description (empty to skip)> ").strip() or None
            img = input("image path (empty to skip)> ").strip() or None
        except (EOFError, KeyboardInterrupt):
            break
        if desc is None and img is None:
            break
        try:
            print_results(seeker.search_items(description=desc, image_path=img))
        except Exception as e:
            print(f"error: {e}")


if __name__ == "__main__":
    main()
