"""Interactive text search over the fashion index
(ref:scripts/demo_search_text.py:17-60)."""

import argparse

from _common import add_encoder_args, build_encoder, print_results


def main():
    p = argparse.ArgumentParser(description="Interactive fashion-index text search")
    p.add_argument("--index", default="data/index/fashion_text_index.npz")
    p.add_argument("--k", type=int, default=5)
    p.add_argument("--query", default=None)
    add_encoder_args(p)
    args = p.parse_args()

    from clip_lora_match_tpu.retrieval import SearchIndex

    si = SearchIndex.from_file(args.index, build_encoder(args))
    print(f"[demo] loaded {len(si.index)} items from {args.index}")
    if args.query:
        print_results(si.search_by_text(args.query, args.k))
        return
    while True:
        try:
            q = input("query> ").strip()
        except (EOFError, KeyboardInterrupt):
            break
        if not q or q.lower() in ("q", "quit", "exit"):
            break
        print_results(si.search_by_text(q, args.k))


if __name__ == "__main__":
    main()
