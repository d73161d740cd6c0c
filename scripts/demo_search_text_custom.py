"""Interactive text search over the custom index
(ref:scripts/demo_search_text_custom.py:17-56)."""

import argparse

from _common import add_encoder_args, build_encoder, print_results


def main():
    p = argparse.ArgumentParser(description="Interactive custom-index text search")
    p.add_argument("--index", default="data/index/custom_items_index.npz")
    p.add_argument("--k", type=int, default=5)
    p.add_argument("--query", default=None, help="one-shot query (skip REPL)")
    add_encoder_args(p)
    args = p.parse_args()

    from clip_lora_match_tpu.retrieval import SearchIndex

    si = SearchIndex.from_file(args.index, build_encoder(args))
    print(f"[demo] loaded {len(si.index)} items from {args.index}")

    def run(q):
        print_results(si.search_by_text(q, args.k))

    if args.query:
        run(args.query)
        return
    while True:
        try:
            q = input("query> ").strip()
        except (EOFError, KeyboardInterrupt):
            break
        if not q or q.lower() in ("q", "quit", "exit"):
            break
        run(q)


if __name__ == "__main__":
    main()
