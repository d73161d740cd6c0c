"""One-shot finder report demo (ref:scripts/demo_finder_report.py:17-41)."""

import argparse
import datetime as dt

from _common import add_encoder_args, build_encoder


def main():
    p = argparse.ArgumentParser(description="Finder report demo")
    p.add_argument("--index", default="data/index/custom_items_index.npz")
    p.add_argument("--image", required=True)
    p.add_argument("--description", required=True)
    p.add_argument("--location", default=None)
    p.add_argument("--reporter", default="demo")
    p.add_argument("--db", default=None)
    add_encoder_args(p)
    args = p.parse_args()

    from clip_lora_match_tpu.db.store import open_store
    from clip_lora_match_tpu.services import FinderConfig, FinderService

    finder = FinderService(
        build_encoder(args),
        FinderConfig(index_path=args.index),
        store=open_store(args.db) if args.db else None,
    )
    r = finder.report_item(
        args.image,
        description=args.description,
        location=args.location,
        found_at=dt.datetime.now(),
        reporter=args.reporter,
    )
    print(
        f"[demo_finder_report] row={r.index_row} id={r.item_id} "
        f"stored={r.stored_image_path}\n  indexed text: {r.indexed_text}"
    )


if __name__ == "__main__":
    main()
