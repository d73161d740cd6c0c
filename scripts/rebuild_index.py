"""Rebuild the embedding index from the found_items database
(ref:scripts/rebuild_index.py:13-123 — sync repair tool with self-verify)."""

import argparse

from _common import add_encoder_args, build_encoder


def main():
    p = argparse.ArgumentParser(description="Rebuild index from DB rows")
    p.add_argument("--db", default=None, help="DATABASE_URL / sqlite path")
    p.add_argument("--db-config", default="config/db_config.yaml")
    p.add_argument("--out", default="data/index/custom_items_index.npz")
    add_encoder_args(p)
    args = p.parse_args()

    from clip_lora_match_tpu.db.store import open_store
    from clip_lora_match_tpu.index import build_text_index, verify_index

    encoder = build_encoder(args)
    store = open_store(args.db, args.db_config)
    items = store.all_items(order_desc=False)  # ordered by id like ref L49
    texts = [
        f"{i.description}, ditemukan di {i.location}" if i.location else i.description
        for i in items
    ]
    paths = [i.image_path for i in items]
    index = build_text_index(texts, paths, encoder)
    index.save(args.out)
    ok = verify_index(index)
    print(
        f"[rebuild_index] {len(items)} DB rows -> {len(index)} index rows -> "
        f"{args.out} (verify={'ok' if ok else 'FAILED'})"
    )


if __name__ == "__main__":
    main()
