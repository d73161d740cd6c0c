"""Build the small custom-items index (ref:scripts/build_custom_index.py:33-76
— including the malformed-CSV column-shift workaround, reproduced in
index/build.read_custom_items_csv)."""

import argparse

from _common import add_encoder_args, build_encoder


def main():
    p = argparse.ArgumentParser(description="Build custom items index")
    p.add_argument("--csv", default="data/custom/my_items.csv")
    p.add_argument("--out", default="data/index/custom_items_index.npz")
    add_encoder_args(p)
    args = p.parse_args()

    from clip_lora_match_tpu.index import build_index_from_csv, verify_index

    encoder = build_encoder(args)
    index = build_index_from_csv(args.csv, encoder, custom_format=True)
    index.save(args.out)
    ok = verify_index(index)
    print(f"[build_custom_index] {len(index)} items -> {args.out} (verify={'ok' if ok else 'FAILED'})")
    for t in index.texts:
        print("  -", t)


if __name__ == "__main__":
    main()
