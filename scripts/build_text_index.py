"""Build the fashion text index from a pairs CSV
(ref:scripts/build_text_index.py:13-77 — but batched instead of one forward
per row)."""

import argparse

from _common import add_encoder_args, build_encoder


def main():
    p = argparse.ArgumentParser(description="Build text embedding index from CSV")
    p.add_argument("--csv", default="data/text/train_fashion.csv")
    p.add_argument("--out", default="data/index/fashion_text_index.npz")
    p.add_argument("--batch-size", type=int, default=256)
    add_encoder_args(p)
    args = p.parse_args()

    import jax

    from clip_lora_match_tpu.index import build_index_from_csv, verify_index

    encoder = build_encoder(args)
    encode_fn = None
    if jax.device_count() > 1:  # shard the build over all chips
        from clip_lora_match_tpu.parallel.sharded_encode import sharded_text_encode_fn

        encode_fn = sharded_text_encode_fn(encoder)
        print(f"[build_text_index] sharding over {jax.device_count()} devices")
    index = build_index_from_csv(
        args.csv, encoder, custom_format=False, batch_size=args.batch_size,
        encode_fn=encode_fn,
    )
    index.save(args.out)
    ok = verify_index(index)
    print(f"[build_text_index] {len(index)} rows -> {args.out} (verify={'ok' if ok else 'FAILED'})")


if __name__ == "__main__":
    main()
