"""Model-load smoke test (role of ref:scripts/test_clip_download.py — there is
no download here; verifies the encoder constructs, jits, and encodes)."""

import argparse

import numpy as np

from _common import add_encoder_args, build_encoder


def main():
    p = argparse.ArgumentParser(description="CLIP encoder load + encode smoke test")
    add_encoder_args(p)
    args = p.parse_args()
    encoder = build_encoder(args)
    emb = encoder.encode_text("smoke test kalimat pendek")
    print(
        f"[test_clip_load] ok: arch=ViT-B/{encoder.arch.patch_size} "
        f"dim={emb.shape[0]} norm={np.linalg.norm(emb):.4f} "
        f"vocab={encoder.preprocessor.tokenizer.vocab_size}"
    )


if __name__ == "__main__":
    main()
