"""LoRA inference smoke test (ref:scripts/test_lora_inference.py:50-92):
N random val samples, each image ranked against its true caption + 4
distractors; also verifies merged-vs-unmerged adapter parity (the
test-harness role BASELINE.json assigns to this script)."""

import argparse
import random

import numpy as np

from _common import add_encoder_args, build_encoder


def main():
    p = argparse.ArgumentParser(description="LoRA inference smoke test")
    p.add_argument("--csv", default="data/text/val_fashion.csv")
    p.add_argument("--samples", type=int, default=3)
    p.add_argument("--distractors", type=int, default=4)
    p.add_argument("--seed", type=int, default=42)
    add_encoder_args(p)
    args = p.parse_args()

    from clip_lora_match_tpu.eval import load_eval_csv

    encoder = build_encoder(args)
    data = load_eval_csv(args.csv, require_images=True)
    if not data.texts:
        print("[test_lora_inference] no rows with images; nothing to test")
        return
    rng = random.Random(args.seed)
    n = min(args.samples, len(data.texts))
    picks = rng.sample(range(len(data.texts)), n)
    hits = 0
    for i in picks:
        others = [j for j in range(len(data.texts)) if j != i]
        distractors = rng.sample(others, min(args.distractors, len(others)))
        candidates = [data.texts[i]] + [data.texts[j] for j in distractors]
        img = encoder.encode_image(data.image_paths[i])
        txt = encoder.encode_text(candidates)
        sims = txt @ img
        order = np.argsort(-sims)
        rank = int(np.where(order == 0)[0][0]) + 1
        hits += rank == 1
        print(f"  sample {i}: true caption rank {rank}/{len(candidates)}")
        for r, j in enumerate(order[:3], 1):
            print(f"    {r}. [{sims[j]:.4f}] {candidates[j][:60]}")
    print(f"[test_lora_inference] top-1 {hits}/{n}")

    if encoder.lora is not None:
        base = encoder.encode_text("merged-vs-unmerged parity probe")
        encoder.merge_lora()
        merged = encoder.encode_text("merged-vs-unmerged parity probe")
        cos = float(base @ merged)
        print(f"[test_lora_inference] merged-vs-unmerged cosine: {cos:.6f}")
        assert cos > 0.9999, "merge changed the embedding!"


if __name__ == "__main__":
    main()
