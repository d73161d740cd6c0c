"""CLIP embedding smoke walkthrough — the "03_clip_embedding_test" scenario
(BASELINE.json configs[0]; the reference shipped only an empty notebook
placeholder, ref:notebook/). CPU-runnable.

Encodes a handful of images and captions, prints the pairwise cosine match
matrix, and checks the diagonal wins for the bundled sample items.

Run: python examples/03_clip_embedding_test.py [--lora DIR] [--weights NPZ]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--csv", default="data/custom/my_items.csv")
    p.add_argument("--weights", default=None)
    p.add_argument("--lora", default=None)
    args = p.parse_args()

    from clip_lora_match_tpu.eval import load_eval_csv, similarity_matrix
    from clip_lora_match_tpu.models.encoder import ClipEncoder

    encoder = ClipEncoder.from_config(
        weights_path=args.weights, lora_path=args.lora
    )
    data = load_eval_csv(args.csv, image_root=".")
    if not data.texts:
        print("no rows with existing images in", args.csv)
        return
    print(f"encoding {len(data.texts)} image-caption pairs ...")
    img = encoder.encode_image(data.image_paths)
    txt = encoder.encode_text(data.texts)
    sim = similarity_matrix(img, txt)

    print("\npairwise cosine match matrix (rows=images, cols=texts):")
    header = "      " + " ".join(f"t{j:<5d}" for j in range(sim.shape[1]))
    print(header)
    for i, row in enumerate(sim):
        cells = " ".join(f"{v:+.3f}" for v in row)
        print(f"img{i:<2d} {cells}")

    diag_wins = int((np.argmax(sim, axis=1) == np.arange(sim.shape[0])).sum())
    print(f"\ndiagonal argmax wins: {diag_wins}/{sim.shape[0]}")
    for i in range(sim.shape[0]):
        j = int(np.argmax(sim[i]))
        mark = "✓" if j == i else "✗"
        print(f"  {mark} image {i} → '{data.texts[j][:60]}' ({sim[i, j]:+.3f})")


if __name__ == "__main__":
    main()
