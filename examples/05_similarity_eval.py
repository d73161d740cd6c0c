"""Similarity & retrieval evaluation walkthrough — fills the reference's
empty ``notebook/05_similarity_eval.ipynb`` placeholder.

Builds an index from the bundled sample items, runs both evaluation
protocols, and shows a few searches.

Run: python examples/05_similarity_eval.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from clip_lora_match_tpu.eval import (
        diagonal_metrics,
        load_eval_csv,
        threshold_metrics,
    )
    from clip_lora_match_tpu.index import build_index_from_csv
    from clip_lora_match_tpu.models.encoder import ClipEncoder
    from clip_lora_match_tpu.retrieval import SearchIndex

    encoder = ClipEncoder.from_config()
    csv_path = "data/custom/my_items.csv"
    index = build_index_from_csv(csv_path, encoder)
    si = SearchIndex(index, encoder)
    print(f"index: {len(index)} items\n")

    for q in ["payung hitam", "dompet kulit", "jam tangan"]:
        top = si.search_by_text(q, k=1)[0]
        print(f"query '{q}' -> [{top.score:+.3f}] {top.text}")

    data = load_eval_csv(csv_path, image_root=".")
    img = encoder.encode_image(data.image_paths)
    txt = encoder.encode_text(data.texts)
    print("\ndiagonal protocol:",
          json.dumps(diagonal_metrics(img, txt, ks=(1, 3)), indent=2))
    print("threshold protocol (text self-retrieval):",
          json.dumps(threshold_metrics(txt, txt, ks=(1, 3), exclude_self=True),
                     indent=2))


if __name__ == "__main__":
    main()
