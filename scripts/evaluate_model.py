"""Diagonal-ground-truth evaluation (ref:scripts/evaluate_model.py:291-375).
Writes results/evaluation_results.json in the committed artifact shape."""

import argparse
import json
import os

from _common import DEFAULT_EVAL_CONFIG, add_encoder_args, build_encoder


def main():
    p = argparse.ArgumentParser(description="Diagonal-GT retrieval evaluation")
    p.add_argument("--eval-config", default=DEFAULT_EVAL_CONFIG)
    p.add_argument("--csv", default=None)
    p.add_argument("--image-root", default=None)
    p.add_argument("--max-rows", type=int, default=None)
    p.add_argument("--out", default=None)
    add_encoder_args(p)
    args = p.parse_args()

    from clip_lora_match_tpu.core.config import load_eval_config
    from clip_lora_match_tpu.eval import CLIPEvaluator, load_eval_csv

    cfg = load_eval_config(args.eval_config)
    csv_path = args.csv or cfg.val_csv
    encoder = build_encoder(args)
    data = load_eval_csv(
        csv_path, args.image_root or cfg.image_root, max_rows=args.max_rows
    )
    ev = CLIPEvaluator(encoder)
    artifact = ev.evaluation_results_artifact(data, ks=cfg.recall_k_values)
    out = args.out or os.path.join(cfg.results_dir, "evaluation_results.json")
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out, "w") as f:
        json.dump(artifact, f, indent=2)
    print(f"[evaluate_model] {data.texts and len(data.texts)} samples -> {out}")
    print(json.dumps(artifact, indent=2))


if __name__ == "__main__":
    main()
