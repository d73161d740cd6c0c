"""Failure-case grids + embedding-space plot
(ref:scripts/qualitative_evaluation.py:117-337)."""

import argparse
import os

from _common import DEFAULT_EVAL_CONFIG, add_encoder_args, build_encoder


def main():
    p = argparse.ArgumentParser(description="Qualitative failure analysis")
    p.add_argument("--eval-config", default=DEFAULT_EVAL_CONFIG)
    p.add_argument("--csv", default=None)
    p.add_argument("--max-rows", type=int, default=None)
    p.add_argument("--num-cases", type=int, default=None)
    add_encoder_args(p)
    args = p.parse_args()

    from clip_lora_match_tpu.core.config import load_eval_config
    from clip_lora_match_tpu.eval import (
        CLIPEvaluator,
        find_failure_cases,
        load_eval_csv,
        plot_embedding_space,
        plot_failure_grids,
    )

    cfg = load_eval_config(args.eval_config)
    encoder = build_encoder(args)
    data = load_eval_csv(args.csv or cfg.val_csv, cfg.image_root,
                         max_rows=args.max_rows)
    ev = CLIPEvaluator(encoder)
    img, txt = ev.encode_dataset(data)
    cases = find_failure_cases(
        img, txt, data.texts,
        num_cases=args.num_cases or cfg.num_failure_cases,
        k=cfg.num_top_k_visualize,
    )
    print(f"[qualitative] {len(cases)} failure cases:")
    for c in cases:
        print(f"  rank {c.correct_rank:4d} score {c.correct_score:.3f}  {c.query_text[:60]}")
    grids = plot_failure_grids(
        cases, data.image_paths, cfg.qualitative_dir, k=cfg.num_top_k_visualize
    )
    viz = plot_embedding_space(
        img, txt, os.path.join(cfg.plots_dir, "embedding_space.png"),
        method=cfg.embedding_viz_method,
    )
    print(f"[qualitative] {len(grids)} grids -> {cfg.qualitative_dir}; viz={viz}")


if __name__ == "__main__":
    main()
