"""Evaluation orchestrator (ref:scripts/run_all_evaluations.py:140-269):
full eval → comparison → qualitative → markdown report, with
--quick/--skip-base/--skip-qualitative flags."""

import argparse
import json
import os

from _common import DEFAULT_EVAL_CONFIG, add_encoder_args, build_encoder


def main():
    p = argparse.ArgumentParser(description="Run the full evaluation pipeline")
    p.add_argument("--eval-config", default=DEFAULT_EVAL_CONFIG)
    p.add_argument("--csv", default=None)
    p.add_argument("--quick", action="store_true", help="subsample to 200 rows")
    p.add_argument("--skip-base", action="store_true")
    p.add_argument("--skip-qualitative", action="store_true")
    add_encoder_args(p)
    args = p.parse_args()

    from clip_lora_match_tpu.core.config import load_eval_config
    from clip_lora_match_tpu.eval import (
        BASE_NAME,
        CLIPEvaluator,
        ModelComparator,
        create_evaluation_report,
        find_failure_cases,
        load_eval_csv,
        plot_embedding_space,
        plot_failure_grids,
    )

    cfg = load_eval_config(args.eval_config)
    encoder = build_encoder(args)
    data = load_eval_csv(
        args.csv or cfg.val_csv, cfg.image_root,
        max_rows=200 if args.quick else None,
    )
    os.makedirs(cfg.results_dir, exist_ok=True)

    # 1. full evaluation on the current encoder (base or --lora)
    ev = CLIPEvaluator(encoder)
    artifact = ev.evaluation_results_artifact(data, ks=cfg.recall_k_values)
    with open(os.path.join(cfg.results_dir, "evaluation_results.json"), "w") as f:
        json.dump(artifact, f, indent=2)

    # 2. comparison across base + epochs
    comp = ModelComparator(encoder, cfg.lora_dir, epochs=cfg.lora_epochs)
    results = comp.compare(data, ks=cfg.recall_k_values)
    if args.skip_base:
        results.pop(BASE_NAME, None)
    comp.save_json(results, os.path.join(cfg.results_dir, "model_comparison.json"))
    comp.plot_all(results, cfg.plots_dir, ks=cfg.recall_k_values)

    # 3. qualitative
    if not (args.skip_qualitative or cfg.skip_qualitative):
        img, txt = ev.encode_dataset(data)
        cases = find_failure_cases(
            img, txt, data.texts, num_cases=cfg.num_failure_cases,
            k=cfg.num_top_k_visualize,
        )
        plot_failure_grids(cases, data.image_paths, cfg.qualitative_dir,
                           k=cfg.num_top_k_visualize)
        plot_embedding_space(
            img, txt, os.path.join(cfg.plots_dir, "embedding_space.png"),
            method=cfg.embedding_viz_method,
        )

    # 4. report — epoch-over-epoch lift, not vs the (chance-level when
    # random-init) base: percent-vs-chance is noise
    report = create_evaluation_report(
        results,
        os.path.join(cfg.results_dir, "evaluation_report.md"),
        ModelComparator.epoch_over_epoch(results),
        improvements_title="Improvement (epoch over epoch)",
    )
    print(f"[run_all_evaluations] report: {report}")


if __name__ == "__main__":
    main()
