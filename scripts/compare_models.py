"""Base-vs-LoRA comparison with plots (ref:scripts/compare_models.py:305-350)."""

import argparse
import os

from _common import DEFAULT_EVAL_CONFIG, add_encoder_args, build_encoder


def main():
    p = argparse.ArgumentParser(description="Compare base CLIP vs LoRA epochs")
    p.add_argument("--eval-config", default=DEFAULT_EVAL_CONFIG)
    p.add_argument("--csv", default=None)
    p.add_argument("--max-rows", type=int, default=None)
    p.add_argument("--skip-plots", action="store_true")
    p.add_argument("--lora-dir", default=None,
                   help="adapter root (default: eval config's lora_dir)")
    p.add_argument("--epochs", type=int, nargs="+", default=None)
    p.add_argument("--out", default=None,
                   help="output JSON path (default: results_dir/model_comparison.json)")
    add_encoder_args(p)
    args = p.parse_args()

    from clip_lora_match_tpu.core.config import load_eval_config
    from clip_lora_match_tpu.eval import ModelComparator, load_eval_csv

    cfg = load_eval_config(args.eval_config)
    encoder = build_encoder(args)
    data = load_eval_csv(args.csv or cfg.val_csv, cfg.image_root,
                         max_rows=args.max_rows)
    comp = ModelComparator(
        encoder,
        args.lora_dir or cfg.lora_dir,
        epochs=args.epochs or cfg.lora_epochs,
    )
    results = comp.compare(data, ks=cfg.recall_k_values)
    out = args.out or os.path.join(cfg.results_dir, "model_comparison.json")
    comp.save_json(results, out)
    print(f"[compare_models] wrote {out}")
    for name, imp in comp.summary(results).items():
        print(f"  {name}: " + ", ".join(f"{k} {v:+.1f}%" for k, v in imp.items()))
    if not args.skip_plots:
        for path in comp.plot_all(results, cfg.plots_dir, ks=cfg.recall_k_values):
            print(f"  plot: {path}")


if __name__ == "__main__":
    main()
