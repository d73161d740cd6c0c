"""Threshold-relevance evaluation with per-epoch loop and query-latency
measurement (ref:scripts/evaluate.py:24,141-168,231-266,305)."""

import argparse
import json
import os

from _common import DEFAULT_EVAL_CONFIG, add_encoder_args, build_encoder


def main():
    p = argparse.ArgumentParser(description="Threshold-relevance evaluation")
    p.add_argument("--eval-config", default=DEFAULT_EVAL_CONFIG)
    p.add_argument("--csv", default=None)
    p.add_argument("--threshold", type=float, default=0.7)
    p.add_argument("--epochs", type=int, nargs="*", default=None)
    p.add_argument("--max-rows", type=int, default=None)
    p.add_argument("--out", default=None)
    p.add_argument("--lora-dir", default=None,
                   help="adapter root (default: eval config / training output)")
    add_encoder_args(p)
    args = p.parse_args()

    from clip_lora_match_tpu.core.config import load_eval_config, load_lora_config
    from clip_lora_match_tpu.eval import CLIPEvaluator, load_eval_csv, threshold_metrics
    from clip_lora_match_tpu.lora.adapter import load_lora
    from _common import DEFAULT_LORA_CONFIG

    cfg = load_eval_config(args.eval_config)
    encoder = build_encoder(args)
    data = load_eval_csv(args.csv or cfg.val_csv, cfg.image_root,
                         max_rows=args.max_rows)
    epochs = args.epochs if args.epochs is not None else list(cfg.lora_epochs)
    _, tcfg = load_lora_config(DEFAULT_LORA_CONFIG)

    results = {}
    variants = [("base", None, 1.0)]
    for k in epochs:
        path = os.path.join(
            args.lora_dir or cfg.lora_dir or tcfg.output_dir, f"epoch_{k}"
        )
        if os.path.exists(path):
            lora, scaling = load_lora(path)
            variants.append((f"epoch_{k}", lora, scaling))
    for name, lora, scaling in variants:
        if lora is None:
            encoder.lora = None
        else:
            encoder.attach_lora(lora, scaling)
        ev = CLIPEvaluator(encoder)
        _, txt = ev.encode_dataset(data)
        results[name] = threshold_metrics(
            txt, txt, ks=cfg.recall_k_values, threshold=args.threshold,
            exclude_self=True,
        )
        print(f"[evaluate] {name}: {json.dumps(results[name])}")

    out = args.out or os.path.join(cfg.results_dir, "evaluation_results_threshold.json")
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"[evaluate] wrote {out}")


if __name__ == "__main__":
    main()
