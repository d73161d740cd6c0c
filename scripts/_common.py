"""Shared CLI helpers for the scripts/ entry points."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clip_lora_match_tpu.core.config import load_clip_config  # noqa: E402
from clip_lora_match_tpu.models.encoder import ClipEncoder  # noqa: E402

DEFAULT_CLIP_CONFIG = "config/clip_config.yaml"
DEFAULT_LORA_CONFIG = "config/lora_config.yaml"
DEFAULT_EVAL_CONFIG = "config/evaluation_config.yaml"
DEFAULT_YOLO_CONFIG = "config/yolo_config.yaml"


def add_encoder_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--clip-config", default=DEFAULT_CLIP_CONFIG)
    p.add_argument("--weights", default=None, help="base CLIP weights (.npz)")
    p.add_argument(
        "--lora", default=None,
        help="LoRA adapter dir (native or PEFT); e.g. models/saved/clip-lora/epoch_1",
    )
    p.add_argument("--lora-epoch", type=int, default=None,
                   help="shorthand: epoch number under the configured output dir")
    p.add_argument(
        "--seed", type=int, default=0,
        help="random-init seed when no --weights given; MUST match the "
        "training seed (config training.seed) to evaluate its adapters",
    )


def build_encoder(args) -> ClipEncoder:
    lora_path = args.lora
    if lora_path is None and args.lora_epoch is not None:
        from clip_lora_match_tpu.core.config import load_lora_config

        _, tcfg = load_lora_config(DEFAULT_LORA_CONFIG)
        lora_path = os.path.join(tcfg.output_dir, f"epoch_{args.lora_epoch}")
    return ClipEncoder.from_config(
        config_path=args.clip_config if os.path.exists(args.clip_config) else None,
        weights_path=args.weights,
        lora_path=lora_path,
        seed=getattr(args, "seed", 0),
    )


def print_results(results, max_text: int = 70) -> None:
    for rank, r in enumerate(results, 1):
        text = (r.text or "")[:max_text]
        print(f"  {rank}. [{r.score:.4f}] {text}  ({r.image_path})")
