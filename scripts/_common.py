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


# -- measurement helpers (relay-safe timing protocol) --------------------------
# One home for the sync + paired-burst discipline the experiment scripts
# share (CLAUDE.md measurement discipline): block_until_ready alone can lie
# on the axon relay, so completion is forced via a device→host transfer, and
# paired bursts (N vs 3N iterations, one sync each) cancel the constant
# dispatch/RTT overhead.


def sync_device(out) -> None:
    import jax
    import numpy as np

    leaf = jax.tree_util.tree_leaves(out)[0]
    leaf.block_until_ready()
    np.asarray(leaf)


def paired_burst_time(fn, args, iters: int = 10, warmup: int = 2) -> float:
    """Seconds per iteration by paired-burst subtraction."""
    import time

    if warmup > 0:
        for _ in range(warmup):
            out = fn(*args)
        sync_device(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync_device(out)
    t1 = time.perf_counter()
    for _ in range(3 * iters):
        out = fn(*args)
    sync_device(out)
    t2 = time.perf_counter()
    return max(((t2 - t1) - (t1 - t0)) / (2 * iters), 1e-9)
