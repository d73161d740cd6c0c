"""LoRA fine-tune entry point (ref:scripts/train_lora.py:111-249)."""

import argparse

from _common import DEFAULT_LORA_CONFIG, add_encoder_args


def main():
    p = argparse.ArgumentParser(description="Contrastive LoRA fine-tune of CLIP")
    p.add_argument("--config", default=DEFAULT_LORA_CONFIG)
    p.add_argument("--max-steps-per-epoch", type=int, default=None)
    p.add_argument(
        "--chain-steps", type=int, default=None,
        help="K optimizer steps per device dispatch (amortizes relay/launch "
        "overhead; bit-equal trajectory — see TrainingConfig.chain_steps)",
    )
    p.add_argument(
        "--arch", choices=["vit-b32", "tiny"], default="vit-b32",
        help="'tiny' trains a miniature tower (CPU-friendly smoke runs)",
    )
    add_encoder_args(p)
    args = p.parse_args()

    from clip_lora_match_tpu.train import train

    train_cfg = None
    if args.chain_steps is not None:
        import dataclasses

        from clip_lora_match_tpu.core.config import load_lora_config

        _, train_cfg = load_lora_config(args.config)
        train_cfg = dataclasses.replace(train_cfg, chain_steps=args.chain_steps)

    arch = None
    if args.arch == "tiny":
        from clip_lora_match_tpu.core.config import ClipArchConfig

        arch = ClipArchConfig(
            image_size=64, patch_size=16, vision_width=64, vision_layers=2,
            vision_heads=4, vision_mlp_dim=128, vocab_size=600,
            max_text_length=32, text_width=64, text_layers=2, text_heads=4,
            text_mlp_dim=128, projection_dim=32,
        )

    result = train(
        config_path=args.config,
        train_cfg=train_cfg,
        weights_path=args.weights,
        arch=arch,
        max_steps_per_epoch=args.max_steps_per_epoch,
    )
    print(
        f"[train] done: {result.epochs} epochs, {result.steps} steps, "
        f"final loss {result.train_losses[-1] if result.train_losses else float('nan'):.4f}, "
        f"adapters in {result.output_dir}"
    )


if __name__ == "__main__":
    main()
