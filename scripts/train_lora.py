"""LoRA fine-tune entry point (ref:scripts/train_lora.py:111-249)."""

import argparse

from _common import DEFAULT_LORA_CONFIG, add_encoder_args


def main():
    p = argparse.ArgumentParser(description="Contrastive LoRA fine-tune of CLIP")
    p.add_argument("--config", default=DEFAULT_LORA_CONFIG)
    p.add_argument("--max-steps-per-epoch", type=int, default=None)
    add_encoder_args(p)
    args = p.parse_args()

    from clip_lora_match_tpu.train import train

    result = train(
        config_path=args.config,
        weights_path=args.weights,
        max_steps_per_epoch=args.max_steps_per_epoch,
    )
    print(
        f"[train] done: {result.epochs} epochs, {result.steps} steps, "
        f"final loss {result.train_losses[-1] if result.train_losses else float('nan'):.4f}, "
        f"adapters in {result.output_dir}"
    )


if __name__ == "__main__":
    main()
