"""LoRA training walkthrough — fills the reference's empty
``notebook/04_lora_training.ipynb`` placeholder.

Trains a tiny CLIP+LoRA on the bundled sample dataset, prints the loss
curve, and shows merged-vs-unmerged equivalence on the result.

Run: python examples/04_lora_training.py  (CPU-friendly, ~1 min)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import jax

    from clip_lora_match_tpu.core.config import (
        ClipArchConfig,
        LoraConfig,
        TrainingConfig,
    )
    from clip_lora_match_tpu.lora import merge_lora
    from clip_lora_match_tpu.models import clip as jclip
    from clip_lora_match_tpu.train import train

    arch = ClipArchConfig(
        image_size=64, patch_size=16, vision_width=64, vision_layers=2,
        vision_heads=4, vision_mlp_dim=128, vocab_size=600, max_text_length=32,
        text_width=64, text_layers=2, text_heads=4, text_mlp_dim=128,
        projection_dim=32,
    )
    lora_cfg = LoraConfig(r=8, alpha=16)
    tcfg = TrainingConfig(
        batch_size=8, num_epochs=2, learning_rate=3e-3, logging_steps=2,
        output_dir="/tmp/clm_example_run", resume=False,
    )
    result = train(lora_cfg=lora_cfg, train_cfg=tcfg, arch=arch)
    print(f"\nsteps: {result.steps}  epochs: {result.epochs}")
    print("loss curve:", " ".join(f"{l:.3f}" for l in result.train_losses))
    print("val losses:", [f"{l:.3f}" for l in result.val_losses])

    # merged == unmerged check on the trained adapter
    params = jclip.init_params(jax.random.PRNGKey(tcfg.seed), arch)
    lora = result.final_lora
    rng = np.random.default_rng(0)
    pix = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    unmerged = jclip.encode_image_features(
        params, pix, arch, lora=lora, lora_scaling=lora_cfg.scaling
    )
    merged = jclip.encode_image_features(
        merge_lora(params, lora, lora_cfg.scaling), pix, arch
    )
    diff = float(np.abs(np.asarray(unmerged) - np.asarray(merged)).max())
    print(f"merged-vs-unmerged max abs diff: {diff:.2e} (should be ~1e-5)")


if __name__ == "__main__":
    main()
