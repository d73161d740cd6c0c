"""CI-speed variant of the committed quality reproduction (results/README.md):
generate a small attribute-grounded corpus with the real generator, run the
real trainer over the real CSV pipeline, evaluate with the real comparator —
and require a LoRA recall lift over the random base. Exercises the exact
train→eval→compare path used for results/model_comparison.json."""

import dataclasses
import subprocess
import sys

import pytest

from clip_lora_match_tpu.core.config import (
    ClipArchConfig,
    LoraConfig,
    TrainingConfig,
)


@pytest.mark.slow
def test_generate_train_compare_pipeline(tmp_path, repo_root):
    out = tmp_path / "corpus"
    res = subprocess.run(
        [
            sys.executable, "scripts/generate_fashion_corpus.py",
            "--out", str(out), "--n-train", "96", "--n-val", "24", "--seed", "7",
        ],
        cwd=repo_root, capture_output=True, text=True, timeout=300,
    )
    assert res.returncode == 0, res.stderr[-1500:]

    arch = ClipArchConfig(
        image_size=64, patch_size=16, vision_width=64, vision_layers=2,
        vision_heads=4, vision_mlp_dim=128, vocab_size=600, max_text_length=77,
        text_width=64, text_layers=2, text_heads=4, text_mlp_dim=128,
        projection_dim=32,
    )
    lora_cfg = LoraConfig(r=8, alpha=16, dropout=0.1)
    tcfg = TrainingConfig(
        batch_size=8,
        num_epochs=10,
        learning_rate=1e-3,
        train_csv=str(out / "train_fashion_synth.csv"),
        val_csv=str(out / "val_fashion_synth.csv"),
        image_root_dir=".",
        output_dir=str(tmp_path / "lora_out"),
        logging_steps=1000,
    )
    from clip_lora_match_tpu.train import train

    result = train(lora_cfg=lora_cfg, train_cfg=tcfg, arch=arch)
    assert result.steps >= 40
    assert result.train_losses[-1] < result.train_losses[0]

    from clip_lora_match_tpu.eval import ModelComparator, load_eval_csv
    from clip_lora_match_tpu.models import clip as jclip
    from clip_lora_match_tpu.models.encoder import ClipEncoder
    import jax

    from clip_lora_match_tpu.core.config import ClipConfig, PreprocessConfig

    params = jclip.init_params(jax.random.PRNGKey(tcfg.seed), arch)
    cfg = ClipConfig(arch=arch, preprocess=PreprocessConfig(image_size=64))
    enc = ClipEncoder(params, arch=arch, config=cfg)
    data = load_eval_csv(str(out / "val_fashion_synth.csv"), ".")
    comp = ModelComparator(
        enc, str(tmp_path / "lora_out"), epochs=(tcfg.num_epochs,), batch_size=24
    )
    results = comp.compare(data, ks=(1, 5))
    base = results["Base CLIP (No LoRA)"]
    lora = results[f"CLIP+LoRA (Epoch {tcfg.num_epochs})"]
    # tiny random towers + 48 steps: require a clear, not heroic, lift
    assert lora["recall@5"] > base["recall@5"], results
    assert lora["recall@1"] >= base["recall@1"], results
    assert lora["recall@5"] >= 0.3, results  # chance = 5/24 ≈ 0.21
