"""Experiment: train-step throughput variants on the real chip.

Not part of the library surface — a measurement harness for tuning
train/step.py (VERDICT r1 item 3). Prints ms/step + ex/s for each variant.
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clip_lora_match_tpu.core.config import (  # noqa: E402
    ClipArchConfig,
    LoraConfig,
    TrainingConfig,
)
from clip_lora_match_tpu.lora import init_lora  # noqa: E402
from clip_lora_match_tpu.models import clip as clip_model  # noqa: E402
from clip_lora_match_tpu.train import (  # noqa: E402
    init_train_state,
    make_optimizer,
    make_train_step,
)


from scripts._common import paired_burst_time, sync_device  # noqa: E402

_sync = sync_device


def bench(fn, args, iters=6, warmup=2):
    return paired_burst_time(fn, args, iters=iters, warmup=warmup)


def make_batch(rng, arch, B):
    return {
        "pixel_values": jnp.asarray(
            rng.normal(size=(B, arch.image_size, arch.image_size, 3)).astype(
                np.float32
            )
        ),
        "input_ids": jnp.asarray(
            rng.integers(0, arch.vocab_size - 2, (B, arch.max_text_length)).astype(
                np.int32
            )
        ),
        "attention_mask": jnp.asarray(np.ones((B, arch.max_text_length), np.int32)),
    }


def run_variant(name, params, arch, rng, B, remat, dropout, fused, rng_impl=None,
                unroll=1):
    from clip_lora_match_tpu.nn.layers import set_kernel_flags

    set_kernel_flags(fused_lora=fused, flash_attention=False, interpret=False)
    lora_cfg = LoraConfig(dropout=dropout)
    tcfg = TrainingConfig(batch_size=B)
    tx, _ = make_optimizer(tcfg, 100)
    state = init_train_state(init_lora(jax.random.PRNGKey(1), arch, lora_cfg), tx)
    if rng_impl:
        import dataclasses

        state = dataclasses.replace(state, rng=jax.random.key(0, impl=rng_impl))
    step = make_train_step(
        params, arch, lora_cfg, tcfg, tx,
        eot_id=arch.vocab_size - 1, compute_dtype=jnp.bfloat16, remat=remat,
        unroll=unroll,
    )
    batch = make_batch(rng, arch, B)
    t = bench(lambda s, b: step(s, b)[1], (state, batch))
    print(
        f"[exp] {name:34s} B={B:4d} {t * 1e3:7.1f} ms/step "
        f"{B / t:9,.0f} ex/s", flush=True,
    )
    return t


def run_fwd_only(name, params, arch, rng, B, dropout, rng_impl=None):
    from clip_lora_match_tpu.train.loss import clip_contrastive_loss
    from clip_lora_match_tpu.train.step import _tower_features

    lora_cfg = LoraConfig(dropout=dropout)
    lora = init_lora(jax.random.PRNGKey(1), arch, lora_cfg)
    key = (
        jax.random.key(0, impl=rng_impl) if rng_impl else jax.random.PRNGKey(0)
    )

    @jax.jit
    def fwd(params, lora, batch, key):
        img, txt = _tower_features(
            params, lora, batch, arch, lora_cfg, arch.vocab_size - 1,
            jnp.bfloat16, False,
            dropout_rng=key if dropout > 0 else None,
        )
        return clip_contrastive_loss(img, txt, 0.07)

    batch = make_batch(rng, arch, B)
    t = bench(lambda *a: fwd(*a), (params, lora, batch, key))
    print(
        f"[exp] {name:34s} B={B:4d} {t * 1e3:7.1f} ms/step "
        f"{B / t:9,.0f} ex/s", flush=True,
    )
    return t


def run_chained(name, params, arch, rng, B, dropout, rng_impl=None, n_chain=4):
    """n_chain train steps inside ONE jit call — isolates per-dispatch
    overhead from real compute."""
    from clip_lora_match_tpu.train.step import make_train_step

    lora_cfg = LoraConfig(dropout=dropout)
    tcfg = TrainingConfig(batch_size=B)
    tx, _ = make_optimizer(tcfg, 100)
    state = init_train_state(init_lora(jax.random.PRNGKey(1), arch, lora_cfg), tx)
    if rng_impl:
        import dataclasses

        state = dataclasses.replace(state, rng=jax.random.key(0, impl=rng_impl))
    step = make_train_step(
        params, arch, lora_cfg, tcfg, tx,
        eot_id=arch.vocab_size - 1, compute_dtype=jnp.bfloat16, remat=False,
    )

    @jax.jit
    def chained(params, state, batch):
        def body(s, _):
            s, m = step.inner(params, s, batch)
            return s, m["loss"]

        state, losses = jax.lax.scan(body, state, None, length=n_chain)
        return state, losses

    batch = make_batch(rng, arch, B)
    t = bench(
        lambda p, s, b: chained(p, s, b)[1], (params, state, batch), iters=3
    ) / n_chain
    print(
        f"[exp] {name:34s} B={B:4d} {t * 1e3:7.1f} ms/step "
        f"{B / t:9,.0f} ex/s", flush=True,
    )
    return t


def run_tower_grad(name, params, arch, rng, B, tower):
    """Gradient cost of one tower alone (loss = mean of features)."""
    from clip_lora_match_tpu.train.step import _tower_features

    lora_cfg = LoraConfig(dropout=0.0)
    lora = init_lora(jax.random.PRNGKey(1), arch, lora_cfg)
    batch = make_batch(rng, arch, B)

    @jax.jit
    def g(params, lora, batch):
        def loss(lora):
            img, txt = _tower_features(
                params, lora, batch, arch, lora_cfg, arch.vocab_size - 1,
                jnp.bfloat16, False,
            )
            feats = img if tower == "img" else txt
            return jnp.mean(jnp.square(feats.astype(jnp.float32)))

        return jax.grad(loss)(lora)

    t = bench(g, (params, lora, batch))
    print(
        f"[exp] {name:34s} B={B:4d} {t * 1e3:7.1f} ms/step "
        f"{B / t:9,.0f} ex/s", flush=True,
    )
    return t


def main():
    arch = ClipArchConfig()
    params = clip_model.init_params(jax.random.PRNGKey(0), arch)
    rng = np.random.default_rng(0)
    which = sys.argv[1:] or ["A", "B", "C", "D"]
    if "A" in which:
        run_variant("A remat dropout.1", params, arch, rng, 128, True, 0.1, False)
    if "B" in which:
        run_variant("B noremat dropout.1", params, arch, rng, 128, False, 0.1, False)
    if "C" in which:
        run_variant("C noremat dropout0", params, arch, rng, 128, False, 0.0, False)
    if "D" in which:
        run_variant("D noremat dropout0 fused", params, arch, rng, 128, False, 0.0, True)
    if "E" in which:
        run_variant("E noremat dropout.1 B256", params, arch, rng, 256, False, 0.1, False)
    if "F" in which:
        run_variant("F remat dropout.1 B256", params, arch, rng, 256, True, 0.1, False)
    if "G" in which:
        run_variant("G noremat dropout.1 B512", params, arch, rng, 512, False, 0.1, False)
    if "H" in which:
        run_variant("H noremat dropout.1 rbg", params, arch, rng, 128, False, 0.1, False,
                    rng_impl="rbg")
    if "I" in which:
        run_variant("I noremat dropout.1 unsafe_rbg", params, arch, rng, 128, False, 0.1,
                    False, rng_impl="unsafe_rbg")
    if "J" in which:
        run_variant("J noremat dropout0 B256", params, arch, rng, 256, False, 0.0, False)
    if "K" in which:
        run_variant("K remat dropout.1 rbg B256", params, arch, rng, 256, True, 0.1,
                    False, rng_impl="rbg")
    if "L" in which:
        run_variant("L dots dropout.1 rbg B256", params, arch, rng, 256, "dots", 0.1,
                    False, rng_impl="rbg")
    if "M" in which:
        run_variant("M dots dropout.1 rbg B512", params, arch, rng, 512, "dots", 0.1,
                    False, rng_impl="rbg")
    if "N" in which:
        run_variant("N dots dropout.1 rbg B128", params, arch, rng, 128, "dots", 0.1,
                    False, rng_impl="rbg")
    if "P" in which:
        run_fwd_only("P fwd-only dropout0", params, arch, rng, 128, 0.0)
    if "R" in which:
        run_chained("R chained4 dropout.1 rbg", params, arch, rng, 128, 0.1,
                    rng_impl="rbg")
    if "S" in which:
        run_chained("S chained4 dropout0", params, arch, rng, 128, 0.0)
    if "Q" in which:
        run_fwd_only("Q fwd-only dropout.1 rbg", params, arch, rng, 128, 0.1,
                     rng_impl="rbg")
    if "W" in which:
        run_variant("W noremat drop0 unroll4", params, arch, rng, 128, False, 0.0,
                    False, unroll=4)
    if "X" in which:
        run_variant("X noremat drop0 unroll12", params, arch, rng, 128, False, 0.0,
                    False, unroll=12)
    if "Y" in which:
        run_variant("Y noremat drop.1 rbg unroll12", params, arch, rng, 128, False,
                    0.1, False, rng_impl="rbg", unroll=12)
    if "Z" in which:
        run_variant("Z remat drop0 unroll12", params, arch, rng, 128, True, 0.0,
                    False, unroll=12)
    if "Z2" in which:
        run_variant("Z2 dots drop0 unroll12", params, arch, rng, 128, "dots", 0.0,
                    False, unroll=12)
    if "Z3" in which:
        run_variant("Z3 dots drop.1 rbg unroll12 B256", params, arch, rng, 256,
                    "dots", 0.1, False, rng_impl="rbg", unroll=12)
    if "T" in which:
        run_tower_grad("T grad img-tower only", params, arch, rng, 128, "img")
    if "U" in which:
        run_tower_grad("U grad txt-tower only", params, arch, rng, 128, "txt")


if __name__ == "__main__":
    main()
