"""A/B the train-step backward optimizations (VERDICT r3 #1).

Interleaved in ONE process (CLAUDE.md measurement discipline): the ViT-B/32
LoRA train step at B=96, S=64 (production sliced regime), chained dispatch,
with and without the shared-mask fused QKV LoRA dropout path
(nn/layers._qkv_lora_shared — erases two of the three masked-x saves and
recomputes the third's mask in the backward).

Usage: python scripts/exp_bwd_audit.py [--trials 3] [--chain 4] [--b 96]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--chain", type=int, default=4)
    ap.add_argument("--b", type=int, default=96)
    ap.add_argument("--seq", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from clip_lora_match_tpu.core.config import (
        ClipArchConfig,
        LoraConfig,
        TrainingConfig,
    )
    from clip_lora_match_tpu.lora.adapter import init_lora
    from clip_lora_match_tpu.models import clip as clip_model
    from clip_lora_match_tpu.nn.layers import set_kernel_flags
    from clip_lora_match_tpu.train import init_train_state, make_optimizer
    from clip_lora_match_tpu.train.step import make_chained_train_step

    arch = ClipArchConfig()
    lora_cfg = LoraConfig()
    B, S, K = args.b, args.seq, args.chain
    params = clip_model.init_params(jax.random.PRNGKey(0), arch)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params,
    )

    rng = np.random.default_rng(0)
    ids = rng.integers(0, arch.vocab_size - 2, (B, S)).astype(np.int32)
    ids[:, 48] = arch.vocab_size - 1
    mask = np.zeros((B, S), np.int32)
    mask[:, :49] = 1
    one = {
        "pixel_values": jnp.asarray(
            rng.normal(size=(B, arch.image_size, arch.image_size, 3)).astype(
                np.float32
            )
        ),
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.asarray(mask),
    }
    batches = {k: jnp.broadcast_to(v, (K,) + v.shape) for k, v in one.items()}

    tcfg = TrainingConfig(batch_size=B)
    tx, _ = make_optimizer(tcfg, 100)

    variants = []
    for name, flags in (
        ("baseline", {}),
        ("fused-lora", {"fused_lora_dropout": True}),
        ("fast-ln", {"fast_ln": True}),
        ("both", {"fused_lora_dropout": True, "fast_ln": True}),
    ):
        step = make_chained_train_step(
            params, arch, lora_cfg, tcfg, tx, chain=K,
            eot_id=arch.vocab_size - 1, compute_dtype=jnp.bfloat16,
        )
        state = init_train_state(
            init_lora(jax.random.PRNGKey(1), arch, lora_cfg), tx,
            rng_impl="rbg",
        )
        variants.append((name, flags, step, state))

    def sync(s):
        jax.tree_util.tree_leaves(s)[0].block_until_ready()
        # relay-safe sync: device→host readback
        np.asarray(jax.tree_util.tree_leaves(s.lora)[0][0, 0, :1])

    print("warming...", file=sys.stderr)
    warmed = []
    for name, flags, step, state in variants:
        prev = set_kernel_flags(**flags) if flags else None
        s2, m = step(state, batches)
        if prev is not None:
            set_kernel_flags(**prev)
        sync(s2)
        warmed.append((name, flags, step, state))

    results = {name: [] for name, *_ in warmed}
    for t in range(args.trials):
        for name, flags, step, state in warmed:
            s = state
            sync(s)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                s, m = step(s, batches)
            sync(s)
            dt = (time.perf_counter() - t0) / (args.iters * K)
            results[name].append(dt * 1e3)
            print(
                f"trial {t} {name}: {dt*1e3:.2f} ms/step "
                f"({B/dt:,.0f} ex/s)",
                file=sys.stderr,
            )

    print()
    for name, ts in results.items():
        med = float(np.median(ts))
        print(f"{name}: median {med:.2f} ms/step -> {B/(med/1e3):,.0f} ex/s/chip")


if __name__ == "__main__":
    main()
