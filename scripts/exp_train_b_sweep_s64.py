"""Batch-size sweep for the trainer's fastest regime (chain4 x S=64).

The B=96 sweet spot was established at S=77 single-step dispatch
(CLAUDE.md "Measured sweet spots"); both the chained dispatch and the
text-slice change the fusion/VMEM picture, so the sweep must be redone in
the combined regime (measurement discipline: re-sweep after any kernel or
regime change). Interleaved A/B in one process, median of N trials.

Run on the real TPU:

  python scripts/exp_train_b_sweep_s64.py [--trials 3] [--batches 64,96,128,160]
"""

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

from scripts._common import paired_burst_time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--chain", type=int, default=4)
    ap.add_argument("--batches", type=str, default="64,96,128,160")
    args = ap.parse_args()
    batch_sizes = [int(b) for b in args.batches.split(",")]

    from clip_lora_match_tpu.core.config import (
        ClipArchConfig,
        LoraConfig,
        TrainingConfig,
    )
    from clip_lora_match_tpu.lora import init_lora
    from clip_lora_match_tpu.models import clip as clip_model
    from clip_lora_match_tpu.nn.layers import set_kernel_flags
    from clip_lora_match_tpu.train import (
        init_train_state,
        make_chained_train_step,
        make_optimizer,
    )

    set_kernel_flags(fused_lora=False, flash_attention=False,
                     small_attention=False)

    arch = ClipArchConfig()
    params = clip_model.init_params(jax.random.PRNGKey(0), arch)
    lora_cfg = LoraConfig()
    K = args.chain
    rng = np.random.default_rng(0)

    variants = []
    for B in batch_sizes:
        tcfg = TrainingConfig(batch_size=B)
        tx, _ = make_optimizer(tcfg, 100)
        state = init_train_state(
            init_lora(jax.random.PRNGKey(1), arch, lora_cfg), tx,
            rng_impl="rbg",
        )
        chained = make_chained_train_step(
            params, arch, lora_cfg, tcfg, tx, chain=K,
            eot_id=arch.vocab_size - 1, compute_dtype=jnp.bfloat16,
        )
        # Mirror the production token stream (advisor r3): padded text with a
        # real EOT at a mid-row position and zeroed mask past it, so EOT
        # pooling and the pad-mask branch are in the timed program.
        ids = rng.integers(0, arch.vocab_size - 2, (B, 64)).astype(np.int32)
        eot_pos = 48
        ids[:, eot_pos] = arch.vocab_size - 1
        mask = np.zeros((B, 64), np.int32)
        mask[:, : eot_pos + 1] = 1
        one = {
            "pixel_values": jnp.asarray(
                rng.normal(
                    size=(B, arch.image_size, arch.image_size, 3)
                ).astype(np.float32)
            ),
            "input_ids": jnp.asarray(ids),
            "attention_mask": jnp.asarray(mask),
        }
        batches = {k: jnp.broadcast_to(v, (K,) + v.shape)
                   for k, v in one.items()}
        variants.append((B, state, chained, batches))

    print("warming buckets...", file=sys.stderr)
    for _, state, chained, batches in variants:
        chained(state, batches)

    results = {B: [] for B, *_ in variants}
    for trial in range(args.trials):
        for B, state, chained, batches in variants:  # interleaved, one proc
            t = paired_burst_time(
                lambda s, b: chained(s, b)[1], (state, batches), iters=4
            ) / K
            results[B].append(t)
            print(
                f"trial {trial} B={B}: {t * 1e3:.1f} ms/step "
                f"({B / t:,.0f} ex/s)",
                file=sys.stderr,
            )

    print(f"\n== medians (chain{K}, S=64) ==")
    for B in results:
        med = float(np.median(results[B]))
        print(f"B={B}: {med * 1e3:.1f} ms/step -> {B / med:,.0f} ex/s/chip")


if __name__ == "__main__":
    main()
