"""A/B: chained micro-steps × text-sliced S=64 batches, combined.

bench.py measures chain4 (dispatch amortization) and S=64 slicing (text
tower FLOP cut) separately; the trainer applies BOTH when the corpus fits
64 real tokens (TrainingConfig.chain_steps + text_seq_slice). This measures
the combined step in one process, interleaved with the singles, median of
N trials (CLAUDE.md measurement discipline). Run on the real TPU:

  python scripts/exp_train_chain_s64.py [--trials 3]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

from scripts._common import paired_burst_time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--chain", type=int, default=4)
    args = ap.parse_args()

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
        make_train_step,
    )

    set_kernel_flags(fused_lora=False, flash_attention=False,
                     small_attention=False)

    arch = ClipArchConfig()
    params = clip_model.init_params(jax.random.PRNGKey(0), arch)
    lora_cfg = LoraConfig()
    tcfg = TrainingConfig(batch_size=args.batch)
    tx, _ = make_optimizer(tcfg, 100)
    state = init_train_state(
        init_lora(jax.random.PRNGKey(1), arch, lora_cfg), tx, rng_impl="rbg"
    )
    B, K = args.batch, args.chain
    rng = np.random.default_rng(0)
    batch = {
        "pixel_values": jnp.asarray(
            rng.normal(size=(B, arch.image_size, arch.image_size, 3)).astype(
                np.float32
            )
        ),
        "input_ids": jnp.asarray(
            rng.integers(0, arch.vocab_size - 2, (B, arch.max_text_length))
            .astype(np.int32)
        ),
        "attention_mask": jnp.asarray(
            np.ones((B, arch.max_text_length), np.int32)
        ),
    }
    step = make_train_step(
        params, arch, lora_cfg, tcfg, tx,
        eot_id=arch.vocab_size - 1, compute_dtype=jnp.bfloat16,
    )
    chained = make_chained_train_step(
        params, arch, lora_cfg, tcfg, tx, chain=K,
        eot_id=arch.vocab_size - 1, compute_dtype=jnp.bfloat16,
    )
    batch64 = dict(
        batch,
        input_ids=batch["input_ids"][:, :64],
        attention_mask=batch["attention_mask"][:, :64],
    )
    batches = {k: jnp.broadcast_to(v, (K,) + v.shape) for k, v in batch.items()}
    batches64 = {
        k: jnp.broadcast_to(v, (K,) + v.shape) for k, v in batch64.items()
    }

    variants = [
        ("single S=77", lambda: paired_burst_time(
            lambda s, b: step(s, b)[1], (state, batch), iters=8)),
        ("single S=64", lambda: paired_burst_time(
            lambda s, b: step(s, b)[1], (state, batch64), iters=8)),
        (f"chain{K} S=77", lambda: paired_burst_time(
            lambda s, b: chained(s, b)[1], (state, batches), iters=4)),
        (f"chain{K} S=64", lambda: paired_burst_time(
            lambda s, b: chained(s, b)[1], (state, batches64), iters=4)),
    ]
    # warm every jit bucket before any timed loop (cold compiles are ~7s+
    # through the relay and must stay out of the timed region)
    print("warming buckets...", file=sys.stderr)
    for _ in range(1):
        step(state, batch); step(state, batch64)
        chained(state, batches); chained(state, batches64)

    results = {name: [] for name, _ in variants}
    for trial in range(args.trials):
        for name, fn in variants:  # interleaved A/B in one process
            t = fn()
            per_step = t / (K if "chain" in name else 1)
            results[name].append(per_step)
            print(
                f"trial {trial} {name}: {per_step * 1e3:.1f} ms/step "
                f"({B / per_step:,.0f} ex/s)",
                file=sys.stderr,
            )
    print("\n== medians ==")
    for name in results:
        med = float(np.median(results[name]))
        print(f"{name}: {med * 1e3:.1f} ms/step -> {B / med:,.0f} ex/s/chip")


if __name__ == "__main__":
    main()
