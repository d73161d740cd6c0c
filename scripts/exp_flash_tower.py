"""Experiment: flash-attention dispatch A/B inside full image towers.

Produced the r3 in-tower table in docs/DESIGN.md §7.3 that corrected the
flash "auto" gate: the Pallas flash kernel loses to XLA's fused attention at
every supported CLIP geometry on v5e (S=197/257/577), so FLASH_MIN_SEQ is a
never-fires sentinel. Re-run this after a kernel change or on new hardware
before lowering the gate.

Usage: python scripts/exp_flash_tower.py [--arch b16|l14|l14_336] [--batch B]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from scripts._common import paired_burst_time, sync_device  # noqa: E402

from clip_lora_match_tpu.core.config import (  # noqa: E402
    VIT_B16,
    VIT_B32,
    VIT_L14,
    VIT_L14_336,
)
from clip_lora_match_tpu.models import clip as clip_model  # noqa: E402
from clip_lora_match_tpu.nn.layers import set_kernel_flags  # noqa: E402

ARCHES = {"b32": VIT_B32, "b16": VIT_B16, "l14": VIT_L14, "l14_336": VIT_L14_336}


_sync = sync_device


def bench(fn, args, iters=6):
    return paired_burst_time(fn, args, iters=iters)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="b16", choices=sorted(ARCHES))
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--trials", type=int, default=2)
    args = ap.parse_args()

    arch = ARCHES[args.arch]
    B = args.batch
    S = (arch.image_size // arch.patch_size) ** 2 + 1
    params = clip_model.init_params(jax.random.PRNGKey(0), arch)
    rng = np.random.default_rng(0)
    pix = jnp.asarray(
        rng.normal(size=(B, arch.image_size, arch.image_size, 3)).astype(
            np.float32
        )
    )

    def make(flash):
        set_kernel_flags(
            fused_lora=False, flash_attention=flash, small_attention=True,
            interpret=jax.default_backend() != "tpu",
        )

        @jax.jit
        def embed(params, pix):
            feats = clip_model.encode_image_features(
                params, pix, arch, compute_dtype=jnp.bfloat16, unroll=True
            )
            return clip_model.l2_normalize(feats)

        out = embed(params, pix)
        _sync(out)
        return embed

    f_xla = make(False)
    f_flash = make(True)  # force the kernel ("auto" never fires on v5e)
    for trial in range(args.trials):
        t_x = bench(f_xla, (params, pix))
        t_f = bench(f_flash, (params, pix))
        print(
            f"[{args.arch} S={S} B={B} trial {trial}] "
            f"xla: {t_x*1e3:.2f} ms ({B/t_x:,.0f} img/s) | "
            f"flash: {t_f*1e3:.2f} ms ({B/t_f:,.0f} img/s) | "
            f"flash/xla {t_f/t_x:.2f}x"
        )


if __name__ == "__main__":
    main()
