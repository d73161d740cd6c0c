"""Experiment: fused-MLP Pallas kernel vs the XLA fc1→gelu→fc2 chain.

Measurement harness for ops/mlp_fused.py (r3 image-embed follow-up: the
forward is MLP-dominated after head-pair packing — DESIGN.md §7.4). Times a
12-layer chained MLP application at the image tower's serving geometry so the
per-layer HBM round-trip of the (M, 3072) hidden shows up in the A/B.

Usage: python scripts/exp_mlp_fused.py [--geometry image|text] [--batch B]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from clip_lora_match_tpu.ops.mlp_fused import (  # noqa: E402
    mlp_fused,
    mlp_fused_reference,
)


from scripts._common import paired_burst_time, sync_device  # noqa: E402

_sync = sync_device


def bench(fn, args, iters=8, warmup=2):
    return paired_burst_time(fn, args, iters=iters, warmup=warmup)


def tower_ab(batch, trials, iters):
    """A/B the flag in-tower: full image-tower forward, fused_mlp off vs on."""
    from clip_lora_match_tpu.core.config import ClipArchConfig
    from clip_lora_match_tpu.models import clip as clip_model
    from clip_lora_match_tpu.nn.layers import set_kernel_flags

    on_tpu = jax.default_backend() == "tpu"
    arch = ClipArchConfig()
    params = clip_model.init_params(jax.random.PRNGKey(0), arch)
    rng = np.random.default_rng(0)
    pix = jnp.asarray(
        rng.normal(size=(batch, arch.image_size, arch.image_size, 3)).astype(
            np.float32
        )
    )

    def make(fused):
        set_kernel_flags(
            fused_lora=False,
            flash_attention="auto",
            small_attention=on_tpu,
            fused_mlp=fused,
            interpret=not on_tpu,
        )

        @jax.jit
        def embed(params, pix):
            feats = clip_model.encode_image_features(
                params, pix, arch, compute_dtype=jnp.bfloat16, unroll=True
            )
            return clip_model.l2_normalize(feats)

        out = embed(params, pix)  # trace under the right flag state
        _sync(out)
        return embed, out

    f_off, y_off = make(False)
    f_on, y_on = make(True)
    cos = float(
        jnp.mean(
            jnp.sum(
                y_off.astype(jnp.float32) * y_on.astype(jnp.float32), axis=-1
            )
        )
    )
    print(f"[tower] fused-vs-xla embedding cosine: {cos:.6f}")
    for trial in range(trials):
        t_off = bench(f_off, (params, pix), iters=iters)
        t_on = bench(f_on, (params, pix), iters=iters)
        print(
            f"[trial {trial}] off: {t_off*1e3:.2f} ms ({batch/t_off:,.0f} img/s)"
            f" | fused_mlp: {t_on*1e3:.2f} ms ({batch/t_on:,.0f} img/s)"
            f" | delta {100*(t_off-t_on)/t_off:+.1f}%"
        )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--geometry", default="image", choices=["image", "text"])
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--layers", type=int, default=12)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--tower", action="store_true",
                    help="A/B the full image tower instead of isolated MLPs")
    args = ap.parse_args()

    if args.tower:
        tower_ab(args.batch, args.trials, args.iters)
        return

    S = 50 if args.geometry == "image" else 77
    D, H = 768, 3072
    M = args.batch * S
    L = args.layers
    dtype = jnp.bfloat16

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(M, D)).astype(np.float32), dtype=dtype)
    w1 = jnp.asarray(
        rng.normal(size=(L, D, H)).astype(np.float32) * 0.02, dtype=dtype
    )
    b1 = jnp.asarray(rng.normal(size=(L, H)).astype(np.float32) * 0.02, dtype)
    w2 = jnp.asarray(
        rng.normal(size=(L, H, D)).astype(np.float32) * 0.02, dtype=dtype
    )
    b2 = jnp.asarray(rng.normal(size=(L, D)).astype(np.float32) * 0.02, dtype)

    flops = 2 * M * H * (D + D) * L

    @jax.jit
    def xla_chain(x, w1, b1, w2, b2):
        def body(h, layer):
            lw1, lb1, lw2, lb2 = layer
            t = jnp.dot(h, lw1, preferred_element_type=dtype) + lb1
            t = t * jax.nn.sigmoid(1.702 * t)
            return jnp.dot(t, lw2, preferred_element_type=dtype) + lb2, None

        y, _ = jax.lax.scan(body, x, (w1, b1, w2, b2))
        return y

    def pallas_chain_factory(block_m, block_h):
        @jax.jit
        def chain(x, w1, b1, w2, b2):
            def body(h, layer):
                lw1, lb1, lw2, lb2 = layer
                return (
                    mlp_fused(
                        h, lw1, lb1, lw2, lb2, block_m=block_m, block_h=block_h
                    ),
                    None,
                )

            y, _ = jax.lax.scan(body, x, (w1, b1, w2, b2))
            return y

        return chain

    # correctness first
    ref = mlp_fused_reference(x, w1[0], b1[0], w2[0], b2[0])
    got = mlp_fused(x, w1[0], b1[0], w2[0], b2[0])
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))))
    print(f"[exp] single-layer max abs err vs oracle: {err:.5f}")

    variants = [("xla", xla_chain)]
    for bm in (128, 256, 512):
        variants.append((f"pallas bm={bm}", pallas_chain_factory(bm, 512)))

    inputs = (x, w1, b1, w2, b2)
    for trial in range(args.trials):
        line = []
        for name, fn in variants:
            try:
                dt = bench(fn, inputs)
            except Exception as e:  # noqa: BLE001
                line.append(f"{name}: FAIL({type(e).__name__})")
                continue
            tf = flops / dt / 1e12
            line.append(f"{name}: {dt*1e3:.3f} ms ({tf:.0f} TF/s)")
        print(f"[trial {trial}] " + " | ".join(line))


if __name__ == "__main__":
    main()
