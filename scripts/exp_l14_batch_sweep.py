"""L/14 image-embed batch sweep (VERDICT r4 next-step #7).

r4 swept B={8,16,32} and found 561 img/s at 32 "still rising"; this sweeps
{32,48,64,96} same-process with the paired-burst protocol so the operating
point for the bench extra is measured, not assumed.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from clip_lora_match_tpu.core.config import VIT_L14
    from clip_lora_match_tpu.models import clip as clip_model

    def _sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        leaf.block_until_ready()
        np.asarray(leaf)

    def bench(fn, *args, iters=6):
        for _ in range(2):
            out = fn(*args)
        _sync(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(3 * iters):
            out = fn(*args)
        _sync(out)
        t3 = time.perf_counter() - t0
        return max((t3 - t1) / (2 * iters), 1e-9)

    arch = VIT_L14
    params = clip_model.init_params(jax.random.PRNGKey(0), arch)
    rng = np.random.default_rng(0)

    @jax.jit
    def embed(params, pix):
        feats = clip_model.encode_image_features(
            params, pix, arch, compute_dtype=jnp.bfloat16, unroll=True
        )
        return clip_model.l2_normalize(feats)

    for trial in range(2):
        for B in (32, 48, 64, 96):
            pix = jnp.asarray(
                rng.normal(size=(B, arch.image_size, arch.image_size, 3))
                .astype(np.float32)
            )
            t = bench(embed, params, pix)
            print(f"[l14 sweep] trial {trial} B={B}: {t * 1e3:.1f} ms -> "
                  f"{B / t:,.0f} img/s", flush=True)


if __name__ == "__main__":
    main()
