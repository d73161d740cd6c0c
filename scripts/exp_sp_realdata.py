"""Drive sequence parallelism on real reference images at full ViT-B/32.

Verify-skill drive (not a test): encodes real jpegs from the reference's
shipped corpus through the image tower twice on an 8-virtual-device CPU
mesh — once with the plain lax.scan transformer, once sequence-sharded as a
dp4×sp2 KV ring (parallel/sp.py; S=50 splits 25/25, no padding) — then the
text tower on the matching captions (S=77 pads to 78, exercising the padded
ring with the causal+pad mask). Reports max feature deltas. Run with:

  env PYTHONPATH= PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/exp_sp_realdata.py
"""

import glob
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np


def main():
    from clip_lora_match_tpu.core.config import ClipArchConfig
    from clip_lora_match_tpu.models import clip as clip_model
    from clip_lora_match_tpu.parallel.sp import (
        make_sp_mesh,
        make_sp_transformer,
        shard_clip_sp,
    )
    from clip_lora_match_tpu.preprocess import ClipPreprocessor

    images = sorted(glob.glob("/root/reference/data/custom/images/*.jpg"))
    assert images, "no reference jpegs found"
    images = (images * 8)[:8]  # dp=4 needs a batch multiple of 4
    pp = ClipPreprocessor()
    pix = np.concatenate([pp.preprocess_image(f) for f in images])
    texts = ["tas pink kanken", "kaca mata pink", "payung hitam", "botol minum"] * 2
    toks = pp.preprocess_text(texts)
    ids, am = toks["input_ids"], toks["attention_mask"]
    print(f"preprocessed {len(images)} real images -> {pix.shape}, text {ids.shape}")

    arch = ClipArchConfig()  # full ViT-B/32
    params = clip_model.init_params(jax.random.PRNGKey(0), arch)

    t0 = time.time()
    ref_img = np.asarray(
        jax.jit(lambda p, x: clip_model.encode_image_features(p, x, arch))(
            params, pix
        )
    )
    ref_txt = np.asarray(
        jax.jit(
            lambda p, i, m: clip_model.encode_text_features(
                p, i, arch, attention_mask=m, eot_id=arch.vocab_size - 1
            )
        )(params, ids, am)
    )
    print(f"plain towers: {time.time() - t0:.1f}s")

    mesh = make_sp_mesh(n_seq=2, n_data=4)
    sp = make_sp_transformer(mesh)
    t0 = time.time()
    with mesh:
        params_g = shard_clip_sp(params, mesh)
        got_img = np.asarray(
            jax.jit(
                lambda p, x: clip_model.encode_image_features(
                    p, x, arch, transformer_fn=sp
                )
            )(params_g, pix)
        )
        got_txt = np.asarray(
            jax.jit(
                lambda p, i, m: clip_model.encode_text_features(
                    p, i, arch, attention_mask=m, eot_id=arch.vocab_size - 1,
                    transformer_fn=sp,
                )
            )(params_g, ids, am)
        )
    print(f"dp4xsp2 ring towers: {time.time() - t0:.1f}s")

    for name, ref, got in (("image", ref_img, got_img), ("text", ref_txt, got_txt)):
        delta = np.abs(got - ref).max()
        cos = np.min(
            np.sum(ref * got, -1)
            / (np.linalg.norm(ref, axis=-1) * np.linalg.norm(got, axis=-1))
        )
        print(f"{name}: max abs delta {delta:.2e}, min cosine {cos:.9f}")
        assert cos > 0.999999, f"{name} SP mismatch"
    print("SP on real reference images: OK")


if __name__ == "__main__":
    main()
