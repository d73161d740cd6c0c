"""Drive pipeline parallelism on real reference images at full ViT-B/32.

Verify-skill drive (not a test): encodes real jpegs from the reference's
shipped corpus through the image tower twice on an 8-virtual-device CPU
mesh — once with the plain lax.scan transformer, once as a dp4×pp2 GPipe
pipeline (parallel/pp.py) — and reports the max feature delta. Run with:

  env PYTHONPATH= PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/exp_pp_realdata.py
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
    from clip_lora_match_tpu.parallel.pp import (
        make_pipeline_transformer,
        make_pp_mesh,
        shard_clip_pp,
    )
    from clip_lora_match_tpu.preprocess import ClipPreprocessor

    images = sorted(glob.glob("/root/reference/data/custom/images/*.jpg"))
    assert images, "no reference jpegs found"
    # dp=4 × 2 microbatches needs 8 rows; tile the shipped corpus up to 8
    images = (images * 8)[:8]
    pp = ClipPreprocessor()
    pix = np.concatenate([pp.preprocess_image(f) for f in images])
    print(f"preprocessed {len(images)} real images -> {pix.shape}")

    arch = ClipArchConfig()  # full ViT-B/32
    params = clip_model.init_params(jax.random.PRNGKey(0), arch)

    t0 = time.time()
    ref = np.asarray(
        jax.jit(
            lambda p, x: clip_model.encode_image_features(p, x, arch)
        )(params, pix)
    )
    print(f"plain scan tower: {time.time() - t0:.1f}s")

    mesh = make_pp_mesh(n_stage=2, n_data=4)
    pipe = make_pipeline_transformer(mesh, n_microbatches=2)
    t0 = time.time()
    with mesh:
        params_g = shard_clip_pp(params, mesh)
        got = np.asarray(
            jax.jit(
                lambda p, x: clip_model.encode_image_features(
                    p, x, arch, transformer_fn=pipe
                )
            )(params_g, pix)
        )
    print(f"dp4xpp2 pipeline tower: {time.time() - t0:.1f}s")

    err = float(np.max(np.abs(got - ref)))
    cos = float(
        np.min(
            np.sum(got * ref, axis=1)
            / (np.linalg.norm(got, axis=1) * np.linalg.norm(ref, axis=1))
        )
    )
    print(f"max abs delta {err:.2e}, min cosine {cos:.9f}")
    assert err < 1e-4 and cos > 0.999999, (err, cos)
    print("PP on real reference images: OK")

    # 3D composition: GPipe stages × KV-ring sequence shard × data — the
    # vision tower's S=50 splits 25/25 over the seq axis inside each stage
    mesh3 = make_pp_mesh(n_stage=2, n_data=2, n_seq=2)
    pipe3 = make_pipeline_transformer(mesh3, n_microbatches=2)
    t0 = time.time()
    with mesh3:
        params_g3 = shard_clip_pp(params, mesh3)
        got3 = np.asarray(
            jax.jit(
                lambda p, x: clip_model.encode_image_features(
                    p, x, arch, transformer_fn=pipe3
                )
            )(params_g3, pix)
        )
    print(f"dp2xpp2xsp2 tower: {time.time() - t0:.1f}s")
    err3 = float(np.max(np.abs(got3 - ref)))
    cos3 = float(
        np.min(
            np.sum(got3 * ref, axis=1)
            / (np.linalg.norm(got3, axis=1) * np.linalg.norm(ref, axis=1))
        )
    )
    print(f"3D max abs delta {err3:.2e}, min cosine {cos3:.9f}")
    assert err3 < 1e-4 and cos3 > 0.999999, (err3, cos3)
    print("dp2xpp2xsp2 on real reference images: OK")


if __name__ == "__main__":
    main()
