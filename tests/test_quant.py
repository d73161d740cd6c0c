"""Int8 W8A8 serving-path tests (quant/int8.py + nn.layers dispatch).

The reference has no quantized path; these pin OUR contract: int8 towers
stay close to the fp32 oracle (cosine, not bitwise), rankings survive, and
the LoRA delta composes exactly (it bypasses quantization).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from clip_lora_match_tpu.core.config import ClipArchConfig, ClipConfig
from clip_lora_match_tpu.models import clip as clip_model
from clip_lora_match_tpu.nn import layers
from clip_lora_match_tpu.quant.int8 import (
    dequantize_linear_params,
    int8_matmul,
    quantize_clip_params,
    quantize_linear_params,
)


def _cosine(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.sum(a * b, -1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
    )


def test_weight_quant_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(64, 96)).astype(np.float32) * 0.05
    qp = quantize_linear_params({"kernel": jnp.asarray(w), "bias": None})
    assert qp["kernel_q"].dtype == jnp.int8
    wd = np.asarray(dequantize_linear_params(qp)["kernel"])
    # per-channel symmetric: |err| <= s_w/2 per element
    s_w = np.abs(w).max(axis=0) / 127.0
    assert (np.abs(wd - w) <= s_w[None, :] * 0.5 + 1e-8).all()


def test_int8_matmul_close_to_f32():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(8, 40, 64)).astype(np.float32)
    w = rng.normal(size=(64, 96)).astype(np.float32) * 0.1
    qp = quantize_linear_params({"kernel": jnp.asarray(w)})
    got = np.asarray(int8_matmul(jnp.asarray(x), qp["kernel_q"], qp["w_scale"]))
    ref = x @ w
    cos = _cosine(got.reshape(-1, 96), ref.reshape(-1, 96))
    assert cos.min() > 0.999


def test_linear_dispatches_on_kernel_q_and_lora_stays_exact():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(4, 10, 32)).astype(np.float32))
    p = {
        "kernel": jnp.asarray(rng.normal(size=(32, 48)).astype(np.float32) * 0.1),
        "bias": jnp.asarray(rng.normal(size=(48,)).astype(np.float32) * 0.01),
    }
    lora = {
        "a": jnp.asarray(rng.normal(size=(32, 4)).astype(np.float32) * 0.1),
        "b": jnp.asarray(rng.normal(size=(4, 48)).astype(np.float32) * 0.1),
    }
    qp = quantize_linear_params(p)
    y_q = layers.linear(qp, x, lora=lora, lora_scaling=2.0)
    y_f = layers.linear(p, x, lora=lora, lora_scaling=2.0)
    # base within quant error; the lora delta itself must match exactly:
    # (quant path with lora) - (quant path without) == float delta
    delta_q = y_q - layers.linear(qp, x)
    delta_f = y_f - layers.linear(p, x)
    np.testing.assert_allclose(
        np.asarray(delta_q), np.asarray(delta_f), atol=1e-5, rtol=1e-5
    )


@pytest.mark.slow
@pytest.mark.parametrize("tower", ["image", "text"])
def test_quantized_towers_cosine(tower):
    arch = ClipArchConfig(
        vision_layers=3, text_layers=3, vision_width=128, text_width=128,
        vision_heads=4, text_heads=4, vision_mlp_dim=512, text_mlp_dim=512,
        projection_dim=64, vocab_size=512, max_text_length=16, image_size=64,
        patch_size=16,
    )
    params = clip_model.init_params(jax.random.PRNGKey(0), arch)
    qparams = quantize_clip_params(params)
    rng = np.random.default_rng(3)
    if tower == "image":
        x = jnp.asarray(rng.normal(size=(4, 64, 64, 3)).astype(np.float32))
        f = lambda p: clip_model.encode_image_features(p, x, arch)
    else:
        ids = jnp.asarray(
            rng.integers(0, arch.vocab_size - 2, (4, 16)).astype(np.int32)
        )
        f = lambda p: clip_model.encode_text_features(
            p, ids, arch, eot_id=arch.vocab_size - 1
        )
    ref = np.asarray(f(params))
    got = np.asarray(f(qparams))
    cos = _cosine(got, ref)
    assert cos.min() > 0.995, cos


@pytest.mark.slow
def test_encoder_int8_mode_end_to_end_and_ranking():
    """ClipEncoder(quantize="int8"): embeddings near-parity with the float
    encoder, and retrieval rankings over a small index are preserved."""
    arch = ClipArchConfig(
        vision_layers=2, text_layers=2, vision_width=64, text_width=64,
        vision_heads=2, text_heads=2, vision_mlp_dim=256, text_mlp_dim=256,
        projection_dim=32, vocab_size=512, max_text_length=12, image_size=32,
        patch_size=16,
    )
    from clip_lora_match_tpu.models.encoder import ClipEncoder

    cfg = ClipConfig(arch=arch, use_pallas_kernels=False)
    params = clip_model.init_params(jax.random.PRNGKey(1), arch)
    enc_f = ClipEncoder(params, arch=arch, config=cfg)
    enc_q = ClipEncoder(params, arch=arch, config=cfg, quantize="int8")

    rng = np.random.default_rng(5)
    pix = rng.normal(size=(6, 32, 32, 3)).astype(np.float32)
    e_f = enc_f.encode_image_batch(pix)
    e_q = enc_q.encode_image_batch(pix)
    assert _cosine(e_f, e_q).min() > 0.995

    # ranking stability: each item's top-1 against the float index agrees
    sims_f = e_f @ e_f.T
    sims_q = e_q @ e_f.T
    np.fill_diagonal(sims_f, -2)
    np.fill_diagonal(sims_q, -2)
    assert (sims_f.argmax(1) == sims_q.argmax(1)).all()


@pytest.mark.slow
def test_encoder_int8_with_lora_adapter():
    """int8 base + float LoRA compose at the encoder level: attaching an
    adapter changes embeddings, and the int8 delta tracks the float delta
    (the adapter itself bypasses quantization)."""
    import jax.numpy as jnp

    from clip_lora_match_tpu.core.config import LoraConfig
    from clip_lora_match_tpu.lora import init_lora
    from clip_lora_match_tpu.models.encoder import ClipEncoder

    arch = ClipArchConfig(
        vision_layers=2, text_layers=2, vision_width=64, text_width=64,
        vision_heads=2, text_heads=2, vision_mlp_dim=256, text_mlp_dim=256,
        projection_dim=32, vocab_size=512, max_text_length=12, image_size=32,
        patch_size=16,
    )
    cfg = ClipConfig(arch=arch, use_pallas_kernels=False)
    params = clip_model.init_params(jax.random.PRNGKey(2), arch)
    lora_cfg = LoraConfig(r=4, alpha=8)
    lora = init_lora(jax.random.PRNGKey(3), arch, lora_cfg)
    # make the adapter non-trivial (init_lora zeros B, a no-op)
    lora = jax.tree_util.tree_map(
        lambda x: x + 0.05 if x.ndim else x, lora
    )

    rng = np.random.default_rng(7)
    pix = rng.normal(size=(3, 32, 32, 3)).astype(np.float32)

    def embeds(quantize, with_lora):
        enc = ClipEncoder(
            params, arch=arch, config=cfg,
            quantize=quantize,
            lora=lora if with_lora else None,
            lora_scaling=lora_cfg.scaling,
        )
        return enc.encode_image_batch(pix, normalize=False)

    d_float = embeds("none", True) - embeds("none", False)
    d_int8 = embeds("int8", True) - embeds("int8", False)
    assert np.abs(d_float).max() > 1e-4  # adapter actually does something
    # deltas agree up to the quantization noise of the activations each
    # adapter branch sees (the branches themselves are float-exact)
    assert _cosine(d_float, d_int8).min() > 0.97


def test_encoder_rejects_unknown_quantize_mode():
    from clip_lora_match_tpu.models.encoder import ClipEncoder

    arch = ClipArchConfig(
        vision_layers=1, text_layers=1, vision_width=64, text_width=64,
        vision_heads=2, text_heads=2, vision_mlp_dim=128, text_mlp_dim=128,
        projection_dim=32, vocab_size=128, max_text_length=8, image_size=32,
        patch_size=16,
    )
    params = clip_model.init_params(jax.random.PRNGKey(0), arch)
    with pytest.raises(ValueError):
        ClipEncoder(params, arch=arch, quantize="int4")
