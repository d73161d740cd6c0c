"""Numerical parity: from-scratch JAX CLIP vs HF torch CLIPModel.

No pretrained weights exist in this environment (zero egress), so parity is
architectural: instantiate HF CLIPModel with RANDOM weights, convert the
state_dict with models/convert_hf.py, and require the JAX towers to reproduce
the torch activations. This is the exact gate real pretrained weights would
pass through (BASELINE.json: cosine ≥ 0.999)."""

import jax.numpy as jnp
import numpy as np
import pytest

from clip_lora_match_tpu.core.config import ClipArchConfig
from clip_lora_match_tpu.models import clip as jclip
from clip_lora_match_tpu.models.convert_hf import convert_hf_clip_model

torch = pytest.importorskip("torch")
from transformers import CLIPConfig, CLIPModel, CLIPTextConfig, CLIPVisionConfig  # noqa: E402


def _cosine(a, b):
    a, b = np.ravel(a), np.ravel(b)
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def _make_pair(arch: ClipArchConfig, seed=0):
    torch.manual_seed(seed)
    hf_cfg = CLIPConfig(
        vision_config=CLIPVisionConfig(
            image_size=arch.image_size,
            patch_size=arch.patch_size,
            hidden_size=arch.vision_width,
            num_hidden_layers=arch.vision_layers,
            num_attention_heads=arch.vision_heads,
            intermediate_size=arch.vision_mlp_dim,
            hidden_act="quick_gelu",
            layer_norm_eps=arch.layer_norm_eps,
        ).to_dict(),
        text_config=CLIPTextConfig(
            vocab_size=arch.vocab_size,
            max_position_embeddings=arch.max_text_length,
            hidden_size=arch.text_width,
            num_hidden_layers=arch.text_layers,
            num_attention_heads=arch.text_heads,
            intermediate_size=arch.text_mlp_dim,
            hidden_act="quick_gelu",
            layer_norm_eps=arch.layer_norm_eps,
            eos_token_id=arch.vocab_size - 1,
        ).to_dict(),
        projection_dim=arch.projection_dim,
    )
    hf = CLIPModel(hf_cfg).eval()
    params = convert_hf_clip_model(hf, arch)
    return hf, params


def _rand_inputs(arch, batch=3, seed=1):
    rng = np.random.default_rng(seed)
    pix_nhwc = rng.normal(size=(batch, arch.image_size, arch.image_size, 3)).astype(
        np.float32
    )
    eot = arch.vocab_size - 1
    L = arch.max_text_length
    ids = np.full((batch, L), eot, np.int64)
    mask = np.zeros((batch, L), np.int64)
    for i in range(batch):
        n = int(rng.integers(3, L))
        ids[i, 1:n] = rng.integers(1, arch.vocab_size - 2, n - 1)
        ids[i, 0] = arch.vocab_size - 2  # pretend SOT
        ids[i, n] = eot
        mask[i, : n + 1] = 1
    return pix_nhwc, ids, mask


SMALL = ClipArchConfig(
    image_size=32,
    patch_size=16,
    vision_width=64,
    vision_layers=2,
    vision_heads=4,
    vision_mlp_dim=128,
    vocab_size=101,
    max_text_length=16,
    text_width=32,
    text_layers=2,
    text_heads=4,
    text_mlp_dim=64,
    projection_dim=24,
)


@pytest.fixture(scope="module")
def small_pair():
    return _make_pair(SMALL)


def test_image_tower_parity_small(small_pair):
    hf, params = small_pair
    pix, _, _ = _rand_inputs(SMALL)
    with torch.no_grad():
        theirs = hf.get_image_features(
            pixel_values=torch.from_numpy(np.moveaxis(pix, -1, 1))
        ).numpy()
    ours = np.asarray(jclip.encode_image_features(params, pix, SMALL))
    np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=1e-4)


def test_text_tower_parity_small(small_pair):
    hf, params = small_pair
    _, ids, mask = _rand_inputs(SMALL)
    with torch.no_grad():
        theirs = hf.get_text_features(
            input_ids=torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)
        ).numpy()
    ours = np.asarray(
        jclip.encode_text_features(
            params, ids, SMALL, attention_mask=mask, eot_id=SMALL.vocab_size - 1
        )
    )
    np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=1e-4)


def test_joint_forward_logits_parity_small(small_pair):
    hf, params = small_pair
    pix, ids, mask = _rand_inputs(SMALL)
    with torch.no_grad():
        out = hf(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
            pixel_values=torch.from_numpy(np.moveaxis(pix, -1, 1)),
        )
    ours = jclip.clip_forward(
        params, pix, ids, SMALL, attention_mask=mask, eot_id=SMALL.vocab_size - 1
    )
    np.testing.assert_allclose(
        np.asarray(ours["logits_per_image"]),
        out.logits_per_image.numpy(),
        atol=1e-4,
        rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(ours["image_embeds"]), out.image_embeds.numpy(), atol=2e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(ours["text_embeds"]), out.text_embeds.numpy(), atol=2e-5, rtol=1e-4
    )


def test_text_pooling_without_mask_matches(small_pair):
    """Pad tokens sit after EOT under causal masking, so dropping the pad mask
    must not change the pooled embedding (enables mask-free serving path)."""
    hf, params = small_pair
    _, ids, mask = _rand_inputs(SMALL)
    with_mask = np.asarray(
        jclip.encode_text_features(
            params, ids, SMALL, attention_mask=mask, eot_id=SMALL.vocab_size - 1
        )
    )
    without = np.asarray(
        jclip.encode_text_features(params, ids, SMALL, eot_id=SMALL.vocab_size - 1)
    )
    np.testing.assert_allclose(with_mask, without, atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_full_vit_b32_parity():
    """The real gate: full ViT-B/32 geometry, cosine ≥ 0.999 (BASELINE.md)."""
    arch = ClipArchConfig()
    hf, params = _make_pair(arch, seed=7)
    pix, ids, mask = _rand_inputs(arch, batch=2, seed=3)
    with torch.no_grad():
        t_img = hf.get_image_features(
            pixel_values=torch.from_numpy(np.moveaxis(pix, -1, 1))
        ).numpy()
        t_txt = hf.get_text_features(
            input_ids=torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)
        ).numpy()
    j_img = np.asarray(jclip.encode_image_features(params, pix, arch))
    j_txt = np.asarray(
        jclip.encode_text_features(
            params, ids, arch, attention_mask=mask, eot_id=arch.vocab_size - 1
        )
    )
    for ours, theirs in [(j_img, t_img), (j_txt, t_txt)]:
        for i in range(ours.shape[0]):
            assert _cosine(ours[i], theirs[i]) >= 0.999
        np.testing.assert_allclose(ours, theirs, atol=5e-4, rtol=1e-3)


def test_init_params_rng_keys_uncorrelated():
    """r1 advisor: visual and text projection inits must come from distinct
    RNG keys (a shared key correlates the towers for from-scratch training)."""
    import jax

    params = jclip.init_params(jax.random.PRNGKey(0), SMALL)
    vp = np.asarray(params["visual"]["proj"]["kernel"])
    tp = np.asarray(params["text"]["proj"]["kernel"])
    k = min(vp.shape[0], tp.shape[0])
    v = vp[:k].ravel()
    t = tp[:k].ravel()
    corr = abs(float(np.corrcoef(v[: t.size], t[: v.size])[0, 1]))
    assert corr < 0.2, f"projection inits look correlated: |corr|={corr:.3f}"


# ---------------------------------------------------------------------------
# Model-family breadth: presets, checkpoint arch inference, non-B/32 parity
# ---------------------------------------------------------------------------


def test_arch_presets_resolve_from_model_name():
    """Configuring a non-B/32 model name must build that geometry, not a
    silent B/32 (the reference resolved this through the HF hub,
    ref:models/clip_model.py:44-60)."""
    from clip_lora_match_tpu.core.config import VIT_B16, VIT_L14, ClipConfig

    cfg = ClipConfig(model_name="openai/clip-vit-base-patch16")
    assert cfg.arch == VIT_B16 and cfg.arch.patch_size == 16
    cfg = ClipConfig(model_name="openai/clip-vit-large-patch14")
    assert cfg.arch == VIT_L14 and cfg.arch.vision_layers == 24
    assert cfg.arch.projection_dim == 768
    with pytest.warns(UserWarning, match="unknown CLIP model name"):
        cfg = ClipConfig(model_name="someone/custom-clip")
    assert cfg.arch.patch_size == 32  # B/32 fallback


def test_preprocess_image_size_follows_arch():
    """L/14-336 (or any non-224 geometry) must also retarget the
    preprocessor, or the pos-embedding add fails on the first encode."""
    from clip_lora_match_tpu.core.config import ClipConfig

    cfg = ClipConfig(model_name="openai/clip-vit-large-patch14-336")
    assert cfg.arch.image_size == 336
    assert cfg.preprocess.image_size == 336


def test_non_224_geometry_encodes_end_to_end():
    """A non-224 arch flows PIL → preprocessor → towers without shape
    errors (the pos-embedding add is where a mismatch would explode)."""
    from PIL import Image

    from clip_lora_match_tpu.core.config import ClipConfig
    from clip_lora_match_tpu.models.encoder import ClipEncoder

    arch = ClipArchConfig(
        image_size=96, patch_size=16, vision_width=64, vision_layers=2,
        vision_heads=2, vision_mlp_dim=128, vocab_size=200,
        max_text_length=12, text_width=64, text_layers=2, text_heads=2,
        text_mlp_dim=128, projection_dim=32,
    )
    cfg = ClipConfig(arch=arch, use_pallas_kernels=False)
    assert cfg.preprocess.image_size == 96
    import jax

    params = jclip.init_params(jax.random.PRNGKey(0), arch)
    enc = ClipEncoder(params, arch=arch, config=cfg)
    img = Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (130, 170, 3), dtype=np.uint8)
    )
    e = enc.encode_image(img)
    assert e.shape == (32,)
    assert np.isfinite(e).all()


def test_arch_yaml_override_block(tmp_path):
    from clip_lora_match_tpu.core.config import load_clip_config

    p = tmp_path / "clip.yaml"
    p.write_text(
        "model:\n  name: openai/clip-vit-base-patch16\n"
        "  arch:\n    vision_layers: 3\n    projection_dim: 128\n"
    )
    cfg = load_clip_config(str(p))
    assert cfg.arch.patch_size == 16  # from the preset
    assert cfg.arch.vision_layers == 3 and cfg.arch.projection_dim == 128


INFER = ClipArchConfig(
    image_size=32,
    patch_size=16,
    vision_width=128,
    vision_layers=2,
    vision_heads=2,   # = width/64: inference-recoverable convention
    vision_mlp_dim=256,
    vocab_size=101,
    max_text_length=16,
    text_width=64,
    text_layers=3,
    text_heads=1,
    text_mlp_dim=128,
    projection_dim=24,
)


def test_infer_arch_from_state_dict():
    """Any CLIP checkpoint self-describes: geometry recovered exactly from
    tensor shapes (heads via OpenAI's 64-dim-per-head convention)."""
    from clip_lora_match_tpu.models.convert_hf import infer_arch_from_state_dict

    hf, _ = _make_pair(INFER)
    got = infer_arch_from_state_dict(hf.state_dict())
    assert got == INFER


def test_parity_non_b32_geometry():
    """Converter + towers at an L/14-flavored geometry (patch 14 ⇒ 257-token
    vision sequence, distinct projection dim) — the family is generic, not
    hardcoded to B/32."""
    arch = ClipArchConfig(
        image_size=112,
        patch_size=14,
        vision_width=128,
        vision_layers=3,
        vision_heads=2,
        vision_mlp_dim=256,
        vocab_size=211,
        max_text_length=12,
        text_width=64,
        text_layers=2,
        text_heads=1,
        text_mlp_dim=128,
        projection_dim=48,
    )
    hf, params = _make_pair(arch, seed=11)
    pix, ids, mask = _rand_inputs(arch, batch=2, seed=5)
    with torch.no_grad():
        t_img = hf.get_image_features(
            pixel_values=torch.from_numpy(np.moveaxis(pix, -1, 1))
        ).numpy()
        t_txt = hf.get_text_features(
            input_ids=torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)
        ).numpy()
    j_img = np.asarray(jclip.encode_image_features(params, pix, arch))
    j_txt = np.asarray(
        jclip.encode_text_features(
            params, ids, arch, attention_mask=mask, eot_id=arch.vocab_size - 1
        )
    )
    np.testing.assert_allclose(j_img, t_img, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(j_txt, t_txt, atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_full_vit_b16_parity():
    """Full ViT-B/16: the 197-token vision sequence at production widths,
    arch resolved from the model-name preset."""
    from clip_lora_match_tpu.core.config import VIT_B16

    hf, params = _make_pair(VIT_B16, seed=13)
    pix, ids, mask = _rand_inputs(VIT_B16, batch=2, seed=9)
    with torch.no_grad():
        t_img = hf.get_image_features(
            pixel_values=torch.from_numpy(np.moveaxis(pix, -1, 1))
        ).numpy()
    j_img = np.asarray(jclip.encode_image_features(params, pix, VIT_B16))
    for i in range(j_img.shape[0]):
        assert _cosine(j_img[i], t_img[i]) >= 0.999
    np.testing.assert_allclose(j_img, t_img, atol=5e-4, rtol=1e-3)


@pytest.mark.slow
def test_full_vit_l14_parity():
    """Full ViT-L/14 (VERDICT r3 #2): the LARGEST family member at real
    widths — 24 vision layers × 1024, S=257, text 768×12. Proves the
    'any HF CLIP name from config' claim (ref:models/clip_model.py:44-56)
    at the geometry the presets advertise, both towers."""
    from clip_lora_match_tpu.core.config import VIT_L14

    hf, params = _make_pair(VIT_L14, seed=21)
    pix, ids, mask = _rand_inputs(VIT_L14, batch=2, seed=22)
    with torch.no_grad():
        t_img = hf.get_image_features(
            pixel_values=torch.from_numpy(np.moveaxis(pix, -1, 1))
        ).numpy()
        t_txt = hf.get_text_features(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
        ).numpy()
    j_img = np.asarray(jclip.encode_image_features(params, pix, VIT_L14))
    j_txt = np.asarray(
        jclip.encode_text_features(
            params, jnp.asarray(ids), VIT_L14,
            attention_mask=jnp.asarray(mask),
            eot_id=VIT_L14.vocab_size - 1,
        )
    )
    for i in range(j_img.shape[0]):
        assert _cosine(j_img[i], t_img[i]) >= 0.999
        assert _cosine(j_txt[i], t_txt[i]) >= 0.999
    np.testing.assert_allclose(j_img, t_img, atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(j_txt, t_txt, atol=1e-3, rtol=1e-3)


@pytest.mark.slow
def test_full_vit_l14_336_parity():
    """L/14-336: the 577-token vision sequence (the longest CLIP geometry).
    Image tower only — the text tower is identical to L/14's."""
    from clip_lora_match_tpu.core.config import VIT_L14_336

    hf, params = _make_pair(VIT_L14_336, seed=31)
    pix, _, _ = _rand_inputs(VIT_L14_336, batch=1, seed=32)
    with torch.no_grad():
        t_img = hf.get_image_features(
            pixel_values=torch.from_numpy(np.moveaxis(pix, -1, 1))
        ).numpy()
    j_img = np.asarray(
        jclip.encode_image_features(params, pix, VIT_L14_336)
    )
    assert _cosine(j_img[0], t_img[0]) >= 0.999
    np.testing.assert_allclose(j_img, t_img, atol=1e-3, rtol=1e-3)
