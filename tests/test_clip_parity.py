"""Numerical parity: from-scratch JAX CLIP vs HF torch CLIPModel.

No pretrained weights exist in this environment (zero egress), so parity is
architectural: instantiate HF CLIPModel with RANDOM weights, convert the
state_dict with models/convert_hf.py, and require the JAX towers to reproduce
the torch activations. This is the exact gate real pretrained weights would
pass through (BASELINE.json: cosine ≥ 0.999)."""

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
