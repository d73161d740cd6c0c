"""LoRA tests: no-op at init, merged≡unmerged equivalence (the BASELINE.json
export_lora gate), and PEFT checkpoint interop golden-tested against real
peft-wrapped torch CLIP."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_lora_match_tpu.core.config import LoraConfig
from clip_lora_match_tpu.lora import (
    init_lora,
    load_peft_adapter,
    lora_param_count,
    merge_lora,
    save_lora,
    load_lora,
    save_peft_adapter,
)
from clip_lora_match_tpu.models import clip as jclip
from tests.test_clip_parity import SMALL, _make_pair, _rand_inputs

CFG = LoraConfig(r=4, alpha=8)


@pytest.fixture(scope="module")
def pair():
    return _make_pair(SMALL, seed=11)


def _randomize_lora(lora, seed=5, scale=0.05):
    """Fill A and B with random values (B is zero at init)."""
    leaves, treedef = jax.tree_util.tree_flatten(lora)
    rng = np.random.default_rng(seed)
    leaves = [jnp.asarray(rng.normal(0, scale, l.shape).astype(np.float32)) for l in leaves]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def test_init_is_noop(pair):
    _, params = pair
    lora = init_lora(jax.random.PRNGKey(0), SMALL, CFG)
    pix, ids, mask = _rand_inputs(SMALL, batch=2)
    base = jclip.encode_image_features(params, pix, SMALL)
    with_lora = jclip.encode_image_features(
        params, pix, SMALL, lora=lora, lora_scaling=CFG.scaling
    )
    np.testing.assert_allclose(np.asarray(base), np.asarray(with_lora), atol=1e-6)


def test_param_count(pair):
    lora = init_lora(jax.random.PRNGKey(0), SMALL, CFG)
    # q/k/v/out per layer, both towers: (in*r + r*out) each
    expected = 0
    for width, layers in [(SMALL.vision_width, SMALL.vision_layers), (SMALL.text_width, SMALL.text_layers)]:
        expected += layers * 4 * (width * CFG.r + CFG.r * width)
    assert lora_param_count(lora) == expected


def test_merged_equals_unmerged(pair):
    """W' = W + (α/r)A@B must reproduce the adapter forward exactly."""
    _, params = pair
    lora = _randomize_lora(init_lora(jax.random.PRNGKey(0), SMALL, CFG))
    pix, ids, mask = _rand_inputs(SMALL, batch=2)
    unmerged_img = jclip.encode_image_features(
        params, pix, SMALL, lora=lora, lora_scaling=CFG.scaling
    )
    unmerged_txt = jclip.encode_text_features(
        params, ids, SMALL, attention_mask=mask, eot_id=SMALL.vocab_size - 1,
        lora=lora, lora_scaling=CFG.scaling,
    )
    merged = merge_lora(params, lora, CFG.scaling)
    merged_img = jclip.encode_image_features(merged, pix, SMALL)
    merged_txt = jclip.encode_text_features(
        merged, ids, SMALL, attention_mask=mask, eot_id=SMALL.vocab_size - 1
    )
    np.testing.assert_allclose(
        np.asarray(unmerged_img), np.asarray(merged_img), atol=2e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(unmerged_txt), np.asarray(merged_txt), atol=2e-5, rtol=1e-4
    )
    # adapter actually does something
    base_img = jclip.encode_image_features(params, pix, SMALL)
    assert np.abs(np.asarray(base_img) - np.asarray(merged_img)).max() > 1e-4


def test_native_save_load_roundtrip(tmp_path):
    lora = _randomize_lora(init_lora(jax.random.PRNGKey(1), SMALL, CFG))
    save_lora(str(tmp_path / "adapter"), lora, CFG)
    loaded, scaling = load_lora(str(tmp_path / "adapter"))
    assert scaling == CFG.scaling
    for a, b in zip(jax.tree_util.tree_leaves(lora), jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


# ---------------------------------------------------------------------------
# PEFT interop goldens
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def peft_pair(pair):
    torch = pytest.importorskip("torch")
    peft = pytest.importorskip("peft")
    hf, params = pair
    pcfg = peft.LoraConfig(
        r=CFG.r,
        lora_alpha=CFG.alpha,
        lora_dropout=0.0,
        bias="none",
        target_modules=["q_proj", "k_proj", "v_proj", "out_proj"],
    )
    wrapped = peft.get_peft_model(hf, pcfg)
    # randomize B so the adapter is non-trivial
    torch.manual_seed(3)
    with torch.no_grad():
        for name, mod in wrapped.named_modules():
            if hasattr(mod, "lora_B") and "default" in getattr(mod, "lora_B", {}):
                mod.lora_B["default"].weight.normal_(0, 0.05)
    return wrapped, params


def test_peft_import_golden(peft_pair, tmp_path):
    """Load a real PEFT checkpoint and match the torch adapter forward."""
    torch = pytest.importorskip("torch")
    wrapped, params = peft_pair
    out_dir = str(tmp_path / "peft_adapter")
    wrapped.save_pretrained(out_dir)
    lora, scaling = load_peft_adapter(out_dir, SMALL)
    assert scaling == CFG.scaling
    pix, ids, mask = _rand_inputs(SMALL, batch=2)
    with torch.no_grad():
        theirs = wrapped.get_image_features(
            pixel_values=torch.from_numpy(np.moveaxis(pix, -1, 1))
        ).numpy()
        theirs_txt = wrapped.get_text_features(
            input_ids=torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)
        ).numpy()
    ours = np.asarray(
        jclip.encode_image_features(params, pix, SMALL, lora=lora, lora_scaling=scaling)
    )
    ours_txt = np.asarray(
        jclip.encode_text_features(
            params, ids, SMALL, attention_mask=mask, eot_id=SMALL.vocab_size - 1,
            lora=lora, lora_scaling=scaling,
        )
    )
    np.testing.assert_allclose(ours, theirs, atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(ours_txt, theirs_txt, atol=3e-5, rtol=1e-4)


def test_peft_export_roundtrip(tmp_path):
    """save_peft_adapter → load_peft_adapter is lossless."""
    lora = _randomize_lora(init_lora(jax.random.PRNGKey(2), SMALL, CFG))
    out = str(tmp_path / "exported")
    save_peft_adapter(out, lora, CFG)
    loaded, scaling = load_peft_adapter(out, SMALL)
    assert scaling == CFG.scaling
    la, lb = jax.tree_util.tree_flatten(lora)[0], jax.tree_util.tree_flatten(loaded)[0]
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
