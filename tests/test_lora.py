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


def test_qkv_lora_shared_custom_vjp_matches_ad():
    """_qkv_lora_shared (shared-mask fused QKV LoRA, train fast path): the
    mask-recomputing custom_vjp must match plain jax AD of the same math,
    and reduce to the exact no-dropout delta at rate=0."""
    import jax
    import jax.numpy as jnp

    from clip_lora_match_tpu.nn import layers as L

    B, S, D, r = 4, 6, 16, 4
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    x = jax.random.normal(ks[0], (B, S, D), jnp.float32)
    a_cat = jax.random.normal(ks[1], (D, 3 * r)) * 0.1
    b_stk = jax.random.normal(ks[2], (3, r, D)) * 0.1
    rng = jax.random.PRNGKey(7)
    scaling, rate = 2.0, 0.1

    def oracle(x, a_cat, b_stk):
        keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
        xl = jnp.where(keep, x / (1.0 - rate), 0.0)
        d = (xl @ a_cat).reshape(B, S, 3, r)
        return scaling * jnp.einsum("bstr,trd->bstd", d, b_stk)

    out = L._qkv_lora_shared(x, a_cat, b_stk, rng, scaling, rate)
    np.testing.assert_allclose(out, oracle(x, a_cat, b_stk), atol=1e-6)

    g1 = jax.grad(
        lambda *t: jnp.sum(jnp.sin(L._qkv_lora_shared(*t, rng, scaling, rate))),
        argnums=(0, 1, 2),
    )(x, a_cat, b_stk)
    g2 = jax.grad(
        lambda *t: jnp.sum(jnp.sin(oracle(*t))), argnums=(0, 1, 2)
    )(x, a_cat, b_stk)
    for u, v in zip(g1, g2):
        np.testing.assert_allclose(u, v, atol=1e-5)

    out0 = L._qkv_lora_shared(x, a_cat, b_stk, rng, scaling, 0.0)
    ref0 = scaling * jnp.einsum(
        "bstr,trd->bstd", (x @ a_cat).reshape(B, S, 3, r), b_stk
    )
    np.testing.assert_allclose(out0, ref0, atol=1e-6)


def test_fused_lora_dropout_train_step_runs_and_learns():
    """Flag on: the full train step dispatches the shared-mask path, loss is
    finite and decreases over a few steps (statistical equivalence with the
    per-proj masks is argued in nn/layers.py; exact equality is not expected
    because the masks differ)."""
    import jax
    import jax.numpy as jnp

    from clip_lora_match_tpu.core.config import (
        ClipArchConfig,
        LoraConfig,
        TrainingConfig,
    )
    from clip_lora_match_tpu.lora.adapter import init_lora
    from clip_lora_match_tpu.models import clip as clip_model
    from clip_lora_match_tpu.nn.layers import set_kernel_flags
    from clip_lora_match_tpu.train import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    arch = ClipArchConfig(
        image_size=32, patch_size=16, vision_width=64, vision_layers=2,
        vision_heads=4, vision_mlp_dim=128, vocab_size=600,
        max_text_length=16, text_width=32, text_layers=2, text_heads=4,
        text_mlp_dim=64, projection_dim=16,
    )
    lora_cfg = LoraConfig(r=4, alpha=8, dropout=0.1)
    tcfg = TrainingConfig(batch_size=16)
    params = clip_model.init_params(jax.random.PRNGKey(0), arch)
    lora = init_lora(jax.random.PRNGKey(1), arch, lora_cfg)
    tx, _ = make_optimizer(tcfg, total_steps=10)

    rng = np.random.default_rng(0)
    ids = np.full((16, arch.max_text_length), 513, np.int32)
    ids[:, 0] = 512
    ids[:, 1] = rng.integers(0, 512, 16)
    batch = {
        "pixel_values": rng.normal(size=(16, 32, 32, 3)).astype(np.float32),
        "input_ids": ids,
        "attention_mask": np.ones_like(ids),
    }
    prev = set_kernel_flags(fused_lora_dropout=True)
    try:
        state = init_train_state(lora, tx, seed=0)
        step = make_train_step(params, arch, lora_cfg, tcfg, tx, eot_id=513)
        losses = []
        for _ in range(6):
            state, m = step(state, batch)
            losses.append(float(m["loss"]))
    finally:
        set_kernel_flags(**prev)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
