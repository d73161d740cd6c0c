"""Pallas kernels dispatched INSIDE the CLIP towers (interpret mode): flagged
forwards must match the reference jnp path."""

import numpy as np
import pytest

import jax

from clip_lora_match_tpu.core.config import LoraConfig
from clip_lora_match_tpu.lora import init_lora
from clip_lora_match_tpu.models import clip as jclip
from clip_lora_match_tpu.nn.layers import set_kernel_flags
from tests.test_clip_parity import SMALL, _rand_inputs
from tests.test_lora import _randomize_lora

CFG = LoraConfig(r=4, alpha=8)


@pytest.fixture(scope="module")
def setup():
    params = jclip.init_params(jax.random.PRNGKey(3), SMALL)
    lora = _randomize_lora(init_lora(jax.random.PRNGKey(4), SMALL, CFG))
    pix, ids, mask = _rand_inputs(SMALL, batch=2)
    return params, lora, pix, ids, mask


@pytest.fixture(autouse=True)
def _restore_flags():
    prev = set_kernel_flags()
    yield
    set_kernel_flags(**prev)


def test_fused_lora_in_towers(setup):
    params, lora, pix, ids, mask = setup
    base_img = np.asarray(
        jclip.encode_image_features(params, pix, SMALL, lora=lora, lora_scaling=2.0)
    )
    base_txt = np.asarray(
        jclip.encode_text_features(
            params, ids, SMALL, attention_mask=mask,
            eot_id=SMALL.vocab_size - 1, lora=lora, lora_scaling=2.0,
        )
    )
    set_kernel_flags(fused_lora=True, interpret=True)
    fused_img = np.asarray(
        jclip.encode_image_features(params, pix, SMALL, lora=lora, lora_scaling=2.0)
    )
    fused_txt = np.asarray(
        jclip.encode_text_features(
            params, ids, SMALL, attention_mask=mask,
            eot_id=SMALL.vocab_size - 1, lora=lora, lora_scaling=2.0,
        )
    )
    np.testing.assert_allclose(fused_img, base_img, atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(fused_txt, base_txt, atol=5e-4, rtol=1e-3)


def test_flash_attention_in_towers(setup):
    params, lora, pix, ids, mask = setup
    base_img = np.asarray(jclip.encode_image_features(params, pix, SMALL))
    base_txt = np.asarray(
        jclip.encode_text_features(
            params, ids, SMALL, attention_mask=mask, eot_id=SMALL.vocab_size - 1
        )
    )
    set_kernel_flags(flash_attention=True, interpret=True)
    fa_img = np.asarray(jclip.encode_image_features(params, pix, SMALL))
    fa_txt = np.asarray(
        jclip.encode_text_features(
            params, ids, SMALL, attention_mask=mask, eot_id=SMALL.vocab_size - 1
        )
    )
    np.testing.assert_allclose(fa_img, base_img, atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(fa_txt, base_txt, atol=5e-5, rtol=1e-4)


def test_dropout_path_bypasses_fused_kernel(setup):
    """Training (dropout active) must keep the differentiable jnp path."""
    params, lora, pix, _, _ = setup
    set_kernel_flags(fused_lora=True, interpret=True)
    out = jclip.encode_image_features(
        params, pix, SMALL, lora=lora, lora_scaling=2.0,
        lora_dropout=0.5, dropout_rng=jax.random.PRNGKey(0),
    )
    assert np.isfinite(np.asarray(out)).all()


def test_fast_ln_grads_match_ad():
    """fast_ln (_ln_fast custom_vjp): bwd recomputes μ/σ/x̂ from the saved
    input instead of saving fp32 intermediates. Grads must be bit-identical
    to plain AD for bf16 inputs (the production path — the fp32 cast of bf16
    is exact and both paths see the same x32) and ~1-ulp-close for fp32
    (advisor r4: the hand-derived dx associates reductions differently)."""
    import jax.numpy as jnp

    from clip_lora_match_tpu.nn import layers as L

    rng = np.random.default_rng(11)
    for dtype, exact in ((jnp.bfloat16, True), (jnp.float32, False)):
        x = jnp.asarray(rng.normal(size=(4, 9, 64)), dtype)
        scale = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))
        bias = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(4, 9, 64)).astype(np.float32))

        def loss(fn, x, s, b):
            return jnp.sum(fn(x, s, b, 1e-5).astype(jnp.float32) * w)

        g_fast = jax.grad(lambda *t: loss(L._ln_fast, *t), argnums=(0, 1, 2))(
            x, scale, bias
        )
        g_ad = jax.grad(lambda *t: loss(L._ln_plain, *t), argnums=(0, 1, 2))(
            x, scale, bias
        )
        for gf, ga, name in zip(g_fast, g_ad, ("dx", "dscale", "dbias")):
            gf, ga = np.asarray(gf, np.float32), np.asarray(ga, np.float32)
            if exact:
                np.testing.assert_array_equal(gf, ga, err_msg=f"{dtype} {name}")
            else:
                np.testing.assert_allclose(
                    gf, ga, atol=1e-5, rtol=1e-6, err_msg=f"{dtype} {name}"
                )
