"""Fused LoRA matmul + flash attention kernels vs jnp oracles (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clip_lora_match_tpu.ops.flash_attention import attention_reference, flash_attention
from clip_lora_match_tpu.ops.lora_matmul import lora_matmul, lora_matmul_reference


@pytest.mark.parametrize(
    "M,K,N,r",
    [
        (64, 128, 128, 8),
        (100, 512, 512, 8),   # ragged M, CLIP text width
        (32, 768, 3072, 4),   # ViT fc1 shape
    ],
)
def test_lora_matmul_matches_oracle(M, K, N, r):
    rng = np.random.default_rng(M + N)
    x = rng.normal(size=(M, K)).astype(np.float32)
    w = rng.normal(size=(K, N)).astype(np.float32) * 0.02
    a = rng.normal(size=(K, r)).astype(np.float32) * 0.02
    b = rng.normal(size=(r, N)).astype(np.float32) * 0.02
    ref = lora_matmul_reference(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(a), jnp.asarray(b), 2.0
    )
    got = lora_matmul(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(a), jnp.asarray(b),
        scaling=2.0, block_m=32, block_n=128, block_k=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-3, rtol=1e-4)


def test_lora_matmul_grad_matches_oracle():
    """custom_vjp backward: grads of the fused kernel (interpret mode) must
    match grads through the jnp oracle for every input, so the fused path is
    safe inside jax.value_and_grad train steps (advisor r1, medium)."""
    import jax

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(24, 256)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(256, 48)).astype(np.float32) * 0.05)
    a = jnp.asarray(rng.normal(size=(256, 4)).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.normal(size=(4, 48)).astype(np.float32) * 0.05)

    def loss_fused(x, w, a, b):
        # multi-block grid (3, 1, 2) with Mosaic-legal geometry: second-minor
        # blocks 8-divisible, minor blocks 128-divisible or the full dim
        y = lora_matmul(
            x, w, a, b, scaling=2.0,
            block_m=8, block_n=48, block_k=128, interpret=True,
        )
        return jnp.sum(jnp.sin(y))

    def loss_oracle(x, w, a, b):
        return jnp.sum(jnp.sin(lora_matmul_reference(x, w, a, b, 2.0)))

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, w, a, b)
    g_oracle = jax.grad(loss_oracle, argnums=(0, 1, 2, 3))(x, w, a, b)
    for gf, go, name in zip(g_fused, g_oracle, "xwab"):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(go), atol=1e-4, rtol=1e-4,
            err_msg=f"d{name}",
        )


def test_lora_matmul_grad_under_jit_with_frozen_w():
    """Training pattern: base w enters as a closure constant; grad wrt the
    adapters must compile and be correct (dw path is dead code)."""
    import jax

    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(size=(16, 256)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(256, 32)).astype(np.float32) * 0.05)
    a0 = jnp.asarray(rng.normal(size=(256, 4)).astype(np.float32) * 0.05)
    b0 = jnp.asarray(rng.normal(size=(4, 32)).astype(np.float32) * 0.05)

    @jax.jit
    def grads(a, b):
        def loss(a, b):
            y = lora_matmul(
                x, w, a, b, scaling=2.0,
                block_m=8, block_n=32, block_k=128, interpret=True,
            )
            return jnp.mean(y * y)

        return jax.grad(loss, argnums=(0, 1))(a, b)

    da, db = grads(a0, b0)

    def loss_o(a, b):
        y = lora_matmul_reference(x, w, a, b, 2.0)
        return jnp.mean(y * y)

    da_o, db_o = jax.grad(loss_o, argnums=(0, 1))(a0, b0)
    np.testing.assert_allclose(np.asarray(da), np.asarray(da_o), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(db), np.asarray(db_o), atol=1e-5, rtol=1e-4)


def test_lora_matmul_zero_b_is_base_matmul():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(16, 64)).astype(np.float32)
    w = rng.normal(size=(64, 32)).astype(np.float32)
    a = rng.normal(size=(64, 4)).astype(np.float32)
    b = np.zeros((4, 32), np.float32)
    got = lora_matmul(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(a), jnp.asarray(b),
        block_m=16, block_n=32, block_k=64, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), x @ w, atol=1e-4, rtol=1e-5)


@pytest.mark.parametrize(
    "B,H,S,d,blocks",
    [
        (2, 4, 77, 64, (128, 128)),   # CLIP text geometry (one kv block)
        # multi-block online path with Mosaic-LEGAL blocks: the mask block's
        # minor dim is bkv, which must be 128-divisible or the full skv —
        # so multi-KV-block coverage needs S > 128 with bkv=128
        (1, 2, 300, 64, (128, 128)),  # 3 q blocks × 3 kv blocks
        (2, 2, 200, 64, (200, 128)),  # single q block, 2 kv blocks
    ],
)
def test_flash_attention_matches_oracle(B, H, S, d, blocks):
    rng = np.random.default_rng(S)
    q = rng.normal(size=(B, H, S, d)).astype(np.float32)
    k = rng.normal(size=(B, H, S, d)).astype(np.float32)
    v = rng.normal(size=(B, H, S, d)).astype(np.float32)
    ref = attention_reference(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    got = flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        block_q=blocks[0], block_kv=blocks[1], interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_flash_attention_causal_mask():
    # S=256 with 128-blocks: the online-softmax path crosses block
    # boundaries in both q and kv while every block stays Mosaic-legal
    B, H, S, d = 1, 2, 256, 64
    rng = np.random.default_rng(1)
    q = rng.normal(size=(B, H, S, d)).astype(np.float32)
    k = rng.normal(size=(B, H, S, d)).astype(np.float32)
    v = rng.normal(size=(B, H, S, d)).astype(np.float32)
    neg = float(np.finfo(np.float32).min)
    causal = np.triu(np.full((S, S), neg, np.float32), k=1)[None, None]
    ref = attention_reference(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(causal)
    )
    got = flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(causal),
        block_q=128, block_kv=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_flash_auto_dispatch_gates_by_seq_len(monkeypatch):
    """'auto' resolves from the measured v5e tables (DESIGN §7.3): XLA wins
    at EVERY supported CLIP geometry (in-tower S=50/77/197/257/577 and the
    isolated S=1024 row), so auto never picks flash; True still forces it."""
    from clip_lora_match_tpu.nn import layers

    monkeypatch.setitem(layers._KERNEL_FLAGS, "flash_attention", "auto")
    for s in (50, 77, 197, 257, 577, 1024, 4096):
        assert not layers._use_flash(s)
    assert layers._use_flash(layers.FLASH_MIN_SEQ)  # the gate itself still works
    monkeypatch.setitem(layers._KERNEL_FLAGS, "flash_attention", True)
    assert layers._use_flash(50)
    monkeypatch.setitem(layers._KERNEL_FLAGS, "flash_attention", False)
    assert not layers._use_flash(4096)


def test_attention_flash_forced_matches_xla_path():
    """End-to-end: attention under flash_attention=True (forced — 'auto'
    never dispatches it on v5e) + interpret must match the XLA path."""
    import jax

    from clip_lora_match_tpu.nn import layers

    rng = np.random.default_rng(3)
    D, H, S, B = 64, 4, 128, 2
    p = {
        name: {
            "kernel": jnp.asarray(rng.normal(size=(D, D)).astype(np.float32) * 0.05),
            "bias": jnp.asarray(rng.normal(size=(D,)).astype(np.float32) * 0.01),
        }
        for name in ("q_proj", "k_proj", "v_proj", "out_proj")
    }
    x = jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32))
    prev = layers.set_kernel_flags(flash_attention=False, interpret=True)
    try:
        ref = layers.attention(p, x, H)
        layers.set_kernel_flags(flash_attention=True)
        got = layers.attention(p, x, H)
    finally:
        layers.set_kernel_flags(**prev)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_attention_without_biases():
    """linear() treats bias as optional; the fused-QKV path must too."""
    from clip_lora_match_tpu.nn import layers

    rng = np.random.default_rng(4)
    D, H = 32, 4
    p = {
        name: {"kernel": jnp.asarray(rng.normal(size=(D, D)).astype(np.float32) * 0.1)}
        for name in ("q_proj", "k_proj", "v_proj", "out_proj")
    }
    x = jnp.asarray(rng.normal(size=(2, 8, D)).astype(np.float32))
    out = layers.attention(p, x, H)
    assert out.shape == (2, 8, D)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize(
    "B,S,H,hd,with_mask",
    [
        (4, 50, 12, 64, False),   # CLIP vision geometry
        (3, 77, 8, 64, True),     # CLIP text geometry + causal mask
        (9, 64, 4, 64, False),    # ragged batch vs block_b
    ],
)
def test_attention_small_matches_oracle(B, S, H, hd, with_mask):
    from clip_lora_match_tpu.ops.attention_small import (
        attention_small,
        attention_small_reference,
    )

    rng = np.random.default_rng(S + B)
    q = jnp.asarray(rng.normal(size=(B, S, H, hd)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, S, H, hd)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, S, H, hd)).astype(np.float32))
    mask = None
    if with_mask:
        neg = float(np.finfo(np.float32).min)
        mask = jnp.asarray(np.triu(np.full((S, S), neg, np.float32), k=1)[None, None])
    ref = attention_small_reference(q, k, v, mask)
    got = attention_small(q, k, v, mask, block_b=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_attention_small_interpret_guards_logit_bound():
    """Interpret mode asserts the max-free softmax's logit<80 assumption:
    feeding logits that reach the clip must raise, not silently flatten."""
    import jax

    from clip_lora_match_tpu.ops.attention_small import attention_small

    rng = np.random.default_rng(0)
    # scale=1 with 30x q,k magnitudes pushes logits way past 80
    q = jnp.asarray(30 * rng.normal(size=(1, 16, 1, 64)).astype(np.float32))
    k = jnp.asarray(30 * rng.normal(size=(1, 16, 1, 64)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 16, 1, 64)).astype(np.float32))
    with pytest.raises(Exception, match="max-free softmax bound"):
        jax.block_until_ready(
            attention_small(q, k, v, scale=1.0, interpret=True)
        )
    # in-bound logits still pass the guard
    out = attention_small(q / 30, k / 30, v, interpret=True)
    assert np.isfinite(np.asarray(out)).all()


def test_attention_small_grad_matches_oracle():
    import jax

    from clip_lora_match_tpu.ops.attention_small import (
        attention_small,
        attention_small_reference,
    )

    rng = np.random.default_rng(11)
    q = jnp.asarray(rng.normal(size=(2, 50, 4, 64)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 50, 4, 64)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 50, 4, 64)).astype(np.float32))
    for arg in range(3):
        g1 = jax.grad(
            lambda *a: jnp.sum(jnp.sin(attention_small(*a, interpret=True))),
            argnums=arg,
        )(q, k, v)
        g2 = jax.grad(
            lambda *a: jnp.sum(jnp.sin(attention_small_reference(*a))), argnums=arg
        )(q, k, v)
        np.testing.assert_allclose(
            np.asarray(g1), np.asarray(g2), atol=1e-5, rtol=1e-4
        )


def test_attention_dispatches_small_kernel():
    """layers.attention under small_attention+interpret matches the XLA path
    at CLIP geometry (full in-tower dispatch contract)."""
    from clip_lora_match_tpu.nn import layers

    rng = np.random.default_rng(12)
    D, H, S, B = 64, 4, 50, 2
    p = {
        name: {
            "kernel": jnp.asarray(rng.normal(size=(D, D)).astype(np.float32) * 0.05),
            "bias": jnp.asarray(rng.normal(size=(D,)).astype(np.float32) * 0.01),
        }
        for name in ("q_proj", "k_proj", "v_proj", "out_proj")
    }
    x = jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32))
    prev = layers.set_kernel_flags(small_attention=False, interpret=True)
    try:
        ref = layers.attention(p, x, H)
        layers.set_kernel_flags(small_attention=True)
        got = layers.attention(p, x, H)
    finally:
        layers.set_kernel_flags(**prev)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("S", [50, 64, 77])
def test_attention_small_structural_mask_matches_additive(S):
    """causal+lengths structural mode (in-kernel iota mask, r4) must equal
    the same kernel fed the equivalent additive causal+pad mask, and the
    jnp oracle."""
    from clip_lora_match_tpu.ops.attention_small import (
        attention_small,
        attention_small_reference,
    )

    B, H, hd = 5, 4, 16
    ks = jax.random.split(jax.random.PRNGKey(3), 4)
    q = jax.random.normal(ks[0], (B, S, H, hd), jnp.float32)
    k = jax.random.normal(ks[1], (B, S, H, hd), jnp.float32)
    v = jax.random.normal(ks[2], (B, S, H, hd), jnp.float32)
    lengths = jnp.asarray([S, S - 1, 3, S // 2, 1], jnp.int32)

    neg = jnp.finfo(jnp.float32).min
    causal = jnp.triu(jnp.full((S, S), neg, jnp.float32), k=1)[None, None]
    kcol = jnp.arange(S)[None, None, None, :]
    pad = jnp.where(kcol < lengths[:, None, None, None], 0.0, neg)
    mask = causal + pad

    ref = attention_small_reference(q, k, v, mask)
    got = attention_small(
        q, k, v, causal=True, lengths=lengths, block_b=4, interpret=True
    )
    additive = attention_small(q, k, v, mask, block_b=4, interpret=True)
    # rows past a query's own length attend to garbage in BOTH modes; only
    # compare rows the pooling can ever read (within-length queries)
    valid_q = jnp.arange(S)[None, :] < lengths[:, None]
    m = np.asarray(valid_q)[:, :, None, None]
    np.testing.assert_allclose(
        np.asarray(got) * m, np.asarray(ref) * m, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(got) * m, np.asarray(additive) * m, atol=2e-5
    )


def test_attention_small_structural_grads_match_oracle():
    from clip_lora_match_tpu.ops.attention_small import (
        attention_small,
        attention_small_reference,
    )

    B, S, H, hd = 3, 13, 2, 8
    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    q = jax.random.normal(ks[0], (B, S, H, hd), jnp.float32)
    k = jax.random.normal(ks[1], (B, S, H, hd), jnp.float32)
    v = jax.random.normal(ks[2], (B, S, H, hd), jnp.float32)
    lengths = jnp.asarray([S, 5, 9], jnp.int32)
    neg = jnp.finfo(jnp.float32).min
    causal = jnp.triu(jnp.full((S, S), neg, jnp.float32), k=1)[None, None]
    kcol = jnp.arange(S)[None, None, None, :]
    mask = causal + jnp.where(kcol < lengths[:, None, None, None], 0.0, neg)
    valid_q = (jnp.arange(S)[None, :] < lengths[:, None]).astype(jnp.float32)
    w = valid_q[:, :, None, None]

    def loss_kernel(q, k, v):
        out = attention_small(
            q, k, v, causal=True, lengths=lengths, interpret=True
        )
        return jnp.sum(jnp.sin(out) * w)

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(attention_small_reference(q, k, v, mask)) * w)

    g1 = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for u, v_ in zip(g1, g2):
        np.testing.assert_allclose(u, v_, atol=1e-5)


def test_attention_small_rejects_mask_plus_structural():
    from clip_lora_match_tpu.ops.attention_small import attention_small

    q = jnp.zeros((1, 4, 1, 8), jnp.float32)
    with pytest.raises(ValueError, match="EITHER"):
        attention_small(
            q, q, q, mask=jnp.zeros((1, 1, 4, 4)), causal=True,
            interpret=True,
        )


def test_text_tower_structural_dispatch_matches_xla():
    """encode_text_features with small_attention on (S=77, ragged pad masks)
    must equal the XLA path — the in-kernel causal+lengths mode end to end,
    EOT pooling included."""
    from clip_lora_match_tpu.core.config import ClipArchConfig
    from clip_lora_match_tpu.models import clip as clip_model
    from clip_lora_match_tpu.nn.layers import set_kernel_flags

    arch = ClipArchConfig(
        image_size=32, patch_size=16, vision_width=64, vision_layers=1,
        vision_heads=4, vision_mlp_dim=128, vocab_size=600,
        max_text_length=77, text_width=64, text_layers=2, text_heads=4,
        text_mlp_dim=128, projection_dim=16,
    )
    params = clip_model.init_params(jax.random.PRNGKey(0), arch)
    rng = np.random.default_rng(0)
    B = 4
    lengths = [77, 20, 5, 50]
    ids = np.full((B, 77), 599, np.int32)
    mask = np.zeros((B, 77), np.int32)
    for i, L in enumerate(lengths):
        ids[i, : L - 1] = rng.integers(0, 598, L - 1)
        ids[i, L - 1] = 599
        mask[i, :L] = 1
    ref = np.asarray(
        clip_model.encode_text_features(
            params, jnp.asarray(ids), arch,
            attention_mask=jnp.asarray(mask), eot_id=599,
        )
    )
    prev = set_kernel_flags(small_attention=True, interpret=True)
    try:
        got = np.asarray(
            clip_model.encode_text_features(
                params, jnp.asarray(ids), arch,
                attention_mask=jnp.asarray(mask), eot_id=599,
            )
        )
    finally:
        set_kernel_flags(**prev)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
