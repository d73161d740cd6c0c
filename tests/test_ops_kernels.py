"""Fused LoRA matmul + flash attention kernels vs jnp oracles (interpret mode)."""

import numpy as np
import pytest

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
        (1, 2, 50, 64, (32, 32)),     # vision geometry, multi-block online path
        (2, 2, 200, 64, (64, 64)),    # longer than one block both ways
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
    B, H, S, d = 1, 2, 64, 64
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
        block_q=32, block_kv=32, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)
