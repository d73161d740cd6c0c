"""Fused-MLP Pallas kernel vs the jnp oracle (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

import clip_lora_match_tpu.ops.mlp_fused as mf
from clip_lora_match_tpu.ops.mlp_fused import mlp_fused, mlp_fused_reference


def _inputs(M, D, H, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(M, D)).astype(dtype))
    w1 = jnp.asarray((rng.normal(size=(D, H)) * 0.02).astype(dtype))
    b1 = jnp.asarray((rng.normal(size=(H,)) * 0.02).astype(dtype))
    w2 = jnp.asarray((rng.normal(size=(H, D)) * 0.02).astype(dtype))
    b2 = jnp.asarray((rng.normal(size=(D,)) * 0.02).astype(dtype))
    return x, w1, b1, w2, b2


@pytest.mark.parametrize("M", [8, 50, 200, 256])
def test_resident_matches_oracle(M):
    args = _inputs(M, 256, 1024, seed=M)
    ref = mlp_fused_reference(*args)
    got = mlp_fused(*args, block_m=64, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5
    )


def test_streamed_matches_oracle(monkeypatch):
    # Force the streamed variant by shrinking the resident budget.
    monkeypatch.setattr(mf, "_RESIDENT_MAX_WEIGHT_BYTES", 0)
    args = _inputs(100, 256, 1024, seed=7)
    ref = mlp_fused_reference(*args)
    got = mlp_fused(*args, block_m=64, block_h=256, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4
    )


def test_streamed_ragged_hidden(monkeypatch):
    # H not a multiple of block_h exercises the hidden-dim padding: the padded
    # W1 columns produce gelu(0 + 0) = 0 rows of h, inert through W2's zero
    # padding rows.
    monkeypatch.setattr(mf, "_RESIDENT_MAX_WEIGHT_BYTES", 0)
    args = _inputs(64, 256, 896, seed=11)
    ref = mlp_fused_reference(*args)
    got = mlp_fused(*args, block_m=64, block_h=512, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4
    )


def test_bf16_tail_semantics():
    # bf16 inputs: oracle and kernel agree (both gelu in fp32, cast before fc2).
    args = _inputs(64, 256, 1024, seed=3)
    args = tuple(a.astype(jnp.bfloat16) for a in args)
    ref = mlp_fused_reference(*args)
    got = mlp_fused(*args, block_m=64, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, dtype=np.float32),
        np.asarray(ref, dtype=np.float32),
        atol=3e-2,
    )


def test_dispatch_in_mlp_layer():
    # nn.layers.mlp takes the kernel path under the flag and matches the
    # XLA composition.
    from clip_lora_match_tpu.nn import layers

    rng = np.random.default_rng(5)
    D, H = 256, 1024
    p = {
        "fc1": {
            "kernel": jnp.asarray((rng.normal(size=(D, H)) * 0.02).astype(np.float32)),
            "bias": jnp.asarray((rng.normal(size=(H,)) * 0.02).astype(np.float32)),
        },
        "fc2": {
            "kernel": jnp.asarray((rng.normal(size=(H, D)) * 0.02).astype(np.float32)),
            "bias": jnp.asarray((rng.normal(size=(D,)) * 0.02).astype(np.float32)),
        },
    }
    x = jnp.asarray(rng.normal(size=(4, 50, D)).astype(np.float32))
    want = layers.mlp(p, x)
    prev = layers.set_kernel_flags(fused_mlp=True, interpret=True)
    try:
        got = layers.mlp(p, x)
    finally:
        layers.set_kernel_flags(**dict(prev))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
    )


def test_dispatch_skips_lora_and_grad_works():
    # An MLP adapter must fall back to the XLA path (the kernel has no LoRA
    # branch); without adapters, grad flows through the custom_vjp.
    import jax

    from clip_lora_match_tpu.nn import layers

    rng = np.random.default_rng(9)
    D, H = 128, 512
    p = {
        "fc1": {
            "kernel": jnp.asarray((rng.normal(size=(D, H)) * 0.02).astype(np.float32)),
            "bias": jnp.asarray((rng.normal(size=(H,)) * 0.02).astype(np.float32)),
        },
        "fc2": {
            "kernel": jnp.asarray((rng.normal(size=(H, D)) * 0.02).astype(np.float32)),
            "bias": jnp.asarray((rng.normal(size=(D,)) * 0.02).astype(np.float32)),
        },
    }
    lora = {
        "fc1": {
            "a": jnp.zeros((D, 4), jnp.float32),
            "b": jnp.asarray((rng.normal(size=(4, H)) * 0.1).astype(np.float32)),
        }
    }
    x = jnp.asarray(rng.normal(size=(2, 8, D)).astype(np.float32))
    prev = layers.set_kernel_flags(fused_mlp=True, interpret=True)
    try:
        # LoRA adapter present → XLA path, exact match with flag off.
        got = layers.mlp(p, x, lora=lora, lora_scaling=2.0)
        layers.set_kernel_flags(fused_mlp=False)
        want = layers.mlp(p, x, lora=lora, lora_scaling=2.0)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

        # grad through the mlp works with the flag on (custom_vjp path).
        layers.set_kernel_flags(fused_mlp=True)

        def loss(px):
            return jnp.sum(layers.mlp(p, px) ** 2)

        g = jax.grad(loss)(x)
        assert np.isfinite(np.asarray(g)).all()
    finally:
        layers.set_kernel_flags(**dict(prev))
