"""Sequence parallelism (parallel/sp.py + ops/ring_attention.py).

Ring attention is a *re-order* of exact attention (online softmax), so the
op, the sequence-sharded tower (including the padded-geometry path — CLIP's
own S=50/77 don't divide the axis), grads, and a full dp×sp train
trajectory must match the single-device path to fp-reassociation tolerance
(CPU, highest matmul precision — conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_lora_match_tpu.core.config import (
    ClipArchConfig,
    LoraConfig,
    TrainingConfig,
)
from clip_lora_match_tpu.lora.adapter import init_lora
from clip_lora_match_tpu.models import clip as clip_model
from clip_lora_match_tpu.nn.layers import stack_blocks, transformer
from clip_lora_match_tpu.ops.ring_attention import (
    _MASK_FLOOR,
    ring_attention,
    ring_attention_oracle,
)
from clip_lora_match_tpu.parallel import (
    init_sp_train_state,
    make_sp_mesh,
    make_sp_train_step,
    make_sp_transformer,
    shard_clip_sp,
)
from clip_lora_match_tpu.parallel.mesh import compat_shard_map
from clip_lora_match_tpu.parallel.sp import SEQ_AXIS
from clip_lora_match_tpu.train import (
    init_train_state,
    make_optimizer,
    make_train_step,
)
from jax.sharding import PartitionSpec as P

ARCH = ClipArchConfig(
    image_size=32, patch_size=16, vision_width=64, vision_layers=2,
    vision_heads=4, vision_mlp_dim=128, vocab_size=600, max_text_length=16,
    text_width=32, text_layers=2, text_heads=4, text_mlp_dim=64,
    projection_dim=16,
)


def _ring_vs_oracle(n_seq, B, S, H, hd, mask=None):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    qh = jax.random.normal(ks[0], (B, S, H, hd), jnp.float32)
    kh = jax.random.normal(ks[1], (B, S, H, hd), jnp.float32)
    vh = jax.random.normal(ks[2], (B, S, H, hd), jnp.float32)
    ref = ring_attention_oracle(qh, kh, vh, mask=mask)

    mesh = make_sp_mesh(n_seq=n_seq, n_data=1)
    specs = {}
    opt = {}
    if mask is not None:
        opt["mask"] = mask
        specs["mask"] = P(
            None, None, SEQ_AXIS if mask.shape[2] > 1 else None, None
        )

    def local(q, k, v, o):
        return ring_attention(q, k, v, SEQ_AXIS, mask=o.get("mask"))

    seq_spec = P(None, SEQ_AXIS)
    fn = compat_shard_map(
        local, mesh=mesh,
        in_specs=(seq_spec, seq_spec, seq_spec, specs),
        out_specs=seq_spec, check_rep=False,
    )
    with mesh:
        got = jax.jit(fn)(qh, kh, vh, opt)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-6
    )


@pytest.mark.parametrize("n_seq", [2, 4, 8])
def test_ring_attention_dense(n_seq):
    _ring_vs_oracle(n_seq, B=2, S=16, H=4, hd=8)


def test_ring_attention_causal_mask():
    S = 16
    neg = jnp.finfo(jnp.float32).min
    mask = jnp.triu(jnp.full((S, S), neg, jnp.float32), k=1)[None, None]
    _ring_vs_oracle(4, B=2, S=S, H=2, hd=8, mask=mask)


def test_ring_attention_batch_mask_with_fully_masked_rows():
    """Padded rows (every key masked) must emit zeros, not NaN — this is
    what the SP pad path relies on."""
    B, S = 2, 16
    neg = float(_MASK_FLOOR)
    mask = np.zeros((B, 1, S, S), np.float32)
    mask[:, :, :, 12:] = neg   # last 4 keys masked for everyone
    mask[:, :, 12:, :] = neg   # last 4 query rows fully masked
    mask = jnp.asarray(mask)
    _ring_vs_oracle(4, B=B, S=S, H=2, hd=8, mask=mask)

    # and the oracle itself puts exact zeros there
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    qh, kh, vh = (jax.random.normal(k, (B, S, 2, 8)) for k in ks)
    out = ring_attention_oracle(qh, kh, vh, mask=mask)
    assert not np.isnan(np.asarray(out)).any()
    np.testing.assert_array_equal(np.asarray(out[:, 12:]), 0.0)


def _blocks(key, n_layers, width, mlp_dim):
    return stack_blocks(
        [
            clip_model._init_block(k, width, mlp_dim, n_layers)
            for k in jax.random.split(key, n_layers)
        ]
    )


@pytest.mark.parametrize("S", [16, 10])  # 10: pad path (10 → 16 on seq=8... 10→12 on 4)
def test_sp_transformer_matches_scan(S):
    blocks = _blocks(jax.random.PRNGKey(0), 3, 64, 128)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, S, 64), jnp.float32)

    ref = jax.jit(lambda b, x: transformer(b, x, 4))(blocks, x)

    mesh = make_sp_mesh(n_seq=4, n_data=2)
    sp = make_sp_transformer(mesh)
    with mesh:
        got = jax.jit(lambda b, x: sp(b, x, 4))(blocks, x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-6
    )


def test_sp_transformer_causal_mask_and_lora_padded():
    """Text-tower shape: causal+pad mask at an indivisible S, LoRA active."""
    blocks = _blocks(jax.random.PRNGKey(0), 2, 32, 64)
    lora_blocks = jax.tree.map(
        lambda x: x + 0.02 * jax.random.normal(jax.random.PRNGKey(2), x.shape),
        init_lora(jax.random.PRNGKey(1), ARCH, LoraConfig(r=4, alpha=8))
        ["text"]["blocks"],
    )
    S = 13  # pads to 16 on a 4-way seq axis
    x = jax.random.normal(jax.random.PRNGKey(3), (8, S, 32), jnp.float32)
    am = np.ones((8, S), np.int32)
    am[:, 9:] = 0  # per-row padding on top of causal
    mask = clip_model._text_mask(jnp.asarray(am), S, jnp.float32)

    ref = jax.jit(
        lambda b, x, lb: transformer(
            b, x, 4, mask=mask, lora_blocks=lb, lora_scaling=2.0
        )
    )(blocks, x, lora_blocks)

    mesh = make_sp_mesh(n_seq=4, n_data=2)
    sp = make_sp_transformer(mesh)
    with mesh:
        got = jax.jit(
            lambda b, x, lb: sp(
                b, x, 4, mask=mask, lora_blocks=lb, lora_scaling=2.0
            )
        )(blocks, x, lora_blocks)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-6
    )


def test_sp_transformer_broadcast_key_mask_padded():
    """A broadcast (B,1,1,S) key-only mask through the PAD path must stay
    broadcast — row-padding it would hand devices past the first all-floor
    rows and silently zero every real token (r3 review repro)."""
    blocks = _blocks(jax.random.PRNGKey(0), 2, 32, 64)
    S = 13  # pads to 16 on a 4-way axis
    x = jax.random.normal(jax.random.PRNGKey(1), (8, S, 32), jnp.float32)
    neg = jnp.finfo(jnp.float32).min
    keep = jax.random.bernoulli(jax.random.PRNGKey(2), 0.8, (8, 1, 1, S))
    mask = jnp.where(keep, 0.0, neg)

    ref = jax.jit(lambda b, x: transformer(b, x, 4, mask=mask))(blocks, x)

    mesh = make_sp_mesh(n_seq=4, n_data=2)
    sp = make_sp_transformer(mesh)
    with mesh:
        got = jax.jit(lambda b, x: sp(b, x, 4, mask=mask))(blocks, x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-6
    )


def test_sp_transformer_rejects_underspecified_masks():
    """The shape contract must fail loudly even when S divides the axis."""
    blocks = _blocks(jax.random.PRNGKey(0), 2, 32, 64)
    x = jnp.zeros((8, 16, 32), jnp.float32)
    mesh = make_sp_mesh(n_seq=4, n_data=2)
    sp = make_sp_transformer(mesh)
    neg = jnp.finfo(jnp.float32).min
    with pytest.raises(ValueError, match="4-dim"):
        with mesh:
            sp(blocks, x, 4, mask=jnp.triu(jnp.full((16, 16), neg), k=1))
    with pytest.raises(ValueError, match="query-row"):
        with mesh:
            sp(blocks, x, 4, mask=jnp.zeros((8, 1, 4, 16)))


@pytest.mark.slow
def test_sp_encode_image_matches_plain():
    """Full image tower at CLIP-style indivisible S (here (32/16)²+1 = 5,
    padded to 8 on a 4-way axis): cls pooling sees identical features."""
    params = clip_model.init_params(jax.random.PRNGKey(0), ARCH)
    pix = jax.random.normal(jax.random.PRNGKey(1), (8, 32, 32, 3))

    ref = clip_model.encode_image_features(params, pix, ARCH)

    mesh = make_sp_mesh(n_seq=4, n_data=2)
    sp = make_sp_transformer(mesh)
    with mesh:
        got = clip_model.encode_image_features(
            params, pix, ARCH, transformer_fn=sp
        )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=5e-5, atol=5e-6
    )


@pytest.mark.slow
def test_sp_grads_match_scan():
    """AD through the KV ring derives the backward ring: LoRA grads equal
    the single-device grads (catches a wrong collective transpose)."""
    blocks = _blocks(jax.random.PRNGKey(0), 2, 32, 64)
    lora_blocks = jax.tree.map(
        lambda x: x + 0.02 * jax.random.normal(jax.random.PRNGKey(2), x.shape),
        init_lora(jax.random.PRNGKey(1), ARCH, LoraConfig(r=4, alpha=8))
        ["text"]["blocks"],
    )
    x = jax.random.normal(jax.random.PRNGKey(3), (8, 12, 32), jnp.float32)

    def loss_ref(lb):
        return jnp.sum(jnp.square(transformer(blocks, x, 4, lora_blocks=lb)))

    g_ref = jax.jit(jax.grad(loss_ref))(lora_blocks)

    mesh = make_sp_mesh(n_seq=4, n_data=2)
    sp = make_sp_transformer(mesh)

    def loss_sp(lb):
        return jnp.sum(jnp.square(sp(blocks, x, 4, lora_blocks=lb)))

    with mesh:
        g_sp = jax.jit(jax.grad(loss_sp))(lora_blocks)
    for ref, got in zip(
        jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_sp)
    ):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-3, atol=1e-5
        )


@pytest.mark.slow
def test_sp_train_step_matches_single_device():
    """Full dp2×sp4 training (2 steps, replicated params + sharded batch,
    both towers on padded sequence shards) reproduces the single-device
    loss trajectory."""
    lora_cfg = LoraConfig(r=4, alpha=8, dropout=0.0)
    train_cfg = TrainingConfig(batch_size=16)
    params = clip_model.init_params(jax.random.PRNGKey(0), ARCH)
    lora = init_lora(jax.random.PRNGKey(1), ARCH, lora_cfg)
    tx, _ = make_optimizer(train_cfg, total_steps=10)

    rng = np.random.default_rng(0)
    B = train_cfg.batch_size
    ids = np.full((B, ARCH.max_text_length), 513, np.int32)
    ids[:, 0] = 512
    ids[:, 1] = rng.integers(0, 512, B)
    batch = {
        "pixel_values": rng.normal(size=(B, 32, 32, 3)).astype(np.float32),
        "input_ids": ids,
        "attention_mask": np.ones_like(ids),
    }

    state = init_train_state(lora, tx, seed=0)
    step = make_train_step(params, ARCH, lora_cfg, train_cfg, tx, eot_id=513)
    ref_losses = []
    for _ in range(2):
        state, m = step(state, batch)
        ref_losses.append(float(m["loss"]))

    mesh = make_sp_mesh(n_seq=4, n_data=2)
    sp_step = make_sp_train_step(
        params, ARCH, lora_cfg, train_cfg, tx, mesh, eot_id=513
    )
    with mesh:
        params_g = shard_clip_sp(params, mesh)
        lora_g = shard_clip_sp(lora, mesh)
        state_g = init_sp_train_state(lora_g, tx, seed=0)
        sp_losses = []
        for _ in range(2):
            state_g, m = sp_step.inner(params_g, state_g, batch)
            sp_losses.append(float(m["loss"]))

    np.testing.assert_allclose(sp_losses, ref_losses, rtol=1e-5, atol=1e-6)


def test_sp_train_step_rejects_dropout():
    params = clip_model.init_params(jax.random.PRNGKey(0), ARCH)
    tx, _ = make_optimizer(TrainingConfig(batch_size=16), total_steps=10)
    mesh = make_sp_mesh(n_seq=4, n_data=2)
    with pytest.raises(ValueError, match="dropout"):
        make_sp_train_step(
            params, ARCH, LoraConfig(r=4, alpha=8, dropout=0.1),
            TrainingConfig(batch_size=16), tx, mesh,
        )


def test_sp_mesh_rejects_device_shortfall():
    with pytest.raises(ValueError, match="devices"):
        make_sp_mesh(n_seq=4, n_data=4)  # conftest provides only 8
    # n_seq > device count used to floor n_data to 0 and hand back an
    # EMPTY mesh instead of the explanatory error
    with pytest.raises(ValueError, match="devices"):
        make_sp_mesh(n_seq=16)


@pytest.mark.slow
def test_dp_tp_sp_train_step_matches_single_device():
    """4-axis composition (VERDICT r3 #9): dp2×tp2×sp2 on 8 devices — the
    SP shard_map runs manual over (data, seq) while Megatron TP shardings
    over the GSPMD-auto ``model`` axis propagate through it (psums inserted
    inside the manual region). Must reproduce the single-device loss
    trajectory, proving every parallel axis composes with every other."""
    from clip_lora_match_tpu.parallel import init_tp_train_state, shard_clip_sp_tp

    lora_cfg = LoraConfig(r=4, alpha=8, dropout=0.0)
    train_cfg = TrainingConfig(batch_size=16)
    params = clip_model.init_params(jax.random.PRNGKey(0), ARCH)
    lora = init_lora(jax.random.PRNGKey(1), ARCH, lora_cfg)
    tx, _ = make_optimizer(train_cfg, total_steps=10)

    rng = np.random.default_rng(0)
    B = train_cfg.batch_size
    ids = np.full((B, ARCH.max_text_length), 513, np.int32)
    ids[:, 0] = 512
    ids[:, 1] = rng.integers(0, 512, B)
    batch = {
        "pixel_values": rng.normal(size=(B, 32, 32, 3)).astype(np.float32),
        "input_ids": ids,
        "attention_mask": np.ones_like(ids),
    }

    state = init_train_state(lora, tx, seed=0)
    step = make_train_step(params, ARCH, lora_cfg, train_cfg, tx, eot_id=513)
    ref_losses = []
    for _ in range(2):
        state, m = step(state, batch)
        ref_losses.append(float(m["loss"]))

    mesh = make_sp_mesh(n_seq=2, n_data=2, n_model=2)
    assert mesh.axis_names == ("data", "model", "seq")
    step3 = make_sp_train_step(
        params, ARCH, lora_cfg, train_cfg, tx, mesh, eot_id=513
    )
    with mesh:
        params_g = shard_clip_sp_tp(params, mesh)
        lora_g = shard_clip_sp_tp(lora, mesh, lora=True)
        state_g = init_tp_train_state(lora_g, tx, seed=0)
        losses = []
        for _ in range(2):
            state_g, m = step3.inner(params_g, state_g, batch)
            losses.append(float(m["loss"]))

    np.testing.assert_allclose(losses, ref_losses, rtol=1e-5, atol=1e-6)


def test_dp_tp_sp_rejects_indivisible_heads():
    from clip_lora_match_tpu.core.config import ClipArchConfig

    bad = ClipArchConfig(
        image_size=32, patch_size=16, vision_width=63, vision_layers=1,
        vision_heads=3, vision_mlp_dim=126, vocab_size=600,
        max_text_length=16, text_width=32, text_layers=1, text_heads=4,
        text_mlp_dim=64, projection_dim=16,
    )
    params = clip_model.init_params(jax.random.PRNGKey(0), bad)
    tx, _ = make_optimizer(TrainingConfig(batch_size=16), total_steps=10)
    mesh = make_sp_mesh(n_seq=2, n_data=2, n_model=2)
    with pytest.raises(ValueError, match="heads"):
        make_sp_train_step(
            params, bad, LoraConfig(r=4, alpha=8, dropout=0.0),
            TrainingConfig(batch_size=16), tx, mesh, eot_id=513,
        )
