"""Pipeline parallelism (parallel/pp.py): GPipe schedule equivalence.

The pipeline is a *re-schedule*, not a re-computation: forward, grads, and a
full dp×pp train trajectory must match the single-device scan bit-for-bit
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
from clip_lora_match_tpu.parallel import (
    init_pp_train_state,
    make_pipeline_transformer,
    make_pp_mesh,
    make_pp_train_step,
    shard_clip_pp,
)
from clip_lora_match_tpu.train import (
    init_train_state,
    make_optimizer,
    make_train_step,
)

ARCH = ClipArchConfig(
    image_size=32, patch_size=16, vision_width=64, vision_layers=4,
    vision_heads=4, vision_mlp_dim=128, vocab_size=600, max_text_length=16,
    text_width=32, text_layers=4, text_heads=4, text_mlp_dim=64,
    projection_dim=16,
)


def _blocks(key, n_layers, width, mlp_dim):
    return stack_blocks(
        [
            clip_model._init_block(k, width, mlp_dim, n_layers)
            for k in jax.random.split(key, n_layers)
        ]
    )


@pytest.mark.parametrize("n_stage,n_mb", [(2, 4), (4, 2)])
def test_pipeline_transformer_matches_scan(n_stage, n_mb):
    key = jax.random.PRNGKey(0)
    blocks = _blocks(key, 4, 64, 128)
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 8, 64), jnp.float32)

    ref = jax.jit(lambda b, x: transformer(b, x, 4))(blocks, x)

    mesh = make_pp_mesh(n_stage=n_stage)
    pipe = make_pipeline_transformer(mesh, n_microbatches=n_mb)
    with mesh:
        got = jax.jit(lambda b, x: pipe(b, x, 4))(blocks, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6, atol=1e-6)


def test_pipeline_transformer_with_batch_mask_and_lora():
    """Per-row additive masks must follow their microbatch through the
    pipeline; LoRA blocks shard on the same stage axis as the base blocks."""
    key = jax.random.PRNGKey(0)
    blocks = _blocks(key, 4, 64, 128)
    lora_full = init_lora(jax.random.PRNGKey(1), ARCH, LoraConfig(r=4, alpha=8))
    lora_blocks = lora_full["visual"]["blocks"]
    # make the adapters non-zero so they actually affect the output
    lora_blocks = jax.tree.map(
        lambda x: x + 0.01 * jax.random.normal(jax.random.PRNGKey(2), x.shape),
        lora_blocks,
    )
    # ARCH's visual lora targets (L=4, d=64) match these blocks
    x = jax.random.normal(jax.random.PRNGKey(3), (16, 8, 64), jnp.float32)
    neg = jnp.finfo(jnp.float32).min
    keep = jax.random.bernoulli(jax.random.PRNGKey(4), 0.8, (16, 1, 1, 8))
    mask = jnp.where(keep, 0.0, neg) * jnp.ones((1, 1, 8, 1))

    ref = jax.jit(
        lambda b, x, lb: transformer(b, x, 4, mask=mask, lora_blocks=lb, lora_scaling=2.0)
    )(blocks, x, lora_blocks)

    mesh = make_pp_mesh(n_stage=4)
    pipe = make_pipeline_transformer(mesh, n_microbatches=4)
    with mesh:
        got = jax.jit(
            lambda b, x, lb: pipe(b, x, 4, mask=mask, lora_blocks=lb, lora_scaling=2.0)
        )(blocks, x, lora_blocks)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6, atol=1e-6)


def test_pipeline_grads_match_scan():
    """AD through the tick loop derives the reverse pipeline schedule:
    grads w.r.t. stage-sharded LoRA params must equal the single-device
    grads (this is what catches a wrong collective transpose)."""
    key = jax.random.PRNGKey(0)
    blocks = _blocks(key, 4, 64, 128)
    lora_blocks = jax.tree.map(
        lambda x: x + 0.02 * jax.random.normal(jax.random.PRNGKey(2), x.shape),
        init_lora(jax.random.PRNGKey(1), ARCH, LoraConfig(r=4, alpha=8))["visual"]["blocks"],
    )
    x = jax.random.normal(jax.random.PRNGKey(3), (16, 8, 64), jnp.float32)

    def loss_ref(lb):
        return jnp.sum(jnp.square(transformer(blocks, x, 4, lora_blocks=lb)))

    g_ref = jax.jit(jax.grad(loss_ref))(lora_blocks)

    mesh = make_pp_mesh(n_stage=4)
    pipe = make_pipeline_transformer(mesh, n_microbatches=2)

    def loss_pp(lb):
        return jnp.sum(jnp.square(pipe(blocks, x, 4, lora_blocks=lb)))

    with mesh:
        g_pp = jax.jit(jax.grad(loss_pp))(lora_blocks)
    for ref, got in zip(
        jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_pp)
    ):
        # fp32 reassociation only: the reversed scan accumulates layer
        # cotangents in a different order (measured max rel ~1e-4); a wrong
        # collective transpose would be off by ×n_stages, far past this bar
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-3, atol=1e-5
        )


@pytest.mark.slow
def test_pp_train_step_matches_single_device():
    """Full dp2×pp4 training (2 steps, real placement helpers + sharded
    optimizer state) reproduces the single-device loss trajectory."""
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

    # single-device reference trajectory
    state = init_train_state(lora, tx, seed=0)
    step = make_train_step(params, ARCH, lora_cfg, train_cfg, tx, eot_id=513)
    ref_losses = []
    for _ in range(2):
        state, m = step(state, batch)
        ref_losses.append(float(m["loss"]))

    mesh = make_pp_mesh(n_stage=4, n_data=2)
    pp_step = make_pp_train_step(
        params, ARCH, lora_cfg, train_cfg, tx, mesh, n_microbatches=2,
        eot_id=513,
    )
    with mesh:
        params_g = shard_clip_pp(params, mesh)
        lora_g = shard_clip_pp(lora, mesh)
        state_g = init_pp_train_state(lora_g, tx, seed=0)
        pp_losses = []
        for _ in range(2):
            state_g, m = pp_step.inner(params_g, state_g, batch)
            pp_losses.append(float(m["loss"]))
        # optimizer moments stayed stage-sharded through the update: every
        # lora-shaped state leaf (adam mu/nu) must carry the stage axis
        lora_leaf_count = len(jax.tree_util.tree_leaves(lora))
        sharded = [
            leaf
            for leaf in jax.tree_util.tree_leaves(state_g.opt_state)
            if hasattr(leaf, "sharding") and "stage" in str(leaf.sharding.spec)
        ]
        assert len(sharded) >= 2 * lora_leaf_count  # mu + nu at minimum

    np.testing.assert_allclose(pp_losses, ref_losses, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("S", [16, 13])  # 13: the pad path (13 → 14 on seq=2)
def test_pp_sp_3d_transformer_matches_scan(S):
    """dp2×pp2×sp2: GPipe ticks over ``stage`` with a KV ring over ``seq``
    inside every stage — both explicit schedules compose in one shard_map
    and must still reproduce the plain scan (causal mask + LoRA active)."""
    blocks = _blocks(jax.random.PRNGKey(0), 4, 64, 128)
    lora_blocks = jax.tree.map(
        lambda x: x + 0.02 * jax.random.normal(jax.random.PRNGKey(2), x.shape),
        init_lora(jax.random.PRNGKey(1), ARCH, LoraConfig(r=4, alpha=8))
        ["visual"]["blocks"],
    )
    x = jax.random.normal(jax.random.PRNGKey(3), (8, S, 64), jnp.float32)
    neg = jnp.finfo(jnp.float32).min
    mask = jnp.triu(jnp.full((S, S), neg, jnp.float32), k=1)[None, None]

    ref = jax.jit(
        lambda b, x, lb: transformer(
            b, x, 4, mask=mask, lora_blocks=lb, lora_scaling=2.0
        )
    )(blocks, x, lora_blocks)

    mesh = make_pp_mesh(n_stage=2, n_data=2, n_seq=2)
    pipe = make_pipeline_transformer(mesh, n_microbatches=2)
    with mesh:
        got = jax.jit(
            lambda b, x, lb: pipe(
                b, x, 4, mask=mask, lora_blocks=lb, lora_scaling=2.0
            )
        )(blocks, x, lora_blocks)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-6
    )


@pytest.mark.slow
def test_pp_sp_3d_train_step_matches_single_device():
    """Full dp2×pp2×sp2 training (2 steps, both towers as pipelined ring
    programs; the vision tower's S=5 pads to 6) reproduces the
    single-device loss trajectory."""
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

    mesh = make_pp_mesh(n_stage=2, n_data=2, n_seq=2)
    pp_step = make_pp_train_step(
        params, ARCH, lora_cfg, train_cfg, tx, mesh, n_microbatches=2,
        eot_id=513,
    )
    with mesh:
        params_g = shard_clip_pp(params, mesh)
        state_g = init_pp_train_state(shard_clip_pp(lora, mesh), tx, seed=0)
        losses = []
        for _ in range(2):
            state_g, m = pp_step.inner(params_g, state_g, batch)
            losses.append(float(m["loss"]))
    np.testing.assert_allclose(losses, ref_losses, rtol=1e-5, atol=1e-6)


def test_pp_train_step_rejects_dropout():
    """Silently disabling LoRA dropout would train a different recipe than
    the DP/TP steps — the PP step must refuse it loudly."""
    params = clip_model.init_params(jax.random.PRNGKey(0), ARCH)
    tx, _ = make_optimizer(TrainingConfig(batch_size=16), total_steps=10)
    mesh = make_pp_mesh(n_stage=4, n_data=2)
    with pytest.raises(ValueError, match="dropout"):
        make_pp_train_step(
            params, ARCH, LoraConfig(r=4, alpha=8, dropout=0.1),
            TrainingConfig(batch_size=16), tx, mesh, n_microbatches=2,
        )


def test_pp_mesh_rejects_device_shortfall():
    with pytest.raises(ValueError, match="devices"):
        make_pp_mesh(n_stage=4, n_data=4)  # conftest provides only 8
    # n_stage > device count used to floor n_data to 0 and hand back an
    # EMPTY mesh instead of the explanatory error
    with pytest.raises(ValueError, match="devices"):
        make_pp_mesh(n_stage=16)


def test_pp_rejects_bad_geometry():
    mesh = make_pp_mesh(n_stage=4)
    pipe = make_pipeline_transformer(mesh, n_microbatches=3)
    blocks = _blocks(jax.random.PRNGKey(0), 4, 64, 128)
    x = jnp.zeros((16, 8, 64), jnp.float32)  # 16/(n_data=2)/3 not integral
    with pytest.raises(ValueError, match="microbatches"):
        with mesh:
            pipe(blocks, x, 4)
    blocks3 = _blocks(jax.random.PRNGKey(0), 3, 64, 128)
    pipe2 = make_pipeline_transformer(mesh, n_microbatches=2)
    with pytest.raises(ValueError, match="stages"):
        with mesh:
            pipe2(blocks3, jnp.zeros((16, 8, 64), jnp.float32), 4)
