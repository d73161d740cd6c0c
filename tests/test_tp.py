"""Tensor-parallel sharding: Megatron column/row splits via GSPMD.

Runs on the conftest's 8 virtual CPU devices. The contract under test: with
params placed by parallel/tp.py the towers and the LoRA train step compute
the SAME numbers as the unsharded single-device program (GSPMD inserts the
head-sharded attention + psum collectives; the math must not change), while
the weight tensors are genuinely distributed (per-device shards are smaller).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_lora_match_tpu.core.config import ClipArchConfig, LoraConfig, TrainingConfig
from clip_lora_match_tpu.lora import init_lora
from clip_lora_match_tpu.models import clip as clip_model
from clip_lora_match_tpu.parallel import (
    MODEL_AXIS,
    check_tp_divisibility,
    clip_tp_pspecs,
    init_tp_train_state,
    lora_tp_pspecs,
    make_mesh,
    shard_batch,
    shard_lora_tp,
    shard_params_tp,
)
from clip_lora_match_tpu.train import (
    init_train_state,
    make_optimizer,
    make_train_step,
)

ARCH = ClipArchConfig(
    image_size=32, patch_size=16, vision_width=64, vision_layers=2,
    vision_heads=4, vision_mlp_dim=128, vocab_size=600, max_text_length=16,
    text_width=32, text_layers=2, text_heads=4, text_mlp_dim=64,
    projection_dim=16,
)
EOT = 513


def _params_and_lora(randomize_b: bool = True):
    params = clip_model.init_params(jax.random.PRNGKey(0), ARCH)
    lora_cfg = LoraConfig(r=4, alpha=8, dropout=0.0)
    lora = init_lora(jax.random.PRNGKey(1), ARCH, lora_cfg)
    if randomize_b:
        # b is zero-init (adapter no-op); randomize so the sharded LoRA path
        # contributes real numbers the equivalence check can catch
        leaves, treedef = jax.tree_util.tree_flatten(lora)
        key = jax.random.PRNGKey(2)
        out = []
        for leaf in leaves:
            key, sub = jax.random.split(key)
            out.append(jax.random.normal(sub, leaf.shape, leaf.dtype) * 0.05)
        lora = jax.tree_util.tree_unflatten(treedef, out)
    return params, lora, lora_cfg


def _batch(rng, B):
    ids = np.full((B, ARCH.max_text_length), EOT, np.int32)
    ids[:, 0] = 512
    ids[:, 1] = rng.integers(0, 512, B)
    return {
        "pixel_values": rng.normal(
            size=(B, ARCH.image_size, ARCH.image_size, 3)
        ).astype(np.float32),
        "input_ids": ids,
        "attention_mask": np.ones_like(ids),
    }


def test_divisibility_check():
    check_tp_divisibility(ARCH, 2)
    check_tp_divisibility(ARCH, 4)
    with pytest.raises(ValueError):
        check_tp_divisibility(ARCH, 3)


def test_pspecs_cover_expected_splits():
    params, lora, _ = _params_and_lora()
    specs = clip_tp_pspecs(params)
    blk = specs["visual"]["blocks"]
    assert blk["attn"]["q_proj"]["kernel"][-1] == MODEL_AXIS
    assert blk["attn"]["q_proj"]["bias"][-1] == MODEL_AXIS
    assert blk["attn"]["out_proj"]["kernel"][-2] == MODEL_AXIS
    assert blk["attn"]["out_proj"]["bias"] == ()  # replicated
    assert blk["mlp"]["fc1"]["kernel"][-1] == MODEL_AXIS
    assert blk["mlp"]["fc2"]["kernel"][-2] == MODEL_AXIS
    assert blk["ln_1"]["scale"] == ()
    assert specs["visual"]["patch_embed"]["kernel"] == ()

    lspecs = lora_tp_pspecs(lora)
    lblk = lspecs["visual"]["blocks"]["attn"]
    assert lblk["q_proj"]["a"] == ()
    assert lblk["q_proj"]["b"][-1] == MODEL_AXIS
    assert lblk["out_proj"]["a"][-2] == MODEL_AXIS
    assert lblk["out_proj"]["b"] == ()


def test_tp_params_are_distributed():
    params, _, _ = _params_and_lora()
    mesh = make_mesh(n_data=2, n_model=4)
    sharded = shard_params_tp(params, mesh)
    qk = sharded["visual"]["blocks"]["attn"]["q_proj"]["kernel"]
    # (L, 64, 64) sharded 4-way on the output dim → 16-wide local shards
    local = qk.addressable_shards[0].data
    assert local.shape == (ARCH.vision_layers, 64, 16)
    ok = sharded["visual"]["blocks"]["attn"]["out_proj"]["kernel"]
    assert ok.addressable_shards[0].data.shape == (ARCH.vision_layers, 16, 64)
    ln = sharded["visual"]["blocks"]["ln_1"]["scale"]
    assert ln.addressable_shards[0].data.shape == ln.shape  # replicated


def test_tp_forward_matches_replicated():
    params, lora, lora_cfg = _params_and_lora()
    rng = np.random.default_rng(0)
    batch = _batch(rng, 8)

    def fwd(params, lora, batch):
        img = clip_model.encode_image_features(
            params, batch["pixel_values"], ARCH,
            lora=lora, lora_scaling=lora_cfg.scaling,
        )
        txt = clip_model.encode_text_features(
            params, batch["input_ids"], ARCH,
            attention_mask=batch["attention_mask"], eot_id=EOT,
            lora=lora, lora_scaling=lora_cfg.scaling,
        )
        return img, txt

    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    img_ref, txt_ref = jax.jit(fwd)(params, lora, jbatch)

    for n_data, n_model in ((2, 4), (4, 2)):
        mesh = make_mesh(n_data=n_data, n_model=n_model)
        check_tp_divisibility(ARCH, n_model)
        with mesh:
            sp = shard_params_tp(params, mesh)
            sl = shard_lora_tp(lora, mesh)
            sb = shard_batch(mesh, batch)
            img, txt = jax.jit(fwd)(sp, sl, sb)
        np.testing.assert_allclose(
            np.asarray(img), np.asarray(img_ref), atol=1e-5,
            err_msg=f"image tower mismatch at mesh ({n_data},{n_model})",
        )
        np.testing.assert_allclose(
            np.asarray(txt), np.asarray(txt_ref), atol=1e-5,
            err_msg=f"text tower mismatch at mesh ({n_data},{n_model})",
        )


@pytest.mark.slow
def test_tp_train_step_matches_single_device():
    params, _, _ = _params_and_lora(randomize_b=False)
    lora_cfg = LoraConfig(r=4, alpha=8, dropout=0.0)
    lora0 = init_lora(jax.random.PRNGKey(5), ARCH, lora_cfg)
    tcfg = TrainingConfig(batch_size=8, learning_rate=1e-2)
    tx, _ = make_optimizer(tcfg, total_steps=10)
    step = make_train_step(params, ARCH, lora_cfg, tcfg, tx, eot_id=EOT)

    rng = np.random.default_rng(1)
    batches = [_batch(rng, tcfg.batch_size) for _ in range(2)]

    # single-device reference trajectory
    st_solo = init_train_state(lora0, tx, seed=7)
    losses_solo = []
    for b in batches:
        st_solo, m = step(st_solo, {k: jnp.asarray(v) for k, v in b.items()})
        losses_solo.append(float(m["loss"]))

    # dp2 × tp4 trajectory: same init, same data, TP-sharded params + state
    mesh = make_mesh(n_data=2, n_model=4)
    with mesh:
        sp = shard_params_tp(params, mesh)
        sl = shard_lora_tp(lora0, mesh)
        st = init_tp_train_state(sl, tx, seed=7)
        step_tp = make_train_step(sp, ARCH, lora_cfg, tcfg, tx, eot_id=EOT)
        losses_tp = []
        for b in batches:
            st, m = step_tp(st, shard_batch(mesh, b))
            losses_tp.append(float(m["loss"]))

    np.testing.assert_allclose(losses_tp, losses_solo, atol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(st.lora),
        jax.tree_util.tree_leaves(st_solo.lora),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_tp_opt_state_inherits_sharding():
    _, lora, lora_cfg = _params_and_lora(randomize_b=False)
    tcfg = TrainingConfig(batch_size=8)
    tx, _ = make_optimizer(tcfg, total_steps=10)
    mesh = make_mesh(n_data=2, n_model=4)
    with mesh:
        sl = shard_lora_tp(lora, mesh)
        st = init_tp_train_state(sl, tx, seed=0)
    # adamw moments for a column-parallel 'b' must carry the model-axis shard
    b_leaf = sl["visual"]["blocks"]["attn"]["q_proj"]["b"]
    spec = b_leaf.sharding.spec
    assert MODEL_AXIS in tuple(spec)
    def _spec(leaf):
        sharding = getattr(leaf, "sharding", None)
        return tuple(getattr(sharding, "spec", ()) or ())

    found = [
        leaf
        for leaf in jax.tree_util.tree_leaves(st.opt_state)
        if getattr(leaf, "shape", None) == b_leaf.shape
        and MODEL_AXIS in _spec(leaf)
    ]
    assert found, "no optimizer moment inherited the TP sharding"
