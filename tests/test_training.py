"""Training stack tests: InfoNCE goldens, schedule shape, data pipeline,
jit train step (loss ↓, base frozen), 8-device DP equivalence, checkpoint
resume, and a miniature end-to-end train() run."""

import os

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from clip_lora_match_tpu.core.config import (
    ClipArchConfig,
    LoraConfig,
    PreprocessConfig,
    TrainingConfig,
)
from clip_lora_match_tpu.data.dataset import ClipPairDataset, batch_iterator, prefetch
from clip_lora_match_tpu.lora.adapter import init_lora
from clip_lora_match_tpu.models import clip as jclip
from clip_lora_match_tpu.parallel import make_mesh, shard_batch
from clip_lora_match_tpu.tokenizer import ClipTokenizer
from clip_lora_match_tpu.train import (
    clip_contrastive_loss,
    init_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
    warmup_linear_schedule,
)

ARCH = ClipArchConfig(
    image_size=32,
    patch_size=16,
    vision_width=32,
    vision_layers=2,
    vision_heads=2,
    vision_mlp_dim=64,
    vocab_size=600,
    max_text_length=16,
    text_width=32,
    text_layers=2,
    text_heads=2,
    text_mlp_dim=64,
    projection_dim=16,
)
LORA = LoraConfig(r=2, alpha=4, dropout=0.1)
TRAIN = TrainingConfig(batch_size=8, learning_rate=1e-2, num_epochs=1)


def _batch(rng, n=8, arch=ARCH):
    eot = 513  # fallback tokenizer EOT
    ids = np.full((n, arch.max_text_length), eot, np.int32)
    mask = np.zeros_like(ids)
    for i in range(n):
        L = int(rng.integers(3, arch.max_text_length))
        ids[i, 0] = 512
        ids[i, 1:L] = rng.integers(0, 512, L - 1)
        ids[i, L] = eot
        mask[i, : L + 1] = 1
    return {
        "pixel_values": rng.normal(
            size=(n, arch.image_size, arch.image_size, 3)
        ).astype(np.float32),
        "input_ids": ids,
        "attention_mask": mask,
    }


def test_infonce_matches_reference_formula(rng):
    """Golden vs a direct numpy transcription of the reference loss
    (normalize → logits/T → symmetric CE on arange targets,
    ref:train_lora.py:83-108)."""
    img = rng.normal(size=(6, 16)).astype(np.float32)
    txt = rng.normal(size=(6, 16)).astype(np.float32)
    T = 0.07
    i = img / np.linalg.norm(img, axis=-1, keepdims=True)
    t = txt / np.linalg.norm(txt, axis=-1, keepdims=True)
    logits = i @ t.T / T

    def ce(lg):
        lg = lg - lg.max(-1, keepdims=True)
        logp = lg - np.log(np.exp(lg).sum(-1, keepdims=True))
        return -np.mean(np.diagonal(logp))

    expected = 0.5 * (ce(logits) + ce(logits.T))
    got = float(clip_contrastive_loss(jnp.asarray(img), jnp.asarray(txt), T))
    assert got == pytest.approx(expected, abs=1e-5)


def test_warmup_linear_schedule():
    sched = warmup_linear_schedule(1e-4, 100, warmup_ratio=0.1)
    assert float(sched(0)) == pytest.approx(0.0, abs=1e-9)
    assert float(sched(10)) == pytest.approx(1e-4, rel=1e-3)
    assert float(sched(100)) == pytest.approx(0.0, abs=1e-9)
    assert float(sched(55)) == pytest.approx(0.5e-4, rel=0.05)


@pytest.fixture(scope="module")
def setup():
    params = jclip.init_params(jax.random.PRNGKey(0), ARCH)
    lora = init_lora(jax.random.PRNGKey(1), ARCH, LORA)
    tx, _ = make_optimizer(TRAIN, total_steps=50)
    state = init_train_state(lora, tx, seed=0)
    step = make_train_step(params, ARCH, LORA, TRAIN, tx, eot_id=513)
    return params, state, step, tx


def test_train_step_reduces_loss(setup, rng):
    params, state, step, _ = setup
    batch = _batch(np.random.default_rng(0))
    losses = []
    for _ in range(12):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] - 0.05, losses
    assert np.isfinite(losses).all()


def test_base_params_frozen(setup):
    """Gradients flow ONLY to the adapter; base stays byte-identical."""
    params, state, step, _ = setup
    before = jax.tree_util.tree_map(np.asarray, params)
    batch = _batch(np.random.default_rng(1))
    state, _ = step(state, batch)
    after = jax.tree_util.tree_map(np.asarray, params)
    for a, b in zip(jax.tree_util.tree_leaves(before), jax.tree_util.tree_leaves(after)):
        np.testing.assert_array_equal(a, b)


def test_chained_step_matches_k_single_steps(setup):
    """make_chained_train_step(K) must be bit-equivalent to K sequential
    single steps (same rng stream, same optimizer trajectory) — it only
    amortizes the per-dispatch relay overhead (VERDICT r2 next-step #4)."""
    from clip_lora_match_tpu.train import make_chained_train_step

    params, state0, step, tx = setup
    K = 3
    batches = [_batch(np.random.default_rng(10 + i)) for i in range(K)]
    stacked = {
        k: np.stack([b[k] for b in batches]) for k in batches[0]
    }
    chained = make_chained_train_step(params, ARCH, LORA, TRAIN, tx, chain=K,
                                      eot_id=513)

    s_single = state0
    losses = []
    for b in batches:
        s_single, m = step(s_single, b)
        losses.append(float(m["loss"]))
    s_chain, mc = chained(state0, stacked)

    np.testing.assert_allclose(
        float(mc["loss"]), np.mean(losses), rtol=1e-6
    )
    assert int(s_chain.step) == int(s_single.step)
    for a, b in zip(
        jax.tree_util.tree_leaves(s_single.lora),
        jax.tree_util.tree_leaves(s_chain.lora),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_eval_step_deterministic(setup):
    params, state, _, _ = setup
    ev = make_eval_step(params, ARCH, LORA, TRAIN, eot_id=513)
    batch = _batch(np.random.default_rng(2))
    l1, l2 = float(ev(state.lora, batch)), float(ev(state.lora, batch))
    assert l1 == l2  # no dropout in eval


def test_dp8_matches_single_device(setup):
    """Global-batch InfoNCE under an 8-way data mesh must equal the
    single-device computation (GSPMD inserts the feature all-gather)."""
    params, state, step, _ = setup
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    batch = _batch(np.random.default_rng(3), n=16)
    _, m_single = step(state, batch)
    mesh = make_mesh()
    sharded = shard_batch(mesh, batch)
    _, m_dp = step(state, sharded)
    assert float(m_dp["loss"]) == pytest.approx(float(m_single["loss"]), abs=1e-5)


# ---------------------------------------------------------------------------
# data pipeline
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def csv_dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("ds")
    img_dir = d / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    rows = ["image_path,text"]
    for i in range(20):
        arr = rng.integers(0, 255, (48, 40, 3), dtype=np.uint8)
        Image.fromarray(arr, "RGB").save(img_dir / f"{i}.jpg")
        rows.append(f"imgs/{i}.jpg,item number {i} pink bag")
    csv_path = d / "pairs.csv"
    csv_path.write_text("\n".join(rows))
    return str(csv_path), str(d)


def test_dataset_and_batching(csv_dataset):
    csv_path, root = csv_dataset
    tok = ClipTokenizer.from_dir(None, max_length=16)
    ds = ClipPairDataset(
        csv_path, tok, PreprocessConfig(image_size=32, max_text_length=16),
        image_root=root,
    )
    assert len(ds) == 20
    item = ds[0]
    assert item["pixel_values"].shape == (32, 32, 3)
    assert item["input_ids"].shape == (16,)
    batches = list(batch_iterator(ds, 8, shuffle=True, seed=1, epoch=0))
    assert len(batches) == 2  # drop_last: 20 → 2×8
    assert batches[0]["pixel_values"].shape == (8, 32, 32, 3)
    # deterministic shuffle
    b2 = list(batch_iterator(ds, 8, shuffle=True, seed=1, epoch=0))
    np.testing.assert_array_equal(batches[0]["input_ids"], b2[0]["input_ids"])
    b3 = list(batch_iterator(ds, 8, shuffle=True, seed=1, epoch=1))
    assert not np.array_equal(batches[0]["input_ids"], b3[0]["input_ids"])


def test_prefetch_yields_all_and_propagates_errors(csv_dataset):
    csv_path, root = csv_dataset
    tok = ClipTokenizer.from_dir(None, max_length=16)
    ds = ClipPairDataset(
        csv_path, tok, PreprocessConfig(image_size=32, max_text_length=16),
        image_root=root,
    )
    n = sum(1 for _ in prefetch(batch_iterator(ds, 4, shuffle=False)))
    assert n == 5

    def boom():
        yield {"x": np.zeros(1)}
        raise RuntimeError("worker died")

    it = prefetch(boom())
    next(it)
    with pytest.raises(RuntimeError, match="worker died"):
        list(it)


def test_uint8_feed_matches_float_feed(csv_dataset, setup):
    """uint8 pixel feed + on-device normalization must produce the SAME
    loss as the host-normalized float feed (both quantize through the same
    source uint8 image)."""
    csv_path, root = csv_dataset
    tok = ClipTokenizer.from_dir(None, max_length=16)
    pre = PreprocessConfig(image_size=32, max_text_length=16)
    ds_f = ClipPairDataset(csv_path, tok, pre, image_root=root)
    ds_u = ClipPairDataset(csv_path, tok, pre, image_root=root,
                           uint8_pixels=True)
    bf = next(batch_iterator(ds_f, 8, shuffle=False))
    bu = next(batch_iterator(ds_u, 8, shuffle=False))
    assert bu["pixel_values"].dtype == np.uint8
    params, state, _, _ = setup
    ev = make_eval_step(params, ARCH, LORA, TRAIN, eot_id=513)
    lf, lu = float(ev(state.lora, bf)), float(ev(state.lora, bu))
    assert lu == pytest.approx(lf, abs=1e-5)


def test_missing_csv_columns(tmp_path):
    bad = tmp_path / "bad.csv"
    bad.write_text("a,b\n1,2\n")
    tok = ClipTokenizer.from_dir(None, max_length=16)
    with pytest.raises(ValueError, match="image_path"):
        ClipPairDataset(str(bad), tok)


# ---------------------------------------------------------------------------
# end-to-end miniature training run + resume
# ---------------------------------------------------------------------------


def test_train_e2e_and_resume(csv_dataset, tmp_path):
    from clip_lora_match_tpu.train import train

    csv_path, root = csv_dataset
    out = str(tmp_path / "run")
    tcfg = TrainingConfig(
        seed=42, batch_size=4, learning_rate=5e-3, num_epochs=2,
        logging_steps=2, train_csv=csv_path, val_csv=csv_path,
        image_root_dir=root, output_dir=out, temperature=0.07,
    )
    res = train(
        lora_cfg=LORA, train_cfg=tcfg, arch=ARCH,
        tokenizer=ClipTokenizer.from_dir(None, max_length=16),
    )
    assert res.epochs == 2 and res.steps == 10  # 20//4=5 per epoch
    # robust descent check: second-epoch average below first-epoch average
    assert np.mean(res.train_losses[5:]) < np.mean(res.train_losses[:5])
    assert len(res.val_losses) == 2
    for k in (1, 2):
        d = os.path.join(out, f"epoch_{k}")
        assert os.path.exists(os.path.join(d, "adapter_model.safetensors"))
        assert os.path.exists(os.path.join(d, "lora_weights.npz"))
    # resume: same config continues instead of restarting
    res2 = train(
        lora_cfg=LORA, train_cfg=tcfg, arch=ARCH,
        tokenizer=ClipTokenizer.from_dir(None, max_length=16),
    )
    assert res2.steps == 0 and res2.epochs == 0  # nothing left to do


@pytest.mark.slow
def test_train_chained_matches_unchained(csv_dataset, tmp_path):
    """chain_steps=2 (K optimizer steps per dispatch incl. a ragged tail)
    must reproduce the unchained run's loss trajectory and final adapter —
    the chained loop is a dispatch-batching optimization, not a recipe
    change. 5 steps/epoch = 2 full chains + 1 ragged single per epoch."""
    from clip_lora_match_tpu.train import train

    csv_path, root = csv_dataset
    common = dict(
        seed=42, batch_size=4, learning_rate=5e-3, num_epochs=1,
        logging_steps=2, train_csv=csv_path, val_csv=csv_path,
        image_root_dir=root, temperature=0.07, resume=False,
    )
    tok = ClipTokenizer.from_dir(None, max_length=16)
    res1 = train(
        lora_cfg=LORA, arch=ARCH, tokenizer=tok,
        train_cfg=TrainingConfig(output_dir=str(tmp_path / "a"), **common),
    )
    res2 = train(
        lora_cfg=LORA, arch=ARCH, tokenizer=tok,
        train_cfg=TrainingConfig(
            output_dir=str(tmp_path / "b"), chain_steps=2, **common
        ),
    )
    assert res1.steps == res2.steps == 5
    np.testing.assert_allclose(res2.train_losses, res1.train_losses, atol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(res1.final_lora),
        jax.tree_util.tree_leaves(res2.final_lora),
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-6)


def test_grain_pipeline_matches_contract(csv_dataset):
    """Optional grain backend yields the same batch contract."""
    pytest.importorskip("grain")
    from clip_lora_match_tpu.data.grain_pipeline import grain_batch_iterator

    csv_path, root = csv_dataset
    tok = ClipTokenizer.from_dir(None, max_length=16)
    ds = ClipPairDataset(
        csv_path, tok, PreprocessConfig(image_size=32, max_text_length=16),
        image_root=root,
    )
    batches = list(grain_batch_iterator(ds, 8, shuffle=True, seed=1, epoch=0))
    assert len(batches) == 2
    assert batches[0]["pixel_values"].shape == (8, 32, 32, 3)
    assert batches[0]["input_ids"].shape == (8, 16)
    again = list(grain_batch_iterator(ds, 8, shuffle=True, seed=1, epoch=0))
    np.testing.assert_array_equal(batches[0]["input_ids"], again[0]["input_ids"])


def test_checkpoint_roundtrip_typed_rng(tmp_path):
    """rbg dropout keys (typed key arrays) must survive orbax save/restore."""
    import dataclasses

    import jax
    import numpy as np

    from clip_lora_match_tpu.core.config import (
        ClipArchConfig,
        LoraConfig,
        TrainingConfig,
    )
    from clip_lora_match_tpu.lora import init_lora
    from clip_lora_match_tpu.train import (
        CheckpointManager,
        init_train_state,
        make_optimizer,
    )

    arch = ClipArchConfig(
        image_size=32, patch_size=16, vision_width=64, vision_layers=2,
        vision_heads=4, vision_mlp_dim=128, vocab_size=600, max_text_length=16,
        text_width=32, text_layers=2, text_heads=4, text_mlp_dim=64,
        projection_dim=16,
    )
    tx, _ = make_optimizer(TrainingConfig(), 10)
    lora = init_lora(jax.random.PRNGKey(0), arch, LoraConfig(r=2))
    state = init_train_state(lora, tx, seed=3, rng_impl="rbg")
    state = dataclasses.replace(state, rng=jax.random.fold_in(state.rng, 7))
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(1, state, epoch=0)
    template = init_train_state(lora, tx, seed=0, rng_impl="rbg")
    restored, epoch = mgr.restore(template)
    mgr.close()
    assert epoch == 0
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(restored.rng)),
        np.asarray(jax.random.key_data(state.rng)),
    )
    # restored key is usable
    jax.random.bernoulli(restored.rng, 0.5, (4,))


def test_checkpoint_resume_across_rng_impl_change(tmp_path):
    """A checkpoint saved with the classic threefry PRNGKey must restore into
    a state configured for the TPU 'rbg' impl (and vice versa) — the upgrade
    path the r2 self-review flagged."""
    import jax
    import numpy as np

    from clip_lora_match_tpu.core.config import (
        ClipArchConfig,
        LoraConfig,
        TrainingConfig,
    )
    from clip_lora_match_tpu.lora import init_lora
    from clip_lora_match_tpu.train import (
        CheckpointManager,
        init_train_state,
        make_optimizer,
    )

    arch = ClipArchConfig(
        image_size=32, patch_size=16, vision_width=64, vision_layers=2,
        vision_heads=4, vision_mlp_dim=128, vocab_size=600, max_text_length=16,
        text_width=32, text_layers=2, text_heads=4, text_mlp_dim=64,
        projection_dim=16,
    )
    tx, _ = make_optimizer(TrainingConfig(), 10)
    lora = init_lora(jax.random.PRNGKey(0), arch, LoraConfig(r=2))
    # save under threefry
    legacy = init_train_state(lora, tx, seed=5)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(1, legacy, epoch=0)
    # resume under rbg
    template = init_train_state(lora, tx, seed=0, rng_impl="rbg")
    restored, epoch = mgr.restore(template)
    mgr.close()
    assert epoch == 0
    # key is typed rbg and usable
    assert jax.numpy.issubdtype(restored.rng.dtype, jax.dtypes.prng_key)
    jax.random.bernoulli(restored.rng, 0.5, (4,))
    # and deterministic given the same stored data
    mgr2 = CheckpointManager(str(tmp_path / "ckpt"))
    restored2, _ = mgr2.restore(template)
    mgr2.close()
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(restored.rng)),
        np.asarray(jax.random.key_data(restored2.rng)),
    )


@pytest.mark.slow
def test_train_text_seq_slice_equivalence(csv_dataset, tmp_path):
    """text_seq_slice=64 drops trailing all-pad text columns before dispatch
    (trainer.slice_batch). With LoRA dropout off the math is exact (causal
    mask: trailing pads unreachable), so the loss trajectory must match a
    text_seq_slice=0 run; chain_steps=2 on the sliced run also exercises
    chain-stacking of sliced batches."""
    import dataclasses

    from clip_lora_match_tpu.train import train

    csv_path, root = csv_dataset
    arch77 = dataclasses.replace(ARCH, max_text_length=77)
    lora0 = LoraConfig(r=2, alpha=4, dropout=0.0)
    tok = ClipTokenizer.from_dir(None, max_length=77)
    common = dict(
        seed=42, batch_size=4, learning_rate=5e-3, num_epochs=1,
        logging_steps=2, train_csv=csv_path, val_csv=csv_path,
        image_root_dir=root, temperature=0.07, resume=False,
    )
    res_full = train(
        lora_cfg=lora0, arch=arch77, tokenizer=tok,
        train_cfg=TrainingConfig(
            output_dir=str(tmp_path / "full"), text_seq_slice=0, **common
        ),
    )
    res_sliced = train(
        lora_cfg=lora0, arch=arch77, tokenizer=tok,
        train_cfg=TrainingConfig(
            output_dir=str(tmp_path / "sliced"), text_seq_slice=64,
            chain_steps=2, **common
        ),
    )
    assert res_full.steps == res_sliced.steps == 5
    np.testing.assert_allclose(
        res_sliced.train_losses, res_full.train_losses, rtol=2e-5, atol=2e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(res_full.final_lora),
        jax.tree_util.tree_leaves(res_sliced.final_lora),
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)
