"""LoRA fine-tuning orchestration — the ``train()`` entry point.

Mirrors the reference training recipe exactly (ref:scripts/train_lora.py:111-249):
seed 42, AdamW(lr 1e-4, wd 0.01) over adapter params only, warmup-ratio-0.1
linear schedule, grad-clip 1.0, symmetric InfoNCE at temperature 0.07,
running-loss log every ``logging_steps`` optimizer steps, per-epoch validation
loss and per-epoch adapter checkpoints in ``output_dir/epoch_{k}`` — while
fixing what it lacked: jit-compiled fused step, static-shape prefetched input
pipeline, Orbax resume (the reference restarts from scratch), and native +
PEFT-compatible adapter exports.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Optional

import jax
import numpy as np

from clip_lora_match_tpu.core.config import (
    ClipArchConfig,
    LoraConfig,
    TrainingConfig,
    load_lora_config,
)
from clip_lora_match_tpu.core.logging import MetricsWriter, get_logger
from clip_lora_match_tpu.data.dataset import (
    ClipPairDataset,
    batch_iterator,
    prefetch,
)
from clip_lora_match_tpu.lora.adapter import init_lora, save_lora
from clip_lora_match_tpu.lora.peft_io import save_peft_adapter
from clip_lora_match_tpu.models import clip as clip_model
from clip_lora_match_tpu.models.io import load_params
from clip_lora_match_tpu.tokenizer import ClipTokenizer
from clip_lora_match_tpu.train.checkpoint import CheckpointManager
from clip_lora_match_tpu.train.step import (
    init_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)
from clip_lora_match_tpu.utils.seeding import set_seed

log = get_logger("train")


@dataclass
class TrainResult:
    train_losses: list[float] = field(default_factory=list)
    val_losses: list[float] = field(default_factory=list)
    steps: int = 0
    epochs: int = 0
    output_dir: str = ""
    final_lora: Optional[dict] = None


def train(
    config_path: Optional[str] = None,
    lora_cfg: Optional[LoraConfig] = None,
    train_cfg: Optional[TrainingConfig] = None,
    arch: Optional[ClipArchConfig] = None,
    params: Optional[dict] = None,
    weights_path: Optional[str] = None,
    tokenizer: Optional[ClipTokenizer] = None,
    max_steps_per_epoch: Optional[int] = None,
    metrics_path: Optional[str] = None,
) -> TrainResult:
    """Run the LoRA fine-tune. Programmatic args override YAML config."""
    if lora_cfg is None or train_cfg is None:
        file_lora, file_train = load_lora_config(config_path)
        lora_cfg = lora_cfg or file_lora
        train_cfg = train_cfg or file_train
    arch = arch or ClipArchConfig()
    tokenizer = tokenizer or ClipTokenizer.from_dir(None, arch.max_text_length)

    root_key = set_seed(train_cfg.seed)  # ref:train_lora.py:116

    if params is None:
        if weights_path and os.path.exists(weights_path):
            params = load_params(weights_path)
        else:
            log.warning("no base weights; random-initializing CLIP (seed=%d)",
                        train_cfg.seed)
            params = clip_model.init_params(root_key, arch)

    from clip_lora_match_tpu.core.config import PreprocessConfig

    pre = PreprocessConfig(
        image_size=arch.image_size, max_text_length=arch.max_text_length
    )
    from clip_lora_match_tpu.preprocess.augment import ImageAugmenter

    # uint8 feed + on-device normalize: 4x smaller host→device pixel
    # transfer per step, bit-identical math (preprocess quantizes through
    # the same source uint8 either way); only valid while the preprocess
    # mean/std are the CLIP constants the step normalizes with
    u8_feed = tuple(pre.mean) == tuple(PreprocessConfig().mean) and tuple(
        pre.std
    ) == tuple(PreprocessConfig().std)
    train_ds = ClipPairDataset(
        train_cfg.train_csv, tokenizer, pre,
        image_root=train_cfg.image_root_dir,
        augmenter=ImageAugmenter(seed=train_cfg.seed),  # deterministic runs
        uint8_pixels=u8_feed,
    )
    val_ds = None
    if train_cfg.val_csv and os.path.exists(train_cfg.val_csv):
        val_ds = ClipPairDataset(
            train_cfg.val_csv, tokenizer, pre,
            image_root=train_cfg.image_root_dir, augment=False,
            uint8_pixels=u8_feed,
        )
    steps_per_epoch = len(train_ds) // train_cfg.batch_size
    if max_steps_per_epoch:
        steps_per_epoch = min(steps_per_epoch, max_steps_per_epoch)
    total_steps = max(1, steps_per_epoch * train_cfg.num_epochs)

    tx, sched = make_optimizer(train_cfg, total_steps)
    lora = init_lora(jax.random.PRNGKey(train_cfg.seed), arch, lora_cfg)
    # Training uses the plain XLA tower paths: the serving kernels
    # (fused-LoRA, small-attention) are inference wins — their custom_vjp
    # backwards recompute via the jnp reference, which would make train
    # steps slower, not faster. An encoder constructed earlier in this
    # process may have enabled them; the step traces below must not.
    from clip_lora_match_tpu.nn.layers import set_kernel_flags

    prev_flags = set_kernel_flags(fused_lora=False, flash_attention=False,
                                  small_attention=False)

    rng_impl = train_cfg.dropout_rng_impl or (
        "rbg" if jax.default_backend() == "tpu" else None
    )
    state = init_train_state(lora, tx, seed=train_cfg.seed, rng_impl=rng_impl)
    train_step = make_train_step(params, arch, lora_cfg, train_cfg, tx,
                                 eot_id=tokenizer.eot_id,
                                 remat=train_cfg.remat,
                                 unroll=train_cfg.scan_unroll)
    eval_step = make_eval_step(params, arch, lora_cfg, train_cfg,
                               eot_id=tokenizer.eot_id)

    # Data-parallel: with >1 device, batch_size is the GLOBAL batch; shard it
    # over the mesh's data axis (GSPMD adds the global-negative all-gather +
    # grad psum). Single device: plain jit, no placement overhead.
    mesh = None
    if jax.device_count() > 1:
        from clip_lora_match_tpu.parallel import make_mesh, replicated, shard_batch

        if train_cfg.batch_size % jax.device_count():
            log.warning(
                "batch_size %d not divisible by %d devices; single-device mode",
                train_cfg.batch_size, jax.device_count(),
            )
        else:
            mesh = make_mesh()
            state = jax.device_put(state, replicated(mesh))
            log.info("data-parallel over %d devices", mesh.devices.size)

    def place_batch(b):
        return shard_batch(mesh, b) if mesh is not None else b

    os.makedirs(train_cfg.output_dir, exist_ok=True)
    metrics = MetricsWriter(
        metrics_path
        or os.path.join(train_cfg.output_dir, "training_metrics.jsonl")
    )
    ckpt = CheckpointManager(os.path.join(train_cfg.output_dir, "orbax"))
    start_epoch = 0
    if train_cfg.resume:
        restored = ckpt.restore(state)
        if restored is not None:
            state, start_epoch = restored

    result = TrainResult(output_dir=train_cfg.output_dir)
    t0 = time.time()
    try:
        _run_epochs(
            result, state, train_step, eval_step, train_ds, val_ds,
            train_cfg, lora_cfg, steps_per_epoch, max_steps_per_epoch,
            place_batch, metrics, ckpt, start_epoch, t0,
        )
    finally:
        # restore whatever dispatch an encoder in this process had set up —
        # otherwise every post-training encode retraces onto the slow paths
        set_kernel_flags(**prev_flags)
        ckpt.close()
        metrics.close()
    return result


def _run_epochs(
    result, state, train_step, eval_step, train_ds, val_ds, train_cfg,
    lora_cfg, steps_per_epoch, max_steps_per_epoch, place_batch, metrics,
    ckpt, start_epoch, t0,
):
    for epoch in range(start_epoch, train_cfg.num_epochs):
        it = prefetch(
            batch_iterator(
                train_ds, train_cfg.batch_size, shuffle=True,
                seed=train_cfg.seed, epoch=epoch,
            )
        )
        # Losses stay DEVICE arrays inside the hot loop — float() forces a
        # device→host sync per step, which through the relay costs a full
        # round trip each step; materialize only at the logging cadence.
        pending: list = []
        for i, batch in enumerate(it):
            if max_steps_per_epoch and i >= max_steps_per_epoch:
                break
            state, m = train_step(state, place_batch(batch))
            pending.append(m)
            result.steps += 1
            if result.steps % train_cfg.logging_steps == 0:
                losses = [float(p["loss"]) for p in pending]
                result.train_losses.extend(losses)
                # running-loss print cadence (ref:train_lora.py:204-211)
                log.info(
                    "epoch %d step %d/%d loss %.4f (run avg %.4f) %.1f s",
                    epoch + 1, i + 1, steps_per_epoch, losses[-1],
                    float(np.mean(losses)), time.time() - t0,
                )
                metrics.write(
                    "train_step", epoch=epoch + 1, step=result.steps,
                    loss=losses[-1], grad_norm=float(pending[-1]["grad_norm"]),
                )
                pending = []
        result.train_losses.extend(float(p["loss"]) for p in pending)

        # per-epoch validation loss (ref:train_lora.py:214-241)
        if val_ds is not None and len(val_ds) < train_cfg.batch_size:
            log.warning(
                "val set (%d rows) smaller than batch_size %d; skipping "
                "per-epoch validation (drop-last batching needs one full "
                "batch)", len(val_ds), train_cfg.batch_size,
            )
        if val_ds is not None and len(val_ds) >= train_cfg.batch_size:
            vlosses = [
                float(eval_step(state.lora, place_batch(b)))
                for b in batch_iterator(
                    val_ds, train_cfg.batch_size, shuffle=False
                )
            ]
            vloss = float(np.mean(vlosses)) if vlosses else float("nan")
            result.val_losses.append(vloss)
            log.info("epoch %d val loss %.4f", epoch + 1, vloss)
            metrics.write("val", epoch=epoch + 1, loss=vloss)

        # per-epoch adapter checkpoint dirs, reference naming epoch_{k}
        epoch_dir = os.path.join(train_cfg.output_dir, f"epoch_{epoch + 1}")
        save_lora(epoch_dir, state.lora, lora_cfg)
        save_peft_adapter(epoch_dir, state.lora, lora_cfg)
        ckpt.save(int(state.step), state, epoch + 1)
        result.epochs = epoch + 1

    result.final_lora = jax.device_get(state.lora)
