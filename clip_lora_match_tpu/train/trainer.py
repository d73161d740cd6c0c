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
    chained_step = None
    if train_cfg.chain_steps > 1:
        # K optimizer steps per dispatch (bit-equal to K singles, tested);
        # full chains go through this, the ragged tail through train_step
        from clip_lora_match_tpu.train.step import make_chained_train_step

        chained_step = make_chained_train_step(
            params, arch, lora_cfg, train_cfg, tx,
            chain=train_cfg.chain_steps, eot_id=tokenizer.eot_id,
            remat=train_cfg.remat, unroll=train_cfg.scan_unroll,
        )
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

    seq_slice = getattr(train_cfg, "text_seq_slice", 0) or 0
    eot_id = tokenizer.eot_id

    def slice_batch(b):
        """Drop trailing all-padding text columns down to
        ``train_cfg.text_seq_slice`` — exact under the causal mask (trailing
        pads cannot influence earlier positions or the EOT pooling; same
        argument as the serving-side slice in models/encoder.py). ~17% fewer
        text-tower FLOPs fwd+bwd at 77→64."""
        ids, mask = b["input_ids"], b["attention_mask"]
        if (
            seq_slice
            and ids.shape[1] > seq_slice
            and not mask[:, seq_slice:].any()
            and (ids[:, :seq_slice] == eot_id).any(axis=1).all()
        ):
            b = dict(
                b,
                input_ids=ids[:, :seq_slice],
                attention_mask=mask[:, :seq_slice],
            )
        return b

    def place_chain(bs):
        """Stack K host batches to (K, B, ...); under a mesh the DATA axis is
        axis 1 (axis 0 is the scan/chain axis — sharding it would split the
        chain, not the batch)."""
        widths = {b["input_ids"].shape[1] for b in bs}
        if len(widths) > 1:
            # a rare unsliceable batch in a chain of sliced ones: re-pad to
            # the widest (pad = EOT ids + 0 mask, exactly the suffix the
            # slice removed — lossless)
            w = max(widths)

            def repad(b):
                ids, mask = b["input_ids"], b["attention_mask"]
                d = w - ids.shape[1]
                if d == 0:
                    return b
                return dict(
                    b,
                    input_ids=np.pad(ids, ((0, 0), (0, d)), constant_values=eot_id),
                    attention_mask=np.pad(mask, ((0, 0), (0, d))),
                )

            bs = [repad(b) for b in bs]
        stacked = {k: np.stack([b[k] for b in bs]) for k in bs[0]}
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from clip_lora_match_tpu.parallel import DATA_AXIS

            stacked = {
                k: jax.device_put(
                    v,
                    NamedSharding(
                        mesh, P(None, DATA_AXIS, *([None] * (v.ndim - 2)))
                    ),
                )
                for k, v in stacked.items()
            }
        return stacked

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
            chained_step=chained_step, place_chain=place_chain,
            slice_batch=slice_batch,
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
    ckpt, start_epoch, t0, chained_step=None, place_chain=None,
    slice_batch=None,
):
    if slice_batch is None:
        slice_batch = lambda b: b  # noqa: E731
    K = train_cfg.chain_steps if chained_step is not None else 1
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
        # ``pending`` holds per-micro-step device scalars (chained dispatches
        # contribute their full K-vector, so the logged trajectory is
        # identical to an unchained run).
        pending: list = []
        last_grad_norm = None
        i = 0
        chain_buf: list = []

        def flush_chain():
            nonlocal state, pending, last_grad_norm, chain_buf
            if not chain_buf:
                return
            if len(chain_buf) == K and chained_step is not None:
                state, m = chained_step(state, place_chain(chain_buf))
                # keep the K-vector as ONE device array — per-element reads
                # would pay a relay round trip each
                pending.append(m["losses"])
                last_grad_norm = m["grad_norm"]
            else:  # ragged tail (or K=1): one dispatch per step
                for b in chain_buf:
                    state, m = train_step(state, place_batch(b))
                    pending.append(m["loss"])
                    last_grad_norm = m["grad_norm"]
            chain_buf = []

        def maybe_log():
            nonlocal pending
            # running-loss print cadence (ref:train_lora.py:204-211); with
            # chaining the boundary lands on the first dispatch at/after it
            n_pending = sum(
                int(p.shape[0]) if getattr(p, "ndim", 0) else 1
                for p in pending
            )
            if pending and result.steps % train_cfg.logging_steps < n_pending:
                losses = [
                    float(v)
                    for p in pending
                    for v in np.atleast_1d(np.asarray(p))
                ]
                result.train_losses.extend(losses)
                log.info(
                    "epoch %d step %d/%d loss %.4f (run avg %.4f) %.1f s",
                    epoch + 1, i, steps_per_epoch, losses[-1],
                    float(np.mean(losses)), time.time() - t0,
                )
                metrics.write(
                    "train_step", epoch=epoch + 1, step=result.steps,
                    loss=losses[-1], grad_norm=float(last_grad_norm),
                )
                pending = []

        for i, batch in enumerate(it, start=1):
            if max_steps_per_epoch and i > max_steps_per_epoch:
                i -= 1
                break
            chain_buf.append(slice_batch(batch))
            if len(chain_buf) == K:
                flush_chain()
                result.steps += K
                maybe_log()
        flushed = len(chain_buf)
        flush_chain()
        result.steps += flushed
        maybe_log()
        result.train_losses.extend(
            float(v) for p in pending for v in np.atleast_1d(np.asarray(p))
        )

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
