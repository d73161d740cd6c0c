"""Data-parallel LoRA train/eval steps.

The reference's eager per-step loop (ref:scripts/train_lora.py:170-211:
forward both towers → InfoNCE → backward → clip-norm 1.0 → AdamW → warmup/
linear-decay sched) becomes ONE jit-compiled function: forward + global-batch
InfoNCE + backward + AdamW update fused by XLA. Under a mesh, the caller
shards the batch over the ``data`` axis (parallel/mesh.shard_batch) and
replicates params; the GSPMD partitioner inserts the feature all-gather for
the global (B_global × B_global) contrastive logits and the gradient psum —
the collectives SURVEY §2.4 calls for, without hand-written comms.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from clip_lora_match_tpu.core.config import ClipArchConfig, LoraConfig, TrainingConfig
from clip_lora_match_tpu.models import clip as clip_model
from clip_lora_match_tpu.train.loss import clip_contrastive_loss

Params = dict[str, Any]


@jax.tree_util.register_dataclass
@dataclass
class TrainState:
    lora: Params
    opt_state: Any
    step: jnp.ndarray
    rng: jax.Array


def warmup_linear_schedule(
    base_lr: float, total_steps: int, warmup_ratio: float = 0.1
) -> optax.Schedule:
    """Linear warmup then linear decay to 0 (ref:train_lora.py:154-166)."""
    warmup = max(1, int(total_steps * warmup_ratio))
    return optax.join_schedules(
        [
            optax.linear_schedule(0.0, base_lr, warmup),
            optax.linear_schedule(base_lr, 0.0, max(1, total_steps - warmup)),
        ],
        [warmup],
    )


def make_optimizer(
    cfg: TrainingConfig, total_steps: int
) -> tuple[optax.GradientTransformation, optax.Schedule]:
    """AdamW(adapter-only) + clip-norm + warmup/linear-decay (+ grad accum).

    Matches ref:train_lora.py:154-166 (AdamW lr 1e-4, wd 0.01, clip 1.0), with
    gradient_accumulation_steps folded in via optax.MultiSteps.

    ``total_steps`` counts MICRO-batches (what the trainer iterates); the
    schedule inside MultiSteps only ticks once per accumulation window, so
    its horizon is total_steps / accumulation — matching the reference's
    ceil(len(loader)/grad_accum) * epochs (ref:train_lora.py:156). Without
    the division, warmup stretches accumulation× longer and the decay never
    reaches zero.
    """
    sched_steps = max(1, total_steps // max(1, cfg.gradient_accumulation_steps))
    sched = warmup_linear_schedule(cfg.learning_rate, sched_steps, cfg.warmup_ratio)
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(learning_rate=sched, weight_decay=cfg.weight_decay),
    )
    if cfg.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, cfg.gradient_accumulation_steps)
    return tx, sched


def _tower_features(
    params, lora, batch, arch, lora_cfg, eot_id, compute_dtype, remat,
    dropout_rng=None, unroll=1, transformer_fn=None,
):
    """Forward both towers; LoRA dropout active iff dropout_rng is given.

    ``pixel_values`` may arrive as uint8 (resized/cropped, NOT normalized):
    scale + CLIP mean/std then happen ON-DEVICE, cutting the host→HBM batch
    transfer 4x (the same trick as the serving encoder's uint8 feed,
    models/encoder.py::_image_fn_u8 — through the relay the fp32 pixel
    transfer is a real per-step cost at B=128: 77 MB vs 19 MB). Custom
    mean/std pipelines should feed pre-normalized float pixels."""
    pix = batch["pixel_values"]
    if pix.dtype == jnp.uint8:
        from clip_lora_match_tpu.core.config import CLIP_IMAGE_MEAN, CLIP_IMAGE_STD

        x = pix.astype(jnp.float32) / 255.0
        mean = jnp.asarray(CLIP_IMAGE_MEAN, jnp.float32)
        std = jnp.asarray(CLIP_IMAGE_STD, jnp.float32)
        batch = {**batch, "pixel_values": (x - mean) / std}
    rate = lora_cfg.dropout if dropout_rng is not None else 0.0
    rngs = (
        jax.random.split(dropout_rng) if dropout_rng is not None else (None, None)
    )
    img = clip_model.encode_image_features(
        params, batch["pixel_values"], arch,
        lora=lora, lora_scaling=lora_cfg.scaling,
        compute_dtype=compute_dtype, remat=remat,
        lora_dropout=rate, dropout_rng=rngs[0], unroll=unroll,
        transformer_fn=transformer_fn,
    )
    txt = clip_model.encode_text_features(
        params, batch["input_ids"], arch,
        attention_mask=batch.get("attention_mask"), eot_id=eot_id,
        lora=lora, lora_scaling=lora_cfg.scaling,
        compute_dtype=compute_dtype, remat=remat,
        lora_dropout=rate, dropout_rng=rngs[1], unroll=unroll,
        transformer_fn=transformer_fn,
    )
    return img, txt


def make_train_step(
    params: Params,
    arch: ClipArchConfig,
    lora_cfg: LoraConfig,
    train_cfg: TrainingConfig,
    tx: optax.GradientTransformation,
    eot_id: Optional[int] = None,
    compute_dtype=None,
    remat: bool | str = False,
    unroll: int | bool = True,
    transformer_fn=None,
) -> Callable[[TrainState, dict], tuple[TrainState, dict]]:
    """Build the jit'd train step. The frozen base params are a jit ARGUMENT
    (not a closure capture — captured arrays embed as HLO constants, which
    bloats the compile payload by the full 151M-param model and can exceed
    compile-service request limits); only the LoRA tree is differentiated.

    ``transformer_fn``: alternate stacked-transformer executor threaded into
    both towers (models/clip.py) — how the PP/SP factories
    (parallel/{pp,sp}.py) reuse this exact step program."""

    def _loss(lora, params, batch, rng):
        img, txt = _tower_features(
            params, lora, batch, arch, lora_cfg, eot_id, compute_dtype, remat,
            dropout_rng=rng if lora_cfg.dropout > 0 else None, unroll=unroll,
            transformer_fn=transformer_fn,
        )
        return clip_contrastive_loss(img, txt, train_cfg.temperature)

    @jax.jit
    def _step(params, state: TrainState, batch: dict):
        rng, new_rng = jax.random.split(state.rng)
        loss, grads = jax.value_and_grad(_loss)(state.lora, params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.lora)
        lora = optax.apply_updates(state.lora, updates)
        new_state = TrainState(
            lora=lora, opt_state=opt_state, step=state.step + 1, rng=new_rng
        )
        return new_state, {"loss": loss, "grad_norm": optax.global_norm(grads)}

    def step(state: TrainState, batch: dict) -> tuple[TrainState, dict]:
        return _step(params, state, batch)

    # Callers composing larger jit programs (chained multi-step, custom
    # loops) must pass params as an ARGUMENT — calling `step` inside another
    # trace would inline the 151M-param tree as HLO constants and blow the
    # compile-request size (CLAUDE.md: HTTP 413 limit on the axon relay).
    step.inner = _step
    return step


def make_chained_train_step(
    params: Params,
    arch: ClipArchConfig,
    lora_cfg: LoraConfig,
    train_cfg: TrainingConfig,
    tx: optax.GradientTransformation,
    chain: int,
    eot_id: Optional[int] = None,
    compute_dtype=None,
    remat: bool | str = False,
    unroll: int | bool = True,
) -> Callable[[TrainState, dict], tuple[TrainState, dict]]:
    """K micro-steps per device dispatch via ``lax.scan``.

    Each dispatch through the axon relay costs ~10 ms of launch/RTT overhead
    (measured r2, ROUND_NOTES) — ~17% of a 59.6 ms step. Chaining K
    optimizer steps into one jit program amortizes that to 10/K ms. Batch
    leaves arrive stacked as (K, B, ...); the scan body is the SAME program
    as make_train_step's (params as an argument — no HLO-constant blowup,
    the 413-payload concern in make_train_step's docstring), so compile cost
    matches the single step.

    Returns per-chain mean loss and last grad_norm. Matches the reference
    recipe (ref:scripts/train_lora.py:170-211) — K genuine sequential
    optimizer steps, not grad accumulation."""

    def _loss(lora, params, batch, rng):
        img, txt = _tower_features(
            params, lora, batch, arch, lora_cfg, eot_id, compute_dtype, remat,
            dropout_rng=rng if lora_cfg.dropout > 0 else None, unroll=unroll,
        )
        return clip_contrastive_loss(img, txt, train_cfg.temperature)

    @jax.jit
    def _chained(params, state: TrainState, batches: dict):
        def body(carry, batch):
            st = carry
            rng, new_rng = jax.random.split(st.rng)
            loss, grads = jax.value_and_grad(_loss)(st.lora, params, batch, rng)
            updates, opt_state = tx.update(grads, st.opt_state, st.lora)
            lora = optax.apply_updates(st.lora, updates)
            nxt = TrainState(
                lora=lora, opt_state=opt_state, step=st.step + 1, rng=new_rng
            )
            return nxt, (loss, optax.global_norm(grads))

        state, (losses, gnorms) = jax.lax.scan(body, state, batches, length=chain)
        # "losses"/"grad_norms" carry the full per-micro-step vectors so a
        # chained trainer loop logs the SAME trajectory as an unchained one
        return state, {
            "loss": jnp.mean(losses),
            "losses": losses,
            "grad_norm": gnorms[-1],
            "grad_norms": gnorms,
        }

    def step(state: TrainState, batches: dict) -> tuple[TrainState, dict]:
        return _chained(params, state, batches)

    step.inner = _chained
    return step


def make_eval_step(
    params: Params,
    arch: ClipArchConfig,
    lora_cfg: LoraConfig,
    train_cfg: TrainingConfig,
    eot_id: Optional[int] = None,
    compute_dtype=None,
) -> Callable[[Params, dict], jnp.ndarray]:
    """Validation loss (ref:train_lora.py:214-241's eval-mode loop body —
    no dropout, no grads). Params are a jit argument, not a captured const."""

    @jax.jit
    def _step(params, lora: Params, batch: dict) -> jnp.ndarray:
        img, txt = _tower_features(
            params, lora, batch, arch, lora_cfg, eot_id, compute_dtype, False
        )
        return clip_contrastive_loss(img, txt, train_cfg.temperature)

    def step(lora: Params, batch: dict) -> jnp.ndarray:
        return _step(params, lora, batch)

    return step


def init_train_state(
    lora: Params,
    tx: optax.GradientTransformation,
    seed: int = 42,
    rng_impl: Optional[str] = None,
) -> TrainState:
    """``rng_impl``: None → classic threefry PRNGKey (deterministic across
    backends); "rbg"/"unsafe_rbg" → the TPU's hardware RNG instruction for
    dropout masks (~4x cheaper per step, measured 97→60 ms at B=128)."""
    rng = (
        jax.random.key(seed, impl=rng_impl) if rng_impl else jax.random.PRNGKey(seed)
    )
    return TrainState(
        lora=lora,
        opt_state=tx.init(lora),
        step=jnp.zeros((), jnp.int32),
        rng=rng,
    )
