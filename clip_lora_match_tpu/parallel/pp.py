"""Pipeline parallelism (GPipe) for the stacked CLIP towers.

The reference is single-device (SURVEY §2.4: no DP/TP/PP anywhere); DP is the
required strategy and TP ships in parallel/tp.py. This module adds the third
axis of the scale-out story: **pipeline parallelism over the transformer
depth**, built the TPU way —

- The towers' params are already STACKED on a leading layer axis and executed
  with ``lax.scan`` (nn/layers.py). PP is therefore *a sharding of that axis*:
  stage ``s`` of ``n`` holds layers ``[s·L/n, (s+1)·L/n)`` — no param
  restructuring, the (L, ...) tree just gets ``P('stage', ...)``.
- The schedule is SPMD: one ``shard_map`` over the ``stage`` axis runs the
  classic GPipe loop as a ``lax.scan`` over ``M + n - 1`` ticks. Every tick,
  each stage runs its layer block on its current microbatch and hands the
  activation to the next stage with ``lax.ppermute`` (a neighbor hop on the
  ICI ring — the stage axis is the mesh's minor axis).
- **Backward is derived, not scheduled**: the tick loop is differentiable
  (``ppermute`` transposes to the reverse permutation, the scan transposes to
  the reversed scan), so ``jax.value_and_grad`` through the pipeline yields a
  correct reverse pipeline schedule automatically. Grad cotangents for the
  stage-sharded params come out stage-sharded.

Bubble fraction is the textbook ``(n-1)/(M+n-1)``; pick ``n_microbatches``
≳ 4·n_stages to amortize. At ViT-B/32 depth (12 layers) PP is not *needed* —
it exists so the framework scales to depths where it is, and is validated by
equivalence tests (forward, grads, full train trajectory) on the virtual CPU
mesh plus the driver's multichip dry run.

Not supported inside the pipeline: LoRA dropout (per-layer rng threading
across stages; train PP recipes set dropout=0) and the single-device Pallas
serving kernels (same restriction as TP — set_kernel_flags defaults).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from clip_lora_match_tpu.nn.layers import transformer
from clip_lora_match_tpu.parallel.mesh import DATA_AXIS, compat_shard_map

STAGE_AXIS = "stage"

Params = dict[str, Any]


def make_pp_mesh(
    n_stage: int,
    n_data: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
    n_seq: Optional[int] = None,
) -> Mesh:
    """(data, stage[, seq]) mesh; the communicating axes sit minor so both
    the GPipe activation hops (stage) and the KV ring (seq — densest
    traffic, once per layer) ride neighbor ICI.

    ``n_seq``: adds a sequence axis for the 3D dp×pp×sp composition —
    ``make_pipeline_transformer`` detects it and runs ring attention inside
    every stage (see parallel/sp.py for the sequence-sharding story).
    """
    devices = list(devices if devices is not None else jax.devices())
    per_data = n_stage * (n_seq or 1)
    if n_data is None:
        n_data = len(devices) // per_data
    if n_data < 1 or len(devices) < n_data * per_data:
        raise ValueError(
            f"need {max(n_data, 1)}×{per_data}={max(n_data, 1) * per_data} "
            f"devices for the mesh, have {len(devices)} — on CPU "
            "set XLA_FLAGS=--xla_force_host_platform_device_count=N"
        )
    use = devices[: n_data * per_data]
    if n_seq:
        arr = np.array(use).reshape(n_data, n_stage, n_seq)
        from clip_lora_match_tpu.parallel.sp import SEQ_AXIS

        return Mesh(arr, (DATA_AXIS, STAGE_AXIS, SEQ_AXIS))
    arr = np.array(use).reshape(n_data, n_stage)
    return Mesh(arr, (DATA_AXIS, STAGE_AXIS))


def _path_in_blocks(path) -> bool:
    return any(getattr(e, "key", None) == "blocks" for e in path)


def clip_pp_pspecs(tree: Params) -> Params:
    """Spec tree for a CLIP param tree or its LoRA mirror: stacked transformer
    blocks shard the leading layer axis over ``stage``; everything else
    (embeddings, LNs, projections, logit_scale) replicates — at CLIP scale
    those are <2% of params."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: P(STAGE_AXIS) if _path_in_blocks(path) else P(),
        tree,
    )


def shard_clip_pp(tree: Params, mesh: Mesh) -> Params:
    """Place a CLIP param/LoRA tree on the mesh with PP shardings."""
    specs = clip_pp_pspecs(tree)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs
    )


def check_pp_divisibility(arch, n_stage: int) -> None:
    for name, layers in (
        ("vision", arch.vision_layers),
        ("text", arch.text_layers),
    ):
        if layers % n_stage:
            raise ValueError(
                f"{name} tower has {layers} layers, not divisible by "
                f"stage-axis size {n_stage}"
            )


def make_pipeline_transformer(mesh: Mesh, n_microbatches: int):
    """A drop-in for ``nn.layers.transformer`` that runs the stacked blocks
    as a GPipe pipeline over ``mesh``'s stage axis.

    blocks / lora_blocks leaves must be placed (or placeable) with
    ``P('stage', ...)`` on the leading layer axis; x with ``P('data', ...)``.
    The local batch (global B / n_data) must divide by ``n_microbatches``.

    3D composition: when ``mesh`` also carries a ``seq`` axis (make_pp_mesh
    with n_seq), each microbatch's token axis shards over it and every
    stage's attention runs as the parallel/sp.py KV ring — both schedules
    are explicit shard_map programs over disjoint axes, so they compose in
    ONE shard_map: GPipe ticks over ``stage``, ring hops over ``seq``, the
    batch over ``data``. Indivisible sequence lengths pad exactly like
    pure SP (pad_seq_and_mask).
    """
    from clip_lora_match_tpu.parallel.sp import (
        SEQ_AXIS,
        pad_seq_and_mask,
        seq_mask_spec,
    )

    n_stages = mesh.shape[STAGE_AXIS]
    M = n_microbatches
    seq_mode = SEQ_AXIS in mesh.axis_names
    n_seq = mesh.shape[SEQ_AXIS] if seq_mode else 1

    def pipeline_transformer(
        blocks: Params,
        x: jnp.ndarray,
        num_heads: int,
        mask: Optional[jnp.ndarray] = None,
        lora_blocks: Optional[Params] = None,
        lora_scaling: float = 1.0,
        eps: float = 1e-5,
        compute_dtype=None,
        remat: bool | str = False,
        lora_dropout: float = 0.0,
        dropout_rng=None,
        unroll: int | bool = 1,
    ) -> jnp.ndarray:
        if dropout_rng is not None and lora_dropout > 0.0:
            raise NotImplementedError(
                "LoRA dropout inside the pipeline is unsupported; train PP "
                "recipes set dropout=0 (see module docstring)"
            )
        L = jax.tree_util.tree_leaves(blocks)[0].shape[0]
        if L % n_stages:
            raise ValueError(f"{L} layers not divisible by {n_stages} stages")
        n_data = mesh.shape[DATA_AXIS]
        b_loc = x.shape[0] // n_data
        if x.shape[0] % n_data or b_loc % M:
            raise ValueError(
                f"global batch {x.shape[0]} must split into {n_data} data "
                f"shards × {M} microbatches"
            )

        S = x.shape[1]
        pad_s = 0
        if seq_mode:
            x, mask, pad_s = pad_seq_and_mask(x, mask, n_seq)

        # mask with a real batch dim must be microbatched alongside x;
        # batch-1 (pure causal) masks are tick-invariant
        batch_mask = mask is not None and mask.shape[0] > 1

        opt = {}
        opt_specs = {}
        if mask is not None:
            opt["mask"] = mask
            opt_specs["mask"] = (
                seq_mask_spec(mask)
                if seq_mode
                else (P(DATA_AXIS) if batch_mask else P())
            )
        if lora_blocks is not None:
            opt["lora"] = lora_blocks
            opt_specs["lora"] = jax.tree_util.tree_map(
                lambda _: P(STAGE_AXIS), lora_blocks
            )

        def local(blocks_loc, x_loc, opt_loc):
            stage = lax.axis_index(STAGE_AXIS)
            mb = x_loc.reshape(M, x_loc.shape[0] // M, *x_loc.shape[1:])
            mask_loc = opt_loc.get("mask")
            mask_mb = (
                mask_loc.reshape(M, -1, *mask_loc.shape[1:])
                if batch_mask
                else None
            )
            lora_loc = opt_loc.get("lora")

            ring_core = None
            if seq_mode:
                from clip_lora_match_tpu.ops.ring_attention import (
                    ring_attention,
                )

                def ring_core(qh, kh, vh, m):
                    return ring_attention(qh, kh, vh, SEQ_AXIS, mask=m)

            def stage_fn(xmb, m):
                return transformer(
                    blocks_loc, xmb, num_heads, mask=m,
                    lora_blocks=lora_loc, lora_scaling=lora_scaling, eps=eps,
                    compute_dtype=compute_dtype, remat=remat, unroll=unroll,
                    core_attn_fn=ring_core,
                )

            ring = [(i, (i + 1) % n_stages) for i in range(n_stages)]

            def tick(carry, t):
                state, outputs = carry
                # microbatch index flowing through this stage at tick t
                u = jnp.clip(t - stage, 0, M - 1)
                inp = jnp.where(
                    stage == 0,
                    lax.dynamic_index_in_dim(mb, u, 0, keepdims=False),
                    state,
                )
                m = (
                    lax.dynamic_index_in_dim(mask_mb, u, 0, keepdims=False)
                    if batch_mask
                    else mask_loc
                )
                out = stage_fn(inp, m)
                # the last stage banks finished microbatch t-(n-1); ticks in
                # the fill bubble (o < 0) and other stages leave outputs alone
                o = t - (n_stages - 1)
                upd = lax.dynamic_update_index_in_dim(
                    outputs, out, jnp.clip(o, 0, M - 1), 0
                )
                outputs = jnp.where(
                    (stage == n_stages - 1) & (o >= 0), upd, outputs
                )
                state = lax.ppermute(out, STAGE_AXIS, ring)
                return (state, outputs), None

            T = M + n_stages - 1
            (_, outputs), _ = lax.scan(
                tick,
                (jnp.zeros_like(mb[0]), jnp.zeros_like(mb)),
                jnp.arange(T),
            )
            # only the last stage banked real outputs (zeros elsewhere):
            # all_gather + static index is the broadcast-from-last-stage with
            # an exact AD transpose (cotangents route only to the last stage)
            outputs = lax.all_gather(outputs, STAGE_AXIS)[n_stages - 1]
            return outputs.reshape(x_loc.shape)

        x_spec = P(DATA_AXIS, SEQ_AXIS) if seq_mode else P(DATA_AXIS)
        fn = compat_shard_map(
            local,
            mesh=mesh,
            in_specs=(P(STAGE_AXIS), x_spec, opt_specs),
            out_specs=x_spec,
            check_rep=False,
        )
        out = fn(blocks, x, opt)
        return out[:, :S] if pad_s else out

    return pipeline_transformer


def init_pp_train_state(sharded_lora: Params, tx, seed: int = 42,
                        rng_impl: Optional[str] = None):
    """TrainState whose optimizer moments carry the LoRA PP shardings
    (stage-sharded block leaves). Place the LoRA tree with
    ``shard_clip_pp`` first."""
    from clip_lora_match_tpu.parallel.state import init_sharded_train_state

    return init_sharded_train_state(
        sharded_lora, tx, clip_pp_pspecs(sharded_lora), seed=seed,
        rng_impl=rng_impl,
    )


def make_pp_train_step(
    params: Params,
    arch,
    lora_cfg,
    train_cfg,
    tx,
    mesh: Mesh,
    n_microbatches: int,
    eot_id: Optional[int] = None,
    compute_dtype=None,
    remat: bool | str = False,
):
    """dp×pp LoRA train step: both towers execute as GPipe pipelines over the
    ``stage`` axis while the batch shards over ``data``; the global-batch
    InfoNCE all-gather and the DP grad psum stay GSPMD-derived, exactly like
    ``train.step.make_train_step`` (whose program this matches step-for-step
    at pp=1). LoRA dropout is forced off inside the pipeline (module
    docstring); PP recipes train with dropout=0.

    Place params/lora with ``shard_clip_pp`` and build state via
    ``init_pp_train_state``; batch leaves shard over ``data``.
    """
    from clip_lora_match_tpu.train.step import make_train_step

    if lora_cfg.dropout > 0.0:
        raise ValueError(
            "LoRA dropout is unsupported inside the pipeline (per-layer rng "
            "threading across stages); pass a LoraConfig with dropout=0.0 — "
            "silently disabling it would train a different recipe than the "
            "DP/TP steps"
        )
    check_pp_divisibility(arch, mesh.shape[STAGE_AXIS])
    # with dropout enforced off, make_train_step's program is EXACTLY the
    # production step with the pipeline executor injected into both towers
    return make_train_step(
        params, arch, lora_cfg, train_cfg, tx, eot_id=eot_id,
        compute_dtype=compute_dtype, remat=remat, unroll=1,
        transformer_fn=make_pipeline_transformer(mesh, n_microbatches),
    )
