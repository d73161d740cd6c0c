"""Sequence parallelism for the CLIP towers: ring attention over a ``seq`` axis.

DP covers batch, TP width (parallel/tp.py), PP depth (parallel/pp.py); this
module covers the fourth axis — SEQUENCE — the TPU way:

- Every non-attention op in a transformer block (LN, QKV/out projections,
  MLP, LoRA deltas, residuals) is per-token, so under a sequence sharding
  ``x: P(data, seq)`` they run unchanged on the local rows with params
  replicated — no communication at all.
- Attention is the one all-to-all over tokens. It runs as RING ATTENTION
  (ops/ring_attention.py): each device keeps its query rows, KV blocks
  rotate around the ``seq`` axis via ``lax.ppermute`` (neighbor ICI hops),
  and a flash-style online softmax accumulates exact results block by
  block. AD through the ring derives the backward schedule automatically,
  same argument as the PP tick loop.
- Arbitrary sequence lengths are supported by PADDING to the next multiple
  of the axis size: pad key columns are masked to the additive-mask floor
  in every layer (so they never receive attention mass) and pad query rows
  are sliced off after the tower. This matters here — CLIP's own
  geometries (vision S=50/197/257/577, text S=77) are mostly indivisible.

At CLIP's 50-77 tokens SP buys nothing (same honesty as TP/PP at 12
layers): it exists so the framework's attention scales to sequence lengths
that do not fit one chip, and is validated by equivalence tests (op, tower
incl. pad path, grads, full dp×sp train trajectory) plus the driver's
multichip dry run. The reference is single-device torch
(ref:src/models/clip_model.py); nothing upstream shards anything.

Not supported inside the sequence shard: LoRA dropout (per-shard rng would
draw different masks than the global (B, S, D) draw — recipes set
dropout=0, enforced loudly like parallel/pp.py) and the single-device
Pallas serving kernels (core dispatch is replaced by the ring).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from clip_lora_match_tpu.nn.layers import transformer
from clip_lora_match_tpu.ops.ring_attention import _MASK_FLOOR, ring_attention
from clip_lora_match_tpu.parallel.mesh import DATA_AXIS, compat_shard_map

SEQ_AXIS = "seq"

Params = dict[str, Any]


def make_sp_mesh(
    n_seq: int,
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """(data, seq) mesh; seq is minor so the KV ring rides neighbor ICI.

    ``n_model > 1`` inserts a GSPMD-auto ``model`` axis between them —
    dp×tp×sp: the SP shard_map runs MANUAL over (data, seq) while Megatron
    TP shardings over ``model`` propagate through it (see
    mesh.compat_shard_map's axis_names). model sits next to seq so both
    all-reduce-ish axes ride short ICI hops."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // (n_seq * n_model)
    need = max(n_data, 1) * n_seq * n_model
    if n_data < 1 or len(devices) < n_data * n_seq * n_model:
        raise ValueError(
            f"need {need} devices for a (data, model, seq)="
            f"({max(n_data, 1)}, {n_model}, {n_seq}) mesh, have "
            f"{len(devices)} — on CPU set "
            "XLA_FLAGS=--xla_force_host_platform_device_count=N"
        )
    if n_model == 1:
        arr = np.array(devices[: n_data * n_seq]).reshape(n_data, n_seq)
        return Mesh(arr, (DATA_AXIS, SEQ_AXIS))
    from clip_lora_match_tpu.parallel.mesh import MODEL_AXIS

    arr = np.array(devices[: n_data * n_model * n_seq]).reshape(
        n_data, n_model, n_seq
    )
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS, SEQ_AXIS))


def shard_clip_sp(tree: Params, mesh: Mesh) -> Params:
    """Place a CLIP param/LoRA tree for SP: everything REPLICATES (only
    activations shard — that is the point of sequence parallelism)."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def shard_clip_sp_tp(tree: Params, mesh: Mesh, lora: bool = False) -> Params:
    """Place a tree for dp×tp×sp: Megatron TP splits over the mesh's
    ``model`` axis (parallel/tp.py specs), replicated over data/seq."""
    from clip_lora_match_tpu.parallel.tp import clip_tp_pspecs, lora_tp_pspecs

    specs = (lora_tp_pspecs if lora else clip_tp_pspecs)(tree)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs
    )


def pad_seq_and_mask(
    x: jnp.ndarray, mask: Optional[jnp.ndarray], n_seq: int
) -> tuple[jnp.ndarray, Optional[jnp.ndarray], int]:
    """Validate + pad (x, mask) for a ``n_seq``-way sequence shard.

    Returns (x_padded, mask_padded_or_None, pad). Shared by the pure-SP
    executor below and the dp×pp×sp composition (parallel/pp.py).

    Mask contract: the ring slices key columns by GLOBAL position and shards
    query rows, so broadcastable shorthands must be explicit enough to tell
    rows from keys — 4-dim, full key dim, rows either full or a broadcast 1.
    On padding, KEY columns always extend at the floor (pad keys must never
    receive attention mass in any layer); QUERY rows extend only when the
    mask is per-row — a broadcast row mask must STAY broadcast, or devices
    past the first would see all-floor rows. Pad query rows then compute
    unmasked garbage that the caller slices off, and their floor-masked key
    columns keep them out of real rows.
    """
    B, S, D = x.shape
    if mask is not None:
        if mask.ndim != 4:
            raise ValueError(
                f"SP needs an explicit 4-dim additive mask (broadcastable "
                f"dims of size 1 allowed), got ndim={mask.ndim}"
            )
        if mask.shape[3] != S or mask.shape[2] not in (1, S):
            raise ValueError(
                f"SP mask must have key dim {S} and query-row dim 1 or "
                f"{S}, got {mask.shape}"
            )
    S_pad = -(-S // n_seq) * n_seq
    pad = S_pad - S
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        if mask is not None:
            mask = jnp.pad(
                mask.astype(jnp.float32),
                ((0, 0), (0, 0), (0, 0), (0, pad)),
                constant_values=float(_MASK_FLOOR),
            )
            if mask.shape[2] > 1:
                mask = jnp.pad(
                    mask,
                    ((0, 0), (0, 0), (0, pad), (0, 0)),
                    constant_values=float(_MASK_FLOOR),
                )
        else:
            cols = jnp.where(
                jnp.arange(S_pad) < S, jnp.float32(0), _MASK_FLOOR
            )
            mask = jnp.broadcast_to(cols, (1, 1, 1, S_pad))
    return x, mask, pad


def seq_mask_spec(mask: jnp.ndarray) -> P:
    """PartitionSpec for a (validated, possibly padded) SP mask: batch over
    ``data`` when per-row batched, query rows over ``seq`` when explicit,
    key columns always FULL (the ring slices them per step)."""
    return P(
        DATA_AXIS if mask.shape[0] > 1 else None,
        None,
        SEQ_AXIS if mask.shape[2] > 1 else None,
        None,
    )


def make_sp_transformer(mesh: Mesh):
    """A drop-in for ``nn.layers.transformer`` that shards the SEQUENCE axis
    over ``mesh``'s ``seq`` axis and runs attention as a KV ring.

    Any sequence length works (padded to a multiple of the axis size with
    floor-masked key columns); the global batch must divide the ``data``
    axis. Params and LoRA replicate.
    """
    n_seq = mesh.shape[SEQ_AXIS]
    n_data = mesh.shape[DATA_AXIS]
    # dp×tp×sp: a ``model`` axis on the mesh stays GSPMD-AUTO inside the
    # shard_map — params keep their Megatron TP shardings and GSPMD inserts
    # the row-parallel psums inside the manual (data, seq) region.
    from clip_lora_match_tpu.parallel.mesh import MODEL_AXIS

    manual_axes = (
        frozenset({DATA_AXIS, SEQ_AXIS})
        if MODEL_AXIS in mesh.axis_names and mesh.shape[MODEL_AXIS] > 1
        else None
    )

    def sp_transformer(
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
                "LoRA dropout inside the sequence shard is unsupported; SP "
                "recipes set dropout=0 (see module docstring)"
            )
        B, S, D = x.shape
        if B % n_data:
            raise ValueError(
                f"global batch {B} must divide the data axis ({n_data})"
            )
        x, mask, pad = pad_seq_and_mask(x, mask, n_seq)

        opt = {}
        opt_specs = {}
        if mask is not None:
            opt["mask"] = mask
            opt_specs["mask"] = seq_mask_spec(mask)
        if lora_blocks is not None:
            opt["lora"] = lora_blocks
            opt_specs["lora"] = jax.tree_util.tree_map(
                lambda _: P(), lora_blocks
            )

        def local(blocks_rep, x_loc, opt_loc):
            def ring_core(qh, kh, vh, m):
                return ring_attention(qh, kh, vh, SEQ_AXIS, mask=m)

            return transformer(
                blocks_rep,
                x_loc,
                num_heads,
                mask=opt_loc.get("mask"),
                lora_blocks=opt_loc.get("lora"),
                lora_scaling=lora_scaling,
                eps=eps,
                compute_dtype=compute_dtype,
                remat=remat,
                unroll=unroll,
                core_attn_fn=ring_core,
            )

        fn = compat_shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P(DATA_AXIS, SEQ_AXIS), opt_specs),
            out_specs=P(DATA_AXIS, SEQ_AXIS),
            check_rep=False,
            axis_names=manual_axes,
        )
        out = fn(blocks, x, opt)
        return out[:, :S] if pad else out

    return sp_transformer


def init_sp_train_state(sharded_lora: Params, tx, seed: int = 42,
                        rng_impl: Optional[str] = None):
    """TrainState with replicated optimizer moments (SP shards activations,
    not params). Place the LoRA tree with ``shard_clip_sp`` first."""
    from clip_lora_match_tpu.parallel.state import init_sharded_train_state

    specs = jax.tree_util.tree_map(lambda _: P(), sharded_lora)
    return init_sharded_train_state(
        sharded_lora, tx, specs, seed=seed, rng_impl=rng_impl
    )


def make_sp_train_step(
    params: Params,
    arch,
    lora_cfg,
    train_cfg,
    tx,
    mesh: Mesh,
    eot_id: Optional[int] = None,
    compute_dtype=None,
    remat: bool | str = False,
):
    """dp×sp LoRA train step: both towers run with the sequence axis sharded
    and ring attention, while the batch shards over ``data``; the global
    InfoNCE all-gather and DP grad psum stay GSPMD-derived, matching
    ``train.step.make_train_step`` step-for-step at sp=1. LoRA dropout is
    refused (module docstring).

    Place params/lora with ``shard_clip_sp`` and build state via
    ``init_sp_train_state``; batch leaves shard over ``data``.
    """
    from clip_lora_match_tpu.train.step import make_train_step

    if lora_cfg.dropout > 0.0:
        raise ValueError(
            "LoRA dropout is unsupported inside the sequence shard; pass a "
            "LoraConfig with dropout=0.0 — silently disabling it would "
            "train a different recipe than the DP/TP steps"
        )
    from clip_lora_match_tpu.parallel.mesh import MODEL_AXIS

    if MODEL_AXIS in mesh.axis_names and mesh.shape[MODEL_AXIS] > 1:
        # dp×tp×sp: params must be placed with shard_clip_sp_tp and the TP
        # splits must divide heads/mlp — same contract as parallel/tp.py.
        from clip_lora_match_tpu.parallel.tp import check_tp_divisibility

        check_tp_divisibility(arch, mesh.shape[MODEL_AXIS])
    # with dropout enforced off, make_train_step's program is EXACTLY the
    # production step with the ring executor injected into both towers
    return make_train_step(
        params, arch, lora_cfg, train_cfg, tx, eot_id=eot_id,
        compute_dtype=compute_dtype, remat=remat, unroll=1,
        transformer_fn=make_sp_transformer(mesh),
    )
