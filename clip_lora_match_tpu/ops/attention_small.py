"""Pallas small-sequence attention: whole-sequence blocks, native layout.

CLIP's towers run attention at S=50/77 — far below flash-attention's useful
block sizes. Profiling the image tower at B=128 on v5e attributes
~0.45 ms/layer to XLA's attention core vs ~0.1 ms of fundamental cost: XLA
physically transposes (B,S,H,hd)→(B,H,S,hd) for the batched dots (4 × ~10 MB
relayouts per layer) and runs the fp32 softmax as separate HBM passes over
the (B,H,S,S) scores. This kernel removes both:

- operates DIRECTLY on the (B, S, H, hd) projection layout (no transposes);
- the full sequence fits one block, so scores/softmax/weighted-sum live
  entirely in VMEM — the only HBM traffic is streaming q, k, v in and the
  context out;
- grid over batch slabs; static python loop over heads inside the kernel
  (per-head (S,hd) slices feed padded 64×64-class MXU dots).

Differentiable via custom_vjp: backward recomputes with the plain jnp
attention (the training path's gradients match XLA's exactly).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from clip_lora_match_tpu.ops.geometry import plan_attention_small

NEG_INF = float(np.finfo(np.float32).min)


def _kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, heads, head_dim, scale, s_valid):
    """Refs are (bb, S, H·hd) — heads packed into the lane dimension; per-head
    work slices 64-aligned lane windows (Mosaic-friendly: no 4D reshapes).

    Softmax is the "fast" max-free form (measured ~25% kernel win on v5e —
    the row-max cross-lane reduce and the (S,S) divide were two of the three
    VPU passes): ``e = exp(min(s, 80))`` with the normalization applied AFTER
    the probs·V dot, on the (S, hd) output instead of the (S, S) scores.
    Mathematically identical to softmax whenever row logits lie in
    (-87, 80) — exp(80)≈5.5e34 stays finite in fp32/bf16 and the clip only
    engages where softmax is one-hot beyond bf16 resolution anyway
    (CLIP-B/32 attention logits are empirically O(10))."""
    S = q_ref.shape[1]
    kcol = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
    key_pad = jnp.where(kcol < s_valid, 0.0, NEG_INF)[None]  # (1, 1, S)
    for h in range(heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        qh = q_ref[:, :, sl]  # (bb, S, hd)
        kh = k_ref[:, :, sl]
        vh = v_ref[:, :, sl]
        scores = jax.lax.dot_general(
            qh, kh,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (bb, S, S)
        scores = scores * scale + key_pad
        if mask_ref is not None:
            scores = scores + mask_ref[:, 0]
        e = jnp.exp(jnp.minimum(scores, 80.0))
        oh = jax.lax.dot_general(
            e.astype(vh.dtype), vh,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        # max(., tiny): a fully-masked row (every logit ≤ -87) yields a ZERO
        # context vector instead of NaN (the jnp path gives near-uniform
        # attention there; no real query row is ever fully masked — causal
        # rows keep their diagonal — but don't let padding rows poison
        # downstream reductions)
        oh = oh / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
        o_ref[:, :, sl] = oh.astype(o_ref.dtype)


def _kernel_inkmask(
    q_ref, k_ref, v_ref, len_ref, o_ref, *, heads, head_dim, scale, s_valid,
    causal,
):
    """Mask computed IN-KERNEL from iota (r4, the S=77 text-tower path).

    The text tower's mask is structurally causal + per-row key lengths; the
    generic path streams it as a per-batch (bb, 1, S, S) fp32 block — at
    S=77/B=96 that is 2.3 MB of VMEM + HBM traffic per slab for information
    a (bb,) length vector carries. Here the additive penalty is rebuilt from
    ``broadcasted_iota`` against ``len_ref`` (a tiny (bb, 128) i32 block) —
    zero mask bandwidth. Softmax is the same max-free form as _kernel."""
    S = q_ref.shape[1]
    kcol = jax.lax.broadcasted_iota(jnp.int32, (1, S, S), 2)
    if len_ref is not None:
        lens = len_ref[:, :, :1]  # (bb, 1, 1) from the (bb, 1, 128) block
        key_ok = kcol < lens
    else:
        key_ok = kcol < s_valid
    if causal:
        qrow = jax.lax.broadcasted_iota(jnp.int32, (1, S, S), 1)
        key_ok = jnp.logical_and(key_ok, kcol <= qrow)
    pen = jnp.where(key_ok, 0.0, NEG_INF)
    for h in range(heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        qh = q_ref[:, :, sl]
        kh = k_ref[:, :, sl]
        vh = v_ref[:, :, sl]
        scores = jax.lax.dot_general(
            qh, kh,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        scores = scores * scale + pen
        e = jnp.exp(jnp.minimum(scores, 80.0))
        oh = jax.lax.dot_general(
            e.astype(vh.dtype), vh,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        oh = oh / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
        o_ref[:, :, sl] = oh.astype(o_ref.dtype)


def _kernel_packed(q_ref, k_ref, v_ref, o_ref, *, heads, head_dim, scale, s_valid):
    """Head-PAIR packed variant: two adjacent heads per MXU dot.

    The per-head (S, hd)·(hd, S) dots at CLIP-vision geometry (S→64, hd=64)
    use a quarter of the 128×128 MXU tile — the measured ceiling of the r2
    kernel (~25% tile utilization, ROUND_NOTES r2). Packing head pairs:

    - q/k/v pair slices are FREE: adjacent heads are contiguous 128-wide
      lane windows of the (bb, S, H·hd) layout;
    - keys/values expand to BLOCK-DIAGONAL (2S, 128) operands
      ([[k_h, 0], [0, k_h+1]] — zeros via lane masks, rows via sublane
      concat), so one (S,128)·(128,2S) dot yields both heads' scores side
      by side and one (S,2S)·(2S,128) dot both heads' contexts;
    - K and N dims hit the full 128 tile: 2 heads per MXU pass instead of 1
      (2x the naive FLOPs, half the passes — the zeros ride for free).

    Requires: no attention mask (the image tower's case — text S=77 is
    XLA's anyway), even head count, S padded to a 64 multiple so the
    denominator lane windows stay 64-aligned (Mosaic miscompiles unaligned
    lane windows). Softmax is the same max-free form as _kernel."""
    S = q_ref.shape[1]
    lane2s = jax.lax.broadcasted_iota(jnp.int32, (1, S, 2 * S), 2)
    col_in_win = jnp.where(lane2s < S, lane2s, lane2s - S)
    key_pad = jnp.where(col_in_win < s_valid, 0.0, NEG_INF)
    for h in range(0, heads, 2):
        sl = slice(h * head_dim, (h + 2) * head_dim)  # 128-wide window
        q2 = q_ref[:, :, sl]
        k2 = k_ref[:, :, sl]
        v2 = v_ref[:, :, sl]
        lane = jax.lax.broadcasted_iota(jnp.int32, k2.shape, 2)
        left = lane < head_dim
        k_blk = jnp.concatenate(
            [jnp.where(left, k2, 0.0), jnp.where(left, 0.0, k2)], axis=1
        )  # (bb, 2S, 128) block-diagonal
        scores = jax.lax.dot_general(
            q2, k_blk,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (bb, S, 2S) = [scores_h | scores_h+1]
        scores = scores * scale + key_pad
        e = jnp.exp(jnp.minimum(scores, 80.0))
        v_blk = jnp.concatenate(
            [jnp.where(left, v2, 0.0), jnp.where(left, 0.0, v2)], axis=1
        )
        o2 = jax.lax.dot_general(
            e.astype(v_blk.dtype), v_blk,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (bb, S, 128) = [ctx_h | ctx_h+1]
        d1 = jnp.sum(e[:, :, :S], axis=2, keepdims=True)
        d2 = jnp.sum(e[:, :, S:], axis=2, keepdims=True)
        lane_o = jax.lax.broadcasted_iota(jnp.int32, o2.shape, 2)
        denom = jnp.where(lane_o < head_dim, d1, d2)
        o2 = o2 / jnp.maximum(denom, 1e-30)
        o_ref[:, :, sl] = o2.astype(o_ref.dtype)


def _attention_small_impl(
    q, k, v, mask, scale: float, block_b: int, interpret: bool,
    causal: bool = False, lengths=None,
):
    B, S, H, hd = q.shape
    inkmask = causal or lengths is not None
    if inkmask and mask is not None:
        raise ValueError(
            "attention_small: pass EITHER an additive mask OR the structural "
            "causal/lengths mode, not both"
        )
    # head-pair packed kernel (see _kernel_packed): maskless, even heads,
    # hd=64, and S padded to 64 so the packed score windows stay lane-aligned
    packed = mask is None and not inkmask and H % 2 == 0 and hd == 64
    # batch-invariant masks (e.g. the causal (1,1,S,S)) stream as ONE shared
    # block instead of per-batch-slab copies — no VMEM penalty
    shared_mask = mask is not None and mask.shape[0] == 1
    # all block/pad geometry lives in the pure, Mosaic-rule-asserting planner
    # (ops/geometry.py) so an illegal geometry raises on EVERY backend — the
    # r4 TPU-only compile crash class (VERDICT r4 weak #1/#2)
    plan = plan_attention_small(
        B, S, H, hd, q.dtype.itemsize, block_b,
        packed=packed, inkmask=inkmask,
        mask="none" if mask is None else ("shared" if shared_mask else "per_batch"),
    )
    bb, sp, bp = plan.bb, plan.sp, plan.bp

    def prep(x):
        # (B, S, H, hd) → (B, S, H·hd): a pure minor-dims reshape (free), so
        # per-head work becomes 64-aligned lane slices inside the kernel
        x = x.reshape(B, S, H * hd)
        pads = [(0, bp - B), (0, sp - S), (0, 0)]
        if any(p[1] for p in pads):
            x = jnp.pad(x, pads)
        return x

    if interpret:
        # test-mode guard for the max-free softmax's logit<80 assumption
        # (see _kernel docstring): interpret mode runs in every kernel test,
        # so a workload whose logits approach the clip fails loudly there
        # instead of silently flattening attention on device
        full_mask = _struct_mask(mask, causal, lengths, S)
        smax = jnp.max(
            jnp.einsum(
                "bqhd,bkhd->bhqk", q * scale, k,
                preferred_element_type=jnp.float32,
            )
            + (full_mask.astype(jnp.float32) if full_mask is not None else 0.0)
        )

        def _check_bound(m):
            if np.isfinite(m) and m >= 80.0:
                raise FloatingPointError(
                    f"attention_small: max logit {m:.1f} >= 80 violates the "
                    "max-free softmax bound; use exact attention "
                    "(set_kernel_flags(small_attention=False)) for these "
                    "weights"
                )

        jax.debug.callback(_check_bound, smax)

    qp, kp, vp = prep(q), prep(k), prep(v)

    in_specs = [
        pl.BlockSpec((bb, sp, H * hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bb, sp, H * hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bb, sp, H * hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    args = [qp, kp, vp]
    if inkmask:
        if lengths is None:
            # causal-only: every key column up to s_valid is live
            lengths = jnp.full((B,), S, jnp.int32)
        # 3-D (B, 1, 128) so the block's LAST TWO dims (1, 128) always equal
        # the array dims — Mosaic-legal for any bb (the 2-D (bb, 128) form
        # needed bb % 8 == 0 and crashed at fp32 S=77 where bb=9; r4 bench)
        lens = jnp.broadcast_to(
            lengths.astype(jnp.int32)[:, None, None], (B, 1, 128)
        )
        lens = jnp.pad(lens, [(0, bp - B), (0, 0), (0, 0)])
        in_specs.append(
            pl.BlockSpec((bb, 1, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        )
        args.append(lens)
    if mask is not None:
        nb = 1 if shared_mask else B
        mb = jnp.broadcast_to(mask, (nb, 1, S, S)).astype(jnp.float32)
        mb = jnp.pad(
            mb, [(0, (1 if shared_mask else bp) - nb), (0, 0),
                 (0, sp - S), (0, sp - S)]
        )
        if shared_mask:
            in_specs.append(
                pl.BlockSpec(
                    (1, 1, sp, sp), lambda i: (0, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            )
        else:
            in_specs.append(
                pl.BlockSpec(
                    (bb, 1, sp, sp), lambda i: (i, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            )
        args.append(mb)

    if packed:
        kernel = functools.partial(
            _kernel_packed, heads=H, head_dim=hd, scale=scale, s_valid=S,
        )
    elif inkmask:
        kernel = functools.partial(
            _kernel_inkmask, heads=H, head_dim=hd, scale=scale, s_valid=S,
            causal=causal,
        )
    else:
        kernel = functools.partial(
            _kernel if mask is not None else _kernel_nomask_adapter,
            heads=H, head_dim=hd, scale=scale, s_valid=S,
        )
    out = pl.pallas_call(
        kernel,
        grid=(bp // bb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (bb, sp, H * hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bp, sp, H * hd), q.dtype),
        interpret=interpret,
    )(*args)
    return out[:B, :S].reshape(B, S, H, hd)


def _kernel_nomask_adapter(q_ref, k_ref, v_ref, o_ref, *, heads, head_dim, scale, s_valid):
    _kernel(q_ref, k_ref, v_ref, None, o_ref, heads=heads, head_dim=head_dim,
            scale=scale, s_valid=s_valid)


def _struct_mask(mask, causal: bool, lengths, S: int):
    """Additive (B|1, 1, S, S) mask equivalent to the in-kernel structural
    mode — shared by the bwd reference and the interpret-mode logit check."""
    out = mask
    if causal:
        c = jnp.triu(jnp.full((S, S), NEG_INF, jnp.float32), k=1)[None, None]
        out = c if out is None else out + c
    if lengths is not None:
        kcol = jnp.arange(S)[None, None, None, :]
        pad = jnp.where(kcol < lengths[:, None, None, None], 0.0, NEG_INF)
        out = pad if out is None else out + pad
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _attention_small(q, k, v, mask, lengths, scale, block_b, interpret, causal):
    return _attention_small_impl(
        q, k, v, mask, scale, block_b, interpret, causal=causal,
        lengths=lengths,
    )


def _reference(q, k, v, mask, scale):
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q * scale, k, preferred_element_type=jnp.float32
    )
    if mask is not None:
        scores = scores + mask.astype(scores.dtype)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum(
        "bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32
    ).astype(q.dtype)


def _fwd(q, k, v, mask, lengths, scale, block_b, interpret, causal):
    out = _attention_small_impl(
        q, k, v, mask, scale, block_b, interpret, causal=causal,
        lengths=lengths,
    )
    return out, (q, k, v, mask, lengths)


def _bwd(scale, block_b, interpret, causal, res, g):
    q, k, v, mask, lengths = res
    full = _struct_mask(mask, causal, lengths, q.shape[1])
    _, vjp = jax.vjp(lambda q, k, v: _reference(q, k, v, full, scale), q, k, v)
    dq, dk, dv = vjp(g.astype(q.dtype))
    return dq, dk, dv, None, None


_attention_small.defvjp(_fwd, _bwd)


@functools.partial(
    jax.jit, static_argnames=("scale", "block_b", "interpret", "causal")
)
def attention_small(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    block_b: int = 16,
    interpret: bool = False,
    causal: bool = False,
    lengths: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """q, k, v: (B, S, H, hd) — the projection layout, untransposed.
    mask: optional additive bias broadcastable to (B, 1, S, S).
    ``causal`` / ``lengths`` (B,): STRUCTURAL mask mode — the causal +
    per-row-key-length penalty is rebuilt in-kernel from iota instead of
    streaming a (B, 1, S, S) fp32 mask (the text tower's case: at S=77/B=96
    that saves ~2.3 MB VMEM + HBM per slab). Mutually exclusive with
    ``mask``.
    Returns (B, S, H, hd) context, differentiable. Softmax is the max-free
    fast form (see _kernel): identical to exact softmax for row logits in
    (-87, 80); fully-masked rows return zeros rather than NaN.
    Intended for S ≤ ~128 where the whole sequence fits one VMEM block."""
    if scale is None:
        scale = float(q.shape[-1]) ** -0.5
    return _attention_small(
        q, k, v, mask, lengths, float(scale), block_b, interpret, causal
    )


def attention_small_reference(q, k, v, mask=None, scale=None):
    if scale is None:
        scale = float(q.shape[-1]) ** -0.5
    return _reference(q, k, v, mask, scale)
