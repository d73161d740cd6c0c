"""Hardware-independent Mosaic block-geometry guards (VERDICT r4 weak #2).

Every Pallas kernel that computes block sizes dynamically routes its geometry
through a pure planner in ops/geometry.py, which asserts Mosaic's lowering
rule (second-minor block dim % 8, minor % 128, or equal to the array dims) at
trace time on every backend. These tests sweep the planners across
dtype × batch × seq so the r4 class of TPU-only compile crashes — fp32 S=77
produced a (9, 128) lengths block that only failed on the real chip —
reproduces as a CPU test failure instead.
"""

import numpy as np
import pytest

from clip_lora_match_tpu.ops.geometry import (
    VMEM_BUDGET,
    assert_blocks_ok,
    mosaic_block_error,
    plan_attention_small,
    plan_lora_matmul,
    plan_mlp_fused,
)


def test_mosaic_block_error_basics():
    # equal-to-array dims are always legal
    assert mosaic_block_error((9, 128), (9, 128)) is None
    assert mosaic_block_error((3, 77), (3, 77)) is None
    # divisible dims are legal even when smaller than the array
    assert mosaic_block_error((8, 128), (99, 256)) is None
    assert mosaic_block_error((16, 256, 512), (64, 256, 512)) is None
    # non-8-divisible second-minor strictly smaller than the array dim: illegal
    assert mosaic_block_error((9, 128), (99, 128)) is not None
    # non-128-divisible minor strictly smaller than the array dim: illegal
    assert mosaic_block_error((8, 100), (99, 1000)) is not None
    # leading (non-tiled) dims are unconstrained
    assert mosaic_block_error((9, 1, 128), (99, 1, 128)) is None
    with pytest.raises(ValueError, match="lengths"):
        assert_blocks_ok([("lengths", (9, 128), (99, 128))], "attention_small")


def test_r4_crash_geometry_is_rejected():
    """The exact round-4 bench crash, reproduced CPU-side.

    fp32 text tower at S=77: sp=80, per-batch VMEM cost 1,438,720 bytes →
    bb = 13 MiB // per_b = 9. The old code handed Mosaic a 2-D (9, 128)
    lengths block over a (99, 128) array — illegal. The validator must
    reject it, and the new 3-D layout must be legal at the same bb.
    """
    sp, H, hd, itemsize = 80, 8, 64, 4
    per_b = 2 * 4 * sp * H * hd * itemsize + 3 * sp * sp * 4 + 2 * sp * sp * 4
    bb = VMEM_BUDGET // per_b
    assert bb == 9  # the pathological fp32-S=77 block size
    bp = -(-96 // bb) * bb
    assert mosaic_block_error((bb, 128), (bp, 128)) is not None  # old layout
    assert mosaic_block_error((bb, 1, 128), (bp, 1, 128)) is None  # fixed


@pytest.mark.parametrize("itemsize", [2, 4])
@pytest.mark.parametrize("S", [50, 64, 77, 99, 197, 257, 577])
@pytest.mark.parametrize(
    "B", [1, 2, 3, 7, 8, 9, 10, 16, 77, 96, 99, 128, 512]
)
def test_plan_attention_small_every_mode(itemsize, S, B):
    """plan_attention_small self-asserts; a raise here means a geometry that
    would crash Mosaic on TPU."""
    for H, hd in ((8, 64), (12, 64), (16, 80)):
        for mode in ("inkmask", "none", "shared", "per_batch"):
            plan = plan_attention_small(
                B, S, H, hd, itemsize, block_b=16,
                packed=False,
                inkmask=mode == "inkmask",
                mask="none" if mode == "inkmask" else mode,
            )
            assert plan.bp % plan.bb == 0 and plan.bp >= B
            assert plan.sp >= S
        if H % 2 == 0 and hd == 64:
            plan_attention_small(
                B, S, H, hd, itemsize, block_b=16,
                packed=True, inkmask=False, mask="none",
            )


@pytest.mark.parametrize(
    "M,N,K", [(1, 512, 512), (9, 512, 512), (100, 512, 512), (33, 3072, 768),
              (4800, 2304, 768), (77, 49408, 512)]
)
def test_plan_lora_matmul_sweep(M, N, K):
    plan = plan_lora_matmul(M, N, K, block_m=256, block_n=256, block_k=512)
    assert plan.Mp % plan.bm == 0
    assert plan.Np % plan.bn == 0
    assert plan.Kp % plan.bk == 0


def test_plan_rejects_illegal_caller_blocks():
    # a caller-supplied block_n that is neither 128-divisible nor the full N
    with pytest.raises(ValueError, match="minor"):
        plan_lora_matmul(1000, 1000, 1000, block_m=256, block_n=100, block_k=512)


@pytest.mark.parametrize("resident", [True, False])
@pytest.mark.parametrize(
    "M,K,H,N", [(1, 768, 3072, 768), (9, 512, 2048, 512),
                (4800, 768, 3072, 768), (96, 1024, 4096, 1024)]
)
def test_plan_mlp_fused_sweep(M, K, H, N, resident):
    plan = plan_mlp_fused(M, K, H, N, block_m=128, block_h=512, resident=resident)
    assert plan.Mp % plan.bm == 0
    if not resident:
        assert plan.Hp % plan.bh == 0


def test_attention_small_fp32_s77_inkmask_matches_oracle():
    """End-to-end regression at the exact r4 crash geometry (fp32, S=77,
    B=96, causal + lengths) through the fixed 3-D lengths layout."""
    import jax.numpy as jnp

    from clip_lora_match_tpu.ops.attention_small import (
        _struct_mask,
        attention_small,
        attention_small_reference,
    )

    rng = np.random.default_rng(7)
    B, S, H, hd = 96, 77, 8, 64
    q = jnp.asarray(rng.normal(size=(B, S, H, hd)).astype(np.float32)) * 0.3
    k = jnp.asarray(rng.normal(size=(B, S, H, hd)).astype(np.float32)) * 0.3
    v = jnp.asarray(rng.normal(size=(B, S, H, hd)).astype(np.float32))
    lengths = jnp.asarray(rng.integers(1, S + 1, size=(B,)), jnp.int32)
    mask = _struct_mask(None, True, lengths, S)
    ref = attention_small_reference(q, k, v, mask)
    got = attention_small(
        q, k, v, causal=True, lengths=lengths, interpret=True
    )
    valid = np.arange(S)[None, :, None, None] < np.asarray(lengths)[:, None, None, None]
    np.testing.assert_allclose(
        np.asarray(got) * valid, np.asarray(ref) * valid, atol=2e-5, rtol=1e-5
    )
