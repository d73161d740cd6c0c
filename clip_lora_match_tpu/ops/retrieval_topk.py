"""Pallas fused retrieval kernel: L2-normalize + blocked query×index matmul +
streaming top-k.

This is the BASELINE.json north-star component (≥100k queries/sec): the
reference's ``sims = q @ E.T; torch.topk`` (ref:src/embedding/search.py:96-99)
materializes the full (Q, N) score matrix; at HBM-scale N that matrix is pure
bandwidth waste. This kernel streams the index through VMEM in (BLOCK_N, D)
tiles (auto double-buffered by the Pallas pipeline), keeps a running (Q, k)
top-k in VMEM scratch, and never writes scores to HBM.

Algorithm per (q_block, n_block) grid step, n innermost:
1. normalize the query tile (cheap VPU work, amortized vs the matmul);
2. scores = q @ tile.T on the MXU with fp32 accumulation;
3. mask out-of-range padded rows to -inf;
4. per-tile top-k by k max-extraction passes (k ≪ BLOCK_N, so extraction
   cost is negligible vs the matmul);
5. merge with the running top-k: concat to (Q, 2k) candidates, k more
   extraction passes.

Outputs (Q, k) scores + global int32 indices, sorted descending. Validated
bit-exactly against the jnp argsort oracle in tests (interpret mode on CPU,
compiled on TPU).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(np.finfo(np.float32).min)


def _extract_topk(scores: jnp.ndarray, idx: jnp.ndarray, k: int):
    """k max-extraction passes over (Q, M) → ((Q, k), (Q, k)) sorted desc."""
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    out_s, out_i = [], []
    for _ in range(k):
        m = jnp.max(scores, axis=1, keepdims=True)  # (Q, 1)
        am = jnp.argmax(scores, axis=1)  # (Q,)
        hit = col == am[:, None]  # exactly-one-hot per row
        # gather-free index select: masked sum (Mosaic has no 2D gather)
        sel = jnp.sum(jnp.where(hit, idx, 0), axis=1, keepdims=True)
        out_s.append(m)
        out_i.append(sel)
        scores = jnp.where(hit, NEG_INF, scores)
    return jnp.concatenate(out_s, axis=1), jnp.concatenate(out_i, axis=1)


def _kernel(q_ref, idx_ref, out_s_ref, out_i_ref, run_s, run_i, *, k, block_n, n_total):
    nb = pl.program_id(1)
    num_nb = pl.num_programs(1)

    @pl.when(nb == 0)
    def _():
        run_s[:] = jnp.full_like(run_s, NEG_INF)
        run_i[:] = jnp.zeros_like(run_i)

    # 1. normalize query tile in fp32
    q = q_ref[:].astype(jnp.float32)
    q = q * jax.lax.rsqrt(jnp.sum(q * q, axis=1, keepdims=True) + 1e-12)

    # 2. blocked matmul: (Qb, D) @ (D, BLOCK_N)
    tile = idx_ref[:].astype(jnp.float32)
    scores = jax.lax.dot_general(
        q,
        tile,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Qb, BLOCK_N)

    # 3. mask padded rows beyond the true index size
    base = nb * block_n
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    gcol = col + base
    scores = jnp.where(gcol < n_total, scores, NEG_INF)

    # 4. per-tile top-k
    tile_s, tile_i = _extract_topk(scores, gcol, k)

    # 5. merge with running top-k
    cand_s = jnp.concatenate([run_s[:], tile_s], axis=1)  # (Qb, 2k)
    cand_i = jnp.concatenate([run_i[:], tile_i], axis=1)
    new_s, new_i = _extract_topk(cand_s, cand_i, k)
    run_s[:] = new_s
    run_i[:] = new_i

    @pl.when(nb == num_nb - 1)
    def _():
        out_s_ref[:] = run_s[:]
        out_i_ref[:] = run_i[:]


@functools.partial(
    jax.jit, static_argnames=("k", "block_q", "block_n", "interpret")
)
def topk_retrieve(
    queries: jnp.ndarray,
    index: jnp.ndarray,
    k: int = 5,
    block_q: int = 128,
    block_n: int = 1024,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused top-k cosine retrieval.

    Block defaults: one same-process sweep showed block_q=256 at 649k qps vs
    365k for 128 (Q=256, N=40960), but repeat A/Bs through the relay spread
    128 across 390k-1.5M (incl. physically impossible values) and could not
    reproduce the gap, so the long-measured 128 stays; block_n=4096 exceeds
    scoped VMEM.

    Negative result (r3, committed in docs/DESIGN.md §7.5): a grouped
    per-tile selection variant (tile-max over 16-row sublane groups inside
    the kernel, row resolution via masked column-sums into scratch) cut the
    extraction op count ~6-20x on paper but measured 76-435k qps vs this
    kernel's 294k-6.1M — the 160 serial single-sublane stores it needs
    (Mosaic has no 2D gather and rejects both 3D leading-axis reduces and
    offset-carrying sublane concats) serialize the VPU. Removed.

    queries: (Q, D) — normalized IN-KERNEL (callers may pass raw embeddings).
    index:   (N, D) fp32 or bf16 — assumed L2-normalized (EmbeddingIndex
             guarantees this); bf16 storage halves the HBM stream, scores
             still accumulate in fp32 (measured 6.1M qps at N=8,192 bf16 —
             the realistic service index scale).
    Returns (scores (Q, k) fp32 desc-sorted, indices (Q, k) int32).
    """
    Q, D = queries.shape
    N = index.shape[0]
    k = min(k, N)
    bq = min(block_q, max(8, Q))
    bn = min(block_n, N)

    # pad Q to a multiple of bq; padded queries produce garbage rows sliced off
    q_pad = -(-Q // bq) * bq
    if q_pad != Q:
        queries = jnp.pad(queries, ((0, q_pad - Q), (0, 0)), constant_values=1.0)
    # pad N to a multiple of bn; padded rows masked to -inf in-kernel
    n_pad = -(-N // bn) * bn
    if n_pad != N:
        index = jnp.pad(index, ((0, n_pad - N), (0, 0)))

    grid = (q_pad // bq, n_pad // bn)
    kernel = functools.partial(_kernel, k=k, block_n=bn, n_total=N)
    out_s, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bq, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bq, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((q_pad, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, k), jnp.float32),
            pltpu.VMEM((bq, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * q_pad * n_pad * D,
            bytes_accessed=q_pad * D * 4 + n_pad * D * 4 + 2 * q_pad * k * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(queries, index)
    return out_s[:Q], out_i[:Q]


def topk_retrieve_reference(
    queries: jnp.ndarray, index: jnp.ndarray, k: int = 5
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """jnp oracle with identical contract (for tests and CPU fallback)."""
    q = queries.astype(jnp.float32)
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    sims = jnp.dot(q, index.astype(jnp.float32).T)
    k = min(k, index.shape[0])
    s, i = jax.lax.top_k(sims, k)
    return s, i.astype(jnp.int32)


# ---------------------------------------------------------------------------
# HBM-scale exact two-pass retrieval
# ---------------------------------------------------------------------------
#
# At N ≥ ~10^6 the streaming Pallas kernel above becomes VPU-bound: its
# per-tile k-extraction passes cost O(k·Q·N) vector ops against the matmul's
# O(Q·N·D) MXU FLOPs, capping it near 20 TF/s. The two-pass scheme below
# keeps XLA's matmul at peak (~195 TF/s measured, reduction fused into the
# dot so the (Q, N) scores never hit HBM) and pays only O(Q·N/T) for
# selection:
#
#   pass 1  scores = q @ index.T, fused per-tile max over T-row tiles
#           → (Q, N/T) tile maxes, no score materialization;
#   pass 2  top-k TILES by max. Exactness: if row r is a true top-k element
#           then max(tile(r)) ≥ score(r) ≥ kth value, and at most k tiles
#           can have max ≥ kth value, so the k highest-max tiles contain
#           every true top-k row;
#   pass 3  gather the selected k tiles per query (k·T rows), rescore, exact
#           top-k over the (Q, k·T) candidates.


# hierarchical pass-2 defaults. The r4 threshold (2^17 tile columns) was
# calibrated against the UNFUSED form; the r5 fused kernel (supertile max as
# a second pass-1 output, no in-kernel transpose) moved the crossover DOWN:
# measured at Q=1024 bf16 (scripts/exp_topk_hier_1m.py + the 131k/262k/524k
# sweep, 2-3 trials each): flat wins ≤ N=524k (nt_main≈32.6k; hier's fixed
# supertile-transpose/gather costs dominate), fused-hier wins from N=1M
# (nt_main≈62.5k: 9.4-10.0 vs 10.1-12.6 ms) through 4M (+28%) and 8M (+28%).
# Threshold sits just under the N=1M main width.
HIER_GROUP = 16
HIER_MIN_TILES = 61_440
# The q8 path's hier gate fires much earlier than bf16's: its only flat
# alternative is the XLA dequantize-dot (no non-hier Pallas pass 1), which
# the fused int8 hier kernel overtakes well below the bf16 crossover.
# Measured full-path on v5e (Q=2048, same-process interleaved, 2 trials):
# N=131k flat 252k vs hier 244k qps (tie), N=262k hier 208k vs 157k,
# N=393k hier 218k vs 130k, N=500k hier 178k vs 114k, N=983k hier 139k vs
# 60k. 16_384 tiles = 262,144 rows at tile=16.
Q8_HIER_MIN_TILES = 16_384


def topk_retrieve_twopass(
    queries: jnp.ndarray,
    index: jnp.ndarray,
    k: int = 10,
    tile: int = 16,
    pad_value: float = 0.0,
    n_valid=None,
    max_pad: Optional[int] = None,
    pallas_pass1: Optional[bool] = None,
    interpret: bool = False,
    group: Optional[int] = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact fused top-k for HBM-scale indexes (same contract as
    ``topk_retrieve``; validated against the oracle in tests).

    queries: (Q, D) raw — normalized here. index: (N, D) fp32/bf16, assumed
    L2-normalized. ``n_valid``: optional row count ≤ N (python int or traced
    scalar) — rows at/past it are PADDING and never appear in results.
    ``max_pad``: static upper bound on N - n_valid; required when n_valid is
    traced (the sharded path passes it), inferred otherwise.

    Padding correctness without breaking fusion: pass 1's tile-max reduce is
    fused into the dot and must stay mask-free (a dynamic mask between them
    materializes the Q×N scores — measured 11.9→18.9 ms at N=1M). Zero pad
    rows score 0, so only tiles overlapping the pad region (≤
    ceil(max_pad/tile)+1 of them, pads are contiguous at the end) can be
    OVER-ranked in pass 2. Selecting that many extra tiles guarantees the
    true top-k tiles are still included; pass 3 masks pad candidates on the
    tiny (Q, k_sel·tile) tensor where fusion doesn't matter.

    ``group``: hierarchical pass-2 width (Pallas path only). At HBM scale the
    tile-max array itself is wide enough that ``approx_max_k`` over it
    dominates (measured 22 ms over 500k columns at Q=1024, N=8M — 9× its
    2.4 ms read floor). With ``group=g`` pass 2 first max-reduces g adjacent
    tile-maxes into one supertile max (bandwidth-bound), approx_max_k's the
    g×-smaller supertile array, then resolves tiles inside the selected
    supertiles with tiny gathers. Exactness is the pass-2 argument one level
    up: at most k valid rows score ≥ the kth value, so at most k supertiles
    (+ the same contiguous-pad slack, which only shrinks at coarser
    granularity) can have max ≥ it — the top-k_sel supertiles therefore
    contain every tile whose max ≥ the kth value, and of the gathered
    k_sel·g tiles at most k_sel qualify, so the top-k_sel of them by
    tile-max is a superset of the qualifying set. ``None`` = auto (16 when
    the main tile-max array has ≥ HIER_MIN_TILES columns), ``0``/``1`` =
    disable, explicit g = force (must divide 128 so it divides the kernel's
    128-aligned main width).

    Returns (scores (Q, k) fp32, indices (Q, k) int32), sorted descending.
    """
    N = index.shape[0]
    k = min(k, N)
    nt = -(-N // tile)

    if n_valid is None:
        pad_bound = 0
        nv = None
    elif isinstance(n_valid, (int, np.integer)):
        pad_bound = N - int(n_valid)
        nv = int(n_valid)
    else:
        if max_pad is None:
            raise ValueError("traced n_valid requires a static max_pad bound")
        pad_bound = int(max_pad)
        nv = n_valid
    # total contiguous zero region at the end = shape padding (to a tile
    # multiple) + caller-declared invalid rows; tiles overlapping it can be
    # over-ranked in pass 2 and need selection slack
    shape_pad = nt * tile - N
    total_pad = shape_pad + pad_bound
    extra = (-(-total_pad // tile) + 1) if total_pad > 0 else 0
    k_sel = k + extra

    if nt < k_sel:
        # fewer tiles than the selection needs: the plain oracle is already
        # fast and exact at this size (N < k_sel·tile)
        s, i = topk_retrieve_reference(queries, index, k)
        if nv is not None:
            s = jnp.where(i < nv, s, NEG_INF)
            order = jnp.argsort(-s, axis=1)
            s = jnp.take_along_axis(s, order, axis=1)
            i = jnp.take_along_axis(i, order, axis=1)
        return s, i
    if pallas_pass1 is None:
        # the Pallas pass 1 needs lane-aligned D, a tile that splits the
        # fp32 sublane granularity, and a VMEM-sized index block (bn=128·tile
        # doubles with tile); otherwise keep the XLA fused form
        pallas_pass1 = (
            jax.default_backend() == "tpu"
            and queries.shape[1] % 128 == 0
            and tile % 8 == 0
            and tile <= 16
        )
    if group is None:
        # main part width the Pallas pass 1 will produce (bn-aligned prefix)
        bn = 128 * tile
        nt_main = ((N // bn) * bn) // tile
        group = (
            HIER_GROUP
            if pallas_pass1 and nt_main >= HIER_MIN_TILES
            else 0
        )
    elif group > 1 and 128 % group != 0:
        raise ValueError(f"group={group} must divide 128")
    return _topk_twopass_impl(
        queries, index,
        jnp.asarray(N if nv is None else nv, jnp.int32),
        k=k, k_sel=k_sel, tile=tile, pad_value=pad_value,
        pallas_pass1=bool(pallas_pass1), interpret=interpret,
        group=int(group),
    )


def _tilemax_kernel(q_ref, idx_ref, out_ref, *, tile):
    """One (q_block, n_block) step of pass 1: scores TRANSPOSED so the
    16-row tile grouping splits the SUBLANE dim (Mosaic supports that
    reshape; splitting lanes is not implemented), maxima transposed back in
    VMEM. Every tile the grid touches holds tile-padded index rows; pad
    over-ranking is absorbed by the caller's slack accounting."""
    scores_t = jax.lax.dot_general(
        idx_ref[...], q_ref[...],
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BN, BQ)
    bn, bq = scores_t.shape
    m = jnp.max(scores_t.reshape(bn // tile, tile, bq), axis=1)  # (ntb, BQ)
    out_ref[...] = m.T


_TILEMAX_VMEM = 12 * 1024 * 1024


def _tilemax_sup_kernel(q_ref, idx_ref, out_ref, sup_ref, *, tile, group):
    """Pass-1 step emitting BOTH tile maxima and group-of-``group`` supertile
    maxima, TRANSPOSED (tiles on sublanes, queries on lanes).

    Two wins over _tilemax_kernel + a separate XLA supertile reduce (r5,
    VERDICT r4 next-step #6):
    - no per-step VMEM transpose: the (ntb, bq) maxima store directly in the
      transposed output layout, removing the VPU transpose that serialized
      against the next MXU dot (pass 1 measured 74% of peak at N=8M);
    - the supertile reduce runs on the (ntb, bq) maxima already in VMEM —
      the (Q, nt) tile-max array (4 GB at Q=2048, N=8M) is never re-read
      from HBM.
    Both reshapes split the SUBLANE dim (Mosaic-supported; lane splits are
    not — CLAUDE.md Mosaic notes)."""
    scores_t = jax.lax.dot_general(
        idx_ref[...], q_ref[...],
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BN, BQ)
    bn, bq = scores_t.shape
    m = jnp.max(scores_t.reshape(bn // tile, tile, bq), axis=1)  # (ntb, BQ)
    out_ref[...] = m
    sup_ref[...] = jnp.max(m.reshape(m.shape[0] // group, group, bq), axis=1)


def _tilemax_sup_pallas(
    qc: jnp.ndarray, index: jnp.ndarray, tile: int, group: int, interpret: bool,
    bn_tiles: int = 128, block_q: Optional[int] = None,
):
    """Fused pass 1 + supertile reduce; outputs TRANSPOSED.

    Returns (main_t (n_main/tile, Q-padded), sup_t (n_main/tile/group,
    Q-padded), tail (Q, t_tiles) | None, qp). Caller invariants as
    _tilemax_pallas, plus ntb/group must be 8-divisible (group ≤ 16 with the
    128-wide ntb) — enforced by the dispatch condition in the caller.

    ``bn_tiles``/``block_q``: geometry sweep knobs (scripts/exp_topk_8m
    sweeps); defaults are the production operating point. bn_tiles must keep
    ntb 128-divisible (main_t's minor is the lane dim of the store)."""
    from clip_lora_match_tpu.ops.geometry import assert_blocks_ok

    Q, D = qc.shape
    N = index.shape[0]
    bn = bn_tiles * tile
    ntb = bn // tile
    nsb = ntb // group
    if block_q is not None:
        qp = -(-Q // block_q) * block_q
        bq = block_q
    elif Q <= 512:
        qp = -(-Q // 8) * 8
        bq = qp
    else:
        qp = -(-Q // 512) * 512
        bq = 512
    it = index.dtype.itemsize
    while bq > 8:
        need = (
            2 * bn * D * it + bq * D * it + bn * bq * 4
            + 2 * ntb * bq * 4 + 2 * nsb * bq * 4
        )
        half = bq // 2
        if need <= _TILEMAX_VMEM or bq <= 64 or half % 8 or qp % half:
            break
        bq = half
    if qp != Q:
        qc = jnp.pad(qc, ((0, qp - Q), (0, 0)))
    n_main = (N // bn) * bn
    nt_main = n_main // tile

    main_t = sup_t = None
    if n_main > 0:
        blocks = [
            ("q", (bq, D), (qp, D)),
            ("idx", (bn, D), (n_main, D)),
            ("main_t", (ntb, bq), (nt_main, qp)),
            ("sup_t", (nsb, bq), (nt_main // group, qp)),
        ]
        assert_blocks_ok(blocks, "tilemax_sup")
        main_t, sup_t = pl.pallas_call(
            functools.partial(_tilemax_sup_kernel, tile=tile, group=group),
            grid=(n_main // bn, qp // bq),
            in_specs=[
                pl.BlockSpec((bq, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bn, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((ntb, bq), lambda i, j: (i, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((nsb, bq), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nt_main, qp), jnp.float32),
                jax.ShapeDtypeStruct((nt_main // group, qp), jnp.float32),
            ],
            interpret=interpret,
        )(qc, index)
    tail_max = None
    if n_main < N:
        tail = index[n_main:].reshape(-1, tile, D)
        tail_max = jax.lax.dot_general(
            qc[:Q], tail, (((1,), (2,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).max(axis=2)
    return main_t, sup_t, tail_max


def _tilemax_pallas(
    qc: jnp.ndarray, index: jnp.ndarray, tile: int, interpret: bool
) -> jnp.ndarray:
    """Pass-1 tile maxima as a Pallas kernel: (Q, D)×(N, D) → (Q, ceil(N/tile)).

    The XLA fused dot+max form runs ~50-65% MFU at N=1M (the tile-minor
    output shape caps its emitter); this kernel runs the dot at full
    (bq × bn) tiles — measured 183 TFLOP/s ≈ 93% MFU on v5e, pass 1 drops
    8-10 ms → 5.7 ms at Q=1024, N=1M bf16. The index block is outer-grid so
    Pallas keeps it resident across query blocks (no re-fetch).

    The grid covers only the bn-aligned prefix of the index — NO padding
    copy of the (possibly GB-scale) index array; the ragged tail (< bn
    rows) goes through the XLA fused form and is returned SEPARATELY
    (concatenating it onto the (Q, nt) main part costs 3-6 ms of extra
    HBM copies at N=1M — measured 10.5 vs 3.9-7.7 ms total). ``index``
    must already be padded to a ``tile`` multiple (caller invariant) so the
    tail reshape is exact.

    Returns (main (Q, n_main/tile), tail (Q, t_tiles) | None).
    """
    Q, D = qc.shape
    N = index.shape[0]
    bn = 128 * tile  # output block's minor dim must be 128-divisible
    ntb = bn // tile
    if Q <= 512:
        qp = -(-Q // 8) * 8
        bq = qp
    else:
        qp = -(-Q // 512) * 512
        bq = 512
    # shrink bq until the working set (double-buffered index block + query
    # block + fp32 score/out transients) fits VMEM; candidates must stay
    # multiples of 8 (sublane granularity of the out block) that divide qp
    it = index.dtype.itemsize
    while bq > 8:
        need = 2 * bn * D * it + bq * D * it + bn * bq * 4 + 2 * bq * ntb * 4
        half = bq // 2
        if need <= _TILEMAX_VMEM or bq <= 64 or half % 8 or qp % half:
            break
        bq = half
    if qp != Q:
        qc = jnp.pad(qc, ((0, qp - Q), (0, 0)))
    n_main = (N // bn) * bn

    main = None
    if n_main > 0:
        from clip_lora_match_tpu.ops.geometry import assert_blocks_ok

        assert_blocks_ok(
            [
                ("q", (bq, D), (qp, D)),
                ("idx", (bn, D), (n_main, D)),
                ("out", (bq, bn // tile), (qp, n_main // tile)),
            ],
            "tilemax",
        )
        out = pl.pallas_call(
            functools.partial(_tilemax_kernel, tile=tile),
            grid=(n_main // bn, qp // bq),
            in_specs=[
                pl.BlockSpec((bq, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bn, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (bq, ntb), lambda i, j: (j, i), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((qp, n_main // tile), jnp.float32),
            interpret=interpret,
        )(qc, index)
        main = out[:Q]
    tail_max = None
    if n_main < N:  # ragged tail, < bn rows: XLA fused dot+max
        tail = index[n_main:].reshape(-1, tile, D)
        ts = jax.lax.dot_general(
            qc[:Q], tail, (((1,), (2,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).max(axis=2)
        tail_max = ts
    return main, tail_max


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "k_sel", "tile", "pad_value", "pallas_pass1", "interpret", "group"
    ),
)
def _topk_twopass_impl(
    queries: jnp.ndarray,
    index: jnp.ndarray,
    n_valid: jnp.ndarray,
    k: int,
    k_sel: int,
    tile: int,
    pad_value: float,
    pallas_pass1: bool = False,
    interpret: bool = False,
    group: int = 0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    Q, D = queries.shape
    N = index.shape[0]

    q = queries.astype(jnp.float32)
    q = q * jax.lax.rsqrt(jnp.sum(q * q, axis=1, keepdims=True) + 1e-12)
    qc = q.astype(index.dtype)

    nt = -(-N // tile)
    n_pad = nt * tile
    if n_pad != N:
        index = jnp.pad(index, ((0, n_pad - N), (0, 0)), constant_values=pad_value)
    idx3 = index.reshape(nt, tile, D)

    if pallas_pass1:
        # hierarchical mode runs the FUSED kernel (tile max + supertile max
        # in one pass, outputs transposed — see _tilemax_sup_kernel); plain
        # mode keeps the original kernel. Fused-kernel preconditions: the
        # 128-tile block must split into 8-divisible supertile rows
        # (group ≤ 16) and the supertile array must be wide enough for the
        # selector.
        bn_ = 128 * tile
        nt_main_pre = (N // bn_) * bn_ // tile
        km_pre = min(k_sel, nt_main_pre)
        hier = (
            group > 1
            and nt_main_pre > 0
            and 128 % group == 0
            and (128 // group) % 8 == 0
            and nt_main_pre % group == 0
            and nt_main_pre // group >= km_pre
        )
        # pass 2 without ever concatenating tail onto the (Q, nt) main part
        # (that concat re-copies 256 MB at N=1M — measured 3-6 ms): select
        # candidate tiles from each part, merge on the tiny (Q, ~k_sel+128)
        # candidate tensors, take the global top-k_sel there.
        parts_v, parts_i = [], []
        if hier:
            main_t, sup_t, tail = _tilemax_sup_pallas(
                qc, index, tile, group, interpret
            )
            nt_main = main_t.shape[0]
            km = min(k_sel, nt_main)
            # selector over the group×-smaller supertile array (transposed
            # back — at Q=2048/N=8M that is a 256 MB copy vs the 4 GB
            # tile-max array the unfused form re-read)
            sup = sup_t.T[:Q]
            _, sup_ids = jax.lax.approx_max_k(sup, km, recall_target=1.0)
            tids = (
                sup_ids.astype(jnp.int32)[:, :, None] * group
                + jnp.arange(group, dtype=jnp.int32)
            ).reshape(Q, km * group)
            # in-group resolution directly on the TRANSPOSED maxima:
            # out[j, q] = main_t[tids.T[j, q], q] — only km·group values per
            # query move; the (nt_main, Q) array itself is never transposed
            # (the [:, :Q] slice is a no-op at the production operating
            # points where Q is already 8/512-aligned)
            tvals = jnp.take_along_axis(main_t[:, :Q], tids.T, axis=0).T
            mv, pos = jax.lax.top_k(tvals, km)
            mi = jnp.take_along_axis(tids, pos, axis=1)
            parts_v.append(mv)
            parts_i.append(mi)
            base_tiles = nt_main
        else:
            main, tail = _tilemax_pallas(qc, index, tile, interpret)
            base_tiles = 0
            if main is not None:
                nt_main = base_tiles = main.shape[1]
                km = min(k_sel, nt_main)
                mv, mi = jax.lax.approx_max_k(main, km, recall_target=1.0)
                parts_v.append(mv)
                parts_i.append(mi.astype(jnp.int32))
        if tail is not None:
            base = base_tiles
            t_ids = base + jax.lax.broadcasted_iota(
                jnp.int32, (Q, tail.shape[1]), 1
            )
            parts_v.append(tail)
            parts_i.append(t_ids)
        cand_v = parts_v[0] if len(parts_v) == 1 else jnp.concatenate(parts_v, axis=1)
        cand_i = parts_i[0] if len(parts_i) == 1 else jnp.concatenate(parts_i, axis=1)
        _, pos = jax.lax.top_k(cand_v, min(k_sel, cand_v.shape[1]))
        tile_ids = jnp.take_along_axis(cand_i, pos, axis=1)
    else:
        # pass 1: 3D dot producing (Q, nt, tile) DIRECTLY — no reshape and NO
        # mask between the dot and the reduce (either would break XLA's output
        # fusion and materialize the full Q×N score tensor in HBM)
        scores = jax.lax.dot_general(
            qc, idx3, (((1,), (2,)), ((), ())), preferred_element_type=jnp.float32
        )  # (Q, nt, tile), consumed by the fused max below
        tile_max = scores.max(axis=2)

        # pass 2: k_sel highest-max tiles per query (k plus enough slack that
        # pad-inflated tiles cannot evict a true top-k tile; see caller
        # docstring)
        _, tile_ids = jax.lax.approx_max_k(tile_max, k_sel, recall_target=1.0)
        tile_ids = tile_ids.astype(jnp.int32)
    # clamp keeps the pass-3 gather in-bounds unconditionally (masked -inf
    # columns can only be selected when there are fewer than k_sel real ones)
    tile_ids = jnp.minimum(tile_ids, nt - 1)

    # pass 3: gather selected tiles, rescore, mask pad rows, exact top-k
    rows = idx3[tile_ids]  # (Q, k_sel, tile, D)
    cand = jnp.einsum(
        "qd,qktd->qkt", qc, rows, preferred_element_type=jnp.float32
    ).reshape(Q, k_sel * tile)
    flat_ids = (tile_ids[:, :, None] * tile + jnp.arange(tile, dtype=jnp.int32)
                ).reshape(Q, k_sel * tile)
    cand = jnp.where(flat_ids < n_valid, cand, NEG_INF)
    s, pos = jax.lax.top_k(cand, k)
    return s, jnp.take_along_axis(flat_ids, pos, axis=1)


# ---------------------------------------------------------------------------
# Int8-quantized HBM-scale retrieval (r5)
# ---------------------------------------------------------------------------
#
# At the 8M-row operating point the two-pass path is MXU-bound at Q=2048
# (17.2 TFLOP/pass vs a 10 ms HBM read) and HBM-bound at small Q. An int8
# index attacks both walls at once: the v5e MXU runs int8×int8→int32 at 2×
# the bf16 rate (394 vs 197 TOP/s) and the index stream halves to 1 byte per
# element (an 8M×512 index drops 8 GB → 4 GB, doubling the max single-chip
# index to 16M rows).
#
# Quantization scheme: symmetric per-ROW scales on both sides —
# ``s[n] = max|x[n,:]| / 127``, ``xq = round(x/s)``; queries are normalized
# in fp32 first, then quantized the same way. Scores are
# ``(qq · xq) · s_q · s_n``. Ranking over the QUANTIZED scores is EXACT end
# to end: the int32 dot is exact, and because every int8×int8 product is
# ≤ 127² and D ≤ 2¹⁰ keeps partial sums under 2²⁴, the pass-3 fp32 rescore
# of dequantized rows reproduces the pass-1 integers bit-exactly — the
# two-pass containment argument (see topk_retrieve_twopass) carries over
# unchanged. The only approximation is quantization of the index/query
# values themselves (recall vs the fp32 oracle is measured in
# tests/test_ops_retrieval.py and reported in docs/DESIGN.md §7.5).
#
# The reference has no quantized retrieval (fp32 torch.topk throughout,
# ref:src/embedding/search.py:96-99); this is a TPU-serving addition.

# Cap on the pass-1 tile-maxima transient (see _topk_q8_impl); 4 GiB keeps
# the 16M-row × Q=2048 point inside one v5e's 15.75 GiB HBM next to the
# 7.6 GiB int8 index.
_Q8_MAXIMA_BYTES = 4 << 30
_Q8_MIN_CHUNK = 512


def quantize_index_int8(
    index: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(N, D) float index → (values int8 (N, D), scales fp32 (N, 1)).

    Symmetric per-row: preserves cosine ranking structure of L2-normalized
    rows (each row's scale divides out of nothing — it multiplies that row's
    score only, which is exactly how the quantized scorer applies it)."""
    x = jnp.asarray(index, jnp.float32)
    amax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
    s = jnp.maximum(amax, 1e-12) / 127.0
    vq = jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)
    return vq, s


def _quantize_queries(queries: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Normalize (cosine contract) then int8-quantize per query row."""
    q = queries.astype(jnp.float32)
    q = q * jax.lax.rsqrt(jnp.sum(q * q, axis=1, keepdims=True) + 1e-12)
    amax = jnp.max(jnp.abs(q), axis=1, keepdims=True)
    s_q = jnp.maximum(amax, 1e-12) / 127.0
    qq = jnp.clip(jnp.round(q / s_q), -127, 127).astype(jnp.int8)
    return qq, s_q


def _tilemax_sup_q8_kernel(
    q_ref, idx_ref, sc_ref, out_ref, sup_ref, *, tile, group, mxu
):
    """Int8 variant of _tilemax_sup_kernel: int8×int8→int32 dot on the MXU
    (or an exact bf16 fallback — int8 values are exact in bf16 and partial
    sums stay < 2²⁴, so both forms produce identical integers), dequantized
    by the per-row index scale before the tile/supertile max reduces.

    The per-QUERY scale is deliberately NOT applied here: it multiplies whole
    lanes (columns) uniformly and positively, so every per-query ordering
    pass 2 runs on the maxima is invariant to it; pass 3 applies it to the
    final candidate scores.

    Scales arrive as a (1, bn) ROW block and are transposed to (bn, 1) in
    VMEM (measured supported on v5e). Handing Mosaic the natural (N, 1)
    column instead makes its operand constraint tile-pad every row to 128
    lanes — an N×512-byte relayout temp (7.6 GiB at N=16M) that both OOMed
    the 16M capability point and burned ~4 GB of HBM write traffic per call
    at 8M. The row form pads only 8 sublanes (32 bytes/row)."""
    if mxu == "int8":
        yi = jax.lax.dot_general(
            idx_ref[...], q_ref[...],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        scores_t = yi.astype(jnp.float32)
    else:  # exact bf16 form (see docstring)
        scores_t = jax.lax.dot_general(
            idx_ref[...].astype(jnp.bfloat16),
            q_ref[...].astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    scores_t = scores_t * sc_ref[...].T  # (BN, BQ) * (1, BN)ᵀ
    bn, bq = scores_t.shape
    m = jnp.max(scores_t.reshape(bn // tile, tile, bq), axis=1)
    out_ref[...] = m
    sup_ref[...] = jnp.max(m.reshape(m.shape[0] // group, group, bq), axis=1)


def _tilemax_sup_q8_pallas(
    qq: jnp.ndarray, vq: jnp.ndarray, sc: jnp.ndarray,
    tile: int, group: int, interpret: bool, mxu: str,
    bn_tiles: int = 128, block_q: Optional[int] = None,
):
    """Fused q8 pass 1 + supertile reduce; same contract/layout as
    _tilemax_sup_pallas (outputs transposed), int8 operands."""
    from clip_lora_match_tpu.ops.geometry import assert_blocks_ok

    Q, D = qq.shape
    N = vq.shape[0]
    bn = bn_tiles * tile
    ntb = bn // tile
    nsb = ntb // group
    if block_q is not None:
        qp = -(-Q // block_q) * block_q
        bq = block_q
    elif Q <= 512:
        qp = -(-Q // 8) * 8
        bq = qp
    else:
        qp = -(-Q // 512) * 512
        bq = 512
    while bq > 8:
        # int8 blocks stream at 1 B/elem; the int32+fp32 score transients
        # (4 B each) dominate the VMEM working set
        need = (
            2 * bn * D + bq * D + 2 * bn * bq * 4
            + 2 * ntb * bq * 4 + 2 * nsb * bq * 4
        )
        half = bq // 2
        if need <= _TILEMAX_VMEM or bq <= 64 or half % 8 or qp % half:
            break
        bq = half
    if qp != Q:
        qq = jnp.pad(qq, ((0, qp - Q), (0, 0)))
    n_main = (N // bn) * bn
    nt_main = n_main // tile

    main_t = sup_t = None
    if n_main > 0:
        # (1, n_main) row layout: see the kernel docstring's relayout note
        sc_row = sc[:n_main, 0][None, :]
        blocks = [
            ("q", (bq, D), (qp, D)),
            ("idx", (bn, D), (n_main, D)),
            ("scale", (1, bn), (1, n_main)),
            ("main_t", (ntb, bq), (nt_main, qp)),
            ("sup_t", (nsb, bq), (nt_main // group, qp)),
        ]
        assert_blocks_ok(blocks, "tilemax_sup_q8")
        main_t, sup_t = pl.pallas_call(
            functools.partial(
                _tilemax_sup_q8_kernel, tile=tile, group=group, mxu=mxu
            ),
            grid=(n_main // bn, qp // bq),
            in_specs=[
                pl.BlockSpec((bq, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bn, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bn), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((ntb, bq), lambda i, j: (i, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((nsb, bq), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nt_main, qp), jnp.float32),
                jax.ShapeDtypeStruct((nt_main // group, qp), jnp.float32),
            ],
            interpret=interpret,
            # full arrays, grid covers only the bn-aligned prefix — slicing
            # here would copy the (possibly GB-scale) index (see
            # _tilemax_pallas's no-padding-copy note)
        )(qq, vq, sc_row)
    tail_max = None
    if n_main < N:
        tail = vq[n_main:].astype(jnp.float32).reshape(-1, tile, D)
        ts = jax.lax.dot_general(
            qq[:Q].astype(jnp.float32), tail, (((1,), (2,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Q, t_tiles, tile)
        ts = ts * sc[n_main:].reshape(1, -1, tile)
        tail_max = ts.max(axis=2)
    return main_t, sup_t, tail_max


def topk_retrieve_q8(
    queries: jnp.ndarray,
    values: jnp.ndarray,
    scales: jnp.ndarray,
    k: int = 10,
    tile: int = 16,
    n_valid=None,
    max_pad: Optional[int] = None,
    pallas_pass1: Optional[bool] = None,
    interpret: bool = False,
    group: Optional[int] = None,
    mxu: str = "int8",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Two-pass top-k over an int8-quantized index (see module comment).

    queries: (Q, D) raw float — normalized then int8-quantized here.
    values/scales: from ``quantize_index_int8`` (values (N, D) int8, scales
    (N, 1) fp32). ``mxu``: 'int8' (2× MXU rate) or 'bf16' (identical
    integers, half rate — the measured fallback if Mosaic rejects the int8
    dot on some geometry). Other args as ``topk_retrieve_twopass``.

    Selection is EXACT over the quantized scores; returned scores are the
    quantized cosine approximations (|err| ≲ 2·D·s_q·s_n/2 per dot — in
    practice ≤ ~1e-2 absolute on normalized embeddings). Requires D ≤ 1024
    (127²·D < 2²⁴ keeps every fp32 rescore bit-exact vs the int8 pass 1);
    wider embeddings must use the fp32/bf16 paths.
    """
    if mxu not in ("int8", "bf16"):
        raise ValueError(f"bad mxu mode {mxu!r}")
    # Exactness premise: every int8×int8 partial sum must be exactly
    # representable in fp32 so the XLA fp32 forms (tail dot, pass 3, tiny-N
    # oracle) agree bit-for-bit with the int8 MXU pass 1. 127²·D < 2²⁴
    # requires D ≤ 1040; beyond that a true top-k row can be rounded out
    # near ties, silently voiding the documented "selection EXACT" contract.
    if queries.shape[1] > 1024:
        raise ValueError(
            f"topk_retrieve_q8 requires D <= 1024 (got D={queries.shape[1]}): "
            "int8 dot sums exceed 2^24 and the fp32 rescore is no longer "
            "bit-exact vs pass 1. Use topk_retrieve/topk_retrieve_twopass."
        )
    N = values.shape[0]
    k = min(k, N)
    nt = -(-N // tile)

    if n_valid is None:
        pad_bound = 0
        nv = None
    elif isinstance(n_valid, (int, np.integer)):
        pad_bound = N - int(n_valid)
        nv = int(n_valid)
    else:
        if max_pad is None:
            raise ValueError("traced n_valid requires a static max_pad bound")
        pad_bound = int(max_pad)
        nv = n_valid
    shape_pad = nt * tile - N
    total_pad = shape_pad + pad_bound
    extra = (-(-total_pad // tile) + 1) if total_pad > 0 else 0
    k_sel = k + extra

    if nt < k_sel:
        # tiny index: exact dequantized oracle (scores identical to the
        # quantized scorer — fp32 dot of int-valued floats is exact)
        qq, s_q = _quantize_queries(queries)
        # scale order (dot · s_n) · s_q matches pass 3 bit-for-bit (fp32
        # multiply is not associative; a different order can flip ties)
        sims = (
            jnp.dot(qq.astype(jnp.float32), values.astype(jnp.float32).T)
            * scales[:, 0][None, :] * s_q
        )
        if nv is not None:
            col = jax.lax.broadcasted_iota(jnp.int32, sims.shape, 1)
            sims = jnp.where(col < nv, sims, NEG_INF)
        s, i = jax.lax.top_k(sims, k)
        return s, i.astype(jnp.int32)
    if pallas_pass1 is None:
        pallas_pass1 = (
            jax.default_backend() == "tpu"
            and queries.shape[1] % 128 == 0
            and tile % 8 == 0
            and tile <= 16
        )
    if group is None:
        bn = 128 * tile
        nt_main = ((N // bn) * bn) // tile
        group = HIER_GROUP if pallas_pass1 and nt_main >= Q8_HIER_MIN_TILES else 0
    elif group > 1 and 128 % group != 0:
        raise ValueError(f"group={group} must divide 128")
    return _topk_q8_impl(
        queries, values, scales,
        jnp.asarray(N if nv is None else nv, jnp.int32),
        k=k, k_sel=k_sel, tile=tile,
        pallas_pass1=bool(pallas_pass1), interpret=interpret,
        group=int(group), mxu=mxu,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "k_sel", "tile", "pallas_pass1", "interpret", "group", "mxu"
    ),
)
def _topk_q8_impl(
    queries: jnp.ndarray,
    values: jnp.ndarray,
    scales: jnp.ndarray,
    n_valid: jnp.ndarray,
    k: int,
    k_sel: int,
    tile: int,
    pallas_pass1: bool,
    interpret: bool,
    group: int,
    mxu: str,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    Q, D = queries.shape
    N = values.shape[0]
    qq, s_q = _quantize_queries(queries)

    nt = -(-N // tile)
    n_pad = nt * tile
    if n_pad != N:
        # zero values + zero scales: pad rows score exactly 0, same slack
        # accounting as the fp32 path's pad_value=0
        values = jnp.pad(values, ((0, n_pad - N), (0, 0)))
        scales = jnp.pad(scales, ((0, n_pad - N), (0, 0)))
    vq3 = values.reshape(nt, tile, D)
    sc3 = scales.reshape(nt, tile)

    hier = False
    if pallas_pass1:
        bn_ = 128 * tile
        nt_main_pre = (N // bn_) * bn_ // tile
        km_pre = min(k_sel, nt_main_pre)
        hier = (
            group > 1
            and nt_main_pre > 0
            and 128 % group == 0
            and (128 // group) % 8 == 0
            and nt_main_pre % group == 0
            and nt_main_pre // group >= km_pre
        )
    if hier:
        bn_ = 128 * tile
        nt_main = (N // bn_) * bn_ // tile
        km = min(k_sel, nt_main)

        def _pass12(qq_c):
            """Passes 1+2 for one query block → candidate tile ids."""
            Qc = qq_c.shape[0]
            main_t, sup_t, tail = _tilemax_sup_q8_pallas(
                qq_c, values, scales, tile, group, interpret, mxu
            )
            sup = sup_t.T[:Qc]
            _, sup_ids = jax.lax.approx_max_k(sup, km, recall_target=1.0)
            tids = (
                sup_ids.astype(jnp.int32)[:, :, None] * group
                + jnp.arange(group, dtype=jnp.int32)
            ).reshape(Qc, km * group)
            tvals = jnp.take_along_axis(main_t[:, :Qc], tids.T, axis=0).T
            mv, pos = jax.lax.top_k(tvals, km)
            mi = jnp.take_along_axis(tids, pos, axis=1)
            parts_v, parts_i = [mv], [mi]
            if tail is not None:
                t_ids = nt_main + jax.lax.broadcasted_iota(
                    jnp.int32, (Qc, tail.shape[1]), 1
                )
                parts_v.append(tail)
                parts_i.append(t_ids)
            cand_v = (parts_v[0] if len(parts_v) == 1
                      else jnp.concatenate(parts_v, axis=1))
            cand_i = (parts_i[0] if len(parts_i) == 1
                      else jnp.concatenate(parts_i, axis=1))
            _, pos = jax.lax.top_k(cand_v, min(k_sel, cand_v.shape[1]))
            return jnp.take_along_axis(cand_i, pos, axis=1)

        # Pass 1 materializes an (nt_main, Q) fp32 maxima array; at HBM
        # scale with large Q it rivals the index itself (16M rows × Q=2048
        # → 8 GiB, which cannot coexist with the 7.6 GiB index). Chunk the
        # queries so the transient stays under _Q8_MAXIMA_BYTES; each chunk
        # re-streams the index, so this only engages when forced.
        if 4 * nt_main * Q <= _Q8_MAXIMA_BYTES or Q <= _Q8_MIN_CHUNK:
            tile_ids = _pass12(qq)
        else:
            cq = max(
                _Q8_MIN_CHUNK,
                (_Q8_MAXIMA_BYTES // (4 * nt_main))
                // _Q8_MIN_CHUNK * _Q8_MIN_CHUNK,
            )
            nc = -(-Q // cq)
            qq_p = jnp.pad(qq, ((0, nc * cq - Q), (0, 0)))
            ids = jax.lax.map(_pass12, qq_p.reshape(nc, cq, qq.shape[1]))
            tile_ids = ids.reshape(nc * cq, -1)[:Q]
    else:
        # XLA fused form: fp32 dot of int-valued floats — exact (D ≤ 1024
        # keeps every sum < 2²⁴; int8 values are exact even through the
        # MXU's default bf16 operand rounding). Fastest flat form measured
        # on v5e (pass 1 only, N=131k/Q=2048): fp32 662k qps vs 398k
        # (native s8×s8→s32) and 371k (bf16 cast) — scripts/
        # exp_q8_flat_dot.py. The fp32 index transient is bounded by the
        # hier gate at Q8_HIER_MIN_TILES (≤512 MB at D=512); above it
        # pass 1 streams int8 and never dequantizes.
        scores = jax.lax.dot_general(
            qq.astype(jnp.float32), vq3.astype(jnp.float32),
            (((1,), (2,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Q, nt, tile)
        tile_max = (scores * sc3[None]).max(axis=2)
        _, tile_ids = jax.lax.approx_max_k(tile_max, k_sel, recall_target=1.0)
        tile_ids = tile_ids.astype(jnp.int32)
    tile_ids = jnp.minimum(tile_ids, nt - 1)

    # pass 3: gather, rescore (bit-identical to pass 1 — int-valued fp32
    # dot), apply BOTH scales, mask pads, exact top-k
    rows = vq3[tile_ids].astype(jnp.float32)  # (Q, k_sel, tile, D)
    row_sc = sc3[tile_ids]  # (Q, k_sel, tile)
    cand = jnp.einsum(
        "qd,qktd->qkt", qq.astype(jnp.float32), rows,
        preferred_element_type=jnp.float32,
    )
    cand = (cand * row_sc).reshape(Q, k_sel * tile) * s_q
    flat_ids = (tile_ids[:, :, None] * tile + jnp.arange(tile, dtype=jnp.int32)
                ).reshape(Q, k_sel * tile)
    cand = jnp.where(flat_ids < n_valid, cand, NEG_INF)
    s, pos = jax.lax.top_k(cand, k)
    return s, jnp.take_along_axis(flat_ids, pos, axis=1)


# N above which the two-pass path beats the streaming kernel. Re-measured on
# v5e with the Pallas tile-max pass 1 (Q=256, D=512, k=10): streaming wins at
# 40,960 (466k vs 278k qps), two-pass from 65,536 up (400k vs 288k; 4.6x by
# 524k rows).
TWOPASS_MIN_N = 65_536


@functools.partial(jax.jit, static_argnames=("k",))
def topk_retrieve_midscale(
    queries: jnp.ndarray, index: jnp.ndarray, k: int = 5
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact XLA path for the mid-scale band: one dot (query cast to the
    index dtype, fp32 accumulation) + ``approx_max_k(recall_target=1.0)`` —
    the fastest EXACT selector XLA offers (333 µs vs lax.top_k's 422 µs on
    (256, 40960); DESIGN §7.5). In the band between the streaming kernel's
    VMEM sweet spot and the two-pass crossover, materializing the (Q, N)
    scores and letting this selector run beats the in-kernel streaming
    extraction (measured: 546k vs 398-510k qps at N=40,960 bf16).
    Same contract as topk_retrieve: queries raw, index L2-normalized.

    Precision note: on a bf16 index the normalized query is cast to bf16
    before the dot (same rounding the two-pass path applies at HBM scale),
    while the streaming kernel keeps fp32 queries — selection is exact over
    the computed scores in all three regimes, but candidates separated by
    less than bf16 query-rounding error can rank differently across the
    MIDSCALE_MIN_N boundary."""
    q = queries.astype(jnp.float32)
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    sims = jax.lax.dot_general(
        q.astype(index.dtype), index, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    k = min(k, index.shape[0])
    s, i = jax.lax.approx_max_k(sims, k, recall_target=1.0)
    return s, i.astype(jnp.int32)


# Measured crossover (v5e, Q=256, D=512, k=10, docs/DESIGN.md §7.5): below
# this the streaming kernel's VMEM-resident scan wins (6.1M qps at 8,192;
# at 16-24k the two paths are within relay noise of each other); from here
# to TWOPASS_MIN_N the XLA dot+approx_max_k exact path wins consistently
# (546k vs 398-510k qps at 40,960 in the r3 median-of-5 table, 1.03-1.14x
# at 32-49k in the third-wave re-measurement).
MIDSCALE_MIN_N = 32_768


def topk_retrieve_auto(
    queries: jnp.ndarray, index: jnp.ndarray, k: int = 5, **kw
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Size-based dispatch, all paths EXACT: streaming Pallas kernel at VMEM
    scale, XLA dot+approx_max_k in the mid band (bf16 indexes only — at f32
    the r3 table has the two within noise: 516k vs 510k qps at 40,960, so
    the kernel keeps the band), two-pass at HBM scale."""
    n = index.shape[0]
    if n >= TWOPASS_MIN_N:
        return topk_retrieve_twopass(queries, index, k)
    if n >= MIDSCALE_MIN_N and index.dtype == jnp.bfloat16:
        return topk_retrieve_midscale(queries, index, k)
    return topk_retrieve(queries, index, k, **kw)
