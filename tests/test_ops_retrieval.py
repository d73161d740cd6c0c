"""Pallas retrieval kernel vs the jnp oracle (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from clip_lora_match_tpu.ops.retrieval_topk import (
    topk_retrieve,
    topk_retrieve_reference,
)


def _norm_rows(x):
    return x / np.linalg.norm(x, axis=1, keepdims=True)


@pytest.mark.parametrize(
    "Q,N,D,k",
    [
        (8, 256, 128, 5),
        (1, 100, 128, 10),     # ragged N, Q=1 (padded in-kernel)
        (17, 1000, 128, 3),    # ragged Q and N
        (128, 4096, 512, 10),  # CLIP-sized
    ],
)
def test_kernel_matches_oracle(Q, N, D, k):
    rng = np.random.default_rng(Q * 1000 + N)
    q = rng.normal(size=(Q, D)).astype(np.float32) * 3.0  # unnormalized input
    idx = _norm_rows(rng.normal(size=(N, D)).astype(np.float32))
    s_ref, i_ref = topk_retrieve_reference(jnp.asarray(q), jnp.asarray(idx), k)
    s, i = topk_retrieve(
        jnp.asarray(q), jnp.asarray(idx), k, block_q=16, block_n=128,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), atol=1e-5)


def test_k_clamped_to_n():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(4, 64)).astype(np.float32)
    idx = _norm_rows(rng.normal(size=(7, 64)).astype(np.float32))
    s, i = topk_retrieve(jnp.asarray(q), jnp.asarray(idx), k=20, block_n=8,
                         interpret=True)
    assert s.shape == (4, 7) and i.shape == (4, 7)


def test_duplicate_scores_stable():
    """Exact ties: every returned index must point at a row achieving its
    score (tie order may differ from the oracle's)."""
    idx = np.eye(8, 64, dtype=np.float32)
    idx[4] = idx[0]  # duplicate row → tied scores
    q = idx[0:1].copy()
    s, i = topk_retrieve(jnp.asarray(q), jnp.asarray(idx), k=3, block_n=8,
                         interpret=True)
    s, i = np.asarray(s), np.asarray(i)
    assert s[0, 0] == pytest.approx(1.0, abs=1e-5)
    assert {0, 4} >= set(i[0, :2].tolist())


def test_scores_sorted_descending():
    rng = np.random.default_rng(3)
    q = rng.normal(size=(5, 128)).astype(np.float32)
    idx = _norm_rows(rng.normal(size=(300, 128)).astype(np.float32))
    s, _ = topk_retrieve(jnp.asarray(q), jnp.asarray(idx), k=7, block_n=64,
                         interpret=True)
    s = np.asarray(s)
    assert (np.diff(s, axis=1) <= 1e-6).all()


# -- exact two-pass HBM-scale path (r2) ---------------------------------------


@pytest.mark.parametrize("N,tile", [(1000, 32), (999, 32), (4097, 16), (20000, 64)])
def test_twopass_matches_oracle(N, tile):
    from clip_lora_match_tpu.ops.retrieval_topk import (
        topk_retrieve_reference,
        topk_retrieve_twopass,
    )

    rng = np.random.default_rng(N)
    idx = rng.normal(size=(N, 64)).astype(np.float32)
    idx /= np.linalg.norm(idx, axis=1, keepdims=True)
    qs = rng.normal(size=(9, 64)).astype(np.float32)
    s, i = topk_retrieve_twopass(jnp.asarray(qs), jnp.asarray(idx), 10, tile=tile)
    so, io = topk_retrieve_reference(jnp.asarray(qs), jnp.asarray(idx), 10)
    np.testing.assert_allclose(np.asarray(s), np.asarray(so), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(io))


@pytest.mark.parametrize(
    "Q,N,D,dtype,n_valid",
    [
        (9, 1000, 128, np.float32, None),     # tail-only (N < bn)
        (4, 4097, 128, np.float32, None),     # main + 1-tile tail
        (6, 2500, 128, np.float32, None),     # main + multi-tile tail merge
        (5, 2048, 128, np.float32, 2000),     # caller-declared invalid rows
        (3, 1500, 256, "bfloat16", None),     # bf16 storage path
    ],
)
def test_twopass_pallas_pass1_matches_oracle(Q, N, D, dtype, n_valid):
    """The Pallas tile-max pass 1 (transposed dot, sublane-split reduce,
    in-kernel pad-tile masking) must stay EXACT vs the oracle through all the
    padding regimes (query pad to 8, index pad to the 1-2k n-block)."""
    from clip_lora_match_tpu.ops.retrieval_topk import (
        topk_retrieve_reference,
        topk_retrieve_twopass,
    )

    rng = np.random.default_rng(N + Q)
    idx = rng.normal(size=(N, D)).astype(np.float32)
    idx /= np.linalg.norm(idx, axis=1, keepdims=True)
    qs = rng.normal(size=(Q, D)).astype(np.float32)
    store = jnp.asarray(idx, jnp.bfloat16) if dtype == "bfloat16" else jnp.asarray(idx)
    s, i = topk_retrieve_twopass(
        jnp.asarray(qs), store, 10, tile=16, n_valid=n_valid,
        pallas_pass1=True, interpret=True,
    )
    ref_idx = idx if n_valid is None else idx[:n_valid]
    so, io = topk_retrieve_reference(
        jnp.asarray(qs), jnp.asarray(ref_idx), 10
    )
    if dtype == "bfloat16":
        overlap = [
            len(set(np.asarray(i)[r]) & set(np.asarray(io)[r])) for r in range(Q)
        ]
        assert min(overlap) >= 8, overlap
    else:
        np.testing.assert_allclose(np.asarray(s), np.asarray(so), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(io))


def test_twopass_fuzz_exactness():
    """Randomized sweep over (N, Q, D, k, tile, n_valid) regimes — the slack
    accounting and tail merge must stay EXACT for every combination."""
    from clip_lora_match_tpu.ops.retrieval_topk import (
        topk_retrieve_reference,
        topk_retrieve_twopass,
    )

    rng = np.random.default_rng(123)
    for trial in range(10):
        N = int(rng.integers(300, 6000))
        Q = int(rng.integers(1, 20))
        D = int(rng.choice([128, 256]))
        k = int(rng.integers(1, 16))
        tile = int(rng.choice([8, 16]))
        use_nv = rng.random() < 0.4
        nv = int(rng.integers(max(1, N - 200), N)) if use_nv else None
        pallas = bool(rng.random() < 0.5)
        idx = rng.normal(size=(N, D)).astype(np.float32)
        idx /= np.linalg.norm(idx, axis=1, keepdims=True)
        qs = rng.normal(size=(Q, D)).astype(np.float32)
        s, i = topk_retrieve_twopass(
            jnp.asarray(qs), jnp.asarray(idx), k, tile=tile, n_valid=nv,
            pallas_pass1=pallas, interpret=True,
        )
        ref = idx if nv is None else idx[:nv]
        so, io = topk_retrieve_reference(jnp.asarray(qs), jnp.asarray(ref), k)
        cfg = dict(N=N, Q=Q, D=D, k=k, tile=tile, nv=nv, pallas=pallas)
        np.testing.assert_allclose(
            np.asarray(s), np.asarray(so), atol=1e-5, err_msg=str(cfg)
        )
        np.testing.assert_array_equal(np.asarray(i), np.asarray(io), str(cfg))


@pytest.mark.parametrize(
    "N,n_valid,group",
    [
        (8192, None, 16),     # bn-aligned, pure hierarchical main
        (8692, None, 16),     # main + 500-row tail merged with hier main
        (8192, 8000, 16),     # pad slack propagated to the supertile level
        (8192, None, 8),      # non-default group width
    ],
)
def test_twopass_hierarchical_pass2_exact(N, n_valid, group):
    """Forced hierarchical pass 2 (supertile max → approx_max_k → in-group
    tile resolution) must stay EXACT vs the oracle — incl. tail merge and
    caller-declared pad rows (the slack argument one level up)."""
    from clip_lora_match_tpu.ops.retrieval_topk import (
        topk_retrieve_reference,
        topk_retrieve_twopass,
    )

    rng = np.random.default_rng(N)
    idx = rng.normal(size=(N, 128)).astype(np.float32)
    idx /= np.linalg.norm(idx, axis=1, keepdims=True)
    qs = rng.normal(size=(7, 128)).astype(np.float32)
    s, i = topk_retrieve_twopass(
        jnp.asarray(qs), jnp.asarray(idx), 10, tile=16, n_valid=n_valid,
        pallas_pass1=True, interpret=True, group=group,
    )
    ref = idx if n_valid is None else idx[:n_valid]
    so, io = topk_retrieve_reference(jnp.asarray(qs), jnp.asarray(ref), 10)
    np.testing.assert_allclose(np.asarray(s), np.asarray(so), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(io))

    with pytest.raises(ValueError, match="divide 128"):
        topk_retrieve_twopass(
            jnp.asarray(qs), jnp.asarray(idx), 10, tile=16, group=9,
        )


def _q8_oracle(qs, vq, sc, k, n_valid=None):
    """Exact top-k over the QUANTIZED scores: the semantics topk_retrieve_q8
    must reproduce bit-for-bit. Query quantization reuses the impl's own
    fp32 quantizer (a float64 re-derivation here can differ by 1 ulp and
    flip a rounded int8); scoring + selection are independent numpy."""
    from clip_lora_match_tpu.ops.retrieval_topk import _quantize_queries

    qq_j, s_q_j = _quantize_queries(jnp.asarray(qs))
    qq = np.asarray(qq_j, np.int64)
    s_q = np.asarray(s_q_j)
    sims = (qq @ vq.astype(np.int64).T).astype(np.float32)
    sims = sims * sc[:, 0][None, :] * s_q
    if n_valid is not None:
        sims[:, n_valid:] = -np.inf
    k = min(k, sims.shape[1])
    ids = np.argsort(-sims, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(sims, ids, axis=1), ids.astype(np.int32)


def test_quantize_index_int8_roundtrip_bound():
    from clip_lora_match_tpu.ops.retrieval_topk import quantize_index_int8

    rng = np.random.default_rng(0)
    x = rng.normal(size=(64, 96)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    vq, sc = quantize_index_int8(jnp.asarray(x))
    assert vq.dtype == jnp.int8 and sc.shape == (64, 1)
    deq = np.asarray(vq, np.float32) * np.asarray(sc)
    # symmetric rounding error ≤ scale/2 per element
    assert np.max(np.abs(deq - x) / np.asarray(sc)) <= 0.5 + 1e-6


@pytest.mark.parametrize(
    "Q,N,D,n_valid,pallas,group,mxu",
    [
        (5, 120, 128, None, False, 0, "int8"),       # tiny-N oracle fallback
        (9, 1000, 128, None, True, 0, "int8"),       # tail-only (N < bn)
        (4, 4097, 128, None, True, 0, "int8"),       # main + 1-tile tail (XLA fallback: hier off)
        (5, 2048, 128, 2000, False, 0, "int8"),      # invalid rows, XLA form
        (7, 8192, 128, None, True, 16, "int8"),      # forced hierarchical main
        (7, 8692, 128, None, True, 16, "int8"),      # hier main + tail merge
        (7, 8192, 128, 8000, True, 16, "int8"),      # pad slack at supertile level
        (7, 8192, 128, None, True, 16, "bf16"),      # exact-bf16 MXU fallback
    ],
)
def test_q8_matches_quantized_oracle(Q, N, D, n_valid, pallas, group, mxu):
    """topk_retrieve_q8 selection must be EXACT over the quantized scores in
    every dispatch regime (tiny-N fallback, XLA fused form, forced
    hierarchical Pallas pass 1, both MXU modes)."""
    from clip_lora_match_tpu.ops.retrieval_topk import (
        quantize_index_int8,
        topk_retrieve_q8,
    )

    rng = np.random.default_rng(N + Q + D)
    idx = rng.normal(size=(N, D)).astype(np.float32)
    idx /= np.linalg.norm(idx, axis=1, keepdims=True)
    qs = rng.normal(size=(Q, D)).astype(np.float32)
    vq, sc = quantize_index_int8(jnp.asarray(idx))
    s, i = topk_retrieve_q8(
        jnp.asarray(qs), vq, sc, 10, tile=16, n_valid=n_valid,
        pallas_pass1=pallas, interpret=True,
        group=group if group else None if pallas else 0, mxu=mxu,
    )
    so, io = _q8_oracle(qs, np.asarray(vq), np.asarray(sc), 10, n_valid)
    np.testing.assert_allclose(np.asarray(s), so, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i), io)


def test_q8_query_chunked_pass12_matches_unchunked(monkeypatch):
    """When the pass-1 maxima transient would exceed the HBM budget, passes
    1+2 run query-chunked under lax.map (the 16M × Q=2048 capability point's
    path). Chunking must not change a single result: force a tiny budget so
    Q=1300 splits into 512-row chunks (with a ragged padded tail) and compare
    against the unchunked run."""
    from clip_lora_match_tpu.ops import retrieval_topk as rt

    rng = np.random.default_rng(41)
    idx = rng.normal(size=(8192, 128)).astype(np.float32)
    idx /= np.linalg.norm(idx, axis=1, keepdims=True)
    qs = rng.normal(size=(1300, 128)).astype(np.float32)
    vq, sc = rt.quantize_index_int8(jnp.asarray(idx))
    args = dict(k=10, tile=16, pallas_pass1=True, interpret=True, group=16)
    s0, i0 = rt.topk_retrieve_q8(jnp.asarray(qs), vq, sc, **args)
    monkeypatch.setattr(rt, "_Q8_MAXIMA_BYTES", 4 * 512 * 512)
    # distinct Q avoids the jit cache entry traced with the real budget
    s1, i1 = rt.topk_retrieve_q8(jnp.asarray(qs[:1299]), vq, sc, **args)
    np.testing.assert_array_equal(np.asarray(i0)[:1299], np.asarray(i1))
    np.testing.assert_allclose(np.asarray(s0)[:1299], np.asarray(s1), rtol=1e-6)


def test_q8_recall_vs_fp32_oracle():
    """Quantization is the ONLY approximation: measure top-10 overlap vs the
    fp32 exact oracle at embedding-realistic D=512 (documented in DESIGN
    §7.5; random normalized data is the WORST case — real embedding score
    gaps are wider)."""
    from clip_lora_match_tpu.ops.retrieval_topk import (
        quantize_index_int8,
        topk_retrieve_q8,
        topk_retrieve_reference,
    )

    rng = np.random.default_rng(7)
    idx = rng.normal(size=(4096, 512)).astype(np.float32)
    idx /= np.linalg.norm(idx, axis=1, keepdims=True)
    qs = rng.normal(size=(128, 512)).astype(np.float32)
    vq, sc = quantize_index_int8(jnp.asarray(idx))
    _, i = topk_retrieve_q8(
        jnp.asarray(qs), vq, sc, 10, pallas_pass1=False, interpret=True
    )
    _, io = topk_retrieve_reference(jnp.asarray(qs), jnp.asarray(idx), 10)
    i, io = np.asarray(i), np.asarray(io)
    overlap = [len(set(i[r]) & set(io[r])) for r in range(128)]
    # measured on this seed: mean 9.80, min 9, top-1 rate 0.945,
    # top1-in-top3 1.0 — assert with slack below the measured values
    assert np.mean(overlap) >= 9.5 and min(overlap) >= 8, overlap
    assert np.mean(i[:, 0] == io[:, 0]) >= 0.9
    assert all(io[r, 0] in set(i[r, :3]) for r in range(128))


def test_q8_fuzz_quantized_exactness():
    """Randomized regimes sweep for the q8 path's slack accounting."""
    from clip_lora_match_tpu.ops.retrieval_topk import (
        quantize_index_int8,
        topk_retrieve_q8,
    )

    rng = np.random.default_rng(99)
    for _ in range(8):
        N = int(rng.integers(300, 6000))
        Q = int(rng.integers(1, 16))
        D = int(rng.choice([128, 256]))
        k = int(rng.integers(1, 16))
        use_nv = rng.random() < 0.4
        nv = int(rng.integers(max(1, N - 200), N)) if use_nv else None
        pallas = bool(rng.random() < 0.5)
        idx = rng.normal(size=(N, D)).astype(np.float32)
        idx /= np.linalg.norm(idx, axis=1, keepdims=True)
        qs = rng.normal(size=(Q, D)).astype(np.float32)
        vq, sc = quantize_index_int8(jnp.asarray(idx))
        s, i = topk_retrieve_q8(
            jnp.asarray(qs), vq, sc, k, tile=16, n_valid=nv,
            pallas_pass1=pallas, interpret=True,
        )
        so, io = _q8_oracle(qs, np.asarray(vq), np.asarray(sc), k, nv)
        cfg = dict(N=N, Q=Q, D=D, k=k, nv=nv, pallas=pallas)
        np.testing.assert_allclose(
            np.asarray(s), so, rtol=1e-6, err_msg=str(cfg)
        )
        np.testing.assert_array_equal(np.asarray(i), io, str(cfg))


def test_twopass_k_clamp_and_bf16():
    from clip_lora_match_tpu.ops.retrieval_topk import (
        topk_retrieve_reference,
        topk_retrieve_twopass,
    )

    rng = np.random.default_rng(0)
    idx = rng.normal(size=(300, 32)).astype(np.float32)
    idx /= np.linalg.norm(idx, axis=1, keepdims=True)
    qs = rng.normal(size=(3, 32)).astype(np.float32)
    s, i = topk_retrieve_twopass(
        jnp.asarray(qs), jnp.asarray(idx, jnp.bfloat16), 5, tile=16
    )
    so, io = topk_retrieve_reference(jnp.asarray(qs), jnp.asarray(idx), 5)
    # bf16 storage: allow rank flips between near-equal scores
    overlap = [
        len(set(np.asarray(i)[r]) & set(np.asarray(io)[r])) for r in range(3)
    ]
    assert min(overlap) >= 4, overlap


def test_auto_dispatch_thresholds(monkeypatch):
    from clip_lora_match_tpu.ops import retrieval_topk as rt

    calls = []
    monkeypatch.setattr(
        rt, "topk_retrieve_twopass", lambda *a, **k: calls.append("two") or (None, None)
    )
    monkeypatch.setattr(
        rt, "topk_retrieve_midscale", lambda *a, **k: calls.append("mid") or (None, None)
    )
    monkeypatch.setattr(
        rt, "topk_retrieve", lambda *a, **k: calls.append("stream") or (None, None)
    )
    small = jnp.zeros((4, 8)), jnp.zeros((100, 8))
    mid_bf16 = jnp.zeros((4, 8)), jnp.zeros((rt.MIDSCALE_MIN_N, 8), jnp.bfloat16)
    mid_f32 = jnp.zeros((4, 8)), jnp.zeros((rt.MIDSCALE_MIN_N, 8))
    big = jnp.zeros((4, 8)), jnp.zeros((rt.TWOPASS_MIN_N, 8))
    rt.topk_retrieve_auto(*small, k=2)
    rt.topk_retrieve_auto(*mid_bf16, k=2)
    rt.topk_retrieve_auto(*mid_f32, k=2)  # f32 mid band: streaming (tie at f32)
    rt.topk_retrieve_auto(*big, k=2)
    assert calls == ["stream", "mid", "stream", "two"]


def test_midscale_matches_oracle():
    from clip_lora_match_tpu.ops.retrieval_topk import (
        topk_retrieve_midscale,
        topk_retrieve_reference,
    )

    rng = np.random.default_rng(21)
    q = rng.normal(size=(16, 64)).astype(np.float32) * 2.0
    idx = _norm_rows(rng.normal(size=(3000, 64)).astype(np.float32))
    s, i = topk_retrieve_midscale(jnp.asarray(q), jnp.asarray(idx), 7)
    s_ref, i_ref = topk_retrieve_reference(jnp.asarray(q), jnp.asarray(idx), 7)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), atol=1e-5)


def test_sharded_topk_matches_oracle():
    """8-way sharded exact top-k on the virtual CPU mesh (v5e-8 story)."""
    import jax

    from clip_lora_match_tpu.ops.retrieval_topk import topk_retrieve_reference
    from clip_lora_match_tpu.parallel.mesh import make_mesh, pad_to_multiple
    from clip_lora_match_tpu.retrieval.sharded import (
        shard_index,
        sharded_topk_retrieve,
    )

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(n_data=8)
    rng = np.random.default_rng(1)
    N = 10_001  # ragged: pads to 10_008, 1251 rows/shard
    idx = rng.normal(size=(N, 64)).astype(np.float32)
    idx /= np.linalg.norm(idx, axis=1, keepdims=True)
    qs = rng.normal(size=(7, 64)).astype(np.float32)
    padded, n_valid = pad_to_multiple(idx, 8)
    with mesh:
        placed = shard_index(mesh, padded)
        s, i = sharded_topk_retrieve(qs, placed, k=10, mesh=mesh, n_valid=n_valid)
    so, io = topk_retrieve_reference(jnp.asarray(qs), jnp.asarray(idx), 10)
    np.testing.assert_allclose(np.asarray(s), np.asarray(so), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(io))


def test_sharded_topk_q8_matches_quantized_oracle():
    """8-way sharded int8 retrieval on the virtual CPU mesh: per-shard q8
    selection + ICI candidate merge must equal the whole-index q8 oracle.
    (Per-shard quantization IS whole-index quantization — scales are
    per-row, so sharding commutes with quantization.)"""
    import jax

    from clip_lora_match_tpu.ops.retrieval_topk import quantize_index_int8
    from clip_lora_match_tpu.parallel.mesh import make_mesh, pad_to_multiple
    from clip_lora_match_tpu.retrieval.sharded import (
        shard_index_q8,
        sharded_topk_retrieve_q8,
    )

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(n_data=8)
    rng = np.random.default_rng(4)
    N = 10_001  # ragged: pads to 10_008, 1251 rows/shard
    idx = rng.normal(size=(N, 64)).astype(np.float32)
    idx /= np.linalg.norm(idx, axis=1, keepdims=True)
    qs = rng.normal(size=(7, 64)).astype(np.float32)
    vq, sc = quantize_index_int8(jnp.asarray(idx))
    padded, n_valid = pad_to_multiple(np.asarray(vq), 8)
    sc_padded, _ = pad_to_multiple(np.asarray(sc), 8)
    with mesh:
        v_pl, s_pl = shard_index_q8(
            mesh, jnp.asarray(padded, jnp.int8), jnp.asarray(sc_padded)
        )
        s, i = sharded_topk_retrieve_q8(
            qs, v_pl, s_pl, k=10, mesh=mesh, n_valid=n_valid
        )
    so, io = _q8_oracle(qs, np.asarray(vq), np.asarray(sc), 10)
    np.testing.assert_allclose(np.asarray(s), so, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i), io)


def test_twopass_small_n_fallback():
    """ceil(N/tile) < k must not crash (falls back to the oracle path)."""
    from clip_lora_match_tpu.ops.retrieval_topk import (
        topk_retrieve_reference,
        topk_retrieve_twopass,
    )

    rng = np.random.default_rng(2)
    idx = rng.normal(size=(100, 16)).astype(np.float32)
    idx /= np.linalg.norm(idx, axis=1, keepdims=True)
    qs = rng.normal(size=(3, 16)).astype(np.float32)
    s, i = topk_retrieve_twopass(jnp.asarray(qs), jnp.asarray(idx), 10, tile=16)
    so, io = topk_retrieve_reference(jnp.asarray(qs), jnp.asarray(idx), 10)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(io))


def test_twopass_dynamic_n_valid_mask():
    """Rows at/past n_valid must never appear, even when they'd score best."""
    from clip_lora_match_tpu.ops.retrieval_topk import topk_retrieve_twopass

    rng = np.random.default_rng(3)
    D = 32
    q = rng.normal(size=(4, D)).astype(np.float32)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    # valid rows anti-aligned with the queries (negative scores); "pad" rows
    # EQUAL to the queries (score 1.0 — maximal) beyond n_valid
    valid = (-qn[rng.integers(0, 4, 640)] + rng.normal(0, .05, (640, D))).astype(np.float32)
    valid /= np.linalg.norm(valid, axis=1, keepdims=True)
    evil = qn[rng.integers(0, 4, 64)].astype(np.float32)
    idx = np.concatenate([valid, evil])
    s, i = topk_retrieve_twopass(
        jnp.asarray(q), jnp.asarray(idx), 10, tile=16, n_valid=640
    )
    assert (np.asarray(i) < 640).all(), np.asarray(i)
    assert (np.asarray(s) <= 0.5).all()


def test_sharded_topk_all_negative_scores():
    """Adversarial case from the r2 self-review: every true similarity is
    negative and the top-k rows sit in the zero-padded last shard — zero pad
    rows (score 0) must NOT displace real candidates from the local top-k."""
    import jax

    from clip_lora_match_tpu.ops.retrieval_topk import topk_retrieve_reference
    from clip_lora_match_tpu.parallel.mesh import make_mesh, pad_to_multiple
    from clip_lora_match_tpu.retrieval.sharded import (
        shard_index,
        sharded_topk_retrieve,
    )

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(n_data=8)
    rng = np.random.default_rng(4)
    D = 32
    q = rng.normal(size=(3, D)).astype(np.float32)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    # all rows anti-correlated with queries → all scores < 0
    idx = (-qn[rng.integers(0, 3, 1001)] + rng.normal(0, 0.3, (1001, D))).astype(
        np.float32
    )
    idx /= np.linalg.norm(idx, axis=1, keepdims=True)
    padded, n_valid = pad_to_multiple(idx, 8)  # zero rows land in last shard
    with mesh:
        placed = shard_index(mesh, padded)
        s, i = sharded_topk_retrieve(q, placed, k=10, mesh=mesh, n_valid=n_valid)
    so, io = topk_retrieve_reference(jnp.asarray(q), jnp.asarray(idx), 10)
    np.testing.assert_allclose(np.asarray(s), np.asarray(so), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(io))
