"""Index store + retrieval tests, including legacy .pt round-trips against the
SHIPPED reference index (6 real Balikkin items) and an end-to-end
encode→index→search integration on the 3-item custom CSV."""

import os

import numpy as np
import pytest

from clip_lora_match_tpu.core.config import ClipArchConfig
from clip_lora_match_tpu.index import (
    EmbeddingIndex,
    build_index_from_csv,
    read_custom_items_csv,
    verify_index,
)
from clip_lora_match_tpu.models import clip as jclip
from clip_lora_match_tpu.models.encoder import ClipEncoder
from clip_lora_match_tpu.retrieval import (
    SearchIndex,
    cosine_similarity,
    top_k_similar,
)

TINY = ClipArchConfig(
    image_size=32,
    patch_size=16,
    vision_width=64,
    vision_layers=2,
    vision_heads=4,
    vision_mlp_dim=128,
    vocab_size=600,  # > fallback tokenizer's 514 ids
    max_text_length=77,
    text_width=32,
    text_layers=2,
    text_heads=4,
    text_mlp_dim=64,
    projection_dim=16,
)


@pytest.fixture(scope="module")
def tiny_encoder():
    import jax

    params = jclip.init_params(jax.random.PRNGKey(0), TINY)
    from clip_lora_match_tpu.core.config import ClipConfig, PreprocessConfig

    cfg = ClipConfig(arch=TINY, preprocess=PreprocessConfig(image_size=32))
    return ClipEncoder(params, arch=TINY, config=cfg)


def test_similarity_matches_numpy(rng):
    q = rng.normal(size=(8, 32)).astype(np.float32)
    c = rng.normal(size=(100, 32)).astype(np.float32)
    sims = np.asarray(cosine_similarity(q, c))
    qn = q / np.linalg.norm(q, axis=-1, keepdims=True)
    cn = c / np.linalg.norm(c, axis=-1, keepdims=True)
    np.testing.assert_allclose(sims, qn @ cn.T, atol=1e-5)
    scores, idx = top_k_similar(q, c, k=7)
    oracle = np.argsort(-sims, axis=-1)[:, :7]
    np.testing.assert_array_equal(idx, oracle)
    # k clamps to N (ref:similarity.py:50)
    s2, i2 = top_k_similar(q[0], c[:3], k=10)
    assert s2.shape == (3,)


def test_approximate_topk(rng):
    """Opt-in approx_max_k path: exact at recall_target=1.0, and at the
    default target the returned set overlaps the oracle at >= target recall
    (averaged; approx_max_k's guarantee is in expectation)."""
    q = rng.normal(size=(16, 32)).astype(np.float32)
    c = rng.normal(size=(2048, 32)).astype(np.float32)
    k = 10
    s_ex, i_ex = top_k_similar(q, c, k=k)
    s_ap, i_ap = top_k_similar(q, c, k=k, approximate=True, recall_target=1.0)
    np.testing.assert_array_equal(i_ap, i_ex)
    np.testing.assert_allclose(s_ap, s_ex, atol=1e-5)
    _, i95 = top_k_similar(q, c, k=k, approximate=True, recall_target=0.95)
    recall = np.mean(
        [len(set(a) & set(b)) / k for a, b in zip(i95, i_ex)]
    )
    assert recall >= 0.9
    # single-query shape contract matches the exact path
    s1, i1 = top_k_similar(q[0], c, k=3, approximate=True, recall_target=1.0)
    assert s1.shape == (3,) and i1.shape == (3,)


def test_search_index_approximate_flag(rng):
    emb = rng.normal(size=(64, 16)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    index = EmbeddingIndex(dim=16)
    for i in range(64):
        index.append(emb[i], f"p{i}", f"t{i}")
    exact = SearchIndex(index)
    approx = SearchIndex(index, approximate=True, recall_target=1.0)
    r_ex = exact.search_with_embedding(emb[7], k=5)
    r_ap = approx.search_with_embedding(emb[7], k=5)
    assert [r.index for r in r_ap] == [r.index for r in r_ex]
    assert r_ap[0].index == 7


def test_search_index_quantize_int8(rng):
    """Opt-in int8-quantized SearchIndex: same top-k as exact on separated
    data, batched path included, and the q8 cache invalidates on append."""
    emb = rng.normal(size=(96, 64)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    index = EmbeddingIndex(dim=64)
    for i in range(96):
        index.append(emb[i], f"p{i}", f"t{i}")
    exact = SearchIndex(index)
    q8 = SearchIndex(index, quantize="int8")
    r_ex = exact.search_with_embedding(emb[11], k=5)
    r_q8 = q8.search_with_embedding(emb[11], k=5)
    assert r_q8[0].index == 11 and r_q8[0].score == pytest.approx(1.0, abs=5e-3)
    assert {r.index for r in r_q8} == {r.index for r in r_ex}
    # batched path
    rb = q8.search_batch(emb[[3, 4]], k=3)
    assert rb[0][0].index == 3 and rb[1][0].index == 4
    # appends invalidate the quantized cache (keyed on size)
    new = rng.normal(size=64).astype(np.float32)
    new /= np.linalg.norm(new)
    row = index.append(new, "pnew", "tnew")
    assert q8.search_with_embedding(new, k=1)[0].index == row
    with pytest.raises(ValueError):
        SearchIndex(index, quantize="int4")


def test_q8_cache_appends_incrementally(rng, monkeypatch):
    """Growth must quantize ONLY the new rows (EmbeddingIndex is
    append-only; a full requantize's fp32 cast transient would stall every
    search after an append at production scale) and match a from-scratch
    rebuild bit-for-bit."""
    import clip_lora_match_tpu.ops.retrieval_topk as rt

    emb = rng.normal(size=(48, 64)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    index = EmbeddingIndex(dim=64)
    for i in range(40):
        index.append(emb[i], f"p{i}", f"t{i}")
    q8 = SearchIndex(index, quantize="int8")
    with index.lock:
        q8._q8_state()  # warm: full quantize of the first 40 rows

    rows_quantized = []
    real = rt.quantize_index_int8

    def counting(x, *a, **kw):
        rows_quantized.append(x.shape[0])
        return real(x, *a, **kw)

    monkeypatch.setattr(
        "clip_lora_match_tpu.ops.retrieval_topk.quantize_index_int8", counting
    )
    for i in range(40, 48):
        index.append(emb[i], f"p{i}", f"t{i}")
    with index.lock:
        vq, sc = q8._q8_state()
    assert rows_quantized == [8], rows_quantized  # the 8 new rows, once
    fresh = SearchIndex(index, quantize="int8")
    with index.lock:
        vq_f, sc_f = fresh._q8_state()
    np.testing.assert_array_equal(np.asarray(vq), np.asarray(vq_f))
    np.testing.assert_array_equal(np.asarray(sc), np.asarray(sc_f))
    assert q8.search_with_embedding(emb[44], k=1)[0].index == 44


def test_q8_rejects_wide_embeddings(rng):
    """D > 1024 voids the int8 exactness premise (127²·D ≥ 2²⁴): the kernel
    must refuse rather than silently mis-rank near ties."""
    from clip_lora_match_tpu.ops.retrieval_topk import (
        quantize_index_int8,
        topk_retrieve_q8,
    )

    import jax.numpy as jnp

    x = rng.normal(size=(64, 2048)).astype(np.float32)
    vq, sc = quantize_index_int8(jnp.asarray(x))
    with pytest.raises(ValueError, match="D <= 1024"):
        topk_retrieve_q8(jnp.asarray(x[:4]), vq, sc, 5)


def test_index_append_and_search(rng):
    idx = EmbeddingIndex(dim=16)
    assert len(idx) == 0
    vecs = rng.normal(size=(20, 16)).astype(np.float32)
    for i, v in enumerate(vecs):
        idx.append(v, image_path=f"img{i}.jpg", text=f"text {i}")
    assert len(idx) == 20
    si = SearchIndex(idx)
    target = vecs[7] / np.linalg.norm(vecs[7])
    res = si.search_with_embedding(target, k=3)
    assert res[0].index == 7 and res[0].image_path == "img7.jpg"
    assert res[0].score == pytest.approx(1.0, abs=1e-5)


def test_q8_index_persistence_roundtrip(tmp_path, rng):
    """save_index_q8/load_index_q8: the quantized form is the durable
    artifact at HBM scale (fp32 source may not fit to re-quantize from)."""
    from clip_lora_match_tpu.index.store import load_index_q8, save_index_q8
    from clip_lora_match_tpu.ops.retrieval_topk import (
        quantize_index_int8,
        topk_retrieve_q8,
    )

    emb = rng.normal(size=(48, 32)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    vq, sc = quantize_index_int8(emb)
    p = str(tmp_path / "q8_index.npz")
    save_index_q8(p, vq, sc, [f"p{i}" for i in range(48)], [f"t{i}" for i in range(48)])
    v2, s2, paths, texts = load_index_q8(p)
    np.testing.assert_array_equal(np.asarray(v2), np.asarray(vq))
    np.testing.assert_array_equal(np.asarray(s2), np.asarray(sc))
    assert paths[7] == "p7" and texts[47] == "t47"
    s_a, i_a = topk_retrieve_q8(emb[:4], vq, sc, 3)
    s_b, i_b = topk_retrieve_q8(emb[:4], v2, s2, 3)
    np.testing.assert_array_equal(np.asarray(i_a), np.asarray(i_b))
    with pytest.raises(ValueError):
        save_index_q8(p, np.zeros((4, 8), np.float32), np.zeros((4, 1)))


def test_search_validation(rng):
    idx = EmbeddingIndex(rng.normal(size=(5, 16)).astype(np.float32))
    si = SearchIndex(idx)
    with pytest.raises(ValueError):
        si.search_with_embedding(np.zeros((3, 16)))
    with pytest.raises(ValueError):
        si.search_with_embedding(np.zeros(8))
    # (1, D) accepted (ref:search.py:83-85)
    assert len(si.search_with_embedding(np.ones((1, 16)), k=2)) == 2
    # empty index → empty results
    assert SearchIndex(EmbeddingIndex(dim=16)).search_with_embedding(np.ones(16)) == []


def test_npz_roundtrip(tmp_path, rng):
    emb = rng.normal(size=(10, 16)).astype(np.float32)
    idx = EmbeddingIndex(emb, [f"p{i}" for i in range(10)], [f"t{i}" for i in range(10)])
    path = str(tmp_path / "index.npz")
    idx.save(path)
    loaded = EmbeddingIndex.load(path)
    np.testing.assert_allclose(loaded.embeddings_np(), idx.embeddings_np(), atol=1e-6)
    assert loaded.texts == idx.texts and loaded.image_paths == idx.image_paths
    assert verify_index(loaded)


def test_pt_roundtrip(tmp_path, rng):
    pytest.importorskip("torch")
    emb = rng.normal(size=(4, 16)).astype(np.float32)
    idx = EmbeddingIndex(emb, ["a", "b", "c", "d"], ["w", "x", "y", "z"])
    path = str(tmp_path / "legacy.pt")
    idx.save(path)
    loaded = EmbeddingIndex.load(path)
    np.testing.assert_allclose(loaded.embeddings_np(), idx.embeddings_np(), atol=1e-6)
    assert loaded.texts == ["w", "x", "y", "z"]


def test_pt_singular_keys(tmp_path):
    """Key-tolerant loading of singular spellings (ref:search.py:41-56)."""
    torch = pytest.importorskip("torch")
    emb = np.eye(4, 16, dtype=np.float32)
    torch.save(
        {"embeddings": torch.from_numpy(emb), "image_path": ["i"], "text": ["t"]},
        str(tmp_path / "s.pt"),
    )
    with pytest.warns(UserWarning):  # metadata count mismatch warning
        loaded = EmbeddingIndex.load(str(tmp_path / "s.pt"))
    assert loaded.image_paths == ["i"] and len(loaded) == 4
    # safe metadata indexing beyond list length (ref:search.py:104-105)
    assert loaded.metadata(3) == (None, None)


def test_load_shipped_reference_index(reference_root):
    """The committed 6-item Balikkin index loads and self-searches correctly."""
    pytest.importorskip("torch")
    idx = EmbeddingIndex.load(
        os.path.join(reference_root, "data/index/custom_items_index.pt")
    )
    assert len(idx) == 6 and idx.dim == 512
    assert "tas" in idx.texts[0]
    si = SearchIndex(idx)
    res = si.search_with_embedding(idx.embeddings_np()[2], k=6)
    assert res[0].index == 2 and res[0].score == pytest.approx(1.0, abs=1e-4)
    assert verify_index(idx)


def test_search_index_constructs_from_path(reference_root):
    """Drop-in parity: the reference constructs ``TextSearchIndex(index_path)``
    directly from a path string (ref:src/embedding/search.py:24)."""
    pytest.importorskip("torch")
    from clip_lora_match_tpu.retrieval.search import TextSearchIndex

    tsi = TextSearchIndex(
        os.path.join(reference_root, "data/index/custom_items_index.pt")
    )
    assert len(tsi.index) == 6
    res = tsi.search_with_embedding(tsi.index.embeddings_np()[1], k=2)
    assert res[0].index == 1


def test_missing_file_starts_empty(tmp_path):
    idx = EmbeddingIndex.load(str(tmp_path / "nope.npz"), dim=16)
    assert len(idx) == 0


def test_e2e_build_and_search_custom_csv(tiny_encoder, reference_root, tmp_path):
    """End-to-end slice: parse the real malformed custom CSV → batch encode →
    index → text search → metadata round-trip (ref:build_custom_index.py +
    demo_search_text_custom.py path)."""
    csv_path = os.path.join(reference_root, "data/custom/my_items.csv")
    paths, texts = read_custom_items_csv(csv_path)
    assert len(texts) == 3
    assert texts[0].startswith("Kaca mata pink")
    index = build_index_from_csv(csv_path, tiny_encoder, custom_format=True)
    assert len(index) == 3
    si = SearchIndex(index, tiny_encoder)
    res = si.search_by_text("Kaca mata pink, ditemukan di gk 1.", k=3)
    assert len(res) == 3
    # the exact text's own embedding must rank first
    assert res[0].index == 0
    out = str(tmp_path / "custom.npz")
    index.save(out)
    reloaded = EmbeddingIndex.load(out)
    res2 = SearchIndex(reloaded, tiny_encoder).search_by_text(texts[0], k=1)
    assert res2[0].index == res[0].index
