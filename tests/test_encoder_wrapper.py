"""ClipEncoder wrapper behavior: bucket padding invariance, lora attach/merge
lifecycle, missing-weights warnings, legacy .pt finder persistence."""

import warnings

import numpy as np
import pytest

import jax

from clip_lora_match_tpu.core.config import ClipConfig, LoraConfig, PreprocessConfig
from clip_lora_match_tpu.lora import init_lora
from clip_lora_match_tpu.models import clip as jclip
from clip_lora_match_tpu.models.encoder import ClipEncoder
from tests.test_index_retrieval import TINY, tiny_encoder  # noqa: F401
from tests.test_lora import _randomize_lora


def test_bucket_padding_invariance(tiny_encoder):  # noqa: F811
    """Encoding 3 texts (padded to bucket 4) must equal encoding them inside
    a larger batch — padding rows can't leak into results."""
    texts = ["tas pink", "dompet coklat", "payung hitam"]
    small = tiny_encoder.encode_text(texts)
    big = tiny_encoder.encode_text(texts + ["botol biru"] * 5)[:3]
    np.testing.assert_allclose(small, big, atol=1e-5)


def test_compilation_cache_dir_applied(tmp_path):
    """compilation_cache_dir threads YAML → config → process-wide jax config
    and populates the directory after an encode (warm service restarts then
    deserialize executables instead of recompiling)."""
    cache = tmp_path / "xla_cache"
    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    cfg = ClipConfig(
        arch=TINY,
        preprocess=PreprocessConfig(image_size=32),
        compilation_cache_dir=str(cache),
    )
    params = jclip.init_params(jax.random.PRNGKey(0), TINY)
    try:
        enc = ClipEncoder(params, arch=TINY, config=cfg)
        assert jax.config.jax_compilation_cache_dir == str(cache)
        assert cache.is_dir()
        enc.encode_text("tas pink")
        # the tiny towers compile fast; min_compile_time 0.5 s may skip
        # writes on CPU — the contract here is config application, not
        # cache-hit timing (measured on TPU in docs/DESIGN.md)
        assert jax.config.jax_persistent_cache_min_compile_time_secs == 0.5
    finally:
        # process-wide knobs: restore so the rest of the suite doesn't write
        # executables into this test's (soon-deleted) tmp dir
        jax.config.update("jax_compilation_cache_dir", prev_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", prev_min)


def test_bucket_ladder_contains_v5e_sweet_spot():
    """96 sits between 64 and 128 (the measured v5e image sweet spot);
    _bucket rounds 65-96 to it instead of jumping to 128."""
    from clip_lora_match_tpu.models.encoder import _BUCKETS, _bucket

    assert 96 in _BUCKETS
    assert _bucket(65) == 96 and _bucket(96) == 96 and _bucket(97) == 128
    assert list(_BUCKETS) == sorted(_BUCKETS)


def test_single_vs_batch_image(tiny_encoder, tmp_path):  # noqa: F811
    from PIL import Image

    rng = np.random.default_rng(0)
    p = tmp_path / "x.jpg"
    Image.fromarray(rng.integers(0, 255, (50, 60, 3), dtype=np.uint8), "RGB").save(p)
    one = tiny_encoder.encode_image(str(p))
    batch = tiny_encoder.encode_image([str(p), str(p)])
    assert one.shape == (TINY.projection_dim,)
    np.testing.assert_allclose(batch[0], one, atol=1e-6)
    np.testing.assert_allclose(batch[1], one, atol=1e-6)
    assert np.linalg.norm(one) == pytest.approx(1.0, abs=1e-5)


def test_lora_attach_changes_then_merge_drops_adapter():
    params = jclip.init_params(jax.random.PRNGKey(0), TINY)
    enc = ClipEncoder(
        params, arch=TINY,
        config=ClipConfig(arch=TINY, preprocess=PreprocessConfig(image_size=32)),
    )
    base = enc.encode_text("tas pink")
    lora = _randomize_lora(
        init_lora(jax.random.PRNGKey(1), TINY, LoraConfig(r=2, alpha=4))
    )
    enc.attach_lora(lora, 2.0)
    adapted = enc.encode_text("tas pink")
    assert np.abs(adapted - base).max() > 1e-4
    enc.merge_lora()
    assert enc.lora is None
    merged = enc.encode_text("tas pink")
    np.testing.assert_allclose(merged, adapted, atol=1e-4)


def test_missing_weights_warns():
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        ClipEncoder.from_config(weights_path="/nonexistent/weights.npz")
    assert any("random init" in str(x.message) for x in w)


def test_missing_lora_warns_and_continues(tmp_path):
    """ref:models/clip_model.py:74-75 — missing LoRA warns, base model used."""
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        enc = ClipEncoder.from_config(lora_path=str(tmp_path / "nope"))
    assert enc.lora is None
    assert any("LoRA weights not found" in str(x.message) for x in w)


def test_finder_persists_legacy_pt(tmp_path, tiny_encoder):  # noqa: F811
    """FinderService with a .pt index path writes the torch legacy format the
    reference tooling reads (ref:finder_service.py:93-103)."""
    torch = pytest.importorskip("torch")
    from PIL import Image

    from clip_lora_match_tpu.index.store import EmbeddingIndex
    from clip_lora_match_tpu.services import FinderConfig, FinderService

    img = tmp_path / "item.jpg"
    Image.new("RGB", (40, 40), (200, 20, 20)).save(img)
    cfg = FinderConfig(
        index_path=str(tmp_path / "legacy.pt"),
        reported_images_dir=str(tmp_path / "reported"),
        k_dim=TINY.projection_dim,
    )
    finder = FinderService(tiny_encoder, cfg)
    finder.report_item(str(img), "tas merah", location="gerbang")
    raw = torch.load(str(tmp_path / "legacy.pt"), map_location="cpu",
                     weights_only=False)
    assert set(raw) == {"embeddings", "image_paths", "texts"}
    assert raw["embeddings"].shape == (1, TINY.projection_dim)
    loaded = EmbeddingIndex.load(str(tmp_path / "legacy.pt"))
    assert loaded.texts[0] == "tas merah, ditemukan di gerbang"


def test_text_seq_slice_matches_full_width(tiny_encoder):  # noqa: F811
    """Batches whose real tokens fit in 64 columns are sliced 77→64 before
    dispatch (models/encoder.py::_TEXT_SEQ_SLICE); under the causal mask the
    dropped all-pad columns cannot influence the EOT-pooled embedding, so
    the output must equal the full-width compute."""
    enc = tiny_encoder
    pp = enc.preprocessor.preprocess_text(
        ["tas pink kecil", "dompet coklat", "sepatu hijau"]
    )
    ids, mask = np.asarray(pp["input_ids"]), np.asarray(pp["attention_mask"])
    assert ids.shape[1] == 77 and not mask[:, 64:].any()
    sliced = enc.encode_text_batch(ids, mask)
    # defeat the slice via a mask bit past 64 — serving drops the padding
    # mask (provably output-neutral, see _text_fn), so this only changes
    # the dispatch width, not the math
    full_mask = mask.copy()
    full_mask[0, -1] = 1
    full = enc.encode_text_batch(ids, full_mask)
    np.testing.assert_allclose(sliced, full, atol=1e-5)


def test_text_seq_slice_guards_eot_position(tiny_encoder):  # noqa: F811
    """If a row's first EOT sits past the slice boundary (a mask convention
    that doesn't count the EOT), the slice must not fire — output equals the
    full-width compute either way."""
    enc = tiny_encoder
    eot = enc.eot_id
    ids = np.full((2, 77), 0, np.int32)
    ids[:, 0] = 1
    ids[0, 10] = eot
    ids[0, 11:] = eot
    ids[1, 70] = eot  # first EOT past 64
    ids[1, 71:] = eot
    mask = np.zeros_like(ids)
    mask[:, :5] = 1  # mask says "fits in 64" for both rows
    out = enc.encode_text_batch(ids, mask)
    full_mask = mask.copy()
    full_mask[0, -1] = 1
    full = enc.encode_text_batch(ids, full_mask)
    np.testing.assert_allclose(out, full, atol=1e-5)
