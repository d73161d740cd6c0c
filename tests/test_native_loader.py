"""Native C++ loader: builds, decodes real reference JPEGs, matches the PIL
pipeline closely, survives corrupt inputs, and is exercised for throughput."""

import glob
import os
import time

import numpy as np
import pytest
from PIL import Image

from clip_lora_match_tpu.data.native_loader import (
    native_available,
    preprocess_image_batch_native,
)
from clip_lora_match_tpu.preprocess.image import preprocess_image_batch

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native loader unavailable (no g++/libjpeg)"
)


@pytest.fixture(scope="module")
def jpegs(tmp_path_factory):
    d = tmp_path_factory.mktemp("jpg")
    rng = np.random.default_rng(0)
    paths = []
    for i, (w, h) in enumerate([(640, 480), (300, 500), (224, 224), (100, 80)]):
        p = d / f"img{i}.jpg"
        Image.fromarray(
            rng.integers(0, 255, (h, w, 3), dtype=np.uint8), "RGB"
        ).save(p, quality=95)
        paths.append(str(p))
    return paths


def test_matches_pil_pipeline(jpegs):
    ours = preprocess_image_batch_native(jpegs)
    theirs = preprocess_image_batch(jpegs)
    assert ours.shape == theirs.shape
    # both pipelines decode the same JPEG and resample with the same cubic
    # algorithm; differences are fixed-point rounding (±1-2 LSB pre-normalize)
    max_diff = np.abs(ours - theirs).max()
    assert max_diff < 5 / 255 / 0.26, f"max diff {max_diff}"
    mean_diff = np.abs(ours - theirs).mean()
    assert mean_diff < 0.01, f"mean diff {mean_diff}"


def test_reference_images(reference_root):
    paths = sorted(
        glob.glob(os.path.join(reference_root, "data/custom/images/*.jpg"))
    )
    assert paths
    ours = preprocess_image_batch_native(paths)
    theirs = preprocess_image_batch(paths)
    assert np.abs(ours - theirs).mean() < 0.01


def test_corrupt_file_falls_back(tmp_path, jpegs):
    bad = tmp_path / "corrupt.jpg"
    bad.write_bytes(b"not a jpeg at all")
    png = tmp_path / "actually.png"
    Image.new("RGB", (50, 50), (10, 200, 30)).save(png)
    fake_jpg = tmp_path / "renamed.jpg"
    Image.new("RGB", (50, 50), (10, 200, 30)).save(fake_jpg, format="PNG")
    with pytest.raises(Exception):
        preprocess_image_batch_native([str(bad)])  # PIL can't decode it either
    out = preprocess_image_batch_native([jpegs[0], str(fake_jpg)])
    ref = preprocess_image_batch([jpegs[0], str(fake_jpg)])
    assert np.abs(out - ref).mean() < 0.01  # PNG-in-.jpg handled via fallback


def test_throughput_sane(jpegs):
    batch = jpegs * 16  # 64 images
    t0 = time.perf_counter()
    preprocess_image_batch_native(batch)
    native_t = time.perf_counter() - t0
    per_img_ms = native_t / len(batch) * 1e3
    assert per_img_ms < 100, f"{per_img_ms:.1f} ms/img is implausibly slow"


def test_native_u8_matches_fp32_pipeline(tmp_path):
    """u8 feed + on-device normalization must equal the fp32 host pipeline:
    u8 path returns resize+crop only; (u8/255 - mean)/std == fp32 output."""
    import numpy as np
    from PIL import Image

    from clip_lora_match_tpu.core.config import PreprocessConfig
    from clip_lora_match_tpu.data.native_loader import (
        preprocess_image_batch_native,
        preprocess_image_batch_native_u8,
    )

    rng = np.random.default_rng(5)
    paths = []
    for i in range(3):
        p = tmp_path / f"img{i}.jpg"
        Image.fromarray(
            rng.integers(0, 255, (300 + 7 * i, 260, 3), dtype=np.uint8), "RGB"
        ).save(p, quality=95)
        paths.append(str(p))
    cfg = PreprocessConfig()
    f32 = preprocess_image_batch_native(paths, cfg)
    u8 = preprocess_image_batch_native_u8(paths, cfg)
    assert u8.dtype == np.uint8 and u8.shape == (3, 224, 224, 3)
    mean = np.asarray(cfg.mean, np.float32)
    std = np.asarray(cfg.std, np.float32)
    renorm = (u8.astype(np.float32) / 255.0 - mean) / std
    np.testing.assert_allclose(renorm, f32, atol=1e-5)


def test_encode_image_files_matches_per_image_path(tmp_path):
    """The overlapped jpeg→embedding pipeline must agree with the plain
    per-image encode path (same preprocessing, same tower)."""
    import numpy as np
    from PIL import Image

    import jax

    from clip_lora_match_tpu.core.config import (
        ClipArchConfig,
        ClipConfig,
        PreprocessConfig,
    )
    from clip_lora_match_tpu.models import clip as jclip
    from clip_lora_match_tpu.models.encoder import ClipEncoder

    arch = ClipArchConfig(
        image_size=32, patch_size=16, vision_width=64, vision_layers=2,
        vision_heads=4, vision_mlp_dim=128, vocab_size=600, max_text_length=77,
        text_width=32, text_layers=2, text_heads=4, text_mlp_dim=64,
        projection_dim=16,
    )
    cfg = ClipConfig(arch=arch, preprocess=PreprocessConfig(image_size=32))
    enc = ClipEncoder(
        jclip.init_params(jax.random.PRNGKey(0), arch), arch=arch, config=cfg
    )
    rng = np.random.default_rng(6)
    paths = []
    for i in range(5):
        p = tmp_path / f"f{i}.jpg"
        Image.fromarray(
            rng.integers(0, 255, (60, 50, 3), dtype=np.uint8), "RGB"
        ).save(p, quality=95)
        paths.append(str(p))
    # dct_scale off: these are random-noise jpegs (pathological for the DCT
    # lowpass); this test pins PIPELINE equivalence, test_dct_scale_photo_
    # parity pins the scaled-decode tolerance on real photos
    fast = enc.encode_image_files(paths, batch_size=2, dct_scale=False)
    slow = enc.encode_image(paths)
    cos = (fast * slow).sum(axis=1)
    assert (cos > 0.9999).all(), cos


def test_dct_scale_default_off_is_pil_exact(jpegs):
    """dct_scale defaults OFF in the low-level API: output must be identical
    to an explicit dct_scale=False call (strict PIL-parity contract)."""
    a = preprocess_image_batch_native(jpegs)
    b = preprocess_image_batch_native(jpegs, dct_scale=False)
    np.testing.assert_array_equal(a, b)


def test_dct_scale_photo_parity(reference_root):
    """DCT-scaled decode on the reference's real photos: pixel-level close
    (the N/8 DCT lowpass vs full decode + cubic) and embedding-level
    ≥0.999 cosine — VERDICT r3 #3's 'embeddings within parity tolerance'."""
    paths = sorted(
        glob.glob(os.path.join(reference_root, "data/custom/images/*.jpg"))
    ) + sorted(
        glob.glob(os.path.join(reference_root, "data/reported/images/*.jpg"))
    )
    assert len(paths) >= 6
    full = preprocess_image_batch_native(paths, dct_scale=False)
    fast = preprocess_image_batch_native(paths, dct_scale=True)
    assert np.abs(full - fast).mean() < 0.03

    # embedding parity on a random-weight tower (zero egress — weights don't
    # matter for this: a lowpass-induced embedding rotation would show up
    # regardless of where the tower's random features point)
    import jax
    from clip_lora_match_tpu.core.config import ClipArchConfig
    from clip_lora_match_tpu.models import clip as clip_model

    arch = ClipArchConfig(
        image_size=224, patch_size=32, vision_width=128, vision_layers=2,
        vision_heads=4, vision_mlp_dim=256, vocab_size=512,
        max_text_length=16, text_width=64, text_layers=1, text_heads=2,
        text_mlp_dim=128, projection_dim=32,
    )
    params = clip_model.init_params(jax.random.PRNGKey(0), arch)
    emb_full = np.asarray(
        clip_model.l2_normalize(
            clip_model.encode_image_features(params, full, arch)
        )
    )
    emb_fast = np.asarray(
        clip_model.l2_normalize(
            clip_model.encode_image_features(params, fast, arch)
        )
    )
    cos = (emb_full * emb_fast).sum(-1)
    assert cos.min() >= 0.999, f"embedding cosine {cos.min()}"


def test_dct_scale_small_images_noop(tmp_path):
    """Images already at/below ~the target short side decode at 8/8 — the
    DCT path must be a byte-exact no-op there (no accidental upscaling)."""
    rng = np.random.default_rng(9)
    paths = []
    for i, (w, h) in enumerate([(224, 224), (100, 80), (230, 240)]):
        p = tmp_path / f"s{i}.jpg"
        Image.fromarray(
            rng.integers(0, 255, (h, w, 3), dtype=np.uint8), "RGB"
        ).save(p, quality=95)
        paths.append(str(p))
    a = preprocess_image_batch_native(paths, dct_scale=False)
    b = preprocess_image_batch_native(paths, dct_scale=True)
    np.testing.assert_array_equal(a, b)
