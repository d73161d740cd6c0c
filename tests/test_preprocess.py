"""Image preprocessing goldens vs HF CLIPImageProcessor (constructed from
defaults — pure code, no download) and distribution checks for the augmenter."""

import numpy as np
import pytest
from PIL import Image

from clip_lora_match_tpu.core.config import PreprocessConfig
from clip_lora_match_tpu.preprocess import (
    ClipPreprocessor,
    ImageAugmenter,
    preprocess_image,
    preprocess_image_batch,
)
from clip_lora_match_tpu.preprocess.image import nhwc_to_nchw


def _random_img(rng, w, h):
    return Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8), "RGB")


@pytest.fixture(scope="module")
def hf_proc():
    from transformers import CLIPImageProcessor

    return CLIPImageProcessor()  # defaults == CLIP ViT-B/32 pipeline


@pytest.mark.parametrize("wh", [(640, 480), (480, 640), (224, 224), (100, 300), (225, 223)])
def test_pixel_parity_vs_hf(hf_proc, wh):
    rng = np.random.default_rng(0)
    img = _random_img(rng, *wh)
    ours = nhwc_to_nchw(preprocess_image(img))
    theirs = hf_proc(img, return_tensors="np")["pixel_values"][0]
    assert ours.shape == theirs.shape == (3, 224, 224)
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_batch_and_empty():
    rng = np.random.default_rng(1)
    imgs = [_random_img(rng, 64, 64) for _ in range(3)]
    batch = preprocess_image_batch(imgs)
    assert batch.shape == (3, 224, 224, 3)
    empty = preprocess_image_batch([])
    assert empty.shape == (0, 224, 224, 3)


def test_grayscale_and_rgba_convert():
    g = Image.new("L", (300, 200), 128)
    a = Image.new("RGBA", (200, 300), (10, 20, 30, 255))
    assert preprocess_image(g).shape == (224, 224, 3)
    assert preprocess_image(a).shape == (224, 224, 3)


def test_pair_shapes():
    pp = ClipPreprocessor()
    rng = np.random.default_rng(2)
    out = pp.preprocess_pair(_random_img(rng, 320, 240), "tas pink kanken")
    assert out["pixel_values"].shape == (1, 224, 224, 3)
    assert out["input_ids"].shape == (1, 77)
    assert out["attention_mask"].shape == (1, 77)


def test_augmenter_deterministic_and_distribution():
    rng = np.random.default_rng(3)
    img = _random_img(rng, 64, 48)
    a1, a2 = ImageAugmenter(seed=7), ImageAugmenter(seed=7)
    for _ in range(5):
        x1, x2 = a1.augment(img), a2.augment(img)
        assert np.array_equal(np.asarray(x1), np.asarray(x2))
    # rotation-with-expand grows the canvas (ref:src/preprocessing/augment.py:52-55)
    aug = ImageAugmenter(hflip_p=0, rotate_p=1.0, jitter_p=0, seed=0)
    out = aug.augment(img)
    assert out.size[0] >= img.size[0] and out.size[1] >= img.size[1]
    # p=0 path is identity
    ident = ImageAugmenter(hflip_p=0, rotate_p=0, jitter_p=0)
    assert np.array_equal(np.asarray(ident.augment(img)), np.asarray(img))


def test_augmenter_jitter_single_roll():
    """Brightness and contrast are gated by ONE roll (ref:augment.py:57-67):
    either both apply or neither — never brightness-only.

    With independent rolls P(exactly-one) would be 2·0.3·0.7 = 0.42; with the
    reference's joint roll it is 0. Detect via RNG draw count: each call must
    consume exactly 1 draw (gate) when it misses or 3 draws (gate + two
    factors) when it hits — 2 draws would mean an independent second gate."""
    aug = ImageAugmenter(hflip_p=0, rotate_p=0, jitter_p=0.3, seed=11)
    rng = np.random.default_rng(5)
    img = _random_img(rng, 32, 32)
    shadow = np.random.default_rng(11)  # replica of aug.rng
    hits = 0
    for _ in range(200):
        shadow.random()  # hflip gate (consumed even at p=0)
        shadow.random()  # rotate gate
        gate = shadow.random()  # jitter gate
        changed = not np.array_equal(np.asarray(aug.augment(img)), np.asarray(img))
        if gate < 0.3:
            hits += 1
            shadow.uniform(0.8, 1.2)  # brightness factor
            shadow.uniform(0.8, 1.2)  # contrast factor
        else:
            assert not changed
        # resync check: a 2-draw hit (independent second gate) would desync here
        assert aug.rng.random() == shadow.random()
    assert 30 <= hits <= 90  # ~0.3·200


def test_custom_config_size():
    cfg = PreprocessConfig(image_size=96)
    rng = np.random.default_rng(4)
    assert preprocess_image(_random_img(rng, 500, 300), cfg).shape == (96, 96, 3)
