"""Native C++ BPE merge core: exact id parity with the Python merge loop
(which itself is golden-tested against HF)."""

import numpy as np
import pytest

from clip_lora_match_tpu.tokenizer import ClipTokenizer
from clip_lora_match_tpu.tokenizer.native_bpe import NativeBPE, native_bpe_available
from tests.test_tokenizer import SAMPLES, _build_fixture_vocab

pytestmark = pytest.mark.skipif(
    not native_bpe_available(), reason="native BPE unavailable"
)


@pytest.fixture(scope="module")
def tok():
    vocab, merges = _build_fixture_vocab()
    return ClipTokenizer(vocab, merges)


def _python_ids(tok, text):
    ids = []
    from clip_lora_match_tpu.tokenizer.bpe import _WORD_PATTERN, clean_text

    for word in _WORD_PATTERN.findall(clean_text(text)):
        bw = "".join(tok.byte_encoder[b] for b in word.encode("utf-8"))
        ids.extend(tok.encoder.get(t, tok.unk_id) for t in tok._bpe(bw).split(" "))
    return ids


@pytest.mark.parametrize("text", [s for s in SAMPLES if s])
def test_native_matches_python(tok, text):
    native = NativeBPE(tok.encoder, tok._merges_ranked, tok.unk_id)
    from clip_lora_match_tpu.tokenizer.bpe import _WORD_PATTERN, clean_text

    for word in _WORD_PATTERN.findall(clean_text(text)):
        bw = "".join(tok.byte_encoder[b] for b in word.encode("utf-8"))
        py = [tok.encoder.get(t, tok.unk_id) for t in tok._bpe(bw).split(" ")]
        assert native.encode_word(bw) == py, (word, bw)


def test_tokenizer_uses_native_transparently(tok):
    """encode() (native path) must equal the pure-python computation."""
    for text in [s for s in SAMPLES if s]:
        got = tok.encode(text, add_specials=False)
        assert got == _python_ids(tok, text), text


def test_unicode_words(tok):
    native = NativeBPE(tok.encoder, tok._merges_ranked, tok.unk_id)
    for word in ["ditemukan", "café", "кошка", "日本"]:
        bw = "".join(tok.byte_encoder[b] for b in word.encode("utf-8"))
        py = [tok.encoder.get(t, tok.unk_id) for t in tok._bpe(bw).split(" ")]
        assert native.encode_word(bw) == py


def test_fallback_vocab_roundtrip():
    tok = ClipTokenizer.from_dir(None)
    ids = tok.encode("tas pink kanken")
    assert tok.decode(ids) == "tas pink kanken"


def test_throughput_large_corpus(tok):
    """Cold-corpus encode completes briskly through the native path."""
    import time

    rng = np.random.default_rng(0)
    words = ["".join(rng.choice(list("abcdefghij"), 8)) for _ in range(2000)]
    texts = [" ".join(rng.choice(words, 6)) for _ in range(500)]
    t0 = time.perf_counter()
    for t in texts:
        tok.encode(t)
    dt = time.perf_counter() - t0
    assert dt < 10, f"tokenized 500 texts in {dt:.1f}s (too slow)"
