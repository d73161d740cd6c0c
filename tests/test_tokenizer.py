"""Tokenizer tests: BPE algorithm golden-tested against HF CLIPTokenizer
loaded from identical vocab/merges fixture files (offline-safe: HF tokenizer
code ships with transformers; only the 49k vocab blob needs network, so the
fixture builds a small but non-trivial vocab instead)."""

import json
import os

import numpy as np
import pytest

from clip_lora_match_tpu.tokenizer import (
    ClipTokenizer,
    build_fallback_vocab_and_merges,
    bytes_to_unicode,
)
from clip_lora_match_tpu.tokenizer.bpe import clean_text, EOT_TOKEN, SOT_TOKEN

SAMPLES = [
    "a photo of a cat",
    "Tas ransel hitam polos merk funboy, ditemukan di aula gedung f.",
    "Femella Women Black Skinny Leggings, Black Leggings for Women!",
    "kaca mata pink , ditemukan di atm gerbang utama",
    "  Weird   WHITESPACE\tand\nnewlines  ",
    "numbers 123 and symbols #@!",
    "don't we've it's I'll they'd",
    "",
]


def _build_fixture_vocab():
    """Small vocab with real merge structure: all byte units (+</w> forms),
    then merges for common bigrams/words so multi-char tokens exist."""
    alphabet = [bytes_to_unicode()[b] for b in range(256)]
    vocab = {}
    for ch in alphabet:
        vocab[ch] = len(vocab)
    for ch in alphabet:
        vocab[ch + "</w>"] = len(vocab)
    merges = []

    def add_merge(a, b):
        merges.append((a, b))
        tok = a + b
        if tok not in vocab:
            vocab[tok] = len(vocab)

    # build up: 'th', 'th</w>'? merges operate on units present in words
    for a, b in [
        ("t", "h"), ("th", "e</w>"), ("a", "n"), ("an", "d</w>"),
        ("i", "n"), ("o", "f</w>"), ("a</w>", None), ("c", "a"), ("ca", "t</w>"),
        ("p", "h"), ("ph", "o"), ("pho", "to</w>"), ("t", "o</w>"),
        ("d", "i</w>"), ("t", "a"), ("ta", "s</w>"), ("1", "2"),
        ("'", "s</w>"), ("l", "l</w>"), ("'", "ll</w>"),
    ]:
        if b is None:
            continue
        add_merge(a, b)
    vocab[SOT_TOKEN] = len(vocab)
    vocab[EOT_TOKEN] = len(vocab)
    return vocab, merges


@pytest.fixture(scope="module")
def fixture_files(tmp_path_factory):
    vocab, merges = _build_fixture_vocab()
    d = tmp_path_factory.mktemp("tok")
    with open(d / "vocab.json", "w") as f:
        json.dump(vocab, f, ensure_ascii=False)
    with open(d / "merges.txt", "w") as f:
        f.write("#version: 0.2\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")
    return str(d)


@pytest.fixture(scope="module")
def ours(fixture_files):
    return ClipTokenizer.from_dir(fixture_files)


@pytest.fixture(scope="module")
def theirs(fixture_files):
    from transformers import CLIPTokenizer

    return CLIPTokenizer(
        os.path.join(fixture_files, "vocab.json"),
        os.path.join(fixture_files, "merges.txt"),
    )


@pytest.mark.parametrize("text", [s for s in SAMPLES if s])
def test_golden_vs_hf(ours, theirs, text):
    assert ours.tokenize(text) == theirs._tokenize(text), text


@pytest.mark.parametrize("text", [s for s in SAMPLES if s])
def test_golden_ids_vs_hf(ours, theirs, text):
    hf = theirs(text, padding="max_length", max_length=77, truncation=True)
    enc = ours([text], max_length=77)
    assert enc["input_ids"][0].tolist() == hf["input_ids"]
    assert enc["attention_mask"][0].tolist() == hf["attention_mask"]


def test_specials_and_padding(ours):
    out = ours(["a cat", ""], max_length=16)
    ids, mask = out["input_ids"], out["attention_mask"]
    assert ids.shape == (2, 16) and mask.shape == (2, 16)
    assert ids[0, 0] == ours.sot_id
    # first EOT is at the argmax position (pad == eot; argmax finds first)
    eot_pos = int(np.argmax(ids[0] == ours.eot_id))
    assert mask[0, : eot_pos + 1].all() and not mask[0, eot_pos + 1 :].any()
    # empty text → [SOT, EOT, pad...]
    assert ids[1, 0] == ours.sot_id and ids[1, 1] == ours.eot_id


def test_truncation(ours):
    long = "word " * 200
    out = ours([long], max_length=77)
    assert out["input_ids"].shape == (1, 77)
    assert out["input_ids"][0, -1] == ours.eot_id
    assert out["attention_mask"][0].sum() == 77


def test_truncation_matches_hf_exactly(ours, theirs):
    """>77-token captions: HF truncates the inner token stream to 75 and
    re-wraps with SOT/EOT; ours must produce the identical 77 ids (advisor
    flagged a suspected divergence here — this golden pins the behavior)."""
    for long in ["kaca mata pink tas ransel " * 40, "a " * 500, "x" * 1000]:
        hf = theirs(long, padding="max_length", max_length=77, truncation=True)
        enc = ours([long], max_length=77)
        assert enc["input_ids"][0].tolist() == hf["input_ids"], long[:40]
        assert enc["attention_mask"][0].tolist() == hf["attention_mask"]


# -- adversarial goldens vs HF (VERDICT r1 item 8) ---------------------------

ADVERSARIAL = [
    # CJK spacing: each han char becomes its own word
    "黑色背包丢失在图书馆",
    "iPhone 13 在 食堂 lost",
    # control characters stripped, \t\n\r treated as whitespace
    "tab\there\x07bell\x1bescape",
    "null\x00byte and � replacement",
    # zero-width (Cf category) characters removed
    "zero\u200bwidth\u200djoiner\ufeffbom",
    # accents: NFC form and its NFD decomposition must tokenize identically
    "caf\u00e9 na\u00efve r\u00e9sum\u00e9",
    "cafe\u0301 nai\u0308ve re\u0301sume\u0301",
    # emoji / astral-plane codepoints (multi-byte UTF-8 through the byte map)
    "lost 🎒 backpack 🧳",
    # uppercase contractions hit the 's/'ll/'ve branches after lowercasing
    "DON'T WE'VE IT'S I'LL THEY'D",
    # mixed digits/symbols/punctuation runs
    "USD$1,234.56 -- 50% off!!! (call +62-812)",
    # non-latin scripts without CJK spacing (cyrillic, arabic)
    "пропал рюкзак في الجامعة",
]


@pytest.mark.parametrize("text", ADVERSARIAL)
def test_adversarial_vs_hf(ours, theirs, text):
    assert ours.tokenize(text) == theirs._tokenize(text), text
    hf = theirs(text, padding="max_length", max_length=77, truncation=True)
    enc = ours([text], max_length=77)
    assert enc["input_ids"][0].tolist() == hf["input_ids"], text


def test_merge_priority_order(tmp_path):
    """Lowest-rank merge must win: with merges [(a,b),(ab,c</w>),(b,c</w>)],
    'abc' → 'abc</w>' (never 'a'+'bc</w>'). Verified against HF on the same
    files."""
    alphabet = [bytes_to_unicode()[b] for b in range(256)]
    vocab = {}
    for ch in alphabet:
        vocab[ch] = len(vocab)
    for ch in alphabet:
        vocab[ch + "</w>"] = len(vocab)
    merges = [("a", "b"), ("ab", "c</w>"), ("b", "c</w>")]
    for a, b in merges:
        tok = a + b
        if tok not in vocab:
            vocab[tok] = len(vocab)
    vocab[SOT_TOKEN] = len(vocab)
    vocab[EOT_TOKEN] = len(vocab)
    with open(tmp_path / "vocab.json", "w") as f:
        json.dump(vocab, f, ensure_ascii=False)
    with open(tmp_path / "merges.txt", "w") as f:
        f.write("#version: 0.2\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")
    mine = ClipTokenizer.from_dir(str(tmp_path))
    assert mine.tokenize("abc") == ["abc</w>"]
    assert mine.tokenize("bc") == ["bc</w>"]
    from transformers import CLIPTokenizer

    hf = CLIPTokenizer(
        str(tmp_path / "vocab.json"), str(tmp_path / "merges.txt")
    )
    for text in ["abc", "bc", "abcabc", "cab"]:
        assert mine.tokenize(text) == hf._tokenize(text), text


def test_roundtrip_fallback():
    tok = ClipTokenizer.from_dir(None)  # byte-level fallback
    for text in ["hello world", "tas pink kanken"]:
        ids = tok.encode(text)
        assert tok.decode(ids) == text
    # digits split into separate words by the CLIP pattern ([\p{N}] is a
    # single digit), so decode re-spaces them — canonical CLIP behavior
    assert tok.decode(tok.encode("abc 123")) == "abc 1 2 3"


def test_fallback_vocab_is_deterministic():
    v1, m1 = build_fallback_vocab_and_merges()
    v2, m2 = build_fallback_vocab_and_merges()
    assert v1 == v2 and m1 == m2
    # EOT must be the max id so argmax pooling finds it (models/clip contract)
    assert v1[EOT_TOKEN] == len(v1) - 1


def test_clean_text():
    assert clean_text("  A\tB\nC  ") == "a b c"
    assert clean_text("HeLLo") == "hello"
    assert clean_text("") == ""
