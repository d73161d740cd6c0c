"""ctypes bridge to the C++ BPE merge core (native/clm_bpe.cpp).

Cleaning and word splitting stay in Python (exact CLIP semantics, validated
against HF goldens); only the greedy merge loop — the hot path for cold
large-corpus tokenization — moves to C++. Drop-in accelerator for
``ClipTokenizer``; identical output, shared per-word cache.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

from clip_lora_match_tpu.core.logging import get_logger

log = get_logger("native_bpe")

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO_PATH = os.path.join(_NATIVE_DIR, "libclm_bpe.so")
_lib = None
_failed = False


def _get_lib():
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    src = os.path.join(_NATIVE_DIR, "clm_bpe.cpp")
    try:
        if not os.path.exists(_SO_PATH) or (
            os.path.exists(src)
            and os.path.getmtime(src) > os.path.getmtime(_SO_PATH)
        ):
            subprocess.run(
                ["g++", "-O3", "-fPIC", "-shared", "-std=c++17",
                 "-o", _SO_PATH, src],
                check=True, capture_output=True, timeout=120,
            )
        lib = ctypes.CDLL(_SO_PATH)
        lib.clm_bpe_init.restype = ctypes.c_void_p
        lib.clm_bpe_init.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32, ctypes.c_int32,
        ]
        lib.clm_bpe_free.argtypes = [ctypes.c_void_p]
        lib.clm_bpe_encode_word.restype = ctypes.c_int32
        lib.clm_bpe_encode_word.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ]
        assert lib.clm_bpe_version() >= 1
        _lib = lib
    except Exception as e:
        log.info("native BPE unavailable (%s); using python merges", e)
        _failed = True
    return _lib


def native_bpe_available() -> bool:
    return _get_lib() is not None


class NativeBPE:
    """Holds a native model handle for one (vocab, merges) table."""

    def __init__(self, vocab: dict[str, int], merges_ranked: list[tuple[str, str]],
                 unk_id: int):
        lib = _get_lib()
        if lib is None:
            raise RuntimeError("native BPE library unavailable")
        self._lib = lib
        toks = list(vocab.items())
        tok_bytes = [t.encode() for t, _ in toks]
        c_tokens = (ctypes.c_char_p * len(toks))(*tok_bytes)
        c_tlens = (ctypes.c_int32 * len(toks))(*[len(b) for b in tok_bytes])
        c_tids = (ctypes.c_int32 * len(toks))(*[i for _, i in toks])
        a_bytes = [a.encode() for a, _ in merges_ranked]
        b_bytes = [b.encode() for _, b in merges_ranked]
        c_a = (ctypes.c_char_p * len(a_bytes))(*a_bytes)
        c_al = (ctypes.c_int32 * len(a_bytes))(*[len(x) for x in a_bytes])
        c_b = (ctypes.c_char_p * len(b_bytes))(*b_bytes)
        c_bl = (ctypes.c_int32 * len(b_bytes))(*[len(x) for x in b_bytes])
        self._handle = lib.clm_bpe_init(
            c_tokens, c_tlens, c_tids, len(toks),
            c_a, c_al, c_b, c_bl, len(a_bytes), unk_id,
        )
        self._out = (ctypes.c_int32 * 512)()
        # one shared output buffer → concurrent encode_word calls would
        # corrupt each other's token ids; the native call itself is
        # re-entrant per handle, so a lock around buffer use suffices
        self._out_lock = threading.Lock()

    def encode_word(self, byte_word: str) -> Optional[list[int]]:
        """Byte-alphabet word → token ids, or None on overflow. Thread-safe."""
        data = byte_word.encode()
        with self._out_lock:
            n = self._lib.clm_bpe_encode_word(
                self._handle, data, len(data), self._out, len(self._out)
            )
            if n < 0:
                return None
            return list(self._out[:n])

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.clm_bpe_free(self._handle)
        except Exception:
            pass
