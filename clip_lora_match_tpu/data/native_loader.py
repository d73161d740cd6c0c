"""ctypes bridge to the C++ data loader (native/clm_native.cpp).

Decode → resize → crop → normalize for JPEG batches runs in native threads
(libjpeg + PIL-algorithm cubic resampling); non-JPEG or failed rows fall back
to the Python/PIL pipeline transparently, so callers always get a full batch.

The shared library is built on demand with the system g++ (no pybind11 —
plain C ABI) and cached next to the source.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

from clip_lora_match_tpu.core.config import PreprocessConfig
from clip_lora_match_tpu.core.logging import get_logger

log = get_logger("native")

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO_PATH = os.path.join(_NATIVE_DIR, "libclm_native.so")
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "clm_native.cpp")
    if not os.path.exists(src):
        return False
    cmd = [
        "g++", "-O3", "-fPIC", "-shared", "-std=c++17",
        "-o", _SO_PATH, src, "-ljpeg", "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:
        log.warning("native loader build failed: %s", e)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None when unavailable."""
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    if not os.path.exists(_SO_PATH) or (
        os.path.exists(os.path.join(_NATIVE_DIR, "clm_native.cpp"))
        and os.path.getmtime(os.path.join(_NATIVE_DIR, "clm_native.cpp"))
        > os.path.getmtime(_SO_PATH)
    ):
        if not _build():
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
        # v3 ABI: trailing int enables DCT-domain scaled decode
        if lib.clm_native_version() < 3:
            # stale artifact with a NEWER mtime than the source (copied .so,
            # clock skew): don't give up for the whole process — delete it
            # and rebuild once (advisor r4)
            del lib
            log.warning("stale libclm_native.so (ABI < 3); rebuilding")
            os.remove(_SO_PATH)
            if not _build():
                raise RuntimeError("rebuild after stale ABI failed")
            lib = ctypes.CDLL(_SO_PATH)
            if lib.clm_native_version() < 3:
                raise RuntimeError("rebuilt libclm_native.so still ABI < 3")
        lib.clm_preprocess_batch.restype = ctypes.c_int
        lib.clm_preprocess_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte),
            ctypes.c_int,
        ]
        lib.clm_preprocess_batch_u8.restype = ctypes.c_int
        lib.clm_preprocess_batch_u8.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte),
            ctypes.c_int,
        ]
        _lib = lib
        return _lib
    except Exception as e:
        log.warning("native loader unavailable: %s", e)
        _build_failed = True
        return None


def native_available() -> bool:
    return get_lib() is not None


def _dct_scale_default() -> bool:
    """DCT-domain scaled decode (libjpeg scale_num/denom): decode at the
    smallest N/8 scale that still covers the target short side, then cubic to
    exact size. Skips most of the IDCT + resample work for large photos
    (measured 51 → 320 img/s at 1200×1600 on this host); the lowpass differs
    slightly from a full decode, so the DEFAULT here is OFF (strict PIL
    pixel parity) and the throughput path (ClipEncoder.encode_image_files)
    opts in — embedding parity stays ≥0.999 (tests/test_native_loader.py).
    CLM_NATIVE_DCT_SCALE=1 flips the global default."""
    return os.environ.get("CLM_NATIVE_DCT_SCALE", "0") not in ("0", "false")


def preprocess_image_batch_native(
    paths: Sequence[str],
    cfg: Optional[PreprocessConfig] = None,
    num_threads: Optional[int] = None,
    dct_scale: Optional[bool] = None,
) -> np.ndarray:
    """(paths) → (N, S, S, 3) float32; failed rows redone via the PIL path."""
    cfg = cfg or PreprocessConfig()
    if dct_scale is None:
        dct_scale = _dct_scale_default()
    n = len(paths)
    size = cfg.image_size
    out = np.empty((n, size, size, 3), np.float32)
    if n == 0:
        return out
    lib = get_lib()
    ok = np.zeros(n, np.uint8)
    if lib is not None:
        c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        mean = np.asarray(cfg.mean, np.float32)
        std = np.asarray(cfg.std, np.float32)
        lib.clm_preprocess_batch(
            c_paths,
            n,
            size,
            mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            num_threads or max(1, (os.cpu_count() or 1)),
            ok.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            int(dct_scale),
        )
    # fallback rows (non-JPEG, corrupt, or native lib missing)
    if not ok.all():
        from clip_lora_match_tpu.preprocess.image import preprocess_image

        for i in np.flatnonzero(ok == 0):
            out[i] = preprocess_image(paths[i], cfg)
    return out


def preprocess_image_batch_native_u8(
    paths: Sequence[str],
    cfg: Optional[PreprocessConfig] = None,
    num_threads: Optional[int] = None,
    dct_scale: Optional[bool] = None,
) -> np.ndarray:
    """(paths) → (N, S, S, 3) uint8 RGB, resized + center-cropped but NOT
    normalized. Feeding uint8 and normalizing on-device is 4x less
    host→device traffic than the fp32 variant — the dominant cost of the
    end-to-end jpeg→embedding path through the TPU relay."""
    cfg = cfg or PreprocessConfig()
    if dct_scale is None:
        dct_scale = _dct_scale_default()
    n = len(paths)
    size = cfg.image_size
    out = np.empty((n, size, size, 3), np.uint8)
    if n == 0:
        return out
    lib = get_lib()
    ok = np.zeros(n, np.uint8)
    if lib is not None:
        c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        lib.clm_preprocess_batch_u8(
            c_paths,
            n,
            size,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            num_threads or max(1, (os.cpu_count() or 1)),
            ok.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            int(dct_scale),
        )
    if not ok.all():
        from clip_lora_match_tpu.preprocess.image import load_resized_cropped_u8

        for i in np.flatnonzero(ok == 0):
            out[i] = load_resized_cropped_u8(paths[i], cfg)
    return out
