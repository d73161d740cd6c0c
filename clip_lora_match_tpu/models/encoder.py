"""High-level CLIP encoder — the L1 model-wrapper interface.

Mirrors the reference's public surface (``load_clip_model``, ``encode_image``,
``encode_text`` returning L2-normalized 512-d float32 vectors,
ref:models/clip_model.py:37-150) on top of the from-scratch JAX towers.

TPU-first details the reference lacks:
- encode paths are jit-compiled once per batch-size bucket (powers of two):
  static shapes for XLA, no per-call retrace, padded batches sliced on exit;
- one encoder instance is shared by finder+seeker services (the reference
  loaded the full model twice, ref:src/api/main.py:52-62);
- optional bf16 compute with fp32 accumulation (parity mode keeps fp32).
"""

from __future__ import annotations

import os
import warnings
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from clip_lora_match_tpu.core.config import ClipArchConfig, ClipConfig, load_clip_config
from clip_lora_match_tpu.models import clip as clip_model
from clip_lora_match_tpu.models.io import load_params, save_params
from clip_lora_match_tpu.preprocess.pipeline import ClipPreprocessor

_BUCKETS = (1, 2, 4, 8, 16, 32, 64, 96, 128, 256, 512, 1024)  # 96: v5e image sweet spot

# Text sequence bucket: batches whose real tokens (attention_mask) all fit in
# 64 columns are sliced 77→64 before dispatch — provably identical EOT-pooled
# output (causal mask; see encode_text_batch), one extra jit bucket per shape.
_TEXT_SEQ_SLICE = 64


def _bucket(n: int) -> int:
    for b in _BUCKETS:
        if n <= b:
            return b
    return -(-n // _BUCKETS[-1]) * _BUCKETS[-1]


class ClipEncoder:
    """Stateful convenience wrapper around the functional CLIP model."""

    def __init__(
        self,
        params,
        arch: ClipArchConfig | None = None,
        config: ClipConfig | None = None,
        lora=None,
        lora_scaling: float = 1.0,
        compute_dtype: Optional[str] = None,
        quantize: Optional[str] = None,
    ):
        self.cfg = config or ClipConfig()
        self.arch = arch or self.cfg.arch
        self.params = params
        self.lora = lora
        self.lora_scaling = lora_scaling
        # int8 W8A8 serving (quant/int8.py): derived from params lazily, so
        # weight swaps (merge_lora, attach) stay cheap until next encode
        self.quantize = quantize if quantize is not None else self.cfg.quantize
        if self.quantize not in ("none", "int8"):
            raise ValueError(f"unknown quantize mode {self.quantize!r}")
        self._qparams = None
        # Matmul dtype resolution: explicit arg wins; otherwise the YAML
        # `compute_dtype` knob (default bfloat16) applies on TPU, while CPU
        # parity runs follow the fp32 storage dtype. Pass "float32" to force
        # full precision on TPU.
        if compute_dtype is not None:
            dt = compute_dtype
        elif jax.default_backend() == "tpu":
            dt = self.cfg.compute_dtype
        else:
            dt = self.cfg.dtype
        self.compute_dtype = jnp.dtype(dt) if dt not in (None, "float32") else None
        self.preprocessor = ClipPreprocessor(config=self.cfg)
        self.eot_id = self.preprocessor.tokenizer.eot_id
        self._jit_cache: dict = {}
        if self.cfg.compilation_cache_dir:
            # Persistent executable cache: a service restart replays every
            # warm jit bucket from disk instead of re-paying the 20-40 s
            # cold compile. Process-wide (jax config), idempotent.
            os.makedirs(self.cfg.compilation_cache_dir, exist_ok=True)
            jax.config.update(
                "jax_compilation_cache_dir", self.cfg.compilation_cache_dir
            )
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        # full scan unroll is a measured ~5% serving win on TPU (removes the
        # per-layer scan machinery); keep scan form on CPU for compile speed
        self._unroll = True if jax.default_backend() == "tpu" else 1
        if self.cfg.use_pallas_kernels:
            from clip_lora_match_tpu.nn.layers import set_kernel_flags

            on_tpu = jax.default_backend() == "tpu"
            # serving dispatch (measured, docs/DESIGN.md §7.3): the
            # small-sequence attention kernel wins ~20% in-tower at the image
            # tower's S=50 but loses at the text tower's S=77 (pads to 128),
            # so layers.py gates it at SMALL_ATTN_MAX_SEQ=64; flash "auto"
            # resolves to XLA at every supported CLIP geometry (the r3
            # in-tower table: flash loses at S=197/257/577 too) — the flag
            # stays "auto" so a re-measured gate applies here without code
            # changes; fused-LoRA fuses the adapter delta into the base
            # matmul. All TPU-only — CPU keeps the jnp oracle paths.
            set_kernel_flags(
                fused_lora=on_tpu,
                flash_attention="auto",
                small_attention=on_tpu,
                interpret=not on_tpu,
            )

    # -- construction ---------------------------------------------------------

    @classmethod
    def from_config(
        cls,
        config_path: Optional[str] = None,
        weights_path: Optional[str] = None,
        lora_path: Optional[str] = None,
        seed: int = 0,
    ) -> "ClipEncoder":
        """Build from YAML config; loads .npz weights when given/found, else
        random-inits (with a warning — no silent pretenses of pretraining).

        Missing LoRA path warns and continues with base weights, matching
        ref:models/clip_model.py:74-75.
        """
        cfg = load_clip_config(config_path)
        arch = cfg.arch
        if weights_path and os.path.exists(weights_path):
            params = load_params(weights_path)
        else:
            if weights_path:
                warnings.warn(f"weights not found at {weights_path}; random init")
            else:
                warnings.warn("no weights_path given; using random initialization")
            params = clip_model.init_params(jax.random.PRNGKey(seed), arch)
        enc = cls(params, arch=arch, config=cfg)
        if lora_path:
            from clip_lora_match_tpu.lora.adapter import load_lora

            if os.path.exists(lora_path):
                lora_params, scaling = load_lora(lora_path)
                enc.lora, enc.lora_scaling = lora_params, scaling
            else:
                warnings.warn(f"LoRA weights not found at {lora_path}; using base model")
        return enc

    # -- LoRA -----------------------------------------------------------------

    def attach_lora(self, lora_params, scaling: float) -> None:
        self.lora = lora_params
        self.lora_scaling = scaling
        self._jit_cache.clear()

    def merge_lora(self) -> None:
        """Fold the adapter into the base weights (W' = W + s·A@B) and drop it."""
        from clip_lora_match_tpu.lora.adapter import merge_lora

        if self.lora is not None:
            self.params = merge_lora(self.params, self.lora, self.lora_scaling)
            self.lora = None
            self._qparams = None
            self._jit_cache.clear()

    # -- serving weights ---------------------------------------------------------

    def _serving_params(self):
        """Params tree the compiled encode fns consume: the int8-quantized
        mirror under quantize="int8" (derived once, cached), else the master
        float tree. LoRA adapters stay float either way — exact under int8."""
        if self.quantize == "int8":
            if self._qparams is None:
                from clip_lora_match_tpu.quant.int8 import quantize_clip_params

                self._qparams = quantize_clip_params(self.params)
            return self._qparams
        return self.params

    # -- compiled kernels ------------------------------------------------------

    def _image_fn(self, normalize: bool = True):
        from clip_lora_match_tpu.nn.layers import get_kernel_flags

        key = ("img", self.lora is not None, normalize, get_kernel_flags())
        if key not in self._jit_cache:

            @partial(jax.jit, static_argnames=())
            def fn(params, lora, pixel_values):
                feats = clip_model.encode_image_features(
                    params,
                    pixel_values,
                    self.arch,
                    lora=lora,
                    lora_scaling=self.lora_scaling,
                    compute_dtype=self.compute_dtype,
                    unroll=self._unroll,
                )
                if normalize:
                    feats = clip_model.l2_normalize(feats)
                return feats.astype(jnp.float32)

            self._jit_cache[key] = fn
        return self._jit_cache[key]

    def _image_fn_u8(self, normalize: bool = True):
        """uint8-feed variant: scale + CLIP mean/std normalization happen
        ON-DEVICE so the host→HBM transfer is 4x smaller than fp32 — the
        dominant cost of the jpeg→embedding pipeline through the relay."""
        from clip_lora_match_tpu.nn.layers import get_kernel_flags

        key = ("img_u8", self.lora is not None, normalize, get_kernel_flags())
        if key not in self._jit_cache:
            mean = jnp.asarray(self.cfg.preprocess.mean, jnp.float32)
            std = jnp.asarray(self.cfg.preprocess.std, jnp.float32)

            @jax.jit
            def fn(params, lora, pixels_u8):
                x = pixels_u8.astype(jnp.float32) / 255.0
                x = (x - mean) / std
                if self.compute_dtype is not None:
                    x = x.astype(self.compute_dtype)
                feats = clip_model.encode_image_features(
                    params,
                    x,
                    self.arch,
                    lora=lora,
                    lora_scaling=self.lora_scaling,
                    compute_dtype=self.compute_dtype,
                    unroll=self._unroll,
                )
                if normalize:
                    feats = clip_model.l2_normalize(feats)
                return feats.astype(jnp.float32)

            self._jit_cache[key] = fn
        return self._jit_cache[key]

    def _text_fn(self, normalize: bool = True):
        from clip_lora_match_tpu.nn.layers import get_kernel_flags

        key = ("txt", self.lora is not None, normalize, get_kernel_flags())
        if key not in self._jit_cache:

            @partial(jax.jit, static_argnames=())
            def fn(params, lora, input_ids, attention_mask):
                # Serving drops the padding mask: pad tokens sit AFTER the
                # EOT position, and under causal masking later tokens cannot
                # influence earlier ones, so the EOT-pooled embedding is
                # provably identical (tests/test_clip_parity.py::
                # test_text_pooling_without_mask_matches). The causal-only
                # (1,1,S,S) mask is batch-invariant, which lets the small-
                # attention kernel stream it as one shared block.
                del attention_mask
                feats = clip_model.encode_text_features(
                    params,
                    input_ids,
                    self.arch,
                    attention_mask=None,
                    eot_id=self.eot_id,
                    lora=lora,
                    lora_scaling=self.lora_scaling,
                    compute_dtype=self.compute_dtype,
                    unroll=self._unroll,
                )
                if normalize:
                    feats = clip_model.l2_normalize(feats)
                return feats.astype(jnp.float32)

            self._jit_cache[key] = fn
        return self._jit_cache[key]

    # -- batched encode (bucketed static shapes) --------------------------------

    def encode_image_batch(self, pixel_values: np.ndarray, normalize: bool = True) -> np.ndarray:
        """(N, H, W, 3) float32 → (N, 512) float32 embeddings."""
        n = pixel_values.shape[0]
        if n == 0:
            return np.zeros((0, self.arch.projection_dim), np.float32)
        b = _bucket(n)
        if b != n:
            pad = np.zeros((b - n,) + pixel_values.shape[1:], pixel_values.dtype)
            pixel_values = np.concatenate([pixel_values, pad])
        out = self._image_fn(normalize)(
            self._serving_params(), self.lora, jnp.asarray(pixel_values)
        )
        return np.asarray(out[:n])

    def encode_text_batch(
        self,
        input_ids: np.ndarray,
        attention_mask: Optional[np.ndarray] = None,
        normalize: bool = True,
    ) -> np.ndarray:
        n = input_ids.shape[0]
        if n == 0:
            return np.zeros((0, self.arch.projection_dim), np.float32)
        if attention_mask is None:
            attention_mask = np.ones_like(input_ids)
        # Sequence slicing: the wire contract pads every text to 77
        # (docs/PARITY.md), but under causal masking trailing all-pad
        # columns cannot influence the EOT-pooled embedding (same argument
        # as the mask drop below), so when the whole batch's real tokens
        # fit in 64 columns we compute at S=64 — 17% fewer tower FLOPs AND
        # it brings the text tower under the small-attention kernel's
        # S<=64 gate (ops/attention_small.py), which the always-77 shape
        # kept it out of.
        if (
            input_ids.shape[1] > _TEXT_SEQ_SLICE
            and not attention_mask[:, _TEXT_SEQ_SLICE:].any()
            # belt-and-braces: the EOT pooling position must survive the
            # slice for every row (guards a mask convention that didn't
            # count the EOT as a real token)
            and (input_ids[:, :_TEXT_SEQ_SLICE] == self.eot_id).any(axis=1).all()
        ):
            input_ids = input_ids[:, :_TEXT_SEQ_SLICE]
            attention_mask = attention_mask[:, :_TEXT_SEQ_SLICE]
        b = _bucket(n)
        if b != n:
            pad_ids = np.full((b - n, input_ids.shape[1]), self.eot_id, input_ids.dtype)
            pad_mask = np.zeros((b - n, input_ids.shape[1]), attention_mask.dtype)
            input_ids = np.concatenate([input_ids, pad_ids])
            attention_mask = np.concatenate([attention_mask, pad_mask])
        out = self._text_fn(normalize)(
            self._serving_params(), self.lora, jnp.asarray(input_ids), jnp.asarray(attention_mask)
        )
        return np.asarray(out[:n])

    # -- reference-parity convenience API ---------------------------------------

    def encode_image(self, img: str | Image.Image | Sequence, normalize: bool = True) -> np.ndarray:
        """Single path/PIL → (512,); list → (N, 512). L2-normalized float32,
        like ref:models/clip_model.py:89-118 / ref:src/embedding/embed_image.py."""
        single = isinstance(img, (str, Image.Image))
        items = [img] if single else list(img)
        pix = self.preprocessor.preprocess_images(items)
        out = self.encode_image_batch(pix, normalize=normalize)
        return out[0] if single else out

    def encode_image_files(
        self,
        paths: Sequence[str],
        batch_size: int = 96,
        normalize: bool = True,
        num_threads: Optional[int] = None,
        dct_scale: Optional[bool] = None,
    ) -> np.ndarray:
        """JPEG paths → (N, 512) embeddings with the host decode OVERLAPPED
        against device compute: the C++ loader (native/clm_native.cpp,
        libjpeg + thread pool) preprocesses batch i+1 on a background thread
        while the TPU encodes batch i. This is the end-to-end form of the
        flagship index-build workload (ref:scripts/build_text_index.py:57-62
        encoded one item per forward with no batching, let alone overlap).

        ``dct_scale`` (default ON here): decode large JPEGs at the smallest
        libjpeg N/8 scale covering the 224 short side — 6× host decode on
        photo-sized inputs, embedding cosine ≥0.999 vs the full decode
        (tests/test_native_loader.py). Pass False for strict PIL pixel
        parity."""
        from clip_lora_match_tpu.data.dataset import prefetch
        from clip_lora_match_tpu.data.native_loader import (
            preprocess_image_batch_native_u8,
        )

        if dct_scale is None:
            dct_scale = True
        n = len(paths)
        if n == 0:
            return np.zeros((0, self.arch.projection_dim), np.float32)

        def batches():
            for i in range(0, n, batch_size):
                yield preprocess_image_batch_native_u8(
                    paths[i : i + batch_size],
                    cfg=self.cfg.preprocess,
                    num_threads=num_threads,
                    dct_scale=dct_scale,
                )

        from collections import deque

        fn = self._image_fn_u8(normalize)
        out = np.empty((n, self.arch.projection_dim), np.float32)
        row = 0
        # Readback lags dispatch by up to 3 batches: jax dispatch is async,
        # so keeping several batches in flight lets the device (and, through
        # the relay, its round-trip latency) overlap host-side readbacks —
        # with a single pending slot each loop iteration blocked on batch
        # i-1 while only batch i was queued, serializing RTT per batch.
        pending: deque = deque()  # (device_array, row, b)
        for u8 in prefetch(batches(), depth=2):
            b = u8.shape[0]
            bb = _bucket(b)
            if bb != b:
                u8 = np.concatenate(
                    [u8, np.zeros((bb - b,) + u8.shape[1:], u8.dtype)]
                )
            emb = fn(self._serving_params(), self.lora, jnp.asarray(u8))
            pending.append((emb, row, b))
            if len(pending) > 3:
                p_emb, p_row, p_b = pending.popleft()
                out[p_row : p_row + p_b] = np.asarray(p_emb[:p_b])
            row += b
        while pending:
            p_emb, p_row, p_b = pending.popleft()
            out[p_row : p_row + p_b] = np.asarray(p_emb[:p_b])
        return out

    def encode_text(self, text: str | Sequence[str], normalize: bool = True) -> np.ndarray:
        """Single str → (512,); list → (N, 512) (ref:models/clip_model.py:121-150,
        ref:src/embedding/embed_text.py:11-60)."""
        single = isinstance(text, str)
        enc = self.preprocessor.preprocess_text(text)
        out = self.encode_text_batch(enc["input_ids"], enc["attention_mask"], normalize)
        return out[0] if single else out

    def save(self, path: str) -> None:
        save_params(path, self.params)


def load_clip_model(
    config_path: Optional[str] = None,
    lora_path: Optional[str] = None,
    weights_path: Optional[str] = None,
) -> ClipEncoder:
    """Drop-in analogue of ref:models/clip_model.py:37-82."""
    return ClipEncoder.from_config(
        config_path=config_path, weights_path=weights_path, lora_path=lora_path
    )
