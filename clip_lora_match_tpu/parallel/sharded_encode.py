"""Multi-chip sharded batch encoding — the index-build scale path.

BASELINE.json: "The index build ... runs ... sharded (pjit over the N axis)".
Batches shard over the mesh's ``data`` axis; params replicate; every chip
encodes its shard and results gather back to host. Ragged tails pad to the
device count and slice off.

Used by index/build via the ``encode_fn`` hook when more than one device is
visible; validated on the 8-virtual-device CPU mesh in tests.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from clip_lora_match_tpu.core.config import ClipArchConfig
from clip_lora_match_tpu.models import clip as clip_model
from clip_lora_match_tpu.parallel.mesh import (
    data_sharded,
    make_mesh,
    pad_to_multiple,
    replicated,
)

from jax.sharding import Mesh


class ShardedEncoder:
    """Data-parallel text/image encoder over a device mesh."""

    def __init__(
        self,
        params,
        arch: ClipArchConfig,
        eot_id: Optional[int] = None,
        lora=None,
        lora_scaling: float = 1.0,
        mesh: Optional[Mesh] = None,
        compute_dtype=None,
    ):
        self.mesh = mesh or make_mesh()
        self.arch = arch
        self.eot_id = eot_id
        rep = replicated(self.mesh)
        self.params = jax.device_put(params, rep)
        self.lora = jax.device_put(lora, rep) if lora is not None else None
        self.lora_scaling = lora_scaling
        self.compute_dtype = compute_dtype
        self.n_devices = self.mesh.devices.size

        @jax.jit
        def _encode_text(params, lora, ids, mask):
            feats = clip_model.encode_text_features(
                params, ids, arch, attention_mask=mask, eot_id=eot_id,
                lora=lora, lora_scaling=lora_scaling,
                compute_dtype=compute_dtype,
            )
            return clip_model.l2_normalize(feats).astype(jnp.float32)

        @jax.jit
        def _encode_image(params, lora, pix):
            feats = clip_model.encode_image_features(
                params, pix, arch,
                lora=lora, lora_scaling=lora_scaling,
                compute_dtype=compute_dtype,
            )
            return clip_model.l2_normalize(feats).astype(jnp.float32)

        self._encode_text = _encode_text
        self._encode_image = _encode_image

    def _shard(self, x: np.ndarray):
        return jax.device_put(x, data_sharded(self.mesh, rank=x.ndim))

    def encode_text_batch(
        self, input_ids: np.ndarray, attention_mask: Optional[np.ndarray] = None
    ) -> np.ndarray:
        n = input_ids.shape[0]
        if n == 0:
            return np.zeros((0, self.arch.projection_dim), np.float32)
        if attention_mask is None:
            attention_mask = np.ones_like(input_ids)
        ids_p, _ = pad_to_multiple(np.asarray(input_ids), self.n_devices)
        mask_p, _ = pad_to_multiple(np.asarray(attention_mask), self.n_devices)
        out = self._encode_text(
            self.params, self.lora, self._shard(ids_p), self._shard(mask_p)
        )
        return np.asarray(out)[:n]

    def encode_image_batch(self, pixel_values: np.ndarray) -> np.ndarray:
        n = pixel_values.shape[0]
        if n == 0:
            return np.zeros((0, self.arch.projection_dim), np.float32)
        pix_p, _ = pad_to_multiple(np.asarray(pixel_values), self.n_devices)
        out = self._encode_image(self.params, self.lora, self._shard(pix_p))
        return np.asarray(out)[:n]


def sharded_text_encode_fn(encoder, mesh: Optional[Mesh] = None):
    """Build an ``encode_fn`` for index.build over a ClipEncoder's params:
    tokenize on host, encode sharded across the mesh."""
    sh = ShardedEncoder(
        encoder.params,
        encoder.arch,
        eot_id=encoder.eot_id,
        lora=encoder.lora,
        lora_scaling=encoder.lora_scaling,
        mesh=mesh,
        compute_dtype=encoder.compute_dtype,
    )

    def encode(texts: Sequence[str]) -> np.ndarray:
        enc = encoder.preprocessor.preprocess_text(list(texts))
        return sh.encode_text_batch(enc["input_ids"], enc["attention_mask"])

    return encode
