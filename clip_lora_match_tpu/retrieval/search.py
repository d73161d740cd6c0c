"""Search front-end over an EmbeddingIndex.

API mirror of the reference's ``TextSearchIndex``/``SearchResult``
(ref:src/embedding/search.py:14-151): shape-validated queries, normalized
scores, top-k results with safe metadata — but the index stays device-resident
between calls and the encoder is injected (one shared model, not re-loaded
per service like ref:src/api/main.py:52-62).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional

import numpy as np
from PIL import Image

from clip_lora_match_tpu.index.store import EmbeddingIndex
from clip_lora_match_tpu.models.encoder import ClipEncoder
from clip_lora_match_tpu.retrieval.similarity import top_k_similar


@dataclass
class SearchResult:
    """ref:src/embedding/search.py:14-20."""

    index: int
    score: float
    image_path: Optional[str]
    text: Optional[str]


class SearchIndex:
    """Top-k cosine search over an embedding index."""

    def __init__(
        self,
        index: EmbeddingIndex | str,
        encoder: Optional[ClipEncoder] = None,
        dim: int = 512,
        approximate: bool = False,
        recall_target: float = 0.95,
        quantize: str = "none",
    ):
        # drop-in parity: the reference constructs from a path
        # (ref:src/embedding/search.py:24 ``TextSearchIndex(index_path)``)
        if isinstance(index, (str, os.PathLike)):
            index = EmbeddingIndex.load(str(index), dim=dim)
        self.index = index
        self.encoder = encoder
        # opt-in approximate selection (lax.approx_max_k); exact by default —
        # see top_k_similar's docstring for the measured dispatch rationale
        self.approximate = approximate
        self.recall_target = recall_target
        # quantize="int8": per-row int8 index (half/quarter the HBM, int8 MXU
        # rate) — selection exact over the quantized scores, quantization the
        # only approximation (recall@10 ≈ 0.98 on worst-case random data;
        # ops/retrieval_topk.py module comment). Cache keyed on index size so
        # finder appends invalidate it.
        if quantize not in ("none", "int8"):
            raise ValueError(f"quantize must be 'none' or 'int8', got {quantize!r}")
        self.quantize = quantize
        self._q8: Optional[tuple] = None

    def _q8_state(self):
        """(values, scales) for the current index rows; caller holds the lock."""
        n = len(self.index)
        if self._q8 is not None and self._q8[0] == n:
            return self._q8[1], self._q8[2]
        import jax.numpy as jnp

        from clip_lora_match_tpu.ops.retrieval_topk import quantize_index_int8

        if self._q8 is not None and 0 < self._q8[0] < n:
            # EmbeddingIndex is append-only (live rows are never rewritten)
            # and per-row scales are independent, so growth only needs the
            # NEW rows quantized — an int8 byte-copy concat instead of a
            # full O(N·D) requantize whose fp32 cast transient (multi-GB at
            # production scale) would stall every search after an append.
            n0, vq0, sc0 = self._q8
            vq1, sc1 = quantize_index_int8(
                self.index.embeddings[n0:].astype(jnp.float32)
            )
            vq = jnp.concatenate([vq0, vq1])
            sc = jnp.concatenate([sc0, sc1])
        else:
            vq, sc = quantize_index_int8(
                self.index.embeddings.astype(jnp.float32)
            )
        self._q8 = (n, vq, sc)
        return vq, sc

    def _topk(self, queries_2d: np.ndarray, k: int):
        """Dispatch one (Q, D) batch under the index lock."""
        if self.quantize == "int8":
            from clip_lora_match_tpu.ops.retrieval_topk import topk_retrieve_q8

            vq, sc = self._q8_state()
            s, i = topk_retrieve_q8(queries_2d, vq, sc, k)
            return np.atleast_2d(np.asarray(s)), np.atleast_2d(np.asarray(i))
        s, i = top_k_similar(
            queries_2d, self.index.embeddings, k, assume_normalized=True,
            approximate=self.approximate, recall_target=self.recall_target,
        )
        return np.atleast_2d(np.asarray(s)), np.atleast_2d(np.asarray(i))

    @classmethod
    def from_file(
        cls,
        path: str,
        encoder: Optional[ClipEncoder] = None,
        dim: int = 512,
        approximate: bool = False,
        recall_target: float = 0.95,
    ) -> "SearchIndex":
        return cls(
            EmbeddingIndex.load(path, dim=dim), encoder,
            approximate=approximate, recall_target=recall_target,
        )

    def search_with_embedding(
        self, query: np.ndarray, k: int = 5
    ) -> list[SearchResult]:
        """(D,) or (1,D) query → top-k results (ref:search.py:70-115)."""
        q = np.asarray(query, np.float32)
        if q.ndim == 2 and q.shape[0] == 1:
            q = q[0]
        if q.ndim != 1:
            raise ValueError(f"query must be (D,) or (1,D), got {q.shape}")
        if q.shape[0] != self.index.dim:
            raise ValueError(
                f"query dim {q.shape[0]} != index dim {self.index.dim}"
            )
        if len(self.index) == 0:
            return []
        # hold the index lock through dispatch+materialization: an append's
        # donated-buffer swap while we read would hand us a deleted array
        with self.index.lock:
            scores, idx = self._topk(q[None], k)
        scores, idx = scores[0], idx[0]
        results = []
        for s, i in zip(scores, idx):
            path, text = self.index.metadata(int(i))
            results.append(SearchResult(int(i), float(s), path, text))
        return results

    def _require_encoder(self) -> ClipEncoder:
        if self.encoder is None:
            raise RuntimeError("SearchIndex has no encoder attached")
        return self.encoder

    def search_by_text(self, text: str, k: int = 5) -> list[SearchResult]:
        """ref:search.py:117-131."""
        emb = self._require_encoder().encode_text(text)
        return self.search_with_embedding(emb, k)

    def search_by_image(
        self, image: str | Image.Image, k: int = 5
    ) -> list[SearchResult]:
        """ref:search.py:133-151."""
        emb = self._require_encoder().encode_image(image)
        return self.search_with_embedding(emb, k)

    def search_batch(
        self, queries: np.ndarray, k: int = 5
    ) -> list[list[SearchResult]]:
        """Batched query matrix (Q, D) → per-query result lists (new: the
        reference had no batched search path)."""
        queries = np.asarray(queries, np.float32)
        if len(self.index) == 0:
            return [[] for _ in range(queries.shape[0])]
        with self.index.lock:
            scores, idx = self._topk(queries, k)
        out = []
        for qs, qi in zip(scores, idx):
            row = []
            for s, i in zip(qs, qi):
                path, text = self.index.metadata(int(i))
                row.append(SearchResult(int(i), float(s), path, text))
            out.append(row)
        return out


# Backwards-friendly alias matching the reference class name
TextSearchIndex = SearchIndex
