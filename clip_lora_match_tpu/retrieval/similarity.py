"""Cosine similarity + top-k retrieval math.

JAX equivalents of ref:src/embedding/similarity.py:10-58 — normalize both
sides, one query×candidates matmul, top-k with k clamped to N. The jnp path
here is the correctness oracle; the Pallas fused kernel (ops/retrieval_topk.py)
implements the same contract for HBM-scale indexes and is validated against
this implementation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps)


def cosine_similarity(query: jnp.ndarray, candidates: jnp.ndarray) -> jnp.ndarray:
    """(D,)|(Q,D) × (N,D) → (N,)|(Q,N) cosine scores (ref:similarity.py:10-33)."""
    q = l2_normalize(jnp.atleast_2d(query))
    c = l2_normalize(candidates)
    sims = jnp.dot(q, c.T, preferred_element_type=jnp.float32)
    return sims[0] if query.ndim == 1 else sims


@partial(jax.jit, static_argnames=("k",))
def _topk_jit(sims: jnp.ndarray, k: int):
    return jax.lax.top_k(sims, k)


def _use_pallas(n: int) -> bool:
    """The fused kernel pays off once the index spills past one VMEM tile and
    only compiles on TPU."""
    try:
        return jax.default_backend() == "tpu" and n >= 2048
    except Exception:
        return False


def top_k_similar(
    query: jnp.ndarray,
    candidates: jnp.ndarray,
    k: int = 5,
    assume_normalized: bool = False,
    use_pallas: bool | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """→ (scores, indices), k clamped to N (ref:similarity.py:36-58).

    On TPU with a large candidate set this dispatches to the Pallas fused
    normalize+matmul+streaming-topk kernel (ops/retrieval_topk.py); the jnp
    path is the oracle/CPU fallback. ``assume_normalized`` skips re-normalizing
    the candidate rows (EmbeddingIndex already guarantees unit norm).
    """
    n = candidates.shape[0]
    if n == 0:
        return np.zeros((0,), np.float32), np.zeros((0,), np.int32)
    k = min(k, n)
    single = query.ndim == 1
    if use_pallas is None:
        use_pallas = _use_pallas(n) and assume_normalized
    if use_pallas:
        from clip_lora_match_tpu.ops.retrieval_topk import topk_retrieve_auto

        scores, idx = topk_retrieve_auto(jnp.atleast_2d(query), candidates, k)
    else:
        cand = candidates if assume_normalized else l2_normalize(candidates)
        q = l2_normalize(jnp.atleast_2d(query))
        sims = jnp.dot(q, cand.T, preferred_element_type=jnp.float32)
        scores, idx = _topk_jit(sims, k)
    if single:
        return np.asarray(scores[0]), np.asarray(idx[0])
    return np.asarray(scores), np.asarray(idx)
