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


def top_k_similar(
    query: jnp.ndarray, candidates: jnp.ndarray, k: int = 5
) -> tuple[np.ndarray, np.ndarray]:
    """→ (scores, indices), k clamped to N (ref:similarity.py:36-58)."""
    n = candidates.shape[0]
    if n == 0:
        return np.zeros((0,), np.float32), np.zeros((0,), np.int32)
    k = min(k, n)
    sims = cosine_similarity(query, candidates)
    scores, idx = _topk_jit(jnp.atleast_2d(sims), k)
    if query.ndim == 1 or (hasattr(query, "ndim") and query.ndim == 1):
        return np.asarray(scores[0]), np.asarray(idx[0])
    return np.asarray(scores), np.asarray(idx)
