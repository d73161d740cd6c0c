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


@partial(jax.jit, static_argnames=("k", "recall_target"))
def _approx_topk_jit(q, cand, k: int, recall_target: float):
    sims = jnp.dot(q, cand.T, preferred_element_type=jnp.float32)
    vals, idx = jax.lax.approx_max_k(sims, k, recall_target=recall_target)
    return vals, idx.astype(jnp.int32)


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
    approximate: bool = False,
    recall_target: float = 0.95,
) -> tuple[np.ndarray, np.ndarray]:
    """→ (scores, indices), k clamped to N (ref:similarity.py:36-58).

    On TPU with a large candidate set this dispatches to the Pallas fused
    normalize+matmul+streaming-topk kernel (ops/retrieval_topk.py); the jnp
    path is the oracle/CPU fallback. ``assume_normalized`` skips re-normalizing
    the candidate rows (EmbeddingIndex already guarantees unit norm).

    ``approximate=True`` (new capability — the reference is exact-only,
    ref:similarity.py:36-58) trades recall for speed via the TPU-native
    ``lax.approx_max_k`` selector at the given ``recall_target`` (expected
    per-query recall vs exact top-k). Measured on v5e it pays in the
    mid-scale window (N ≈ 16k-65k, where exact selection is the bottleneck:
    546k vs 398-510k qps at N=40,960); below that the streaming kernel is
    10x faster anyway, and at HBM scale the exact two-pass path WINS over
    approx (308k vs 153k at N=131k) — so this stays opt-in rather than an
    auto dispatch. Scores materialize as a (Q, N) fp32 tensor; keep Q
    modest at large N. ``recall_target=1.0`` is exact.
    """
    n = candidates.shape[0]
    if n == 0:
        return np.zeros((0,), np.float32), np.zeros((0,), np.int32)
    k = min(k, n)
    single = query.ndim == 1
    if approximate:
        cand = candidates if assume_normalized else l2_normalize(candidates)
        q = l2_normalize(jnp.atleast_2d(query)).astype(cand.dtype)
        scores, idx = _approx_topk_jit(q, cand, k, float(recall_target))
    else:
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
