"""Retrieval evaluation protocols.

Two protocols, matching the reference's two evaluators:

1. **Diagonal ground truth** (ref:scripts/evaluate_model.py:38-107): the i-th
   image matches the i-th caption. recall@k = diagonal-in-top-k, MRR, mAP =
   mean(1/rank), matching accuracy = argmax==diagonal; computed for both
   image→text and text→image over the (N, N) similarity matrix.

2. **Threshold relevance** (ref:scripts/evaluate.py:24,141-168): any index
   item with cosine ≥ 0.7 to the query counts as relevant; recall/precision@k
   against that set, MRR of the first relevant hit, average precision, plus
   ``avg_query_time_ms`` (ref L231-266).

All metric math runs as jnp ops on the device-resident similarity matrix —
one batched encode + one matmul per protocol instead of the reference's
per-sample loops.
"""

from __future__ import annotations

import time
from typing import Sequence

import jax.numpy as jnp
import numpy as np


def similarity_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Cosine sim matrix of L2-normalized inputs (normalizes defensively)."""
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    a = a / np.maximum(np.linalg.norm(a, axis=1, keepdims=True), 1e-12)
    b = b / np.maximum(np.linalg.norm(b, axis=1, keepdims=True), 1e-12)
    return np.asarray(
        jnp.dot(jnp.asarray(a), jnp.asarray(b).T, preferred_element_type=jnp.float32)
    )


def _diagonal_ranks(sim: np.ndarray) -> np.ndarray:
    """1-based rank of the diagonal entry within each row (ties: items with a
    strictly greater score outrank the target)."""
    diag = np.diagonal(sim)
    return 1 + (sim > diag[:, None]).sum(axis=1)


def diagonal_metrics(
    image_embeds: np.ndarray,
    text_embeds: np.ndarray,
    ks: Sequence[int] = (1, 5, 10),
) -> dict:
    """Both-direction diagonal-GT metrics in the model_comparison.json shape
    (keys: recall@k, mrr, map, t2i_recall@k, matching_accuracy)."""
    sim = similarity_matrix(image_embeds, text_embeds)  # (N, N) i2t
    out: dict = {}
    i2t_ranks = _diagonal_ranks(sim)
    for k in ks:
        out[f"recall@{k}"] = float((i2t_ranks <= k).mean())
    out["mrr"] = float((1.0 / i2t_ranks).mean())
    out["map"] = out["mrr"]  # single relevant item ⇒ AP == 1/rank (ref L92-107)
    t2i_ranks = _diagonal_ranks(sim.T)
    for k in ks:
        out[f"t2i_recall@{k}"] = float((t2i_ranks <= k).mean())
    out["matching_accuracy"] = float(
        (np.argmax(sim, axis=1) == np.arange(sim.shape[0])).mean()
    )
    return out


def threshold_metrics(
    query_embeds: np.ndarray,
    index_embeds: np.ndarray,
    ks: Sequence[int] = (1, 5, 10),
    threshold: float = 0.7,
    exclude_self: bool = False,
    measure_latency: bool = True,
) -> dict:
    """Threshold-relevance protocol over an index (ref:scripts/evaluate.py)."""
    t0 = time.perf_counter()
    sim = similarity_matrix(query_embeds, index_embeds)  # (Q, N)
    if exclude_self and sim.shape[0] == sim.shape[1]:
        sim = sim.copy()  # similarity_matrix may hand back a read-only buffer
        np.fill_diagonal(sim, -np.inf)
    elapsed_ms = (time.perf_counter() - t0) * 1000.0

    Q, N = sim.shape
    order = np.argsort(-sim, axis=1)  # (Q, N) descending
    relevant = sim >= threshold
    n_rel = relevant.sum(axis=1)  # (Q,)
    ranked_rel = np.take_along_axis(relevant, order, axis=1)  # (Q, N) bool

    out: dict = {}
    valid = n_rel > 0
    for k in ks:
        hits = ranked_rel[:, :k].sum(axis=1)
        rec = np.where(valid, hits / np.maximum(n_rel, 1), 0.0)
        out[f"recall@{k}"] = float(rec[valid].mean()) if valid.any() else 0.0
        out[f"precision@{k}"] = float((hits / k)[valid].mean()) if valid.any() else 0.0
    # MRR: first relevant position
    first = np.where(
        ranked_rel.any(axis=1), ranked_rel.argmax(axis=1) + 1, np.inf
    )
    out["mrr"] = float(np.where(valid, 1.0 / first, 0.0)[valid].mean()) if valid.any() else 0.0
    # AP per query
    cum = np.cumsum(ranked_rel, axis=1)
    prec_at = cum / np.arange(1, N + 1)[None, :]
    ap = (prec_at * ranked_rel).sum(axis=1) / np.maximum(n_rel, 1)
    out["ap"] = float(ap[valid].mean()) if valid.any() else 0.0
    out["num_queries"] = int(Q)
    out["num_queries_with_relevant"] = int(valid.sum())
    if measure_latency:
        out["avg_query_time_ms"] = float(elapsed_ms / max(Q, 1))
    return out


def relative_improvement(base: dict, tuned: dict) -> dict:
    """Percent improvement per shared numeric metric (ref:compare_models.py:251-300)."""
    out = {}
    for k, v in base.items():
        if isinstance(v, (int, float)) and k in tuned and v:
            out[k] = (tuned[k] - v) / abs(v) * 100.0
    return out
