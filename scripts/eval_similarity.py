"""Pairwise similarity micro-benchmark — fills the reference's EMPTY
scripts/eval_similarity.py (BASELINE.json ties the retrieval-kernel path to
this name). Measures cosine top-k throughput over a built index."""

import argparse
import time

import numpy as np

from _common import add_encoder_args, build_encoder


def main():
    p = argparse.ArgumentParser(description="Similarity/top-k throughput eval")
    p.add_argument("--index", default="data/index/custom_items_index.npz")
    p.add_argument("--queries", type=int, default=256)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--iters", type=int, default=20)
    add_encoder_args(p)
    args = p.parse_args()

    from clip_lora_match_tpu.index import EmbeddingIndex
    from clip_lora_match_tpu.retrieval import top_k_similar

    index = EmbeddingIndex.load(args.index)
    if len(index) == 0:
        print("[eval_similarity] empty index; run build_custom_index first")
        return
    rng = np.random.default_rng(0)
    q = rng.normal(size=(args.queries, index.dim)).astype(np.float32)
    top_k_similar(q, index.embeddings, args.k, assume_normalized=True)  # warmup
    t0 = time.perf_counter()
    for _ in range(args.iters):
        scores, idx = top_k_similar(
            q, index.embeddings, args.k, assume_normalized=True
        )
    dt = (time.perf_counter() - t0) / args.iters
    print(
        f"[eval_similarity] N={len(index)} Q={args.queries} k={args.k}: "
        f"{dt * 1e3:.3f} ms/batch -> {args.queries / dt:,.0f} queries/sec"
    )


if __name__ == "__main__":
    main()
