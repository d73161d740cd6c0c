"""Experiment: streaming top-k at HBM scale (VERDICT r1 item 4)."""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clip_lora_match_tpu.ops.retrieval_topk import (  # noqa: E402
    topk_retrieve,
    topk_retrieve_reference,
)


from scripts._common import paired_burst_time, sync_device  # noqa: E402

_sync = sync_device


def bench(fn, args, iters=4):
    return paired_burst_time(fn, args, iters=iters)


def run(N, Q, dtype, k=10, use_kernel=True, block_n=1024, label=""):
    key = jax.random.PRNGKey(0)
    idx = jax.random.normal(key, (N, 512), dtype=jnp.bfloat16).astype(dtype)
    qs = jax.random.normal(jax.random.PRNGKey(1), (Q, 512), jnp.float32)
    fn = (
        (lambda a, b: topk_retrieve(a, b, k, block_n=block_n))
        if use_kernel
        else (lambda a, b: topk_retrieve_reference(a, b, k))
    )
    t = bench(fn, (qs, idx))
    print(
        f"[topk] {label:28s} N={N:>9,} Q={Q:5d} {str(dtype):10s} "
        f"{t * 1e3:8.2f} ms  {Q / t:10,.0f} qps", flush=True,
    )
    del idx, qs
    return t


def xla_chunked(queries, index, k=10, n_chunks=8, recall=1.0):
    """Chunked XLA matmul + approx_max_k, exact merge at the end."""
    Q, D = queries.shape
    N = index.shape[0]
    q = queries.astype(jnp.float32)
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    qc = q.astype(index.dtype)
    chunk = N // n_chunks
    idx3 = index[: chunk * n_chunks].reshape(n_chunks, chunk, D)

    def body(_, tile):
        scores = jax.lax.dot_general(
            qc, tile, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        v, i = jax.lax.approx_max_k(scores, k, recall_target=recall)
        return None, (v, i.astype(jnp.int32))

    _, (vs, is_) = jax.lax.scan(body, None, idx3)
    # (n_chunks, Q, k) -> (Q, n_chunks*k), offset indices, exact final top-k
    offs = (jnp.arange(n_chunks, dtype=jnp.int32) * chunk)[:, None, None]
    is_ = is_ + offs
    vs = jnp.moveaxis(vs, 0, 1).reshape(Q, -1)
    is_ = jnp.moveaxis(is_, 0, 1).reshape(Q, -1)
    fv, fi = jax.lax.top_k(vs, k)
    return fv, jnp.take_along_axis(is_, fi, axis=1)


def run_xla_chunked(N, Q, dtype, k=10, n_chunks=8, label=""):
    idx = jax.random.normal(jax.random.PRNGKey(0), (N, 512), dtype=jnp.bfloat16).astype(dtype)
    qs = jax.random.normal(jax.random.PRNGKey(1), (Q, 512), jnp.float32)
    fn = jax.jit(lambda a, b: xla_chunked(a, b, k, n_chunks))
    t = bench(fn, (qs, idx))
    print(
        f"[topk] {label:28s} N={N:>9,} Q={Q:5d} {str(dtype):10s} "
        f"{t * 1e3:8.2f} ms  {Q / t:10,.0f} qps", flush=True,
    )
    # correctness vs oracle on a small slice
    fv, fi = fn(qs[:8], idx[:100000])
    ov, oi = topk_retrieve_reference(qs[:8], idx[:100000], k)
    ok = bool((np.asarray(fi) == np.asarray(oi)).all())
    print(f"[topk] {label}: exact-vs-oracle {ok}", flush=True)


if __name__ == "__main__":
    which = sys.argv[1:] or ["1m"]
    if "1m" in which:
        run(1_000_000, 1024, jnp.bfloat16, label="kernel bf16")
        run(1_000_000, 1024, jnp.float32, label="kernel f32")
    if "1mx" in which:
        run(1_000_000, 256, jnp.float32, use_kernel=False, label="xla lax.top_k f32")
    if "4m" in which:
        run(4_000_000, 1024, jnp.bfloat16, label="kernel bf16")
    if "blocks" in which:
        for bn in (512, 1024, 2048, 4096):
            run(1_000_000, 1024, jnp.bfloat16, block_n=bn, label=f"kernel bf16 bn={bn}")
    if "xla1m" in which:
        run_xla_chunked(1_000_000, 1024, jnp.bfloat16, label="xla-chunk bf16")
        run_xla_chunked(1_000_000, 1024, jnp.float32, label="xla-chunk f32")
    if "xla4m" in which:
        run_xla_chunked(4_000_000, 1024, jnp.bfloat16, n_chunks=32, label="xla-chunk bf16")
    if "q" in which:
        for q in (256, 2048, 4096):
            run(1_000_000, q, jnp.bfloat16, label=f"kernel bf16 Q={q}")
