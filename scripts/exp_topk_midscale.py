"""Experiment: serving-scale top-k A/B (streaming kernel vs two-pass vs
XLA dot+approx_max_k).

Produced the r3 crossover table in docs/DESIGN.md §7.5 (median-of-5
interleaved trials per variant; paired-burst timing cancels relay dispatch
overhead). Run on a real TPU:

    PYTHONPATH=/root/.axon_site:. python scripts/exp_topk_midscale.py \
        --sizes 8192,40960,65536 --dtypes f32,bf16
"""

import argparse
import functools
import statistics


def main():
    p = argparse.ArgumentParser(description="mid-scale top-k A/B")
    p.add_argument("--sizes", default="8192,40960,65536")
    p.add_argument("--dtypes", default="f32,bf16")
    p.add_argument("--queries", type=int, default=256)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--trials", type=int, default=5)
    args = p.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    from clip_lora_match_tpu.ops.retrieval_topk import (
        topk_retrieve,
        topk_retrieve_reference,
        topk_retrieve_twopass,
    )

    from scripts._common import paired_burst_time

    def bench_once(fn, *a, iters=30):
        return paired_burst_time(fn, a, iters=iters, warmup=0)

    rng = np.random.default_rng(0)
    Q, D, k = args.queries, 512, args.k
    qs = jnp.asarray(rng.normal(size=(Q, D)).astype(np.float32))

    @functools.partial(jax.jit, static_argnames=("k",))
    def xla_amk(q, idx, k):
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        sims = jnp.dot(q, idx.T, preferred_element_type=jnp.float32)
        s, i = jax.lax.approx_max_k(sims, k, recall_target=1.0)
        return s, i.astype(jnp.int32)

    variants = {
        "streaming": lambda q, x: topk_retrieve(q, x, k),
        "twopass": lambda q, x: topk_retrieve_twopass(q, x, k),
        "xla_amk": lambda q, x: xla_amk(q, x, k),
    }
    for N in (int(s) for s in args.sizes.split(",")):
        idx = rng.normal(size=(N, D)).astype(np.float32)
        idx /= np.linalg.norm(idx, axis=1, keepdims=True)
        for tag in args.dtypes.split(","):
            dt = jnp.float32 if tag == "f32" else jnp.bfloat16
            idx_j = jnp.asarray(idx).astype(dt)
            sr, _ = topk_retrieve_reference(qs, idx_j, k)
            times = {n: [] for n in variants}
            for name, fn in variants.items():  # warm + correctness
                sg, _ = fn(qs, idx_j)
                # 2e-3: TPU default-precision matmul noise between shapes
                assert np.allclose(
                    np.asarray(sg), np.asarray(sr), atol=2e-3
                ), f"{name} mismatch at N={N}"
            for _ in range(args.trials):  # interleaved
                for name, fn in variants.items():
                    times[name].append(bench_once(fn, qs, idx_j))
            line = f"N={N:7d} {tag:4s}"
            for name in variants:
                med = statistics.median(times[name])
                line += f"  {name}={Q / med / 1e3:7.0f}k"
            print(line + f" qps (median of {args.trials})", flush=True)


if __name__ == "__main__":
    main()
