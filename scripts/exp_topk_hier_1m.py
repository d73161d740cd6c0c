"""A/B: flat vs FUSED-hierarchical pass 2 at N=1M/4M (r5).

The HIER_MIN_TILES=2^17 gate was calibrated against the UNFUSED r4 form,
where hierarchical pass 2 paid an extra full-array reduce + gather round
trip and lost below HBM scale. The r5 fused kernel changed the economics:
the supertile output is nearly free and the kernel drops its in-VMEM
transpose. This measures flat vs group=16 fused at N=1M (and the 8k
streaming number that read 5x low in the r5 bench), interleaved in one
process, 3 trials.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from clip_lora_match_tpu.ops.retrieval_topk import (
        topk_retrieve,
        topk_retrieve_twopass,
    )

    def _sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        leaf.block_until_ready()
        np.asarray(leaf)

    def bench(fn, iters):
        out = fn(); out = fn(); _sync(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        _sync(out)
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(3 * iters):
            out = fn()
        _sync(out)
        t3 = time.perf_counter() - t0
        return max((t3 - t1) / (2 * iters), 1e-9)

    qs = jax.random.normal(jax.random.PRNGKey(1), (1024, 512), jnp.float32)

    for N, iters in ((1_000_000, 6), (4_000_000, 4)):
        index = jax.random.normal(jax.random.PRNGKey(0), (N, 512), jnp.bfloat16)
        for trial in range(3):
            t_flat = bench(
                lambda: topk_retrieve_twopass(qs, index, 10, group=0), iters
            )
            t_hier = bench(
                lambda: topk_retrieve_twopass(qs, index, 10, group=16), iters
            )
            print(
                f"[hier1m] N={N} trial {trial}: flat {t_flat*1e3:.2f} ms "
                f"({1024/t_flat:,.0f} qps) vs fused-hier {t_hier*1e3:.2f} ms "
                f"({1024/t_hier:,.0f} qps)", flush=True,
            )
        del index

    # 8k streaming re-measure (r5 bench read 339k vs r3's 1.7M)
    idx8k = jax.random.normal(jax.random.PRNGKey(2), (8192, 512), jnp.bfloat16)
    q256 = jax.random.normal(jax.random.PRNGKey(3), (256, 512), jnp.float32)
    for trial in range(3):
        t = bench(lambda: topk_retrieve(q256, idx8k, 10), 100)
        print(f"[topk8k] trial {trial}: {t*1e3:.3f} ms ({256/t:,.0f} qps)",
              flush=True)


if __name__ == "__main__":
    main()
