"""Sweep the fused pass-1 kernel's (bn_tiles, block_q) geometry at N=8M
(r5). Baseline operating point: bn_tiles=128, block_q auto (512) — 99.8 ms /
20.5k qps in the r5 driver bench. Headroom bound: matmul floor 87.3 ms +
~5 ms serial pass-2/3 ⇒ ≤ ~8%."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from clip_lora_match_tpu.ops import retrieval_topk as rt

    def _sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        leaf.block_until_ready()
        np.asarray(leaf)

    def bench(fn, iters=4):
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

    @functools.partial(jax.jit, donate_argnums=0)
    def _fill(buf, chunk, i):
        return jax.lax.dynamic_update_slice(buf, chunk, (i, 0))

    n8, ch = 8_000_000, 2_000_000
    index = jnp.zeros((n8, 512), jnp.bfloat16)
    for c in range(n8 // ch):
        index = _fill(
            index, jax.random.normal(jax.random.PRNGKey(c), (ch, 512), jnp.bfloat16),
            c * ch,
        )
    qs = jax.random.normal(jax.random.PRNGKey(2), (2048, 512), jnp.float32)

    # geometry variants run the PASS-1 KERNEL ONLY (isolates the lever);
    # then the winner re-runs through the full twopass for the end number
    qn = qs / jnp.linalg.norm(qs, axis=1, keepdims=True)
    qb = qn.astype(index.dtype)

    for bn_tiles, bq in ((128, None), (128, 256), (128, 128), (256, None),
                         (256, 256)):
        try:
            # reduce to a scalar ON DEVICE: syncing the raw (nt, Q) output
            # would move 4 GB through the relay per burst and swamp the
            # paired-burst subtraction (first attempt measured "0.0 ms")
            fn = jax.jit(
                lambda q, i: rt._tilemax_sup_pallas(
                    q, i, 16, 16, False, bn_tiles=bn_tiles, block_q=bq
                )[0].sum()
            )
            t = bench(lambda: fn(qb, index))
            print(f"[geom] bn_tiles={bn_tiles} block_q={bq}: pass1 "
                  f"{t*1e3:.1f} ms", flush=True)
        except Exception as e:
            print(f"[geom] bn_tiles={bn_tiles} block_q={bq}: FAIL {e}",
                  flush=True)

    t = bench(lambda: rt.topk_retrieve_twopass(qs, index, 10))
    print(f"[geom] full twopass baseline: {t*1e3:.1f} ms "
          f"({2048/t:,.0f} qps)", flush=True)


if __name__ == "__main__":
    main()
