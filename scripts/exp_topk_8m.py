"""Sweep the 8M-row exact top-k (VERDICT r3 #8).

Roofline at N=8M, D=512, bf16 on v5e: pass-1 FLOPs = Q·N·D·2 → 10.7 ms at
Q=256 (41.8 ms at Q=1024) against a 9.8 ms HBM floor (8 GB @ 819 GB/s), so
qps is FLOP-bound from Q≈256 up and the ceiling is ~23k qps at 93% MFU
(the tile-max kernel's measured rate). The r3 bench number (13.9k qps) was
taken at Q=256 where the sweep cannot amortize pass 2/3 + normalize; this
sweeps Q × tile to find the operating point.

Usage: python scripts/exp_topk_8m.py [--n 8000000] [--qs 256 512 1024]
       [--tiles 16] [--trials 3]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8_000_000)
    ap.add_argument("--qs", type=int, nargs="+", default=[256, 512, 1024])
    ap.add_argument("--tiles", type=int, nargs="+", default=[16])
    ap.add_argument("--groups", type=int, nargs="+", default=[0, 16],
                    help="hierarchical pass-2 widths (0 = flat approx_max_k)")
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from clip_lora_match_tpu.ops.retrieval_topk import topk_retrieve_twopass

    @functools.partial(jax.jit, donate_argnums=0)
    def _fill(buf, chunk, i):
        return jax.lax.dynamic_update_slice(buf, chunk, (i, 0))

    n, ch = args.n, 2_000_000
    index = jnp.zeros((n, 512), jnp.bfloat16)
    for c in range(-(-n // ch)):
        m = min(ch, n - c * ch)
        index = _fill(
            index,
            jax.random.normal(jax.random.PRNGKey(c), (m, 512), jnp.bfloat16),
            c * ch,
        )
    index.block_until_ready()
    qs_full = jax.random.normal(jax.random.PRNGKey(99), (max(args.qs), 512),
                                jnp.float32)

    def sync(x):
        np.asarray(x[0][:1])  # device→host readback (relay-safe sync)

    combos = [(q, t, g) for q in args.qs for t in args.tiles for g in args.groups]
    fns = {}
    for q, t, g in combos:
        fns[(q, t, g)] = lambda a, b, t=t, g=g: topk_retrieve_twopass(
            a, b, 10, tile=t, group=g)
        out = fns[(q, t, g)](qs_full[:q], index)
        sync(out)
        print(f"warmed Q={q} tile={t} group={g}", file=sys.stderr)

    results = {c: [] for c in combos}
    for trial in range(args.trials):
        for q, t, g in combos:
            fn = fns[(q, t, g)]
            sync(fn(qs_full[:q], index))
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn(qs_full[:q], index)
            sync(out)
            dt = (time.perf_counter() - t0) / args.iters
            results[(q, t, g)].append(dt)
            print(
                f"trial {trial} Q={q} tile={t} group={g}: {dt*1e3:.1f} ms "
                f"({q/dt:,.0f} qps)",
                file=sys.stderr,
            )

    print()
    for (q, t, g), ds in results.items():
        med = float(np.median(ds))
        flop_ms = q * n * 512 * 2 / 197e12 * 1e3
        print(
            f"Q={q} tile={t} group={g}: {med*1e3:.1f} ms median -> {q/med:,.0f} qps "
            f"(FLOP floor {flop_ms:.1f} ms, {flop_ms/(med*1e3)*100:.0f}% of peak)"
        )


if __name__ == "__main__":
    main()
