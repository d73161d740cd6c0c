"""A/B the non-hier q8 pass-1 dot forms (the sub-Q8_HIER_MIN_TILES band).

Below the q8 hier gate (~262k rows) SearchIndex(quantize="int8") runs
pass 1 as one XLA dot. Three candidate forms, all bit-exact for D <= 1024
(int-valued operands, fp32/int32 accumulation):
  fp32  — dequantize index to fp32 (shipped: 662k qps at N=131k/Q=2048);
  bf16  — cast to bf16 (371k qps there);
  int8  — native s8xs8->s32 (398k qps; no dequant transient but the s8
          MXU path loses to the convert-fused fp32 dot at these sizes).
Above the gate the fused int8 hier Pallas kernel takes over (full-path
crossover measured in ops/retrieval_topk.py's Q8_HIER_MIN_TILES note).

Usage: python scripts/exp_q8_flat_dot.py [--n 500000] [--q 2048]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from _common import paired_burst_time  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, nargs="+", default=[131_072, 500_000])
    ap.add_argument("--q", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    import functools

    import jax
    import jax.numpy as jnp

    from clip_lora_match_tpu.ops.retrieval_topk import quantize_index_int8

    print(f"backend={jax.default_backend()}", file=sys.stderr, flush=True)
    D, tile = 512, 16
    qs8 = jax.random.randint(
        jax.random.PRNGKey(0), (args.q, D), -127, 128, jnp.int8
    )

    @functools.partial(jax.jit, static_argnames=("form", "tile"))
    def pass1(qq, vq3, sc3, form, tile):
        if form == "int8":
            scores = jax.lax.dot_general(
                qq, vq3, (((1,), (2,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
        elif form == "bf16":
            scores = jax.lax.dot_general(
                qq.astype(jnp.bfloat16), vq3.astype(jnp.bfloat16),
                (((1,), (2,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            scores = jax.lax.dot_general(
                qq.astype(jnp.float32), vq3.astype(jnp.float32),
                (((1,), (2,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        tile_max = (scores * sc3[None]).max(axis=2)
        _, ids = jax.lax.approx_max_k(tile_max, 16, recall_target=1.0)
        return ids

    for n in args.n:
        nt = n // tile
        vq, sc = quantize_index_int8(
            jax.random.normal(jax.random.PRNGKey(1), (nt * tile, D))
        )
        vq3 = vq.reshape(nt, tile, D)
        sc3 = sc.reshape(nt, tile)
        res = {}
        for form in ("fp32", "bf16", "int8", "fp32", "bf16", "int8"):
            t = paired_burst_time(
                lambda q, v, s, f=form: pass1(q, v, s, f, tile),
                (qs8, vq3, sc3), iters=args.iters,
            )
            res.setdefault(form, []).append(t)
        line = f"N={n:,}: " + "  ".join(
            f"{f}={args.q / min(ts):,.0f} qps ({min(ts) * 1e3:.2f} ms)"
            for f, ts in res.items()
        )
        print(line, flush=True)


if __name__ == "__main__":
    main()
