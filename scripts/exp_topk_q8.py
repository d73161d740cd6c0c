"""A/B the int8-quantized two-pass top-k vs the bf16 path at HBM scale.

Measures, same-process interleaved (CLAUDE.md measurement discipline):
- q8 (mxu=int8) vs q8 (mxu=bf16) vs bf16 twopass at N ∈ {1M, 4M, 8M}, Q=2048;
- the 16M-row capability point (8 GB int8 index — impossible in bf16 on one
  16 GB chip alongside transients).

Usage: python scripts/exp_topk_q8.py [--n 1000000 4000000 8000000] [--q 2048]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from _common import paired_burst_time  # noqa: E402  (scripts/ dir on sys.path)


def bench(fn, args, iters=4, warmup=1, label=""):
    """One home for the sync/burst discipline: scripts/_common.py."""
    per = paired_burst_time(fn, args, iters=iters, warmup=warmup)
    print(f"  {label}: {per * 1e3:.2f} ms/iter", file=sys.stderr, flush=True)
    return per


def make_index_bf16(n, d=512):
    """Chunked assembly into a donated buffer (fp32 RNG transient at 8M+
    would OOM — bench.py's trick)."""
    import functools

    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, donate_argnums=0)
    def _fill(buf, chunk, i):
        return jax.lax.dynamic_update_slice(buf, chunk, (i, 0))

    ch = 1_000_000
    buf = jnp.zeros((n, d), jnp.bfloat16)
    for c in range(-(-n // ch)):
        m = min(ch, n - c * ch)
        buf = _fill(
            buf,
            jax.random.normal(jax.random.PRNGKey(c), (ch, d), jnp.bfloat16)[:m],
            c * ch,
        )
    return buf


def quantize_chunked(index, ch=1_000_000):
    """quantize_index_int8 in donated chunks (whole-index fp32 transient at
    8M would be 16 GB)."""
    import functools

    import jax
    import jax.numpy as jnp

    from clip_lora_match_tpu.ops.retrieval_topk import quantize_index_int8

    n, d = index.shape

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def _fill(vbuf, sbuf, chunk, i):
        vq, sc = quantize_index_int8(chunk)
        return (
            jax.lax.dynamic_update_slice(vbuf, vq, (i, 0)),
            jax.lax.dynamic_update_slice(sbuf, sc, (i, 0)),
        )

    vbuf = jnp.zeros((n, d), jnp.int8)
    sbuf = jnp.zeros((n, 1), jnp.float32)
    for c in range(-(-n // ch)):
        m = min(ch, n - c * ch)
        vbuf, sbuf = _fill(vbuf, sbuf, index[c * ch : c * ch + m], c * ch)
    return vbuf, sbuf


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, nargs="+",
                    default=[1_000_000, 4_000_000, 8_000_000])
    ap.add_argument("--q", type=int, default=2048)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--skip-bf16", action="store_true")
    ap.add_argument("--n16m", action="store_true",
                    help="also run the 16M-row int8 capability point")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from clip_lora_match_tpu.ops.retrieval_topk import (
        topk_retrieve_q8,
        topk_retrieve_twopass,
    )

    print(f"backend={jax.default_backend()}", file=sys.stderr)
    qs = jax.random.normal(jax.random.PRNGKey(9), (args.q, 512), jnp.float32)

    for n in args.n:
        print(f"-- N={n:,} Q={args.q}", file=sys.stderr)
        idx = make_index_bf16(n)
        vq, sc = quantize_chunked(idx)
        res = {}
        if not args.skip_bf16:
            t = bench(lambda a, b: topk_retrieve_twopass(a, b, args.k),
                      (qs, idx), iters=args.iters, label="bf16 twopass")
            res["bf16"] = args.q / t
        del idx
        for mxu in ("int8", "bf16"):
            t = bench(
                lambda a, b, c, m=mxu: topk_retrieve_q8(a, b, c, args.k, mxu=m),
                (qs, vq, sc), iters=args.iters, label=f"q8 mxu={mxu}",
            )
            res[f"q8_{mxu}"] = args.q / t
        del vq, sc
        print(f"N={n:,}: " + "  ".join(
            f"{k}={v:,.0f} qps" for k, v in res.items()), flush=True)

    if args.n16m:
        n = 16_000_000
        print(f"-- N={n:,} (int8-only capability point)", file=sys.stderr)
        # assemble int8 directly in 1M chunks (no 16 GB bf16 intermediate)
        import functools

        from clip_lora_match_tpu.ops.retrieval_topk import quantize_index_int8

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def _fill(vbuf, sbuf, key, i):
            chunk = jax.random.normal(key, (1_000_000, 512), jnp.bfloat16)
            vq, sc = quantize_index_int8(chunk)
            return (
                jax.lax.dynamic_update_slice(vbuf, vq, (i, 0)),
                jax.lax.dynamic_update_slice(sbuf, sc, (i, 0)),
            )

        vbuf = jnp.zeros((n, 512), jnp.int8)
        sbuf = jnp.zeros((n, 1), jnp.float32)
        for c in range(n // 1_000_000):
            vbuf, sbuf = _fill(
                vbuf, sbuf, jax.random.PRNGKey(c), c * 1_000_000
            )
        t = bench(lambda a, b, c: topk_retrieve_q8(a, b, c, args.k),
                  (qs, vbuf, sbuf), iters=args.iters, label="q8 16M")
        print(f"N=16,000,000: q8_int8={args.q / t:,.0f} qps", flush=True)


if __name__ == "__main__":
    main()
