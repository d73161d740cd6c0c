"""Headline benchmark — prints ONE JSON line for the driver.

Metric: ViT-B/32 image embed throughput (images/sec/chip), the BASELINE.json
north-star workload (batched index build / eval encode path). Baseline: the
driver target of 5,000 images/sec/chip on TPU v5e; ``vs_baseline`` is the
speedup ratio against that target.

Also measures (and reports inside "extra") fused top-k retrieval qps and text
embed throughput, so regressions in either hot path are visible per round.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_IMAGES_PER_SEC = 5000.0  # BASELINE.md driver target per chip

# --- TPU liveness watchdog -------------------------------------------------
# The axon relay can wedge (ops hang forever, block_until_ready lies). Probe
# the device with a tiny op under a watchdog BEFORE importing the heavy path;
# if it hangs, re-exec on CPU with an explicit marker so the driver still
# records a line instead of timing out silently.


def _probe_tpu(probe_timeout_s: float = 90.0, retry_sleep_s: float = 45.0) -> bool:
    """Probe the device in a SUBPROCESS and retry across a few windows.

    Two hard-won relay facts (CLAUDE.md): a hung PJRT client cannot be
    recovered in-process (so the probe must not import jax here), and the
    relay FLAPS — a one-shot probe at the wrong moment would demote a
    healthy chip to the CPU fallback for the entire recorded run. The
    subprocess is killed by timeout directly (no pattern matching)."""
    import subprocess

    attempts = int(os.environ.get("CLM_BENCH_PROBE_ATTEMPTS", "4"))
    code = (
        "import sys, numpy as np, jax, jax.numpy as jnp; "
        "sys.exit(0 if jax.default_backend() != 'tpu' "
        "or float(np.asarray(jnp.sum(jnp.ones((8, 8))))) == 64.0 else 1)"
    )
    for i in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c", code],
                timeout=probe_timeout_s, capture_output=True,
            )
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if i < attempts - 1:
            print(
                f"[bench] TPU probe {i + 1}/{attempts} failed; "
                f"retrying in {retry_sleep_s:.0f}s",
                file=sys.stderr,
            )
            time.sleep(retry_sleep_s)
    return False


if os.environ.get("CLM_BENCH_NO_PROBE") != "1" and not _probe_tpu():
    if os.environ.get("CLM_BENCH_CPU_FALLBACK") == "1":
        print(
            json.dumps(
                {
                    "metric": "vit_b32_images_per_sec_per_chip",
                    "value": 0.0,
                    "unit": "images/sec/chip",
                    "vs_baseline": 0.0,
                    "extra": {"error": "tpu_unresponsive_and_cpu_fallback_failed"},
                }
            )
        )
        sys.exit(0)
    env = dict(os.environ)
    env.update(
        {
            "CLM_BENCH_CPU_FALLBACK": "1",
            "JAX_PLATFORMS": "cpu",
            "PYTHONPATH": "",
            "PALLAS_AXON_POOL_IPS": "",
        }
    )
    print("[bench] TPU unresponsive; falling back to CPU backend", file=sys.stderr)
    os.execve(sys.executable, [sys.executable, os.path.abspath(__file__)], env)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _sync(out):
    """Force completion. On the axon-relay platform block_until_ready can
    return before execution finishes; a device→host transfer is the only
    reliable sync point."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    leaf.block_until_ready()
    np.asarray(leaf)


def _burst(fn, args, iters):
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return time.perf_counter() - t0


def _bench(fn, *args, iters=10, warmup=2, label=""):
    """Paired-burst timing: run bursts of N and 3N with one transfer-sync
    each; per-iteration time = (t_3N - t_N) / 2N. The subtraction cancels the
    relay's constant dispatch/RTT overhead (which otherwise dominates when
    benchmarking through the tunnel) while the end-of-burst device→host
    transfer guarantees real execution (block_until_ready alone can lie on
    this platform)."""
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    print(f"[bench] {label}: warmed up", file=sys.stderr)
    t_small = _burst(fn, args, iters)
    t_large = _burst(fn, args, 3 * iters)
    per_iter = max((t_large - t_small) / (2 * iters), 1e-9)
    print(
        f"[bench] {label}: {per_iter * 1e3:.2f} ms/iter "
        f"(bursts {t_small * 1e3:.0f}/{t_large * 1e3:.0f} ms)",
        file=sys.stderr,
    )
    return per_iter


def main():
    from clip_lora_match_tpu.core.config import ClipArchConfig
    from clip_lora_match_tpu.models import clip as clip_model
    from clip_lora_match_tpu.ops.retrieval_topk import (
        topk_retrieve,
        topk_retrieve_reference,
    )

    on_tpu = jax.default_backend() == "tpu"
    arch = ClipArchConfig()
    params = clip_model.init_params(jax.random.PRNGKey(0), arch)
    rng = np.random.default_rng(0)

    # production serving dispatch (same flags ClipEncoder sets)
    from clip_lora_match_tpu.nn.layers import set_kernel_flags

    set_kernel_flags(
        fused_lora=False, flash_attention="auto",
        small_attention=on_tpu, interpret=not on_tpu,
    )

    # --- image embed throughput (the headline) ---
    # B=96 is the measured v5e sweet spot with the small-attention kernel
    # (15.5k img/s vs 13.3k at 128 and 10.5k at 256: larger batches push
    # per-op intermediates past VMEM fusion windows; swept 64-256, 2 trials)
    B = 96 if on_tpu else 16
    pix = jnp.asarray(
        rng.normal(size=(B, arch.image_size, arch.image_size, 3)).astype(np.float32)
    )

    @jax.jit
    def embed_images(params, pix):
        feats = clip_model.encode_image_features(
            params, pix, arch, compute_dtype=jnp.bfloat16, unroll=True
        )
        return clip_model.l2_normalize(feats)

    # median of 3 paired-burst trials: relay noise is two-sided (slow wedges
    # AND occasional impossible sub-floor subtraction artifacts — CLAUDE.md
    # measurement discipline), so the median is the defensible figure; same
    # protocol as the committed DESIGN tables
    t_img = sorted(
        _bench(embed_images, params, pix, label=f"image_embed({i})")
        for i in range(3)
    )[1]
    images_per_sec = B / t_img
    try:  # compiler-measured FLOPs → honest MFU for the headline too
        cost = embed_images.lower(params, pix).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        if flops:
            print(
                f"[bench] image embed XLA cost: {flops / B / 1e9:.2f} "
                f"GFLOP/img -> {flops / t_img / 1e12:.1f} TFLOP/s "
                f"({flops / t_img / 197e12 * 100:.0f}% MFU)",
                file=sys.stderr,
            )
    except Exception as e:
        print(f"[bench] embed cost_analysis unavailable: {e}", file=sys.stderr)

    # --- text embed throughput ---
    # T=96 measured sweet spot (17.8k/s vs 14.5k at 256; swept 96-320, 2 trials)
    T = 96 if on_tpu else 32
    ids = rng.integers(0, arch.vocab_size - 2, (T, arch.max_text_length)).astype(
        np.int32
    )
    ids_j = jnp.asarray(ids)

    @jax.jit
    def embed_texts(params, ids):
        feats = clip_model.encode_text_features(
            params, ids, arch, eot_id=arch.vocab_size - 1,
            compute_dtype=jnp.bfloat16, unroll=True,
        )
        return clip_model.l2_normalize(feats)

    t_txt = _bench(embed_texts, params, ids_j, label="text_embed")
    texts_per_sec = T / t_txt

    # S=64 sliced variant: what serving pays when the batch's real tokens
    # fit in 64 columns (always true for the reference's item corpus; the
    # encoder slices automatically — models/encoder.py::_TEXT_SEQ_SLICE).
    # Also brings the small-attention kernel's S<=64 gate into play.
    t_txt64 = _bench(embed_texts, params, ids_j[:, :64], label="text_embed_s64")
    texts_per_sec_s64 = T / t_txt64

    # --- retrieval qps at the serving scale (production auto dispatch; the
    # index here is fp32 — the EmbeddingIndex default — so auto runs the
    # streaming Pallas kernel; the bf16-only dot+approx_max_k mid-band is
    # covered by topk_40k_bf16_qps below — DESIGN §7.5) ---
    from clip_lora_match_tpu.ops.retrieval_topk import topk_retrieve_auto

    N, D, Q, k = (40960, 512, 256, 10) if on_tpu else (4096, 512, 64, 10)
    index = rng.normal(size=(N, D)).astype(np.float32)
    index /= np.linalg.norm(index, axis=1, keepdims=True)
    qs = jnp.asarray(rng.normal(size=(Q, D)).astype(np.float32))
    index_j = jnp.asarray(index)
    topk_fn = topk_retrieve_auto if on_tpu else topk_retrieve_reference
    # sub-ms per call: use long bursts so relay jitter doesn't dominate the
    # paired-burst subtraction
    t_topk = _bench(
        lambda a, b: topk_fn(a, b, k), qs, index_j, iters=60, label="topk"
    )
    qps = Q / t_topk

    # bf16-index variants: 8k = realistic service scale (streaming kernel's
    # VMEM regime), 40k = the bf16 mid-band (dot+approx_max_k) that the fp32
    # headline above does not execute
    topk_8k = {}
    if on_tpu:
        try:
            idx_bf16 = jnp.asarray(index).astype(jnp.bfloat16)
            t8 = _bench(
                lambda a, b: topk_fn(a, b, k), qs, idx_bf16[:8192], iters=100,
                label="topk_8k",
            )
            t40 = _bench(
                lambda a, b: topk_fn(a, b, k), qs, idx_bf16, iters=60,
                label="topk_40k_bf16",
            )
            topk_8k = {
                "topk_8k_bf16_qps": round(Q / t8, 1),
                "topk_40k_bf16_qps": round(Q / t40, 1),
            }
        except Exception as e:
            print(f"[bench] topk bf16 extras failed: {e}", file=sys.stderr)

    # --- HBM-scale retrieval (exact two-pass path, VERDICT r1 item 4) ---
    big_topk = {}
    if on_tpu and os.environ.get("CLM_BENCH_SKIP_BIGTOPK") != "1":
        try:
            big_topk = _big_topk_extras()
        except Exception as e:  # never lose the headline line
            print(f"[bench] big-topk extra failed: {e}", file=sys.stderr)

    # --- end-to-end jpeg→embedding (host decode overlapped w/ device) ---
    e2e = {}
    if on_tpu and os.environ.get("CLM_BENCH_SKIP_E2E") != "1":
        try:
            e2e = _jpeg_to_embedding_extra(params, arch)
        except Exception as e:
            print(f"[bench] jpeg-e2e extra failed: {e}", file=sys.stderr)

    # --- YOLOv8-s detector (the crop stage) ---
    yolo = {}
    if on_tpu and os.environ.get("CLM_BENCH_SKIP_YOLO") != "1":
        try:
            yolo = _yolo_extra()
        except Exception as e:
            print(f"[bench] yolo extra failed: {e}", file=sys.stderr)

    # --- two-stage search: query jpeg → detect → device crop → embed → top-k ---
    two_stage = {}
    if on_tpu and os.environ.get("CLM_BENCH_SKIP_TWOSTAGE") != "1":
        try:
            two_stage = _two_stage_extra(params, arch)
        except Exception as e:
            print(f"[bench] two-stage extra failed: {e}", file=sys.stderr)

    # --- ViT-B/16 tower (model-family breadth; S=197 → XLA attention,
    # flash 'auto' correctly stays off per DESIGN §7.3 r3 table) ---
    b16 = {}
    if on_tpu and os.environ.get("CLM_BENCH_SKIP_B16") != "1":
        try:
            b16 = _b16_extra(rng)
        except Exception as e:
            print(f"[bench] b16 extra failed: {e}", file=sys.stderr)

    # --- ViT-L/14 tower (largest family; full-width parity is a slow test) ---
    l14 = {}
    if on_tpu and os.environ.get("CLM_BENCH_SKIP_L14") != "1":
        try:
            l14 = _l14_extra(rng)
        except Exception as e:
            print(f"[bench] l14 extra failed: {e}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "vit_b32_images_per_sec_per_chip",
                "value": round(images_per_sec, 1),
                "unit": "images/sec/chip",
                "vs_baseline": round(images_per_sec / BASELINE_IMAGES_PER_SEC, 3),
                "extra": {
                    "texts_per_sec": round(texts_per_sec, 1),
                    "texts_per_sec_s64": round(texts_per_sec_s64, 1),
                    "topk_qps": round(qps, 1),
                    "topk_n": N,
                    **topk_8k,
                    "image_batch": B,
                    "backend": jax.default_backend(),
                    "device": str(jax.devices()[0]),
                    **big_topk,
                    **e2e,
                    **yolo,
                    **two_stage,
                    **b16,
                    **l14,
                },
            }
        ),
        flush=True,
    )

    # Secondary (stderr-only, AFTER the driver's JSON line so a hang here
    # cannot lose the headline): full-size LoRA train-step throughput.
    if on_tpu and os.environ.get("CLM_BENCH_SKIP_TRAIN") != "1":
        try:
            _train_step_extra(arch, params, rng)
        except Exception as e:  # never fail the bench for the extra
            print(f"[bench] train-step extra failed: {e}", file=sys.stderr)


def _big_topk_extras() -> dict:
    """Exact retrieval at HBM scale: N=1M (bf16+fp32) and N=4M (bf16) via the
    fused two-pass path, plus the naive XLA lax.top_k baseline at 1M."""
    from clip_lora_match_tpu.ops.retrieval_topk import (
        topk_retrieve_reference,
        topk_retrieve_twopass,
    )

    out = {}
    qs = jax.random.normal(jax.random.PRNGKey(1), (1024, 512), jnp.float32)

    for n, dt, name in (
        (1_000_000, jnp.bfloat16, "topk_1m_bf16_qps"),
        (1_000_000, jnp.float32, "topk_1m_f32_qps"),
        (4_000_000, jnp.bfloat16, "topk_4m_bf16_qps"),
    ):
        index = jax.random.normal(jax.random.PRNGKey(0), (n, 512), jnp.bfloat16).astype(dt)
        t = _bench(
            lambda a, b: topk_retrieve_twopass(a, b, 10),
            qs, index, iters=4, label=f"topk_{n // 1_000_000}m_{np.dtype(dt).name}",
        )
        out[name] = round(1024 / t, 1)
        del index

    # N=8M bf16: an 8 GB index — HALF the chip's HBM — searched exactly.
    # RNG can't emit it in one shot (the fp32 generation transient alone is
    # 16 GB), so the index is assembled into a donated buffer chunk-by-chunk
    # (the same donation trick as index/store.py's arena). Q=2048 is the
    # measured operating point (r3 used Q=256, which can't amortize pass 2:
    # +43% at 1024, +6% more at 2048 — r4 sweep, scripts/exp_topk_8m.py);
    # the hierarchical pass 2 auto-fires here (group=16 supertile max →
    # approx_max_k over the 16×-smaller array: 72.7→67.7 ms same-process
    # A/B at Q=1024; group 32/64 measured worse). Exactness at this scale
    # is pinned by a half-merge identity (see docs/DESIGN.md §7.5).
    try:
        import functools

        @functools.partial(jax.jit, donate_argnums=0)
        def _fill(buf, chunk, i):
            return jax.lax.dynamic_update_slice(buf, chunk, (i, 0))

        n8, ch = 8_000_000, 2_000_000
        index = jnp.zeros((n8, 512), jnp.bfloat16)
        for c in range(n8 // ch):
            index = _fill(
                index,
                jax.random.normal(jax.random.PRNGKey(c), (ch, 512), jnp.bfloat16),
                c * ch,
            )
        qs2k = jax.random.normal(jax.random.PRNGKey(2), (2048, 512), jnp.float32)
        t = _bench(
            lambda a, b: topk_retrieve_twopass(a, b, 10),
            qs2k, index, iters=4, label="topk_8m_bfloat16",
        )
        out["topk_8m_bf16_qps"] = round(2048 / t, 1)

        # int8-quantized index at the same operating point: half the HBM
        # stream AND the 2× int8 MXU rate (r5, ops/retrieval_topk.py q8 path;
        # selection exact over quantized scores, recall pinned in tests).
        # Quantize in donated 1M-row chunks — a whole-index fp32 transient
        # would be 16 GB.
        try:
            from clip_lora_match_tpu.ops.retrieval_topk import (
                quantize_index_int8,
                topk_retrieve_q8,
            )

            @functools.partial(jax.jit, donate_argnums=(0, 1))
            def _qfill(vbuf, sbuf, chunk, i):
                vq, sc = quantize_index_int8(chunk)
                return (
                    jax.lax.dynamic_update_slice(vbuf, vq, (i, 0)),
                    jax.lax.dynamic_update_slice(sbuf, sc, (i, 0)),
                )

            vbuf = jnp.zeros((n8, 512), jnp.int8)
            sbuf = jnp.zeros((n8, 1), jnp.float32)
            for c in range(n8 // ch):
                vbuf, sbuf = _qfill(
                    vbuf, sbuf, index[c * ch : (c + 1) * ch], c * ch
                )
            del index
            t = _bench(
                lambda a, b, c: topk_retrieve_q8(a, b, c, 10),
                qs2k, vbuf, sbuf, iters=4, label="topk_8m_int8",
            )
            out["topk_8m_int8_qps"] = round(2048 / t, 1)
            del vbuf, sbuf

            # 16M rows — the int8-only capability point (8 GB values: a bf16
            # index this size cannot coexist with its transients on one chip)
            @functools.partial(jax.jit, donate_argnums=(0, 1))
            def _qgen(vbuf, sbuf, key, i):
                chunk = jax.random.normal(key, (ch, 512), jnp.bfloat16)
                vq, sc = quantize_index_int8(chunk)
                return (
                    jax.lax.dynamic_update_slice(vbuf, vq, (i, 0)),
                    jax.lax.dynamic_update_slice(sbuf, sc, (i, 0)),
                )

            n16 = 16_000_000
            vbuf = jnp.zeros((n16, 512), jnp.int8)
            sbuf = jnp.zeros((n16, 1), jnp.float32)
            for c in range(n16 // ch):
                vbuf, sbuf = _qgen(vbuf, sbuf, jax.random.PRNGKey(c), c * ch)
            t = _bench(
                lambda a, b, c: topk_retrieve_q8(a, b, c, 10),
                qs2k, vbuf, sbuf, iters=3, label="topk_16m_int8",
            )
            out["topk_16m_int8_qps"] = round(2048 / t, 1)
            del vbuf, sbuf
        except Exception as e:  # noqa: BLE001
            print(f"[bench] topk int8 extras skipped: {e}", file=sys.stderr)
    except Exception as e:  # noqa: BLE001 — 8 GB alloc can lose to fragmentation
        print(f"[bench] topk_8m extra skipped: {e}", file=sys.stderr)

    # naive baseline: full (Q, N) scores + lax.top_k (the reference's
    # torch.topk workload shape, ref:src/embedding/search.py:96-99)
    index = jax.random.normal(jax.random.PRNGKey(0), (1_000_000, 512), jnp.float32)
    qs256 = qs[:256]
    t = _bench(
        lambda a, b: topk_retrieve_reference(a, b, 10),
        qs256, index, iters=2, label="topk_1m_xla_baseline",
    )
    out["topk_1m_xla_baseline_qps"] = round(256 / t, 1)
    del index
    return out


def _b16_extra(rng) -> dict:
    """ViT-B/16 image tower (S=197, ~4.1x the B/32 FLOPs/img): the second
    model family's serving number. B=32 measured sweet spot (3.3k img/s vs
    2.9k at 64 and 2.1k at 96 — the S=197 activations hit VMEM fusion
    windows earlier than B/32's). ref:models/clip_model.py:37-82 accepts any
    HF CLIP name; here the preset ladder covers B/32, B/16, L/14, L/14-336."""
    from clip_lora_match_tpu.core.config import VIT_B16
    from clip_lora_match_tpu.models import clip as clip_model

    arch = VIT_B16
    params = clip_model.init_params(jax.random.PRNGKey(0), arch)
    B = 32
    pix = jnp.asarray(
        rng.normal(size=(B, arch.image_size, arch.image_size, 3)).astype(
            np.float32
        )
    )

    @jax.jit
    def embed(params, pix):
        feats = clip_model.encode_image_features(
            params, pix, arch, compute_dtype=jnp.bfloat16, unroll=True
        )
        return clip_model.l2_normalize(feats)

    t = _bench(embed, params, pix, iters=8, label="vit_b16_image_embed")
    return {"vit_b16_images_per_sec": round(B / t, 1), "vit_b16_batch": B}


def _l14_extra(rng) -> dict:
    """ViT-L/14 image tower (S=257, width 1024, 24 layers — ~19x the B/32
    FLOPs/img): the largest family the reference's config-driven loader
    accepts (ref:models/clip_model.py:44-56). Full-width parity vs torch is
    pinned by tests/test_clip_parity.py::test_full_vit_l14_parity; this is
    its serving number. B swept on v5e — r4 {8,16,32}: 480/511/561, r5
    {32,48,64,96} ×2 trials (scripts/exp_l14_batch_sweep.py): 614/616/505/487
    img/s — the curve PLATEAUS at 32-48 then falls off the same VMEM fusion
    window as the other families. B=32 stays (same throughput as 48 at
    lower latency)."""
    from clip_lora_match_tpu.core.config import VIT_L14
    from clip_lora_match_tpu.models import clip as clip_model

    arch = VIT_L14
    params = clip_model.init_params(jax.random.PRNGKey(0), arch)
    B = 32
    pix = jnp.asarray(
        rng.normal(size=(B, arch.image_size, arch.image_size, 3)).astype(
            np.float32
        )
    )

    @jax.jit
    def embed(params, pix):
        feats = clip_model.encode_image_features(
            params, pix, arch, compute_dtype=jnp.bfloat16, unroll=True
        )
        return clip_model.l2_normalize(feats)

    t = _bench(embed, params, pix, iters=6, label="vit_l14_image_embed")
    return {"vit_l14_images_per_sec": round(B / t, 1), "vit_l14_batch": B}


def _jpeg_to_embedding_extra(params, arch) -> dict:
    """End-to-end jpeg→embedding throughput: C++ libjpeg decode+preprocess on
    a background thread, TPU encodes the previous batch meanwhile (the
    workload ref:scripts/build_text_index.py ran one un-batched forward per
    item). On this 1-core host the number is DECODE-bound — it measures the
    full-pipeline floor, not the chip."""
    import glob
    import tempfile
    import time

    from clip_lora_match_tpu.core.config import ClipConfig
    from clip_lora_match_tpu.models.encoder import ClipEncoder

    paths = sorted(glob.glob("data/fashion_synth/images/*.jpg"))[:512]
    if len(paths) < 512:  # fresh clone: render a synthetic set
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts"))
        import generate_fashion_corpus as gen

        d = tempfile.mkdtemp(prefix="clm_bench_imgs_")
        combos = [
            (c, a, g, p)
            for c in list(gen.COLOURS)[:8]
            for a in list(gen.ARTICLES)[:8]
            for g in gen.GENDERS
            for p in gen.PATTERNS[:3]
        ][:512]
        paths = []
        for i, (c, a, g, p) in enumerate(combos):
            pth = os.path.join(d, f"{i:04d}.jpg")
            gen.render(c, a, g, p, "grey" if c != "grey" else "red").save(pth, quality=92)
            paths.append(pth)

    enc = ClipEncoder(params, arch=arch, config=ClipConfig(), compute_dtype="bfloat16")
    # warm the SAME bucket the timed run uses; keep the file count a batch
    # multiple so no ragged final batch compiles a cold bucket inside the
    # timed region (512 % 96 = 32 cost ~7 s of compile when overlooked)
    paths = paths[: (len(paths) // 96) * 96]
    enc.encode_image_files(paths[:96], batch_size=96)
    t0 = time.perf_counter()
    out = enc.encode_image_files(paths, batch_size=96)
    dt = time.perf_counter() - t0
    rate = len(paths) / dt
    print(
        f"[bench] jpeg→embedding: {len(paths)} files in {dt:.2f}s -> "
        f"{rate:,.0f} img/s end-to-end (1-core host decode)",
        file=sys.stderr,
    )
    assert out.shape == (len(paths), arch.projection_dim)
    res = {"jpeg_e2e_images_per_sec": round(rate, 1), "jpeg_e2e_files": len(paths)}

    # --- photo-size corpus (r4): the reference's REAL inputs are camera
    # photos (data/reported/images: 899×1599), not 224px renders; decode
    # dominates there and the DCT-scaled path (native/clm_native.cpp v3)
    # earns its keep: host-only decode measured 51 → 320 img/s at 1200×1600.
    from PIL import Image

    photo_dir = os.path.join(tempfile.gettempdir(), "clm_bench_photo_192")
    os.makedirs(photo_dir, exist_ok=True)
    photo_paths = sorted(glob.glob(os.path.join(photo_dir, "*.jpg")))
    if len(photo_paths) < 192:
        photo_paths = []
        for i, src in enumerate(paths[:192]):
            pth = os.path.join(photo_dir, f"{i:04d}.jpg")
            if not os.path.exists(pth):
                Image.open(src).resize((1200, 1600), Image.BILINEAR).save(
                    pth, quality=90
                )
            photo_paths.append(pth)
    enc.encode_image_files(photo_paths[:96], batch_size=96)  # warm bucket
    t0 = time.perf_counter()
    out = enc.encode_image_files(photo_paths, batch_size=96, dct_scale=True)
    dt_fast = time.perf_counter() - t0
    t0 = time.perf_counter()
    enc.encode_image_files(photo_paths, batch_size=96, dct_scale=False)
    dt_full = time.perf_counter() - t0
    n_p = len(photo_paths)
    print(
        f"[bench] jpeg→embedding PHOTO (1200×1600): dct {n_p/dt_fast:,.0f} "
        f"img/s vs full {n_p/dt_full:,.0f} img/s",
        file=sys.stderr,
    )
    assert out.shape == (n_p, arch.projection_dim)
    res["jpeg_e2e_photo_images_per_sec"] = round(n_p / dt_fast, 1)
    res["jpeg_e2e_photo_fulldecode_images_per_sec"] = round(n_p / dt_full, 1)
    return res


def _yolo_extra() -> dict:
    """yolov8s full detect path (backbone+PAN+DFL decode+fixed-slot NMS) at
    640², batched, bf16 conv stack (measured +20-25% vs fp32 on v5e) — the
    reference ran ultralytics one image at a time
    (ref:src/preprocessing/yolo_cropper.py:83-92)."""
    from clip_lora_match_tpu.models.yolo import yolov8

    params = yolov8.init_params(jax.random.PRNGKey(0))
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    rng = np.random.default_rng(3)
    # B swept {8..128} on v5e (equal-iters interleaved A/B): 128 wins big
    # (2,746 img/s vs 1,477 at 32 / 1,267 at 64 — XLA's conv tiling only
    # fills the MXU at the larger batch; ~40% MFU by 28.6 GFLOP/img).
    B = 128
    imgs = jnp.asarray(rng.random((B, 640, 640, 3)).astype(np.float32))

    @jax.jit
    def infer(params, images):
        outs = yolov8.forward(params, images.astype(jnp.bfloat16))
        boxes, probs = yolov8.decode_predictions(outs)
        scores = jnp.max(probs, axis=-1)
        classes = jnp.argmax(probs, axis=-1).astype(jnp.int32)
        return jax.vmap(
            lambda b, s, c: yolov8.nms_fixed(
                b, s, c, 0.25, 0.45, max_det=5, agnostic=False
            )
        )(boxes, scores, classes)

    t = _bench(infer, params, imgs, iters=6, label="yolo_v8s")
    return {"yolo_v8s_images_per_sec": round(B / t, 1), "yolo_batch": B}


def _two_stage_extra(params, arch) -> dict:
    """End-to-end two-stage search latency: query jpeg → trained detector →
    device-side crop → CLIP embed → top-k over a 40,960-row index
    (VERDICT r2 next-step #3's bench). Uses the committed synthetic-corpus
    detector weights; skipped when absent."""
    import tempfile
    import time

    from PIL import Image

    from clip_lora_match_tpu.core.config import ClipConfig, YoloConfig
    from clip_lora_match_tpu.models.encoder import ClipEncoder
    from clip_lora_match_tpu.models.yolo.device_crop import crop_embed_pipeline
    from clip_lora_match_tpu.models.yolo.yolov8 import load_detector
    from clip_lora_match_tpu.ops.retrieval_topk import topk_retrieve

    weights = os.path.join("models", "yolo_synth", "yolov8n_synth.npz")
    if not os.path.exists(weights):
        print("[bench] two-stage: no trained detector weights", file=sys.stderr)
        return {}
    detector = load_detector(weights, YoloConfig())
    enc = ClipEncoder(params, arch=arch, config=ClipConfig(), compute_dtype="bfloat16")

    # a realistic query image from the detection generator
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts"))
    import random as _random

    import generate_fashion_corpus as gen

    img, _ = gen.render_detect_image(_random.Random(7), 320, max_objects=1)
    qpath = os.path.join(tempfile.mkdtemp(prefix="clm_bench_q_"), "q.jpg")
    img.save(qpath, quality=92)

    rng = np.random.default_rng(5)
    index = rng.normal(size=(40960, arch.projection_dim)).astype(np.float32)
    index /= np.linalg.norm(index, axis=1, keepdims=True)
    index_j = jnp.asarray(index)

    def one_query_staged():
        im = Image.open(qpath).convert("RGB")
        emb, dets = crop_embed_pipeline(detector, enc, im, k_best=1)
        out = topk_retrieve(jnp.asarray(emb), index_j, 5)
        _sync(out)
        return dets

    dets = one_query_staged()  # warm all jit buckets
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        one_query_staged()
    staged_ms = (time.perf_counter() - t0) / iters * 1e3

    # fused ONE-dispatch program: detect→NMS→crop→embed→topk in a single
    # jit — 1 dispatch + 1 readback instead of the staged path's 7-9 relay
    # round trips
    from clip_lora_match_tpu.models.yolo.device_crop import make_fused_search

    search = make_fused_search(detector, enc, index_j, k=5)
    u8 = np.asarray(Image.open(qpath).convert("RGB"), np.uint8)
    _, _, _, det1 = search(u8)  # warm
    t0 = time.perf_counter()
    for _ in range(iters):
        search(u8)
    fused_ms = (time.perf_counter() - t0) / iters * 1e3
    print(
        f"[bench] two-stage search: staged {staged_ms:.1f} ms/query "
        f"({len(dets)} det), fused {fused_ms:.1f} ms/query (det={det1})",
        file=sys.stderr,
    )
    return {
        "two_stage_search_ms": round(fused_ms, 2),
        "two_stage_staged_ms": round(staged_ms, 2),
        "two_stage_detections": len(dets),
    }


def _train_step_extra(arch, params, rng):
    from clip_lora_match_tpu.nn.layers import set_kernel_flags

    # training path: plain XLA towers (serving kernels' custom_vjp backwards
    # recompute via the jnp reference — slower under grad)
    set_kernel_flags(fused_lora=False, flash_attention=False,
                     small_attention=False)
    from clip_lora_match_tpu.core.config import LoraConfig, TrainingConfig
    from clip_lora_match_tpu.lora import init_lora
    from clip_lora_match_tpu.train import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    from clip_lora_match_tpu.train import make_chained_train_step

    lora_cfg = LoraConfig()
    # B=96 re-measured as the r3 sweet spot (2,252 ex/s vs 2,160 at 128,
    # 1,796 at 192, 1,740 at 256 — same VMEM-fusion-window effect as the
    # embed path)
    tcfg = TrainingConfig(batch_size=96)
    tx, _ = make_optimizer(tcfg, 100)
    state = init_train_state(
        init_lora(jax.random.PRNGKey(1), arch, lora_cfg), tx, rng_impl="rbg"
    )
    step = make_train_step(
        params, arch, lora_cfg, tcfg, tx,
        eot_id=arch.vocab_size - 1, compute_dtype=jnp.bfloat16,
    )
    B = tcfg.batch_size
    batch = {
        "pixel_values": jnp.asarray(
            rng.normal(size=(B, arch.image_size, arch.image_size, 3)).astype(
                np.float32
            )
        ),
        "input_ids": jnp.asarray(
            rng.integers(0, arch.vocab_size - 2, (B, arch.max_text_length)).astype(
                np.int32
            )
        ),
        "attention_mask": jnp.asarray(
            np.ones((B, arch.max_text_length), np.int32)
        ),
    }
    t = _bench(lambda s, b: step(s, b)[1], state, batch, iters=4,
               label="train_step")
    print(
        f"[bench] train step B={B}: {t * 1e3:.1f} ms -> "
        f"{B / t:,.0f} examples/s/chip",
        file=sys.stderr,
    )

    # compiler-measured FLOPs → honest MFU (VERDICT r2 weak #6: no more
    # hand arithmetic)
    try:
        cost = (
            step.inner.lower(params, state, batch).compile().cost_analysis()
        )
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        if flops:
            mfu = flops / t / 197e12  # v5e bf16 peak 197 TFLOP/s
            print(
                f"[bench] train step XLA cost: {flops / 1e9:.1f} GFLOP/step "
                f"-> {flops / t / 1e12:.1f} TFLOP/s ({mfu * 100:.0f}% MFU)",
                file=sys.stderr,
            )
    except Exception as e:
        print(f"[bench] cost_analysis unavailable: {e}", file=sys.stderr)

    # K-chained micro-steps: one dispatch per K optimizer steps amortizes
    # the ~10 ms relay launch overhead (VERDICT r2 next-step #4)
    K = 4
    chained = make_chained_train_step(
        params, arch, lora_cfg, tcfg, tx, chain=K,
        eot_id=arch.vocab_size - 1, compute_dtype=jnp.bfloat16,
    )
    batches = {k: jnp.broadcast_to(v, (K,) + v.shape) for k, v in batch.items()}
    t_k = _bench(lambda s, b: chained(s, b)[1], state, batches, iters=2,
                 label=f"train_step_chain{K}")
    print(
        f"[bench] chained train step K={K} B={B}: {t_k / K * 1e3:.1f} ms/step "
        f"-> {B * K / t_k:,.0f} examples/s/chip",
        file=sys.stderr,
    )

    # Text-sliced step (S=64): what training pays when the batch's real
    # tokens fit in 64 columns — always true for the reference's serving
    # corpus and for real-vocab BPE on typical captions (the trainer slices
    # automatically, TrainingConfig.text_seq_slice; math exact, tested).
    # The headline number above stays the honest S=77 worst case.
    batch64 = dict(
        batch,
        input_ids=batch["input_ids"][:, :64],
        attention_mask=batch["attention_mask"][:, :64],
    )
    t64 = _bench(lambda s, b: step(s, b)[1], state, batch64, iters=4,
                 label="train_step_s64")
    print(
        f"[bench] train step B={B} S=64 (text-sliced): {t64 * 1e3:.1f} ms -> "
        f"{B / t64:,.0f} examples/s/chip",
        file=sys.stderr,
    )

    # Both knobs together — the trainer's actual configuration on a ≤64-token
    # corpus (chain_steps + text_seq_slice compose; scripts/
    # exp_train_chain_s64.py: gains stack, 2,477 ex/s median-of-3 measured)
    batches64 = {
        k: jnp.broadcast_to(v, (K,) + v.shape) for k, v in batch64.items()
    }
    t_k64 = _bench(lambda s, b: chained(s, b)[1], state, batches64, iters=2,
                   label=f"train_step_chain{K}_s64")
    print(
        f"[bench] chained train step K={K} B={B} S=64: "
        f"{t_k64 / K * 1e3:.1f} ms/step -> "
        f"{B * K / t_k64:,.0f} examples/s/chip",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
