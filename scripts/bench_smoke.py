"""Pre-snapshot TPU compile-smoke gate (VERDICT r4 next-step #3).

Compiles (and runs ONCE) every default-dispatch kernel geometry reachable
from the production surfaces — ClipEncoder image/text encode in BOTH residual
dtype classes (the r4 bench crash was fp32-S=77 only, invisible to the bf16
bench paths), the LoRA train step, retrieval auto-dispatch, and the YOLO
detect path — on the real chip. No timing: the gate is "does every
production geometry lower through Mosaic and execute".

Usage:  python scripts/bench_smoke.py          (full gate, ~3-6 min cold)
        CLM_SMOKE_SKIP_YOLO=1 ... to skip the detector compile
Exit 0 = all geometries green; exit 1 = at least one failed (each failure is
reported, the gate keeps going so one crash doesn't hide another).

Rule (CLAUDE.md): run this (or full bench.py) on the real chip before every
end-of-round commit.
"""

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

FAILURES = []


def _sync(out):
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    leaf.block_until_ready()
    np.asarray(leaf)


def smoke(label):
    def deco(fn):
        def run(*a, **kw):
            t0 = time.perf_counter()
            try:
                out = fn(*a, **kw)
                _sync(out)
                print(f"[smoke] OK   {label} ({time.perf_counter() - t0:.1f}s)")
            except Exception as e:
                FAILURES.append((label, e))
                print(f"[smoke] FAIL {label}: {type(e).__name__}: {e}")
                traceback.print_exc(limit=3)
        return run
    return deco


def main():
    import jax
    import jax.numpy as jnp

    from clip_lora_match_tpu.core.config import ClipArchConfig
    from clip_lora_match_tpu.models import clip as clip_model
    from clip_lora_match_tpu.nn.layers import set_kernel_flags

    on_tpu = jax.default_backend() == "tpu"
    print(f"[smoke] backend={jax.default_backend()} device={jax.devices()[0]}")
    if not on_tpu:
        print("[smoke] WARNING: not on TPU — Mosaic geometry is NOT validated "
              "by this run (interpret mode skips BlockSpec checks)")

    # production serving dispatch (same flags ClipEncoder sets)
    set_kernel_flags(
        fused_lora=False, flash_attention="auto",
        small_attention=on_tpu, interpret=not on_tpu,
    )

    arch = ClipArchConfig()
    params = clip_model.init_params(jax.random.PRNGKey(0), arch)
    rng = np.random.default_rng(0)

    pix = jnp.asarray(rng.normal(size=(96, arch.image_size, arch.image_size, 3))
                      .astype(np.float32))
    ids = jnp.asarray(
        rng.integers(0, arch.vocab_size - 2, (96, arch.max_text_length))
        .astype(np.int32)
    )
    # suffix-padded attention mask → the structural-lengths kernel path
    lens = rng.integers(4, arch.max_text_length + 1, size=(96,))
    amask = jnp.asarray(
        (np.arange(arch.max_text_length)[None] < lens[:, None]).astype(np.int32)
    )

    def embed_image(dt):
        @smoke(f"image_embed B=96 {dt or 'fp32'}")
        def run():
            return jax.jit(
                lambda p, x: clip_model.l2_normalize(
                    clip_model.encode_image_features(p, x, arch, compute_dtype=dt)
                )
            )(params, pix)
        run()

    def embed_text(dt, S, masked):
        tag = f"text_embed B=96 S={S} {np.dtype(dt).name if dt else 'fp32'}" + (
            " masked" if masked else ""
        )

        @smoke(tag)
        def run():
            return jax.jit(
                lambda p, i, m: clip_model.l2_normalize(
                    clip_model.encode_text_features(
                        p, i, arch, attention_mask=m,
                        eot_id=arch.vocab_size - 1, compute_dtype=dt,
                    )
                )
            )(params, ids[:, :S], amask[:, :S] if masked else None)
        run()

    # BOTH residual dtype classes × both seq buckets × mask/lengths modes.
    # fp32 is the class that crashed in r4 (bb=9 lengths block).
    embed_image(jnp.bfloat16)
    for dt in (jnp.bfloat16, None):
        for S in (77, 64):
            for masked in (True, False):
                embed_text(dt, S, masked)

    # odd batch sizes exercise bb/bp padding edges of the small-attn planner
    for B in (1, 9, 10):
        @smoke(f"text_embed B={B} S=77 fp32 masked")
        def run(B=B):
            return jax.jit(
                lambda p, i, m: clip_model.encode_text_features(
                    p, i, arch, attention_mask=m, eot_id=arch.vocab_size - 1
                )
            )(params, ids[:B], amask[:B])
        run()

    # --- retrieval auto dispatch (fp32 streaming + bf16 mid-band) ---
    from clip_lora_match_tpu.ops.retrieval_topk import topk_retrieve_auto

    index = rng.normal(size=(40960, 512)).astype(np.float32)
    index /= np.linalg.norm(index, axis=1, keepdims=True)
    index_j = jnp.asarray(index)
    qs = jnp.asarray(rng.normal(size=(256, 512)).astype(np.float32))

    @smoke("topk auto N=40960 fp32")
    def run_topk():
        return topk_retrieve_auto(qs, index_j, 10)
    run_topk()

    @smoke("topk auto N=8192 bf16")
    def run_topk_bf16():
        return topk_retrieve_auto(qs, index_j[:8192].astype(jnp.bfloat16), 10)
    run_topk_bf16()

    # --- int8-quantized retrieval (q8 two-pass incl. the fused hier pass-1
    # kernel's int8 MXU dot — forced group so the kernel compiles at smoke
    # size; production auto-fires it at HBM scale) ---
    from clip_lora_match_tpu.ops.retrieval_topk import (
        quantize_index_int8,
        topk_retrieve_q8,
    )

    vq, sc = quantize_index_int8(index_j)

    @smoke("topk q8 N=40960 hier int8-MXU")
    def run_topk_q8():
        return topk_retrieve_q8(qs, vq, sc, 10, group=16)
    run_topk_q8()

    @smoke("topk q8 N=40960 non-hier XLA dot")
    def run_topk_q8_flat():
        # the sub-Q8_HIER_MIN_TILES dispatch (hier gate closed): fp32
        # dequantize-dot of int-valued floats
        return topk_retrieve_q8(qs, vq, sc, 10, group=0)
    run_topk_q8_flat()

    # --- LoRA train step (plain-XLA towers, the training dispatch) ---
    if os.environ.get("CLM_SMOKE_SKIP_TRAIN") != "1":
        prev = set_kernel_flags(
            fused_lora=False, flash_attention=False, small_attention=False
        )
        from clip_lora_match_tpu.core.config import LoraConfig, TrainingConfig
        from clip_lora_match_tpu.lora import init_lora
        from clip_lora_match_tpu.train import (
            init_train_state,
            make_optimizer,
            make_train_step,
        )

        tcfg = TrainingConfig(batch_size=96)
        tx, _ = make_optimizer(tcfg, 100)
        state = init_train_state(
            init_lora(jax.random.PRNGKey(1), arch, LoraConfig()), tx,
            rng_impl="rbg",
        )
        step = make_train_step(
            params, arch, LoraConfig(), tcfg, tx,
            eot_id=arch.vocab_size - 1, compute_dtype=jnp.bfloat16,
        )
        batch = {
            "pixel_values": pix,
            "input_ids": ids,
            "attention_mask": amask,
        }

        @smoke("train_step B=96 bf16")
        def run_train():
            return step(state, batch)[1]
        run_train()
        set_kernel_flags(**prev)

    # --- YOLOv8-s detect (bf16 conv stack + fixed-slot NMS) ---
    if os.environ.get("CLM_SMOKE_SKIP_YOLO") != "1":
        from clip_lora_match_tpu.models.yolo import yolov8

        yp = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16),
            yolov8.init_params(jax.random.PRNGKey(0)),
        )
        imgs = jnp.asarray(rng.random((8, 640, 640, 3)).astype(np.float32))

        @smoke("yolo_v8s detect B=8 bf16")
        def run_yolo():
            outs = yolov8.forward(yp, imgs.astype(jnp.bfloat16))
            boxes, probs = yolov8.decode_predictions(outs)
            scores = jnp.max(probs, axis=-1)
            classes = jnp.argmax(probs, axis=-1).astype(jnp.int32)
            return jax.vmap(
                lambda b, s, c: yolov8.nms_fixed(
                    b, s, c, 0.25, 0.45, max_det=5, agnostic=False
                )
            )(boxes, scores, classes)
        run_yolo()

    if FAILURES:
        print(f"[smoke] {len(FAILURES)} geometry failure(s):")
        for label, e in FAILURES:
            print(f"[smoke]   {label}: {type(e).__name__}: {e}")
        sys.exit(1)
    print("[smoke] ALL GREEN")


if __name__ == "__main__":
    main()
