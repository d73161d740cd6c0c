"""Train the JAX YOLOv8 detector on the synthetic detection corpus.

Fills the weights gap left by zero egress: the reference downloads a
pretrained ultralytics yolov8s (ref:models/yolo_model.py:20-39); here the
from-scratch JAX port (models/yolo/yolov8.py) earns its weights on the
programmatically-ground-truthed corpus from
``generate_fashion_corpus.py --detect``.

Typical run (TPU, ~minutes):
    python scripts/generate_fashion_corpus.py --detect --out data/detect_synth \
        --n-train 2400 --n-val 300 --imgsz 320
    python scripts/train_yolo.py --data data/detect_synth --epochs 30

Saves fp16 weights + a class-name sidecar under --out
(default models/yolo_synth/), which load_yolo_cropper picks up by default.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description="Train JAX YOLOv8 on synthetic boxes")
    p.add_argument("--data", default="data/detect_synth")
    p.add_argument("--out", default="models/yolo_synth")
    p.add_argument("--imgsz", type=int, default=320)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--weight-decay", type=float, default=5e-4)
    p.add_argument("--warmup-epochs", type=float, default=3.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--init-weights", default=None,
                   help="warm-start: graft every same-shaped leaf from this "
                        ".npz (class-count-dependent head leaves keep fresh "
                        "init when the class sets differ)")
    p.add_argument("--tag", default="synth",
                   help="weight filename suffix: yolov8{width}_{tag}.npz")
    p.add_argument("--width", choices=["n", "s"], default="n",
                   help="width plan: -n (synthetic default) or full -s")
    p.add_argument("--log-every", type=int, default=20)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from clip_lora_match_tpu.models.io import save_params
    from clip_lora_match_tpu.models.yolo.train import (
        DetectDataset,
        YoloTrainState,
        init_detect_biases,
        make_yolo_train_step,
    )
    from clip_lora_match_tpu.models.yolo.yolov8 import WIDTHS, WIDTHS_N, init_params

    classes = open(os.path.join(args.data, "classes.txt")).read().split()
    ds = DetectDataset(
        os.path.join(args.data, "boxes_train.csv"), args.imgsz
    )
    print(f"[train_yolo] {len(ds)} images, {len(classes)} classes, "
          f"imgsz {args.imgsz}, width -{args.width}")

    params = init_params(
        jax.random.PRNGKey(args.seed),
        widths=WIDTHS_N if args.width == "n" else WIDTHS,
        num_classes=len(classes),
    )
    params = init_detect_biases(params, args.imgsz)

    if args.init_weights:
        from clip_lora_match_tpu.models.io import load_params

        def _graft(dst, src):
            # walk containers in lockstep; graft leaves whose shapes match,
            # keep fresh init otherwise (class-head leaves). Live trees hold
            # lists; unflatten_params restores them as {"0": ...} dicts, so
            # a dst list pairs with str(i) keys in a src dict.
            n = 0
            if isinstance(dst, dict) and isinstance(src, dict):
                items = [(k, k) for k in dst if k in src]
            elif isinstance(dst, list):
                src_get = (
                    (lambda i: src.get(str(i))) if isinstance(src, dict)
                    else (lambda i: src[i] if i < len(src) else None)
                )
                items = [
                    (i, i) for i in range(len(dst)) if src_get(i) is not None
                ]
                src = {i: src_get(i) for i, _ in items}
            else:
                return 0
            for dk, sk in items:
                v = dst[dk]
                if isinstance(v, (dict, list)):
                    n += _graft(v, src[sk])
                elif getattr(src[sk], "shape", None) == getattr(v, "shape", ()):
                    dst[dk] = jnp.asarray(src[sk], v.dtype)
                    n += 1
            return n

        loaded = load_params(args.init_weights)
        n_graft = _graft(params, loaded)
        n_total = len(jax.tree_util.tree_leaves(params))
        print(f"[train_yolo] warm-start from {args.init_weights}: "
              f"{n_graft}/{n_total} leaves grafted")

    steps_per_epoch = len(ds) // args.batch_size
    total = max(2, steps_per_epoch * args.epochs)
    # clamp warmup below the horizon (smoke-scale runs have < warmup steps)
    warmup = min(int(steps_per_epoch * args.warmup_epochs), total - 1)
    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, max(warmup, 1), total, end_value=args.lr * 0.01,
    )
    tx = optax.chain(
        optax.clip_by_global_norm(10.0),
        optax.adamw(sched, weight_decay=args.weight_decay),
    )
    step = make_yolo_train_step(args.imgsz, tx)
    state = YoloTrainState(params, tx.init(params), jnp.zeros((), jnp.int32))

    rng = np.random.default_rng(args.seed)
    t0 = time.time()
    n_steps = 0
    for epoch in range(args.epochs):
        losses = []
        for batch in ds.batches(args.batch_size, rng):
            state, aux = step(state, batch)
            n_steps += 1
            if n_steps % args.log_every == 0:
                aux = {k: float(v) for k, v in aux.items()}
                losses.append(aux["loss"])
                print(
                    f"[train_yolo] epoch {epoch + 1} step {n_steps}/{total} "
                    f"loss {aux['loss']:.3f} (box {aux['box']:.3f} "
                    f"cls {aux['cls']:.3f} dfl {aux['dfl']:.3f}) "
                    f"fg {aux['num_fg']:.1f}",
                    flush=True,
                )
        dt = time.time() - t0
        print(f"[train_yolo] epoch {epoch + 1} done ({dt:.0f}s elapsed, "
              f"{n_steps * args.batch_size / dt:.0f} img/s)")

    params_f16 = jax.tree.map(
        lambda x: np.asarray(x, np.float16), jax.device_get(state.params)
    )
    os.makedirs(args.out, exist_ok=True)
    wpath = os.path.join(args.out, f"yolov8{args.width}_{args.tag}.npz")
    save_params(wpath, params_f16)
    with open(os.path.join(args.out, "meta.json"), "w") as f:
        json.dump(
            {
                "classes": classes,
                "imgsz": args.imgsz,
                "width": args.width,
                "epochs": args.epochs,
                "train_images": len(ds),
            },
            f,
            indent=2,
        )
    print(f"[train_yolo] saved {wpath}")


if __name__ == "__main__":
    main()
