"""Serving concurrency bench (VERDICT r3 #4): drive the API handler layer
with N concurrent clients and record p50/p99 latency + throughput, batch
queue ON vs OFF.

The reference serves this traffic through FastAPI endpoints
(ref:src/api/main.py:172-250) whose async defs serialized every request
behind the encoder; this repo's handler layer + EncoderBatchQueue coalesces
concurrent encodes into device batches. This bench quantifies that.

Workload per client: mixed search-by-text (70%), search-by-image (20%),
report (10%) against a pre-seeded index — the lost-and-found serving mix.

Usage: python scripts/bench_serving.py [--clients 1 4 16] [--requests 40]
       [--index-size 512] [--out results/serving_bench.json]
"""

import argparse
import io
import json
import os
import random
import statistics
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_stack(tmp, use_queue: bool, index_size: int, corpus):
    import jax
    import jax.numpy as jnp

    from clip_lora_match_tpu.core.config import ClipConfig
    from clip_lora_match_tpu.models import clip as jclip
    from clip_lora_match_tpu.models.encoder import ClipEncoder
    from clip_lora_match_tpu.services import (
        FinderConfig,
        FinderService,
        SeekerConfig,
        SeekerService,
    )
    from clip_lora_match_tpu.db.store import SqliteStore

    cfg = ClipConfig()
    params = jclip.init_params(jax.random.PRNGKey(0), cfg.arch)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params,
    )
    enc = ClipEncoder(params, arch=cfg.arch, config=cfg, compute_dtype="bfloat16")
    if use_queue:
        from clip_lora_match_tpu.services import QueuedEncoder

        enc = QueuedEncoder(enc)
    sub = os.path.join(tmp, "queue" if use_queue else "plain")
    os.makedirs(sub, exist_ok=True)
    store = SqliteStore(os.path.join(sub, "db.sqlite"))
    finder = FinderService(
        enc,
        FinderConfig(
            index_path=os.path.join(sub, "index.npz"),
            reported_images_dir=os.path.join(sub, "reported", "images"),
            k_dim=cfg.arch.projection_dim,
            persist_every_insert=False,
        ),
        store=store,
    )
    # seed the index: report index_size items (batched encode via the text
    # path would skip the report flow; keep it honest but fast by feeding
    # the finder directly)
    t0 = time.perf_counter()
    for i in range(index_size):
        path, text = corpus[i % len(corpus)]
        finder.report_item(path, description=f"{text} #{i}", location="rak A")
    print(
        f"[serving] seeded {index_size} items in "
        f"{time.perf_counter() - t0:.1f}s (queue={use_queue})",
        file=sys.stderr,
    )
    seeker = SeekerService(
        enc, SeekerConfig(index_path=finder.cfg.index_path), index=finder.index
    )
    return enc, finder, seeker


def drive(finder, seeker, corpus, n_clients: int, n_requests: int, data_dir):
    from clip_lora_match_tpu.api.handlers import Upload, handle_report, handle_search

    lat = {"search_text": [], "search_image": [], "report": []}
    lock = threading.Lock()
    errs = []

    def client(cid):
        rng = random.Random(cid)
        for i in range(n_requests):
            r = rng.random()
            path, text = corpus[rng.randrange(len(corpus))]
            try:
                if r < 0.7:
                    t0 = time.perf_counter()
                    handle_search(seeker, description=text, top_k=5,
                                  data_dir=data_dir)
                    kind = "search_text"
                elif r < 0.9:
                    with open(path, "rb") as f:
                        up = Upload(filename=os.path.basename(path),
                                    file=io.BytesIO(f.read()),
                                    content_type="image/jpeg")
                    t0 = time.perf_counter()
                    handle_search(seeker, image=up, top_k=5, data_dir=data_dir)
                    kind = "search_image"
                else:
                    with open(path, "rb") as f:
                        up = Upload(filename=os.path.basename(path),
                                    file=io.BytesIO(f.read()),
                                    content_type="image/jpeg")
                    t0 = time.perf_counter()
                    handle_report(finder, description=text, image=up,
                                  location="rak B")
                    kind = "report"
                dt = time.perf_counter() - t0
                with lock:
                    lat[kind].append(dt)
            except Exception as e:  # pragma: no cover - bench robustness
                with lock:
                    errs.append(repr(e))

    threads = [threading.Thread(target=client, args=(c,)) for c in range(n_clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    total = sum(len(v) for v in lat.values())
    out = {
        "clients": n_clients,
        "requests": total,
        "errors": len(errs),
        "qps": round(total / wall, 2),
        "wall_s": round(wall, 2),
    }
    for kind, xs in lat.items():
        if not xs:
            continue
        xs = sorted(xs)
        out[f"{kind}_p50_ms"] = round(1e3 * statistics.median(xs), 1)
        out[f"{kind}_p99_ms"] = round(1e3 * xs[min(len(xs) - 1, int(0.99 * len(xs)))], 1)
    if errs:
        out["first_error"] = errs[0]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, nargs="+", default=[1, 4, 16])
    ap.add_argument("--requests", type=int, default=40)
    ap.add_argument("--index-size", type=int, default=512)
    ap.add_argument("--corpus", default="data/fashion_synth/images")
    ap.add_argument("--out", default="results/serving_bench.json")
    args = ap.parse_args()

    import glob

    paths = sorted(glob.glob(os.path.join(args.corpus, "*.jpg")))[:64]
    if not paths:
        # render a tiny corpus on the fly
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        import generate_fashion_corpus as gen

        d = tempfile.mkdtemp(prefix="clm_serving_imgs_")
        combos = [
            (c, a, g, p)
            for c in list(gen.COLOURS)[:4]
            for a in list(gen.ARTICLES)[:4]
            for g in gen.GENDERS
            for p in gen.PATTERNS[:2]
        ][:64]
        paths = []
        for i, (c, a, g, p) in enumerate(combos):
            pth = os.path.join(d, f"{i:03d}.jpg")
            gen.render(c, a, g, p, "grey" if c != "grey" else "red").save(
                pth, quality=92
            )
            paths.append(pth)
    corpus = [
        (p, f"tas pink {os.path.basename(p).split('.')[0]}") for p in paths
    ]

    results = {"queue_on": [], "queue_off": []}
    with tempfile.TemporaryDirectory(prefix="clm_serving_") as tmp:
        for use_queue, key in ((False, "queue_off"), (True, "queue_on")):
            enc, finder, seeker = build_stack(
                tmp, use_queue, args.index_size, corpus
            )
            # warm both encode buckets
            drive(finder, seeker, corpus, 2, 3, tmp)
            for c in args.clients:
                r = drive(finder, seeker, corpus, c, args.requests, tmp)
                r["queue"] = use_queue
                results[key].append(r)
                print(f"[serving] queue={use_queue} {json.dumps(r)}",
                      file=sys.stderr)
            if use_queue:
                enc.close()

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
