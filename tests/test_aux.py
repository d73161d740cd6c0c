"""Auxiliary subsystems: profiling timer, encoder batch queue, config loaders
parsed against the REFERENCE's own YAML files, metrics writer."""

import json
import threading

import numpy as np
import pytest

from clip_lora_match_tpu.core.config import (
    load_clip_config,
    load_db_config,
    load_eval_config,
    load_lora_config,
    load_yolo_config,
)
from clip_lora_match_tpu.core.logging import MetricsWriter
from clip_lora_match_tpu.core.profiling import StepTimer
from clip_lora_match_tpu.services.batch_queue import EncoderBatchQueue
from tests.test_index_retrieval import TINY, tiny_encoder  # noqa: F401


def test_step_timer():
    t = StepTimer()
    for _ in range(5):
        with t:
            pass
    s = t.summary()
    assert s["count"] == 5
    assert {"avg_query_time_ms", "p50_ms", "p95_ms", "max_ms"} <= set(s)
    assert StepTimer().summary() == {"count": 0}


def test_metrics_writer(tmp_path):
    path = str(tmp_path / "m.jsonl")
    w = MetricsWriter(path)
    w.write("train_step", loss=1.5, step=1)
    w.write("val", loss=1.2)
    w.close()
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["event"] == "train_step" and lines[0]["loss"] == 1.5
    assert "time" in lines[1]


# -- config parity vs the reference's own YAML files -------------------------


def test_reference_clip_config_parses(reference_root):
    cfg = load_clip_config(f"{reference_root}/config/clip_config.yaml")
    assert cfg.model_name == "openai/clip-vit-base-patch32"
    assert cfg.preprocess.image_size == 224
    assert cfg.preprocess.mean[0] == pytest.approx(0.48145466)
    assert cfg.preprocess.max_text_length == 77
    assert cfg.batch_size == 16
    assert cfg.lora_weights_dir == "models/clip/lora"


def test_reference_lora_config_parses(reference_root):
    lora, train = load_lora_config(f"{reference_root}/config/lora_config.yaml")
    assert lora.r == 8 and lora.alpha == 16 and lora.dropout == 0.1
    assert tuple(lora.target_modules) == ("q_proj", "k_proj", "v_proj", "out_proj")
    assert lora.scaling == 2.0
    assert train.seed == 42 and train.batch_size == 8
    assert train.learning_rate == pytest.approx(1e-4)
    assert train.temperature == 0.07 and train.warmup_ratio == 0.1
    assert train.output_dir == "models/saved/clip-lora"


def test_reference_yolo_config_parses(reference_root):
    cfg = load_yolo_config(f"{reference_root}/config/yolo_config.yaml")
    assert cfg.name == "yolov8s"
    assert cfg.conf_threshold == 0.25 and cfg.iou_threshold == 0.45
    assert cfg.max_det == 5 and cfg.agnostic_nms is False
    assert cfg.filename_pattern == "{stem}_crop_{idx}.jpg"


def test_reference_db_and_eval_configs_parse(reference_root):
    db = load_db_config(f"{reference_root}/config/db_config.yaml")
    assert db.dbname == "balikkin_db" and db.port == 5432
    ev = load_eval_config(f"{reference_root}/config/evaluation_config.yaml")
    assert tuple(ev.recall_k_values) == (1, 5, 10)
    assert tuple(ev.lora_epochs) == (1,)
    assert ev.embedding_viz_method == "tsne"


def test_missing_configs_default():
    assert load_clip_config("/nonexistent.yaml").preprocess.image_size == 224
    assert load_db_config(None).host == "localhost"


# -- encoder micro-batching queue ---------------------------------------------


def test_batch_queue_matches_direct(tiny_encoder):  # noqa: F811
    q = EncoderBatchQueue(tiny_encoder, max_batch=8, linger_ms=5)
    try:
        direct = tiny_encoder.encode_text("tas pink kanken")
        queued = q.encode_text("tas pink kanken")
        np.testing.assert_allclose(queued, direct, atol=1e-6)
    finally:
        q.close()


def test_batch_queue_concurrent_coalesces(tiny_encoder):  # noqa: F811
    q = EncoderBatchQueue(tiny_encoder, max_batch=16, linger_ms=20)
    results = {}
    errs = []

    def go(i):
        try:
            results[i] = q.encode_text(f"item nomor {i}")
        except Exception as e:
            errs.append(e)

    threads = [threading.Thread(target=go, args=(i,)) for i in range(12)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    q.close()
    assert not errs and len(results) == 12
    for i in range(12):
        direct = tiny_encoder.encode_text(f"item nomor {i}")
        np.testing.assert_allclose(results[i], direct, atol=1e-5)


def test_batch_queue_closed_raises(tiny_encoder):  # noqa: F811
    q = EncoderBatchQueue(tiny_encoder)
    q.close()
    with pytest.raises(RuntimeError):
        q.encode_text("x")


def test_set_seed_deterministic():
    """set_seed (ref:scripts/train_lora.py:22-26) must make host RNGs and the
    returned key reproducible."""
    import random

    import numpy as np

    from clip_lora_match_tpu.utils import set_seed

    k1 = set_seed(42)
    a = (random.random(), np.random.rand(), np.asarray(k1).tolist())
    k2 = set_seed(42)
    b = (random.random(), np.random.rand(), np.asarray(k2).tolist())
    assert a == b
