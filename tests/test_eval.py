"""Eval protocol + comparator + qualitative + report tests (synthetic data
with known answers; artifact shape parity vs the reference's committed JSON)."""

import json
import os

import numpy as np
import pytest

from clip_lora_match_tpu.eval import (
    BASE_NAME,
    CLIPEvaluator,
    EvalData,
    create_evaluation_report,
    diagonal_metrics,
    find_failure_cases,
    load_eval_csv,
    relative_improvement,
    threshold_metrics,
)


def _unit(v):
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def test_diagonal_metrics_perfect():
    emb = _unit(np.eye(8, 16, dtype=np.float32) + 0.01)
    m = diagonal_metrics(emb, emb)
    assert m["recall@1"] == 1.0 and m["mrr"] == 1.0 and m["matching_accuracy"] == 1.0
    assert m["t2i_recall@1"] == 1.0 and m["map"] == m["mrr"]


def test_diagonal_metrics_known_ranks():
    """Construct sims where item 0's match is at rank 3 exactly."""
    img = np.eye(4, 8, dtype=np.float32)
    txt = np.eye(4, 8, dtype=np.float32)
    # make image 0 closer to texts 1 and 2 than to text 0
    img[0] = _unit(0.2 * txt[0] + 0.9 * txt[1] + 0.5 * txt[2])
    m = diagonal_metrics(img, txt, ks=(1, 2, 3))
    assert m["recall@1"] == 0.75  # items 1..3 perfect, item 0 failed
    assert m["recall@3"] == 1.0
    assert m["mrr"] == pytest.approx((1 / 3 + 3) / 4)


def test_diagonal_artifact_shape_matches_reference():
    rng = np.random.default_rng(0)
    img = _unit(rng.normal(size=(20, 16)).astype(np.float32))
    txt = _unit(rng.normal(size=(20, 16)).astype(np.float32))
    m = diagonal_metrics(img, txt)
    ref_keys = {
        "recall@1", "recall@5", "recall@10", "mrr", "map",
        "t2i_recall@1", "t2i_recall@5", "t2i_recall@10", "matching_accuracy",
    }
    assert set(m) == ref_keys  # exact model_comparison.json per-model shape


def test_threshold_metrics_self_query():
    """Querying the index with itself: every query's best hit is itself."""
    rng = np.random.default_rng(1)
    emb = _unit(rng.normal(size=(30, 16)).astype(np.float32))
    m = threshold_metrics(emb, emb, ks=(1, 5), threshold=0.99)
    # each query has exactly itself as relevant (random vectors ⇒ cos<0.99)
    assert m["recall@1"] == 1.0 and m["mrr"] == 1.0 and m["ap"] == 1.0
    assert m["precision@5"] == pytest.approx(0.2)
    assert m["avg_query_time_ms"] >= 0
    assert m["num_queries_with_relevant"] == 30


def test_threshold_metrics_no_relevant():
    a = _unit(np.ones((3, 8), np.float32))
    b = -a  # cosine -1 < threshold
    m = threshold_metrics(a, b, ks=(1,), threshold=0.7)
    assert m["num_queries_with_relevant"] == 0
    assert m["recall@1"] == 0.0


def test_relative_improvement():
    base = {"recall@1": 0.10, "mrr": 0.2}
    tuned = {"recall@1": 0.15, "mrr": 0.25}
    imp = relative_improvement(base, tuned)
    assert imp["recall@1"] == pytest.approx(50.0)
    assert imp["mrr"] == pytest.approx(25.0)


def test_failure_cases_pick_worst():
    img = _unit(np.eye(6, 8, dtype=np.float32) + 0.01)
    txt = img.copy()
    txt[2] = _unit(img[5] * 0.9 + 0.1 * img[2])  # text 2 retrieves image 5 first
    cases = find_failure_cases(img, txt, [f"t{i}" for i in range(6)], num_cases=2)
    assert cases[0].query_index == 2
    assert cases[0].correct_rank > 1
    assert 5 in cases[0].top_k


def test_load_eval_csv_flexible_columns(tmp_path):
    from PIL import Image

    img = tmp_path / "a.jpg"
    Image.new("RGB", (10, 10)).save(img)
    csv_path = tmp_path / "data.csv"
    csv_path.write_text(
        f"filepath,caption\n{img},a red bag\nmissing.jpg,lost row\n"
    )
    data = load_eval_csv(str(csv_path), image_root=str(tmp_path))
    assert data.texts == ["a red bag"]
    assert data.skipped == 1


def test_report_and_comparison_json(tmp_path):
    results = {
        BASE_NAME: {
            "recall@1": 0.1155, "recall@5": 0.2984, "recall@10": 0.4312,
            "mrr": 0.2156, "map": 0.2156, "matching_accuracy": 0.1155,
        },
        "CLIP+LoRA (Epoch 1)": {
            "recall@1": 0.1684, "recall@5": 0.4494, "recall@10": 0.6183,
            "mrr": 0.3065, "map": 0.3065, "matching_accuracy": 0.1684,
        },
    }
    from clip_lora_match_tpu.eval import ModelComparator

    out_json = str(tmp_path / "model_comparison.json")
    ModelComparator.save_json(results, out_json)
    with open(out_json) as f:
        loaded = json.load(f)
    assert loaded == results
    imp = ModelComparator.summary(results)
    assert imp["CLIP+LoRA (Epoch 1)"]["recall@1"] == pytest.approx(45.8, abs=0.5)
    report = create_evaluation_report(
        results, str(tmp_path / "evaluation_report.md"), imp
    )
    text = open(report).read()
    assert "| Base CLIP (No LoRA) | 0.1155 |" in text
    assert "Deploy **CLIP+LoRA (Epoch 1)**" in text
    # non-chance base: recommendation quotes percent-vs-base
    assert "+46% vs base" in text


def test_epoch_over_epoch_and_chance_base_report(tmp_path):
    """Against a chance-level base the report must NOT quote percent-vs-base
    noise; epoch_over_epoch gives the honest trajectory (VERDICT r2 weak #4)."""
    results = {
        BASE_NAME: {"recall@1": 0.0002, "recall@5": 0.0016, "recall@10": 0.002,
                    "mrr": 0.0021, "map": 0.0021, "matching_accuracy": 0.0002},
        "CLIP+LoRA (Epoch 1)": {"recall@1": 0.1171, "recall@5": 0.3929,
                                "recall@10": 0.5661, "mrr": 0.2526,
                                "map": 0.2526, "matching_accuracy": 0.1171},
        "CLIP+LoRA (Epoch 2)": {"recall@1": 0.2306, "recall@5": 0.6109,
                                "recall@10": 0.8021, "mrr": 0.4028,
                                "map": 0.4028, "matching_accuracy": 0.2306},
    }
    from clip_lora_match_tpu.eval import ModelComparator

    eoe = ModelComparator.epoch_over_epoch(results)
    assert list(eoe) == ["CLIP+LoRA (Epoch 2) vs Epoch 1"]
    assert eoe["CLIP+LoRA (Epoch 2) vs Epoch 1"]["recall@1"] == pytest.approx(
        96.9, abs=0.1
    )
    report = create_evaluation_report(
        results, str(tmp_path / "report.md"), eoe,
        improvements_title="Improvement (epoch over epoch)",
    )
    text = open(report).read()
    assert "Improvement (epoch over epoch)" in text
    assert "chance-level base" in text
    assert "% vs base" not in text


def test_evaluator_end_to_end(tmp_path):
    from PIL import Image

    from tests.test_index_retrieval import TINY
    from clip_lora_match_tpu.core.config import ClipConfig, PreprocessConfig
    from clip_lora_match_tpu.models import clip as jclip
    from clip_lora_match_tpu.models.encoder import ClipEncoder
    import jax

    rng = np.random.default_rng(0)
    rows = ["image_path,text"]
    for i in range(6):
        p = tmp_path / f"{i}.jpg"
        Image.fromarray(
            rng.integers(0, 255, (40, 40, 3), dtype=np.uint8), "RGB"
        ).save(p)
        rows.append(f"{p},unique item {i}")
    csv_path = tmp_path / "val.csv"
    csv_path.write_text("\n".join(rows))

    params = jclip.init_params(jax.random.PRNGKey(0), TINY)
    enc = ClipEncoder(
        params, arch=TINY,
        config=ClipConfig(arch=TINY, preprocess=PreprocessConfig(image_size=32)),
    )
    data = load_eval_csv(str(csv_path))
    ev = CLIPEvaluator(enc, batch_size=4)
    out = ev.evaluate(data, ks=(1, 3))
    assert out["num_samples"] == 6
    assert 0.0 <= out["diagonal"]["recall@1"] <= 1.0
    art = ev.evaluation_results_artifact(data, ks=(1, 3))
    assert set(art) == {"retrieval", "matching_accuracy"}
