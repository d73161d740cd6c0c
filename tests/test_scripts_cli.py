"""Subprocess smoke tests for the CLI layer (marked slow: each spawns a
fresh interpreter with full ViT-B/32 random init on CPU)."""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = {
    **os.environ,
    "PYTHONPATH": "",
    "PALLAS_AXON_POOL_IPS": "",
    "JAX_PLATFORMS": "cpu",
    "USE_TF": "0",
}


def _run(args, timeout=240):
    return subprocess.run(
        [sys.executable] + args, cwd=REPO, env=ENV,
        capture_output=True, text=True, timeout=timeout,
    )


@pytest.mark.slow
def test_build_and_search_cli(tmp_path):
    out = str(tmp_path / "idx.npz")
    r = _run(["scripts/build_custom_index.py", "--csv", "data/custom/my_items.csv",
              "--out", out])
    assert r.returncode == 0, r.stderr[-800:]
    assert "5 items" in r.stdout
    r = _run(["scripts/demo_search_text_custom.py", "--index", out,
              "--query", "payung hitam"])
    assert r.returncode == 0, r.stderr[-800:]
    assert "Payung" in r.stdout


def test_verify_data_structure_cli():
    r = _run(["scripts/verify_data_structure.py", "--epochs"])  # no epochs
    assert r.returncode == 0, r.stdout + r.stderr[-500:]
    assert "ALL OK" in r.stdout


@pytest.mark.slow
def test_yolo_train_eval_cli(tmp_path):
    """Detector pipeline end-to-end at smoke scale: generate GT corpus →
    train a few steps → evaluate against GT (metrics parse, no asserted
    accuracy at this scale)."""
    data = str(tmp_path / "detect")
    r = _run(["scripts/generate_fashion_corpus.py", "--detect", "--out", data,
              "--n-train", "16", "--n-val", "4", "--imgsz", "160"])
    assert r.returncode == 0, r.stderr[-800:]
    out = str(tmp_path / "weights")
    r = _run(["scripts/train_yolo.py", "--data", data, "--out", out,
              "--imgsz", "160", "--epochs", "1", "--batch-size", "8",
              "--log-every", "1"], timeout=480)
    assert r.returncode == 0, r.stderr[-800:]
    assert os.path.exists(os.path.join(out, "yolov8n_synth.npz"))
    r = _run(["scripts/eval_yolo.py", "--data", data,
              "--weights", os.path.join(out, "yolov8n_synth.npz"),
              "--limit", "2"], timeout=480)
    assert r.returncode == 0, r.stderr[-800:]
    metrics = json.loads(r.stdout[r.stdout.index("{"):])
    assert set(metrics) >= {"recall@0.5", "mean_matched_iou", "precision@0.5"}


def test_eval_similarity_cli(tmp_path):
    out = str(tmp_path / "idx.npz")
    r = _run(["scripts/build_custom_index.py", "--csv", "data/custom/my_items.csv",
              "--out", out])
    assert r.returncode == 0
    r = _run(["scripts/eval_similarity.py", "--index", out, "--queries", "16",
              "--iters", "3"])
    assert r.returncode == 0, r.stderr[-800:]
    assert "queries/sec" in r.stdout


@pytest.mark.slow
def test_train_lora_cli_chain_steps(tmp_path):
    """--chain-steps plumbs TrainingConfig.chain_steps through the CLI; the
    tiny-arch run must complete with a finite loss (trajectory equality to
    unchained is pinned at trainer level in test_training.py)."""
    cfg = tmp_path / "lora.yaml"
    cfg.write_text(
        "training:\n"
        f"  output_dir: {tmp_path / 'out'}\n"
        "  batch_size: 8\n"
        "  num_epochs: 1\n"
        "data:\n"
        "  train_csv: data/text/train_fashion.csv\n"
        "  val_csv: data/text/val_fashion.csv\n"
    )
    r = _run([
        "scripts/train_lora.py", "--arch", "tiny", "--config", str(cfg),
        "--max-steps-per-epoch", "4", "--chain-steps", "2",
    ], timeout=360)
    assert r.returncode == 0, r.stderr[-800:]
    assert "[train] done: 1 epochs, 4 steps" in r.stdout
    assert "nan" not in r.stdout.lower()


@pytest.mark.slow
def test_learn_bpe_cli(tmp_path):
    """learn_bpe CLI: corpus CSV → vocab/merges files that round-trip through
    ClipTokenizer with real merge structure."""
    csv_path = tmp_path / "caps.csv"
    csv_path.write_text(
        "image_path,text\n"
        + "\n".join(
            f"img{i}.jpg,\"black leggings for women, category apparel\""
            for i in range(8)
        )
        + "\n"
    )
    out = tmp_path / "bpe"
    r = _run([
        "scripts/learn_bpe.py", "--csv", str(csv_path),
        "--merges", "64", "--out", str(out),
    ])
    assert r.returncode == 0, r.stderr[-800:]
    from clip_lora_match_tpu.tokenizer import ClipTokenizer

    tok = ClipTokenizer.from_dir(str(out))
    units = tok.tokenize("black leggings for women")
    assert len(units) <= 8 and any(len(u) > 4 for u in units), units


@pytest.mark.slow
def test_serve_cli_stdlib_binding(tmp_path):
    """serve.py boots the stdlib binding end-to-end: subprocess serves
    /health over a real socket with a random-init encoder + sqlite store."""
    import re
    import time
    import urllib.request

    # stderr goes to a file, not a pipe: a chatty encoder init (>64 KB of
    # JAX/absl warnings) would fill an undrained pipe and deadlock the child
    # before it ever prints the port banner.
    stderr_path = tmp_path / "serve.stderr"
    stderr_f = stderr_path.open("w")
    # Drop PYTHONUNBUFFERED so this test exercises serve.py's explicit
    # banner flush (block-buffered stdout is what wrappers parsing the
    # port line through a pipe actually see).
    env = {k: v for k, v in ENV.items() if k != "PYTHONUNBUFFERED"}
    proc = subprocess.Popen(
        [sys.executable, "scripts/serve.py", "--binding", "stdlib",
         "--host", "127.0.0.1", "--port", "0",
         "--db", str(tmp_path / "serve.sqlite")],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=stderr_f,
        text=True,
    )
    try:
        port = None
        deadline = time.time() + 240
        while time.time() < deadline:
            line = proc.stdout.readline()
            if not line:
                if proc.poll() is not None:
                    break
                continue
            m = re.search(r"listening on http://[^:]+:(\d+)", line)
            if m:
                port = int(m.group(1))
                break
        assert port, f"server never announced a port; rc={proc.poll()} " \
                     f"stderr={stderr_path.read_text()[-800:]}"
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/health", timeout=30
        ) as resp:
            assert resp.status == 200
            assert json.loads(resp.read())["status"] == "ok"
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()
        stderr_f.close()
