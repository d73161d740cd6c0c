"""API layer tests. Schemas always testable (pydantic is present); endpoint
tests run under fastapi.testclient when fastapi is installed, else skip."""

import datetime as dt

import numpy as np
import pytest

from clip_lora_match_tpu.api.schemas import (
    FoundItemModel,
    ReportItemResponse,
    SearchResponse,
    SearchResultModel,
)


def test_schemas_wire_shape():
    r = ReportItemResponse(
        id=1, image_path="a.jpg", description="tas",
        found_at=dt.datetime(2026, 1, 1),
    )
    d = r.model_dump()
    assert set(d) == {"id", "image_path", "description", "location", "found_at", "reporter"}
    s = SearchResponse(
        query_text="tas",
        results=[SearchResultModel(score=0.9, image_path="a.jpg", text="tas pink")],
    )
    d = s.model_dump()
    assert set(d) == {"query_text", "query_image_path", "results"}
    assert set(d["results"][0]) == {"score", "image_path", "text"}
    f = FoundItemModel(id=1, image_path="a.jpg", description="x")
    assert f.found_at is None  # tolerant of NULL found_at (reference would 500)


fastapi = pytest.importorskip("fastapi")


@pytest.fixture()
def client(tmp_path):
    from fastapi.testclient import TestClient
    from PIL import Image

    from clip_lora_match_tpu.api.main import create_app
    from clip_lora_match_tpu.db.store import SqliteStore
    from tests.test_index_retrieval import TINY
    from clip_lora_match_tpu.core.config import ClipConfig, PreprocessConfig
    from clip_lora_match_tpu.models import clip as jclip
    from clip_lora_match_tpu.models.encoder import ClipEncoder
    import jax

    params = jclip.init_params(jax.random.PRNGKey(0), TINY)
    enc = ClipEncoder(
        params, arch=TINY,
        config=ClipConfig(arch=TINY, preprocess=PreprocessConfig(image_size=32)),
    )
    app = create_app(
        encoder=enc,
        store=SqliteStore(str(tmp_path / "db.sqlite")),
        data_dir=str(tmp_path),
        index_path=str(tmp_path / "index.npz"),
    )
    img = tmp_path / "up.jpg"
    Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (40, 40, 3), dtype=np.uint8), "RGB"
    ).save(img)
    return TestClient(app), img


def test_health(client):
    c, _ = client
    assert c.get("/health").json() == {"status": "ok"}


def test_report_and_items_and_search(client):
    c, img = client
    with open(img, "rb") as f:
        r = c.post(
            "/api/report",
            data={
                "description": "tas pink kanken",
                "location": "lab iot",
                "found_at": "2026-08-01T10:00:00",
            },
            files={"image": ("up.jpg", f, "image/jpeg")},
        )
    assert r.status_code == 200, r.text
    body = r.json()
    assert body["description"] == "tas pink kanken"
    assert body["location"] == "lab iot"

    items = c.get("/api/items").json()
    assert len(items) == 1 and items[0]["description"] == "tas pink kanken"

    r = c.post("/api/search", data={"description": "tas pink kanken, ditemukan di lab iot"})
    assert r.status_code == 200
    res = r.json()["results"]
    assert len(res) == 1 and res[0]["text"].startswith("tas pink")


def test_search_requires_input(client):
    c, _ = client
    assert c.post("/api/search", data={}).status_code == 400
    assert c.post("/api/search", data={"description": "   "}).status_code == 400


def test_report_rejects_non_image(client):
    c, _ = client
    r = c.post(
        "/api/report",
        data={"description": "x"},
        files={"image": ("a.txt", b"hello", "text/plain")},
    )
    assert r.status_code == 400


def test_report_rejects_bad_found_at(client):
    c, img = client
    with open(img, "rb") as f:
        r = c.post(
            "/api/report",
            data={"description": "x", "found_at": "not-a-date"},
            files={"image": ("up.jpg", f, "image/jpeg")},
        )
    assert r.status_code == 400
