"""API layer tests.

The endpoint cores (api/handlers.py) are framework-free, so report/search/
items validation + wire semantics run in THIS environment's suite (fastapi
is not installed here — CLAUDE.md). When fastapi IS available, the same
scenarios additionally run through the real FastAPI binding via TestClient.
"""

import datetime as dt
import io
import os

import numpy as np
import pytest

from clip_lora_match_tpu.api.handlers import (
    ApiError,
    Upload,
    handle_items,
    handle_report,
    handle_search,
)
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


@pytest.fixture()
def stack(tmp_path):
    """finder + seeker + store over a tiny random CLIP — the exact object
    graph create_app builds, minus the fastapi binding."""
    from PIL import Image
    import jax

    from tests.test_index_retrieval import TINY
    from clip_lora_match_tpu.core.config import ClipConfig, PreprocessConfig
    from clip_lora_match_tpu.db.store import SqliteStore
    from clip_lora_match_tpu.models import clip as jclip
    from clip_lora_match_tpu.models.encoder import ClipEncoder
    from clip_lora_match_tpu.services import (
        FinderConfig,
        FinderService,
        SeekerConfig,
        SeekerService,
    )

    params = jclip.init_params(jax.random.PRNGKey(0), TINY)
    enc = ClipEncoder(
        params, arch=TINY,
        config=ClipConfig(arch=TINY, preprocess=PreprocessConfig(image_size=32)),
    )
    store = SqliteStore(str(tmp_path / "db.sqlite"))
    index_path = str(tmp_path / "index.npz")
    finder = FinderService(
        enc,
        FinderConfig(
            index_path=index_path,
            reported_images_dir=str(tmp_path / "reported" / "images"),
            k_dim=enc.arch.projection_dim,
        ),
        store=store,
    )
    seeker = SeekerService(enc, SeekerConfig(index_path=index_path), index=finder.index)
    img = tmp_path / "up.jpg"
    Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (40, 40, 3), dtype=np.uint8), "RGB"
    ).save(img)
    return finder, seeker, store, img, str(tmp_path)


def _upload(path, name=None, content_type="image/jpeg"):
    return Upload(
        file=open(path, "rb"),
        filename=name or os.path.basename(path),
        content_type=content_type,
    )


def test_report_items_search_roundtrip(stack):
    finder, seeker, store, img, data_dir = stack
    body = handle_report(
        finder,
        description="tas pink kanken",
        location="lab iot",
        found_at="2026-08-01T10:00:00",
        image=_upload(img),
    )
    # wire parity: the reference echoes the location-joined stored full_text
    # (ref:src/api/main.py:155-160 returns db_item.description), NOT the raw
    # form field
    assert body.description == "tas pink kanken, ditemukan di lab iot"
    assert body.location == "lab iot"
    assert body.found_at == dt.datetime(2026, 8, 1, 10, 0)
    assert os.path.exists(body.image_path)

    items = handle_items(store)
    assert len(items) == 1
    assert items[0].description == "tas pink kanken, ditemukan di lab iot"

    res = handle_search(
        seeker, description="tas pink kanken, ditemukan di lab iot",
        data_dir=data_dir,
    )
    assert len(res.results) == 1
    assert res.results[0].text.startswith("tas pink")
    assert res.query_image_path is None


def test_search_requires_input(stack):
    _, seeker, _, _, data_dir = stack
    with pytest.raises(ApiError) as e:
        handle_search(seeker, data_dir=data_dir)
    assert e.value.status_code == 400
    with pytest.raises(ApiError) as e:
        handle_search(seeker, description="   ", data_dir=data_dir)
    assert e.value.status_code == 400
    # empty filename normalizes to no-image (ref:main.py:185-199)
    with pytest.raises(ApiError) as e:
        handle_search(
            seeker, image=Upload(file=io.BytesIO(b""), filename="  "),
            data_dir=data_dir,
        )
    assert e.value.status_code == 400


def test_search_image_query_echoes_deleted_path(stack):
    finder, seeker, _, img, data_dir = stack
    handle_report(finder, description="tas pink kanken", image=_upload(img))
    res = handle_search(seeker, image=_upload(img), top_k=1, data_dir=data_dir)
    assert len(res.results) == 1
    # reference semantics: the path is echoed but the file already unlinked
    # (ref:main.py:231-234 deletes temp_path in finally)
    assert res.query_image_path is not None
    assert res.query_image_path.startswith(
        os.path.join(data_dir, "tmp", "queries")
    )
    assert not os.path.exists(res.query_image_path)


def test_concurrent_same_name_queries_do_not_collide(stack):
    """uuid-prefixed query saves: two uploads named image.jpg get distinct
    paths (the r2 version overwrote one with the other)."""
    finder, seeker, _, img, data_dir = stack
    handle_report(finder, description="tas", image=_upload(img))
    p1 = handle_search(
        seeker, image=_upload(img, name="image.jpg"), data_dir=data_dir
    ).query_image_path
    p2 = handle_search(
        seeker, image=_upload(img, name="image.jpg"), data_dir=data_dir
    ).query_image_path
    assert p1 != p2


def test_report_rejects_non_image(stack):
    finder, _, _, _, _ = stack
    with pytest.raises(ApiError) as e:
        handle_report(
            finder, description="x",
            image=Upload(file=io.BytesIO(b"hello"), filename="a.txt",
                         content_type="text/plain"),
        )
    assert e.value.status_code == 400


def test_report_rejects_bad_found_at(stack):
    finder, _, _, img, _ = stack
    with pytest.raises(ApiError) as e:
        handle_report(
            finder, description="x", found_at="not-a-date", image=_upload(img)
        )
    assert e.value.status_code == 400


def test_report_wraps_internal_error(stack):
    _, _, _, img, _ = stack

    class Boom:
        def report_item(self, *a, **k):
            raise RuntimeError("db down")

    with pytest.raises(ApiError) as e:
        handle_report(Boom(), description="x", image=_upload(img))
    assert e.value.status_code == 500


def test_items_wraps_store_error():
    class BadStore:
        def all_items(self, order_desc=True):
            raise RuntimeError("no db")

    with pytest.raises(ApiError) as e:
        handle_items(BadStore())
    assert e.value.status_code == 500


# ---- real-FastAPI binding (runs only where fastapi is installed) ------------


@pytest.fixture()
def client(tmp_path):
    fastapi = pytest.importorskip("fastapi")  # noqa: F841
    from fastapi.testclient import TestClient
    from PIL import Image
    import jax

    from clip_lora_match_tpu.api.main import create_app
    from clip_lora_match_tpu.db.store import SqliteStore
    from tests.test_index_retrieval import TINY
    from clip_lora_match_tpu.core.config import ClipConfig, PreprocessConfig
    from clip_lora_match_tpu.models import clip as jclip
    from clip_lora_match_tpu.models.encoder import ClipEncoder

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


def test_http_report_and_items_and_search(client):
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
    assert body["description"] == "tas pink kanken, ditemukan di lab iot"
    assert body["location"] == "lab iot"

    items = c.get("/api/items").json()
    assert len(items) == 1
    assert items[0]["description"] == "tas pink kanken, ditemukan di lab iot"

    r = c.post("/api/search", data={"description": "tas pink kanken, ditemukan di lab iot"})
    assert r.status_code == 200
    res = r.json()["results"]
    assert len(res) == 1 and res[0]["text"].startswith("tas pink")


def test_http_validation_errors(client):
    c, img = client
    assert c.post("/api/search", data={}).status_code == 400
    assert c.post("/api/search", data={"description": "   "}).status_code == 400
    r = c.post(
        "/api/report",
        data={"description": "x"},
        files={"image": ("a.txt", b"hello", "text/plain")},
    )
    assert r.status_code == 400
    with open(img, "rb") as f:
        r = c.post(
            "/api/report",
            data={"description": "x", "found_at": "not-a-date"},
            files={"image": ("up.jpg", f, "image/jpeg")},
        )
    assert r.status_code == 400
