"""Live HTTP tests for the stdlib binding (api/http_server.py).

Unlike test_api.py (which calls the framework-free handler cores directly),
these start a real ThreadingHTTPServer on an ephemeral port and exercise the
full wire path — sockets, multipart encoding, JSON bodies, CORS headers,
static files — matching the reference's REST surface
(ref:src/api/main.py:94-295) in an environment without fastapi/uvicorn.
"""

import json
import os
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest


def _multipart(fields=None, files=None, boundary="clmtestboundary7316"):
    """Encode fields (str→str) + files (name → (filename, ctype, bytes)) as
    multipart/form-data; returns (body, content_type)."""
    out = bytearray()
    for k, v in (fields or {}).items():
        out += (
            f"--{boundary}\r\n"
            f'Content-Disposition: form-data; name="{k}"\r\n\r\n'
            f"{v}\r\n"
        ).encode()
    for k, (filename, ctype, data) in (files or {}).items():
        out += (
            f"--{boundary}\r\n"
            f'Content-Disposition: form-data; name="{k}"; filename="{filename}"\r\n'
            f"Content-Type: {ctype}\r\n\r\n"
        ).encode()
        out += data + b"\r\n"
    out += f"--{boundary}--\r\n".encode()
    return bytes(out), f"multipart/form-data; boundary={boundary}"


def _request(url, method="GET", body=None, content_type=None):
    """Returns (status, headers, parsed-json-or-bytes); never raises on 4xx/5xx."""
    req = urllib.request.Request(url, data=body, method=method)
    if content_type:
        req.add_header("Content-Type", content_type)
    try:
        resp = urllib.request.urlopen(req, timeout=30)
    except urllib.error.HTTPError as e:
        resp = e
    raw = resp.read()
    headers = dict(resp.headers)
    if headers.get("Content-Type", "").startswith("application/json"):
        return resp.status, headers, json.loads(raw)
    return resp.status, headers, raw


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    from PIL import Image
    import jax

    from clip_lora_match_tpu.api.http_server import create_server, serve_background
    from clip_lora_match_tpu.core.config import ClipConfig, PreprocessConfig
    from clip_lora_match_tpu.db.store import SqliteStore
    from clip_lora_match_tpu.models import clip as jclip
    from clip_lora_match_tpu.models.encoder import ClipEncoder
    from tests.test_index_retrieval import TINY

    tmp = tmp_path_factory.mktemp("httpapi")
    params = jclip.init_params(jax.random.PRNGKey(0), TINY)
    enc = ClipEncoder(
        params, arch=TINY,
        config=ClipConfig(arch=TINY, preprocess=PreprocessConfig(image_size=32)),
    )
    srv = create_server(
        "127.0.0.1", 0,
        encoder=enc,
        store=SqliteStore(str(tmp / "db.sqlite")),
        data_dir=str(tmp),
        index_path=str(tmp / "index.npz"),
    )
    serve_background(srv)
    img = tmp / "up.jpg"
    Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (40, 40, 3), dtype=np.uint8), "RGB"
    ).save(img)
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield base, img, str(tmp)
    srv.shutdown()
    srv.server_close()


def test_health_and_cors(server):
    base, _, _ = server
    status, headers, body = _request(f"{base}/health")
    assert status == 200 and body == {"status": "ok"}
    assert headers["Access-Control-Allow-Origin"] == "*"
    # preflight
    req = urllib.request.Request(f"{base}/api/search", method="OPTIONS")
    resp = urllib.request.urlopen(req, timeout=30)
    assert resp.status == 204
    assert resp.headers["Access-Control-Allow-Origin"] == "*"


def test_report_items_search_over_the_wire(server):
    base, img, _ = server
    body, ctype = _multipart(
        fields={
            "description": "tas pink kanken",
            "location": "lab iot",
            "found_at": "2026-08-01T10:00:00",
        },
        files={"image": ("up.jpg", "image/jpeg", img.read_bytes())},
    )
    status, _, rep = _request(f"{base}/api/report", "POST", body, ctype)
    assert status == 200, rep
    # wire parity: echoes the location-joined stored text (ref:main.py:155-160)
    assert rep["description"] == "tas pink kanken, ditemukan di lab iot"
    assert rep["location"] == "lab iot"
    assert rep["found_at"].startswith("2026-08-01T10:00:00")

    status, _, items = _request(f"{base}/api/items")
    assert status == 200 and len(items) >= 1
    assert items[0]["description"] == "tas pink kanken, ditemukan di lab iot"

    body, ctype = _multipart(fields={"description": "tas pink kanken", "top_k": "3"})
    status, _, res = _request(f"{base}/api/search", "POST", body, ctype)
    assert status == 200
    assert res["query_text"] == "tas pink kanken"
    assert res["query_image_path"] is None
    assert len(res["results"]) >= 1
    assert res["results"][0]["text"].startswith("tas pink")
    assert set(res["results"][0]) == {"score", "image_path", "text"}


def test_search_urlencoded_body(server):
    base, _, _ = server
    status, _, res = _request(
        f"{base}/api/search", "POST",
        b"description=tas+pink+kanken&top_k=2",
        "application/x-www-form-urlencoded",
    )
    assert status == 200 and res["query_text"] == "tas pink kanken"


def test_search_with_image_upload(server):
    base, img, tmp = server
    body, ctype = _multipart(
        files={"image": ("query.jpg", "image/jpeg", img.read_bytes())},
    )
    status, _, res = _request(f"{base}/api/search", "POST", body, ctype)
    assert status == 200, res
    # reference semantics: path echoed but temp file already unlinked
    # (ref:main.py:231-234)
    assert res["query_image_path"] is not None
    assert not os.path.exists(res["query_image_path"])
    assert len(res["results"]) >= 1


def test_validation_errors_over_the_wire(server):
    base, img, _ = server
    # search with neither text nor image → 400 (ref:main.py:185-199)
    body, ctype = _multipart(fields={"description": "   "})
    status, _, res = _request(f"{base}/api/search", "POST", body, ctype)
    assert status == 400 and "detail" in res
    # report without the required description field → 422 (FastAPI form shape)
    body, ctype = _multipart(files={"image": ("a.jpg", "image/jpeg", b"x")})
    status, _, res = _request(f"{base}/api/report", "POST", body, ctype)
    assert status == 422
    # report without the required image file → 422
    body, ctype = _multipart(fields={"description": "x"})
    status, _, res = _request(f"{base}/api/report", "POST", body, ctype)
    assert status == 422
    # non-image upload content type → 400 (ref:main.py:110-118)
    body, ctype = _multipart(
        fields={"description": "x"},
        files={"image": ("a.txt", "text/plain", b"hello")},
    )
    status, _, res = _request(f"{base}/api/report", "POST", body, ctype)
    assert status == 400
    # malformed found_at → 400 (ref:main.py:131-140)
    body, ctype = _multipart(
        fields={"description": "x", "found_at": "not-a-date"},
        files={"image": ("up.jpg", "image/jpeg", img.read_bytes())},
    )
    status, _, res = _request(f"{base}/api/report", "POST", body, ctype)
    assert status == 400
    # unsupported body content type → 415
    status, _, res = _request(
        f"{base}/api/search", "POST", b"{}", "application/json"
    )
    assert status == 415
    # unknown routes → 404
    assert _request(f"{base}/nope")[0] == 404
    assert _request(f"{base}/api/nope", "POST", b"", ctype)[0] == 404


def test_static_mount_and_traversal_guard(server):
    base, img, tmp = server
    rel = os.path.relpath(str(img), tmp)
    status, headers, raw = _request(f"{base}/static/{rel}")
    assert status == 200
    assert headers["Content-Type"] == "image/jpeg"
    assert raw == img.read_bytes()
    # path escape is refused, not served
    status, _, _ = _request(f"{base}/static/../../../../etc/hostname")
    assert status == 404


def test_concurrent_searches(server):
    """ThreadingHTTPServer + QueuedEncoder: overlapping requests all succeed."""
    base, _, _ = server
    body, ctype = _multipart(fields={"description": "tas pink kanken"})
    results = [None] * 4

    def hit(i):
        results[i] = _request(f"{base}/api/search", "POST", body, ctype)[0]

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert results == [200, 200, 200, 200]
