"""FastAPI application — wire-compatible with the reference service.

Same REST surface as ref:src/api/main.py:94-295 (GET /health, POST
/api/report multipart, POST /api/search, GET /api/items, /static mount,
CORS *), same validation semantics (image content-type check, ISO found_at
parse, 400 when search has neither text nor image, 500 wraps), same response
schemas (api/schemas.py).

The endpoint LOGIC lives in api/handlers.py as framework-free functions;
this module only binds them to FastAPI (UploadFile → Upload, ApiError →
HTTPException), so the logic is testable without fastapi installed.

Fixes over the reference:
- ONE shared encoder for finder+seeker (the reference constructed two full
  CLIP models at import time, ref L44-62);
- app factory instead of import-time side effects, so tests and servers
  construct isolated instances;
- pluggable DB store (sqlite fallback) instead of hard-required Postgres.

fastapi is an optional dependency: importing this module without it raises
with a clear message only when ``create_app`` is called.
"""

from __future__ import annotations

import os
from typing import Optional

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
)
from clip_lora_match_tpu.api.wiring import build_services
from clip_lora_match_tpu.core.logging import get_logger
from clip_lora_match_tpu.db.store import BaseStore
from clip_lora_match_tpu.models.encoder import ClipEncoder
from clip_lora_match_tpu.services import FinderService, SeekerService

log = get_logger("api")


def create_app(
    encoder: Optional[ClipEncoder] = None,
    finder: Optional[FinderService] = None,
    seeker: Optional[SeekerService] = None,
    store: Optional[BaseStore] = None,
    data_dir: str = "data",
    index_path: Optional[str] = None,
    use_batch_queue: bool = True,
    index_quantize: str = "none",
):
    try:
        from fastapi import FastAPI, File, Form, HTTPException, UploadFile
        from fastapi.middleware.cors import CORSMiddleware
        from fastapi.staticfiles import StaticFiles
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "fastapi is required for the API layer: pip install "
            "'clip-lora-match-tpu[api]'"
        ) from e

    graph = build_services(
        encoder=encoder,
        finder=finder,
        seeker=seeker,
        store=store,
        data_dir=data_dir,
        index_path=index_path,
        use_batch_queue=use_batch_queue,
        index_quantize=index_quantize,
    )
    finder, seeker, store = graph.finder, graph.seeker, graph.store

    app = FastAPI(title="Balikkin ML Service (TPU)", version="0.1.0")
    app.add_middleware(
        CORSMiddleware,
        allow_origins=["*"],
        allow_credentials=True,
        allow_methods=["*"],
        allow_headers=["*"],
    )
    if os.path.isdir(data_dir):
        app.mount("/static", StaticFiles(directory=data_dir), name="static")

    def _upload(u: UploadFile) -> Upload:
        return Upload(file=u.file, filename=u.filename, content_type=u.content_type)

    @app.get("/health")
    def health_check():
        return {"status": "ok"}

    # endpoints are plain ``def`` on purpose: FastAPI runs them in its
    # threadpool, so a long encode cannot freeze the event loop (an
    # ``async def`` here would serialize every request behind the TPU call)
    @app.post("/api/report", response_model=ReportItemResponse)
    def report_item(
        description: str = Form(...),
        location: Optional[str] = Form(None),
        reporter: Optional[str] = Form(None),
        found_at: Optional[str] = Form(None),
        image: UploadFile = File(...),
    ):
        try:
            return handle_report(
                finder,
                description=description,
                image=_upload(image),
                location=location,
                reporter=reporter,
                found_at=found_at,
            )
        except ApiError as e:
            raise HTTPException(status_code=e.status_code, detail=e.detail)

    @app.post("/api/search", response_model=SearchResponse)
    def search_items(
        description: Optional[str] = Form(None),
        image: Optional[UploadFile] = File(None),
        top_k: int = Form(5),
    ):
        try:
            return handle_search(
                seeker,
                description=description,
                image=_upload(image) if image is not None else None,
                top_k=top_k,
                data_dir=data_dir,
            )
        except ApiError as e:
            raise HTTPException(status_code=e.status_code, detail=e.detail)

    @app.get("/api/items", response_model=list[FoundItemModel])
    def list_found_items():
        try:
            return handle_items(store)
        except ApiError as e:
            raise HTTPException(status_code=e.status_code, detail=e.detail)

    return app
