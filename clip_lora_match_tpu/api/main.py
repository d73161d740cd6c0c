"""FastAPI application — wire-compatible with the reference service.

Same REST surface as ref:src/api/main.py:94-295 (GET /health, POST
/api/report multipart, POST /api/search, GET /api/items, /static mount,
CORS *), same validation semantics (image content-type check, ISO found_at
parse, 400 when search has neither text nor image, 500 wraps), same response
schemas (api/schemas.py).

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

import datetime as dt
import os
import shutil
import tempfile
from typing import Optional

from clip_lora_match_tpu.api.schemas import (
    FoundItemModel,
    ReportItemResponse,
    SearchResponse,
    SearchResultModel,
)
from clip_lora_match_tpu.core.logging import get_logger
from clip_lora_match_tpu.db.store import BaseStore, open_store
from clip_lora_match_tpu.models.encoder import ClipEncoder, load_clip_model
from clip_lora_match_tpu.services import (
    FinderConfig,
    FinderService,
    SeekerConfig,
    SeekerService,
)

log = get_logger("api")


def create_app(
    encoder: Optional[ClipEncoder] = None,
    finder: Optional[FinderService] = None,
    seeker: Optional[SeekerService] = None,
    store: Optional[BaseStore] = None,
    data_dir: str = "data",
    index_path: Optional[str] = None,
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

    encoder = encoder or load_clip_model()
    store = store or open_store()
    index_path = index_path or os.path.join(data_dir, "index", "items_index.npz")
    if finder is None:
        finder = FinderService(
            encoder,
            FinderConfig(
                index_path=index_path,
                reported_images_dir=os.path.join(data_dir, "reported", "images"),
                k_dim=encoder.arch.projection_dim,
            ),
            store=store,
        )
    if seeker is None:
        # share the finder's device-resident index (ref reloaded per query)
        seeker = SeekerService(
            encoder, SeekerConfig(index_path=index_path), index=finder.index
        )

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

    def _save_upload(upload) -> str:
        suffix = os.path.splitext(upload.filename or "upload.jpg")[1] or ".jpg"
        fd, tmp = tempfile.mkstemp(suffix=suffix)
        with os.fdopen(fd, "wb") as f:
            shutil.copyfileobj(upload.file, f)
        return tmp

    @app.get("/health")
    def health_check():
        return {"status": "ok"}

    @app.post("/api/report", response_model=ReportItemResponse)
    async def report_item(
        description: str = Form(...),
        location: Optional[str] = Form(None),
        reporter: Optional[str] = Form(None),
        found_at: Optional[str] = Form(None),
        image: UploadFile = File(...),
    ):
        if not (image.content_type or "").startswith("image/"):
            raise HTTPException(
                status_code=400, detail="File yang diupload harus gambar."
            )
        parsed_at = None
        if found_at:
            try:
                parsed_at = dt.datetime.fromisoformat(found_at)
            except ValueError:
                raise HTTPException(
                    status_code=400,
                    detail="found_at harus format ISO 8601.",
                )
        tmp = _save_upload(image)
        try:
            result = finder.report_item(
                tmp,
                description=description,
                location=location,
                found_at=parsed_at,
                reporter=reporter,
            )
        except Exception:
            log.exception("report failed")
            raise HTTPException(status_code=500, detail="Internal report error")
        finally:
            os.unlink(tmp)
        return ReportItemResponse(
            id=result.item_id or result.index_row,
            image_path=result.stored_image_path,
            description=description,
            location=location,
            found_at=parsed_at,
            reporter=reporter,
        )

    @app.post("/api/search", response_model=SearchResponse)
    async def search_items(
        description: Optional[str] = Form(None),
        image: Optional[UploadFile] = File(None),
        top_k: int = Form(5),
    ):
        # normalize empty form values to None (ref L185-199)
        if description is not None and not description.strip():
            description = None
        if image is not None and not (image.filename or "").strip():
            image = None
        if description is None and image is None:
            raise HTTPException(
                status_code=400,
                detail="Berikan description, image, atau keduanya.",
            )
        tmp = None
        if image is not None:
            if not (image.content_type or "").startswith("image/"):
                raise HTTPException(
                    status_code=400, detail="File yang diupload harus gambar."
                )
            tmp = _save_upload(image)
        try:
            results = seeker.search_items(
                description=description, image_path=tmp, k=top_k
            )
        except ValueError as e:
            raise HTTPException(status_code=400, detail=str(e))
        except Exception:
            log.exception("search failed")
            raise HTTPException(status_code=500, detail="Internal search error")
        finally:
            if tmp:
                os.unlink(tmp)
        return SearchResponse(
            query_text=description,
            query_image_path=None,
            results=[
                SearchResultModel(
                    score=r.score,
                    image_path=r.image_path or "",
                    text=r.text or "",
                )
                for r in results
            ],
        )

    @app.get("/api/items", response_model=list[FoundItemModel])
    def list_found_items():
        try:
            items = store.all_items(order_desc=True)
        except Exception:
            log.exception("items query failed")
            raise HTTPException(status_code=500, detail="Database error")
        return [
            FoundItemModel(
                id=i.id,
                image_path=i.image_path,
                description=i.description,
                location=i.location,
                found_at=i.found_at,
                reporter=i.reporter,
            )
            for i in items
        ]

    return app
