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
    use_batch_queue: bool = True,
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
    if use_batch_queue and finder is None and seeker is None:
        # coalesce concurrent request encodes into one padded device batch
        # (endpoints run in FastAPI's threadpool, so requests CAN overlap)
        from clip_lora_match_tpu.services import QueuedEncoder

        encoder = QueuedEncoder(encoder)
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
        """Write the upload to a fresh temp DIR under its own (sanitized)
        filename — the finder stores items under this basename, so the
        original name survives like the reference's (ref:finder_service.py
        dest_name = src.name) without its path-traversal exposure."""
        name = os.path.basename(upload.filename or "") or "upload.jpg"
        name = name.replace("..", "_") or "upload.jpg"
        d = tempfile.mkdtemp(prefix="clm_upload_")
        tmp = os.path.join(d, name)
        with open(tmp, "wb") as f:
            shutil.copyfileobj(upload.file, f)
        return tmp

    def _drop_upload(tmp: str) -> None:
        os.unlink(tmp)
        os.rmdir(os.path.dirname(tmp))

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
            _drop_upload(tmp)
        return ReportItemResponse(
            id=result.item_id or result.index_row,
            image_path=result.stored_image_path,
            # wire parity: the reference echoes the location-joined full
            # text it stored, not the raw form field (ref:finder_service.py
            # returns db_item.description == full_text)
            description=result.indexed_text,
            location=location,
            found_at=parsed_at,
            reporter=reporter,
        )

    @app.post("/api/search", response_model=SearchResponse)
    def search_items(
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
        query_image_path = None
        if image is not None:
            if not (image.content_type or "").startswith("image/"):
                raise HTTPException(
                    status_code=400, detail="File yang diupload harus gambar."
                )
            tmp = _save_upload(image)
            # keep the query image like the reference (ref:main.py:205-246
            # saves to data/tmp/queries and returns the path in the response)
            queries_dir = os.path.join(data_dir, "tmp", "queries")
            os.makedirs(queries_dir, exist_ok=True)
            query_image_path = os.path.join(queries_dir, os.path.basename(tmp))
            shutil.copy2(tmp, query_image_path)
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
                _drop_upload(tmp)
        return SearchResponse(
            query_text=description,
            query_image_path=query_image_path,
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
