"""FinderService — the report (write) path.

Behavior parity with ref:src/embedding/finder_service.py:107-216:
- copy the uploaded photo into ``reported_images_dir``;
- optional YOLO crop of the stored image (crop failure falls back to the
  original, ref L155-156);
- index the TEXT embedding of ``"{description}, ditemukan di {location}"``
  (NOT the image embedding — ref L158-163 quirk preserved);
- insert the DB row, then append+persist the index (DB-first so any partial
  failure is repairable by scripts/rebuild_index.py, which rebuilds the
  index from the DB; the reference's index-first order leaves orphan index
  rows when the DB insert fails, ref L171-204).

TPU-native fixes over the reference:
- the index row is appended to the device-resident arena (O(1) amortized)
  instead of the load-concat-rewrite cycle (ref L171-185);
- writes serialize through a lock — the reference had an unguarded
  read-modify-write race under concurrent /api/report (SURVEY §5);
- one shared encoder instance (the reference loaded a second full CLIP).
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
import threading
from dataclasses import dataclass
from typing import Optional

from clip_lora_match_tpu.core.logging import get_logger
from clip_lora_match_tpu.db.store import BaseStore, FoundItem
from clip_lora_match_tpu.index.store import EmbeddingIndex
from clip_lora_match_tpu.models.encoder import ClipEncoder

log = get_logger("finder")


@dataclass
class FinderConfig:
    """Mirrors ref:src/embedding/finder_service.py:21-38."""

    index_path: str = "data/index/custom_items_index.npz"
    reported_images_dir: str = "data/reported/images"
    use_yolo_crop: bool = False
    location_template: str = "{description}, ditemukan di {location}"
    k_dim: int = 512
    persist_every_insert: bool = True


@dataclass
class ReportResult:
    item_id: Optional[int]
    index_row: int
    stored_image_path: str
    indexed_text: str
    crop_used: bool = False


class FinderService:
    def __init__(
        self,
        encoder: ClipEncoder,
        config: Optional[FinderConfig] = None,
        store: Optional[BaseStore] = None,
        cropper=None,  # services-level hook: models/yolo cropper, optional
        index: Optional[EmbeddingIndex] = None,
    ):
        self.cfg = config or FinderConfig()
        self.encoder = encoder
        self.store = store
        self.cropper = cropper if self.cfg.use_yolo_crop else None
        self.index = (
            index
            if index is not None
            else EmbeddingIndex.load(self.cfg.index_path, dim=self.cfg.k_dim)
        )
        self._write_lock = threading.Lock()
        os.makedirs(self.cfg.reported_images_dir, exist_ok=True)

    def report_item(
        self,
        image_path: str,
        description: str,
        location: Optional[str] = None,
        found_at: Optional[dt.datetime] = None,
        reporter: Optional[str] = None,
    ) -> ReportResult:
        # 1. store the photo (ref L132-136)
        dest = os.path.join(
            self.cfg.reported_images_dir, os.path.basename(image_path)
        )
        if os.path.abspath(image_path) != os.path.abspath(dest):
            shutil.copy2(image_path, dest)

        # 2. optional YOLO crop of the stored image; errors fall back
        crop_used = False
        if self.cropper is not None:
            try:
                crops = self.cropper.crop_image(dest)
                if crops:
                    crop_used = True
            except Exception as e:  # ref L155-156 fallback semantics
                log.warning("YOLO crop failed (%s); using original image", e)

        # 3. text embedding of description+location (ref L158-163)
        indexed_text = (
            self.cfg.location_template.format(
                description=description, location=location
            )
            if location
            else description
        )
        emb = self.encoder.encode_text(indexed_text)

        # 4+5. serialized DB insert THEN index append + persist. DB-first
        # keeps the pair self-healing: a failure between the two leaves a DB
        # row without an index row, which scripts/rebuild_index.py repairs
        # (it rebuilds the index FROM the DB). The reference's index-first
        # order (ref L171-204) leaves permanent orphan index rows on DB
        # failure, and client retries then duplicate them.
        with self._write_lock:
            item_id = None
            if self.store is not None:
                # DB row parity (ref L187-199): the reference stores the
                # location-joined full_text as description and defaults
                # found_at to now() — NULL found_at would also perturb the
                # ORDER BY found_at DESC listing in /api/items.
                item_id = self.store.insert(
                    FoundItem(
                        id=None,
                        image_path=dest,
                        description=indexed_text,
                        location=location,
                        found_at=found_at or dt.datetime.now(),
                        reporter=reporter,
                    )
                )
            row = self.index.append(emb, image_path=dest, text=indexed_text)
            if self.cfg.persist_every_insert:
                self.index.save(self.cfg.index_path)
        log.info("reported item row=%d id=%s text=%r", row, item_id, indexed_text)
        return ReportResult(
            item_id=item_id,
            index_row=row,
            stored_image_path=dest,
            indexed_text=indexed_text,
            crop_used=crop_used,
        )
