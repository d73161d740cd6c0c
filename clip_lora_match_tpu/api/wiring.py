"""Service-graph construction shared by every HTTP binding.

The reference builds its object graph at module import (two full CLIP
models, ref:src/api/main.py:29-62). Here ONE factory wires encoder →
finder/seeker/store so both the fastapi binding (api/main.py) and the
stdlib binding (api/http_server.py) serve the exact same services.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional

from clip_lora_match_tpu.db.store import BaseStore, open_store
from clip_lora_match_tpu.models.encoder import ClipEncoder, load_clip_model
from clip_lora_match_tpu.services import (
    FinderConfig,
    FinderService,
    SeekerConfig,
    SeekerService,
)


@dataclass
class ServiceGraph:
    finder: FinderService
    seeker: SeekerService
    store: BaseStore
    data_dir: str


def build_services(
    encoder: Optional[ClipEncoder] = None,
    finder: Optional[FinderService] = None,
    seeker: Optional[SeekerService] = None,
    store: Optional[BaseStore] = None,
    data_dir: str = "data",
    index_path: Optional[str] = None,
    use_batch_queue: bool = True,
    index_quantize: str = "none",
) -> ServiceGraph:
    """One shared encoder + device-resident index behind finder AND seeker
    (the reference constructed two model copies and reloaded the index per
    query, ref:src/api/main.py:44-62, ref:seeker_service.py:183)."""
    encoder = encoder or load_clip_model()
    if use_batch_queue and finder is None and seeker is None:
        # coalesce concurrent request encodes into one padded device batch
        # (HTTP handlers run on threads in both bindings, so requests CAN
        # overlap)
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
            encoder,
            SeekerConfig(index_path=index_path, index_quantize=index_quantize),
            index=finder.index,
        )
    return ServiceGraph(finder=finder, seeker=seeker, store=store, data_dir=data_dir)
