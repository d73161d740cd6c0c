from clip_lora_match_tpu.index.store import EmbeddingIndex
from clip_lora_match_tpu.index.build import (
    build_index_from_csv,
    build_text_index,
    read_custom_items_csv,
    read_pairs_csv,
    verify_index,
)

__all__ = [
    "EmbeddingIndex",
    "build_index_from_csv",
    "build_text_index",
    "read_custom_items_csv",
    "read_pairs_csv",
    "verify_index",
]
