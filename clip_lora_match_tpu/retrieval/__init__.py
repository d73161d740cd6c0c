from clip_lora_match_tpu.retrieval.search import SearchIndex, SearchResult, TextSearchIndex
from clip_lora_match_tpu.retrieval.sharded import shard_index, sharded_topk_retrieve
from clip_lora_match_tpu.retrieval.similarity import (
    cosine_similarity,
    l2_normalize,
    top_k_similar,
)

__all__ = [
    "SearchIndex",
    "SearchResult",
    "TextSearchIndex",
    "shard_index",
    "sharded_topk_retrieve",
    "cosine_similarity",
    "l2_normalize",
    "top_k_similar",
]
