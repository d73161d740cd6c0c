from clip_lora_match_tpu.ops.flash_attention import attention_reference, flash_attention
from clip_lora_match_tpu.ops.lora_matmul import lora_matmul, lora_matmul_reference
from clip_lora_match_tpu.ops.retrieval_topk import (
    quantize_index_int8,
    topk_retrieve,
    topk_retrieve_q8,
    topk_retrieve_reference,
)

__all__ = [
    "attention_reference",
    "flash_attention",
    "lora_matmul",
    "lora_matmul_reference",
    "quantize_index_int8",
    "topk_retrieve",
    "topk_retrieve_q8",
    "topk_retrieve_reference",
]
