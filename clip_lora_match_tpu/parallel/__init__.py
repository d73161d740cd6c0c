from clip_lora_match_tpu.parallel.distributed import initialize_distributed, is_primary
from clip_lora_match_tpu.parallel.sharded_encode import ShardedEncoder, sharded_text_encode_fn
from clip_lora_match_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    data_sharded,
    make_mesh,
    pad_to_multiple,
    replicated,
    shard_batch,
)

__all__ = [
    "initialize_distributed",
    "is_primary",
    "ShardedEncoder",
    "sharded_text_encode_fn",
    "DATA_AXIS",
    "MODEL_AXIS",
    "data_sharded",
    "make_mesh",
    "pad_to_multiple",
    "replicated",
    "shard_batch",
]
