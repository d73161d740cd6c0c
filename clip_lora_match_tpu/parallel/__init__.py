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
    "DATA_AXIS",
    "MODEL_AXIS",
    "data_sharded",
    "make_mesh",
    "pad_to_multiple",
    "replicated",
    "shard_batch",
]
