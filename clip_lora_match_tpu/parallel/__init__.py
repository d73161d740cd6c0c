from clip_lora_match_tpu.parallel.distributed import initialize_distributed, is_primary
from clip_lora_match_tpu.parallel.sharded_encode import ShardedEncoder, sharded_text_encode_fn
from clip_lora_match_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    data_sharded,
    global_batch_from_local,
    global_put,
    global_replicated,
    global_shard_batch,
    make_mesh,
    pad_to_multiple,
    replicated,
    shard_batch,
)
from clip_lora_match_tpu.parallel.tp import (
    check_tp_divisibility,
    clip_tp_pspecs,
    init_tp_train_state,
    lora_tp_pspecs,
    shard_lora_tp,
    shard_params_tp,
)

__all__ = [
    "check_tp_divisibility",
    "clip_tp_pspecs",
    "init_tp_train_state",
    "lora_tp_pspecs",
    "shard_lora_tp",
    "shard_params_tp",
    "initialize_distributed",
    "is_primary",
    "ShardedEncoder",
    "sharded_text_encode_fn",
    "DATA_AXIS",
    "MODEL_AXIS",
    "data_sharded",
    "global_batch_from_local",
    "global_put",
    "global_replicated",
    "global_shard_batch",
    "make_mesh",
    "pad_to_multiple",
    "replicated",
    "shard_batch",
]
