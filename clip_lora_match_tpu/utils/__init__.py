from clip_lora_match_tpu.utils.seeding import set_seed
from clip_lora_match_tpu.utils.tree import tree_size, tree_bytes

__all__ = ["set_seed", "tree_size", "tree_bytes"]
