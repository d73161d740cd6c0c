from clip_lora_match_tpu.models import clip
from clip_lora_match_tpu.models.encoder import ClipEncoder, load_clip_model
from clip_lora_match_tpu.models.io import load_params, save_params

__all__ = ["clip", "ClipEncoder", "load_clip_model", "load_params", "save_params"]
