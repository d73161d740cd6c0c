from clip_lora_match_tpu.core.config import (
    ClipArchConfig,
    ClipConfig,
    DBConfig,
    EvalConfig,
    LoraConfig,
    PreprocessConfig,
    TrainingConfig,
    YoloConfig,
    load_clip_config,
    load_db_config,
    load_eval_config,
    load_lora_config,
    load_yolo_config,
)
from clip_lora_match_tpu.core.logging import get_logger

__all__ = [
    "ClipArchConfig",
    "ClipConfig",
    "DBConfig",
    "EvalConfig",
    "LoraConfig",
    "PreprocessConfig",
    "TrainingConfig",
    "YoloConfig",
    "load_clip_config",
    "load_db_config",
    "load_eval_config",
    "load_lora_config",
    "load_yolo_config",
    "get_logger",
]
