from clip_lora_match_tpu.services.finder import FinderConfig, FinderService, ReportResult
from clip_lora_match_tpu.services.seeker import SeekerConfig, SeekerService
from clip_lora_match_tpu.services.batch_queue import EncoderBatchQueue, QueuedEncoder

__all__ = [
    "FinderConfig",
    "FinderService",
    "ReportResult",
    "SeekerConfig",
    "SeekerService",
    "EncoderBatchQueue",
    "QueuedEncoder",
]
