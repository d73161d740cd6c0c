from clip_lora_match_tpu.models.yolo.cropper import YoloCropper, load_yolo_cropper
from clip_lora_match_tpu.models.yolo.postprocess import nms_fixed, decode_boxes

__all__ = ["YoloCropper", "load_yolo_cropper", "nms_fixed", "decode_boxes"]
