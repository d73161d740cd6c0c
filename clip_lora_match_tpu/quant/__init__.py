from clip_lora_match_tpu.quant.int8 import (
    dequantize_linear_params,
    quantize_clip_params,
    quantize_linear_params,
)

__all__ = [
    "quantize_clip_params",
    "quantize_linear_params",
    "dequantize_linear_params",
]
