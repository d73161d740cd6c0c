"""Export / merge LoRA adapters — fills the reference's EMPTY
scripts/export_lora.py (the merge-weights capability BASELINE.json names).

Modes:
- merge: fold the adapter into base weights, write merged .npz;
- peft: convert a native adapter dir to a PEFT-compatible dir (or vice versa).
"""

import argparse
import os

from _common import add_encoder_args, build_encoder


def main():
    p = argparse.ArgumentParser(description="Export / merge LoRA adapters")
    p.add_argument("mode", choices=["merge", "peft", "native"])
    p.add_argument("--adapter", required=True, help="adapter dir (native or PEFT)")
    p.add_argument("--out", required=True)
    add_encoder_args(p)
    args = p.parse_args()

    from clip_lora_match_tpu.core.config import LoraConfig
    from clip_lora_match_tpu.lora import (
        load_lora,
        merge_lora,
        save_lora,
        save_peft_adapter,
    )
    from clip_lora_match_tpu.models.io import save_params

    lora, scaling = load_lora(args.adapter)
    if args.mode == "merge":
        encoder = build_encoder(args)
        merged = merge_lora(encoder.params, lora, scaling)
        save_params(args.out, merged)
        print(f"[export_lora] merged weights -> {args.out}")
    else:
        cfg = LoraConfig(r=8, alpha=int(round(8 * scaling)))
        if args.mode == "peft":
            save_peft_adapter(args.out, lora, cfg)
        else:
            save_lora(args.out, lora, cfg)
        print(f"[export_lora] {args.mode} adapter -> {args.out}")


if __name__ == "__main__":
    main()
