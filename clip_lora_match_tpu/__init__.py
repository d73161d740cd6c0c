"""clip_lora_match_tpu — TPU-native rebuild of youngalip/clip-lora-match.

A from-scratch JAX/XLA/Pallas framework providing the full capability surface of
the reference "Balikkin" lost-and-found matching service:

- From-scratch CLIP ViT-B/32 dual-tower encoders (``models/``) with native LoRA
  (``lora/``) fused into the projection matmuls via Pallas kernels (``ops/``).
- HBM-resident embedding index + blocked cosine top-k retrieval (``index/``,
  ``retrieval/``).
- Data-parallel contrastive (InfoNCE) LoRA fine-tuning over a device mesh
  (``train/``, ``parallel/``).
- YOLOv8-style detector crop stage (``models/yolo``), preprocessing
  (``preprocess/``), CLIP BPE tokenizer (``tokenizer/``).
- Finder/Seeker services, FastAPI wire-compatible API, Postgres persistence
  (``services/``, ``api/``, ``db/``).
- Evaluation protocols matching the reference's committed artifacts (``eval/``).

Reference behavior citations use ``ref:<path>:<lines>`` pointing into
/root/reference (youngalip/clip-lora-match @ 2025-12-05).
"""

__version__ = "0.1.0"
