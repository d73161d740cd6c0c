"""Typed configuration tree, YAML-loadable with reference-compatible keys.

The reference loads five ad-hoc YAMLs with ``yaml.safe_load`` at each
construction site and ``.get``-defaults everywhere (ref:models/clip_model.py:15-20,
ref:models/lora_adapter.py:13-18, ref:src/preprocessing/yolo_cropper.py:55-60,
ref:src/db/db.py:12-18, ref:scripts/train_lora.py:29-34). Here the same file
shapes parse into one typed dataclass tree so every component shares a single,
validated source of truth. Unknown keys are ignored (forward compatible), and
all defaults match the shipped reference configs (ref:config/*.yaml).
"""

from __future__ import annotations

import dataclasses
import os
import warnings
from dataclasses import dataclass, field
from typing import Any, Optional, Sequence

import yaml

# CLIP normalization constants (ref:config/clip_config.yaml preprocess block).
CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


def _read_yaml(path: str) -> dict:
    with open(path, "r") as f:
        data = yaml.safe_load(f)
    return data or {}


@dataclass(frozen=True)
class ClipArchConfig:
    """Architecture hyper-parameters of the CLIP dual tower.

    Defaults are ViT-B/32 as used by the reference's
    ``openai/clip-vit-base-patch32`` (ref:models/clip_model.py:44).
    """

    # Vision tower
    image_size: int = 224
    patch_size: int = 32
    vision_width: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    vision_mlp_dim: int = 3072
    # Text tower
    vocab_size: int = 49408
    max_text_length: int = 77
    text_width: int = 512
    text_layers: int = 12
    text_heads: int = 8
    text_mlp_dim: int = 2048
    # Shared
    projection_dim: int = 512
    layer_norm_eps: float = 1e-5
    # CLIP uses quick-gelu: x * sigmoid(1.702 x) — must match for parity.
    hidden_act: str = "quick_gelu"
    logit_scale_init: float = 2.6592  # ln(1/0.07)

    @property
    def vision_seq_len(self) -> int:
        return (self.image_size // self.patch_size) ** 2 + 1  # +1 class token


# Known OpenAI CLIP geometries. The reference resolves architecture through
# the HF hub by model name (ref:models/clip_model.py:44-60); zero-egress here,
# so the same names map to explicit presets instead.
VIT_B32 = ClipArchConfig()
VIT_B16 = ClipArchConfig(patch_size=16)
VIT_L14 = ClipArchConfig(
    patch_size=14,
    vision_width=1024,
    vision_layers=24,
    vision_heads=16,
    vision_mlp_dim=4096,
    text_width=768,
    text_heads=12,
    text_mlp_dim=3072,
    projection_dim=768,
)
VIT_L14_336 = dataclasses.replace(VIT_L14, image_size=336)

ARCH_PRESETS = {
    "openai/clip-vit-base-patch32": VIT_B32,
    "openai/clip-vit-base-patch16": VIT_B16,
    "openai/clip-vit-large-patch14": VIT_L14,
    "openai/clip-vit-large-patch14-336": VIT_L14_336,
}


def arch_for_model_name(name: str) -> ClipArchConfig:
    """Resolve a CLIP model name to its architecture preset; unknown names
    warn and fall back to ViT-B/32 (the reference's silent `.get` default,
    ref:models/clip_model.py:44, made loud)."""
    if name in ARCH_PRESETS:
        return ARCH_PRESETS[name]
    warnings.warn(
        f"unknown CLIP model name {name!r}; assuming ViT-B/32 geometry "
        f"(known: {sorted(ARCH_PRESETS)})"
    )
    return VIT_B32


@dataclass(frozen=True)
class PreprocessConfig:
    """Mirrors the ``preprocess:`` block of config/clip_config.yaml."""

    image_size: int = 224
    center_crop: bool = True
    mean: Sequence[float] = CLIP_IMAGE_MEAN
    std: Sequence[float] = CLIP_IMAGE_STD
    max_text_length: int = 77
    truncate: bool = True


@dataclass(frozen=True)
class ClipConfig:
    """Mirrors config/clip_config.yaml (model/preprocess/paths/inference)."""

    model_name: str = "openai/clip-vit-base-patch32"
    pretrained: bool = True
    device: str = "tpu"
    dtype: str = "float32"
    compute_dtype: str = "bfloat16"  # TPU matmul dtype; fp32 accumulate
    preprocess: PreprocessConfig = field(default_factory=PreprocessConfig)
    lora_weights_dir: str = "models/clip/lora"
    checkpoints_dir: str = "models/saved"
    logs_dir: str = "logs/clip"
    batch_size: int = 16
    num_workers: int = 4
    # None → resolved from model_name via ARCH_PRESETS in __post_init__, so
    # configuring e.g. openai/clip-vit-large-patch14 actually builds L/14
    # towers (the name was previously cosmetic — a silent B/32).
    arch: Optional[ClipArchConfig] = None
    # Optional tokenizer asset dir (vocab.json + merges.txt)
    tokenizer_dir: Optional[str] = None
    # Dispatch fused-LoRA / flash-attention Pallas kernels inside the towers
    # (TPU only; the jnp path remains the oracle and CPU fallback)
    use_pallas_kernels: bool = True
    # Serving quantization: "none" (default) or "int8" — W8A8 dynamic
    # quantization of the transformer-block linears (quant/int8.py). TPU
    # serving only; training and parity paths always run full precision.
    quantize: str = "none"
    # Persistent XLA compilation cache directory: a service restart replays
    # compiled executables from disk instead of paying the 20-40 s cold
    # compile per jit bucket (set to e.g. ".jax_cache"; None disables).
    # Applied process-wide on first encoder construction.
    compilation_cache_dir: Optional[str] = None

    def __post_init__(self):
        if self.arch is None:
            object.__setattr__(self, "arch", arch_for_model_name(self.model_name))
        # the preprocessor must emit exactly the model's input resolution
        # (e.g. L/14-336): keep them in lock-step so a name-driven config
        # works end-to-end rather than failing at the pos-embedding add
        if self.preprocess.image_size != self.arch.image_size:
            object.__setattr__(
                self,
                "preprocess",
                dataclasses.replace(
                    self.preprocess, image_size=self.arch.image_size
                ),
            )


@dataclass(frozen=True)
class LoraConfig:
    """Mirrors config/lora_config.yaml lora/model blocks.

    Shipped reference values: target q/k/v/out_proj, r=8, alpha=16,
    dropout=0.1, bias none, FEATURE_EXTRACTION (ref:config/lora_config.yaml).
    """

    r: int = 8
    alpha: int = 16
    dropout: float = 0.1
    bias: str = "none"
    task_type: str = "FEATURE_EXTRACTION"
    target_modules: Sequence[str] = ("q_proj", "k_proj", "v_proj", "out_proj")
    base_model_name: str = "openai/clip-vit-base-patch32"

    @property
    def scaling(self) -> float:
        return self.alpha / self.r


@dataclass(frozen=True)
class TrainingConfig:
    """Mirrors the training/data blocks of config/lora_config.yaml."""

    seed: int = 42
    batch_size: int = 8
    num_workers: int = 2
    learning_rate: float = 1e-4
    weight_decay: float = 0.01
    num_epochs: int = 1
    gradient_accumulation_steps: int = 1
    max_grad_norm: float = 1.0
    logging_steps: int = 50
    temperature: float = 0.07
    warmup_ratio: float = 0.1
    output_dir: str = "models/saved/clip-lora"
    train_csv: str = "data/text/train_fashion.csv"
    val_csv: str = "data/text/val_fashion.csv"
    image_root_dir: str = "."
    # TPU-native additions (no reference equivalent):
    global_batch_size: Optional[int] = None  # defaults to batch_size * n_devices
    checkpoint_every_steps: Optional[int] = None
    resume: bool = True  # reference could only restart from scratch (SURVEY §5)
    # Step-performance knobs (tuned on v5e, see docs/DESIGN.md §7.4):
    # remat: False | True | "dots" — False is fastest and fits ≤B128/chip;
    # scan_unroll: full unroll removes lax.scan bwd overhead (~25% step time);
    # dropout_rng_impl: None → auto ("rbg" hardware RNG on TPU: ~4x cheaper
    # dropout masks than threefry; threefry elsewhere for determinism).
    remat: Any = False
    scan_unroll: Any = True
    dropout_rng_impl: Optional[str] = None
    # chain_steps: K optimizer steps per device dispatch (lax.scan over K
    # stacked batches, train/step.py::make_chained_train_step) — amortizes
    # the per-dispatch relay/launch overhead (~10 ms measured, r2). 1 = one
    # dispatch per step (reference-shaped loop). K>1 changes NOTHING about
    # the math (bit-equal to K single steps, tested); logging granularity
    # coarsens to per-chain mean loss.
    chain_steps: int = 1
    # text_seq_slice: drop trailing text columns that are all-padding down
    # to this width before dispatch (0 disables). Provably output-identical
    # under the causal mask (trailing pads can't influence earlier
    # positions or the EOT pooling) — 77→64 cuts text-tower FLOPs ~17%.
    # Dropout draws are shape-dependent, so a sliced run's trajectory is
    # statistically equivalent but not bitwise-reproducing of a 77-wide
    # run; set 0 to reproduce pre-slice trajectories exactly.
    text_seq_slice: int = 64


@dataclass(frozen=True)
class YoloConfig:
    """Mirrors config/yolo_config.yaml."""

    name: str = "yolov8s"
    weights_path: str = "models/yolo/yolov8s.pt"
    device: str = "tpu"
    imgsz: int = 640
    conf_threshold: float = 0.25
    iou_threshold: float = 0.45
    max_det: int = 5
    classes: Optional[Sequence[int]] = None
    agnostic_nms: bool = False
    # minimum box area as a fraction of the image; 0 keeps reference parity
    # (every detection cropped, ref:yolo_cropper.py:117-122). The committed
    # synthetic-corpus detector can fire confident near-zero-area boxes on
    # out-of-domain real photos — production deployments of it should set
    # ~0.01 to drop degenerate crops.
    min_box_frac: float = 0.0
    crop_enabled: bool = False
    crop_save_dir: str = "data/cropped"
    filename_pattern: str = "{stem}_crop_{idx}.jpg"


@dataclass(frozen=True)
class DBConfig:
    """Mirrors config/db_config.yaml (``postgres:`` block or flat keys,
    tolerant like ref:src/db/db.py:12-18)."""

    host: str = "localhost"
    port: int = 5432
    user: str = "postgres"
    password: str = ""
    dbname: str = "balikkin_db"

    @property
    def url(self) -> str:
        return (
            f"postgresql://{self.user}:{self.password}"
            f"@{self.host}:{self.port}/{self.dbname}"
        )


@dataclass(frozen=True)
class EvalConfig:
    """Mirrors config/evaluation_config.yaml paths/models/evaluation blocks."""

    train_csv: str = "data/text/train_fashion.csv"
    val_csv: str = "data/text/val_fashion.csv"
    test_csv: str = "data/text/val_fashion.csv"
    image_root: str = "data/text/images"
    lora_dir: str = "models/saved/clip-lora"
    results_dir: str = "results"
    plots_dir: str = "results/plots"
    qualitative_dir: str = "results/qualitative"
    lora_epochs: Sequence[int] = (1,)
    best_epoch: int = 1
    recall_k_values: Sequence[int] = (1, 5, 10)
    num_failure_cases: int = 10
    num_top_k_visualize: int = 5
    embedding_viz_method: str = "tsne"
    skip_base: bool = False
    skip_qualitative: bool = False
    # threshold-relevance protocol constant (ref:scripts/evaluate.py:24)
    relevance_threshold: float = 0.7


# ---------------------------------------------------------------------------
# YAML loaders (key-tolerant, defaulting like the reference .get chains)
# ---------------------------------------------------------------------------


def _filter_kwargs(cls, kwargs: dict) -> dict:
    names = {f.name for f in dataclasses.fields(cls)}
    return {k: v for k, v in kwargs.items() if k in names}


def load_clip_config(path: Optional[str] = None) -> ClipConfig:
    """Parse config/clip_config.yaml shape (ref:models/clip_model.py:15-20)."""
    if path is None or not os.path.exists(path):
        return ClipConfig()
    raw = _read_yaml(path)
    model = raw.get("model", {}) or {}
    pre = raw.get("preprocess", {}) or {}
    paths = raw.get("paths", {}) or {}
    inf = raw.get("inference", {}) or {}
    norm = pre.get("normalize", {}) or {}
    preprocess = PreprocessConfig(
        image_size=pre.get("image_size", 224),
        center_crop=pre.get("center_crop", True),
        mean=tuple(norm.get("mean", CLIP_IMAGE_MEAN)),
        std=tuple(norm.get("std", CLIP_IMAGE_STD)),
        max_text_length=pre.get("max_text_length", 77),
        truncate=pre.get("truncate", True),
    )
    return ClipConfig(
        model_name=model.get("name", "openai/clip-vit-base-patch32"),
        pretrained=model.get("pretrained", True),
        device=model.get("device", "tpu"),
        dtype=model.get("dtype", "float32"),
        compute_dtype=model.get("compute_dtype", "bfloat16"),
        preprocess=preprocess,
        lora_weights_dir=paths.get("lora_weights_dir", "models/clip/lora"),
        checkpoints_dir=paths.get("checkpoints_dir", "models/saved"),
        logs_dir=paths.get("logs_dir", "logs/clip"),
        batch_size=inf.get("batch_size", 16),
        num_workers=inf.get("num_workers", 4),
        tokenizer_dir=model.get("tokenizer_dir"),
        use_pallas_kernels=model.get("use_pallas_kernels", True),
        quantize=model.get("quantize", "none"),
        compilation_cache_dir=model.get("compilation_cache_dir"),
        arch=_arch_from_yaml(model),
    )


def _arch_from_yaml(model: dict) -> Optional[ClipArchConfig]:
    """Optional explicit ``model.arch:`` override block (custom geometries);
    None lets ClipConfig resolve the preset from the model name."""
    block = model.get("arch")
    if not block:
        return None
    base = arch_for_model_name(model.get("name", "openai/clip-vit-base-patch32"))
    known = {f.name for f in dataclasses.fields(ClipArchConfig)}
    unknown = sorted(set(block) - known)
    if unknown:
        warnings.warn(f"ignoring unknown model.arch keys: {unknown}")
    return dataclasses.replace(
        base, **{k: v for k, v in block.items() if k in known}
    )


def load_lora_config(path: Optional[str] = None) -> tuple[LoraConfig, TrainingConfig]:
    """Parse config/lora_config.yaml shape (ref:models/lora_adapter.py:13-43,
    ref:scripts/train_lora.py:29-34). Returns (lora, training)."""
    if path is None or not os.path.exists(path):
        return LoraConfig(), TrainingConfig()
    raw = _read_yaml(path)
    model = raw.get("model", {}) or {}
    lora = raw.get("lora", {}) or {}
    data = raw.get("data", {}) or {}
    tr = raw.get("training", {}) or {}
    lora_cfg = LoraConfig(
        r=lora.get("r", 8),
        alpha=lora.get("alpha", 16),
        dropout=lora.get("dropout", 0.1),
        bias=lora.get("bias", "none"),
        task_type=lora.get("task_type", "FEATURE_EXTRACTION"),
        target_modules=tuple(
            model.get("target_modules", ("q_proj", "v_proj"))
        ),  # factory default q/v only, like ref:models/lora_adapter.py:33
        base_model_name=model.get("base_model_name", "openai/clip-vit-base-patch32"),
    )
    train_cfg = TrainingConfig(
        **_filter_kwargs(
            TrainingConfig,
            {
                **tr,
                "learning_rate": float(tr.get("learning_rate", 1e-4)),
                "weight_decay": float(tr.get("weight_decay", 0.01)),
                "train_csv": data.get("train_csv", "data/text/train_fashion.csv"),
                "val_csv": data.get("val_csv", "data/text/val_fashion.csv"),
                "image_root_dir": data.get("image_root_dir", "."),
            },
        )
    )
    return lora_cfg, train_cfg


def load_yolo_config(path: Optional[str] = None) -> YoloConfig:
    """Parse config/yolo_config.yaml shape (ref:src/preprocessing/yolo_cropper.py:55-60)."""
    if path is None or not os.path.exists(path):
        return YoloConfig()
    raw = _read_yaml(path)
    model = raw.get("model", {}) or {}
    inf = raw.get("inference", {}) or {}
    crop = raw.get("crop", {}) or {}
    return YoloConfig(
        name=model.get("name", "yolov8s"),
        weights_path=model.get("weights_path", "models/yolo/yolov8s.pt"),
        device=model.get("device", "tpu"),
        imgsz=model.get("imgsz", 640),
        conf_threshold=inf.get("conf_threshold", 0.25),
        iou_threshold=inf.get("iou_threshold", 0.45),
        max_det=inf.get("max_det", 5),
        classes=inf.get("classes"),
        agnostic_nms=inf.get("agnostic_nms", False),
        crop_enabled=crop.get("enabled", False),
        crop_save_dir=crop.get("save_dir", "data/cropped"),
        filename_pattern=crop.get("filename_pattern", "{stem}_crop_{idx}.jpg"),
    )


def load_db_config(path: Optional[str] = None) -> DBConfig:
    """Parse config/db_config.yaml; accepts ``postgres:`` block or flat keys
    like ref:src/db/db.py:12-18."""
    if path is None or not os.path.exists(path):
        return DBConfig()
    raw = _read_yaml(path)
    block = raw.get("postgres", raw) or {}
    return DBConfig(**_filter_kwargs(DBConfig, block))


def load_eval_config(path: Optional[str] = None) -> EvalConfig:
    """Parse config/evaluation_config.yaml shape. Unlike the reference —
    whose eval scripts hardcode paths despite the config existing
    (ref:scripts/evaluate_model.py:296-304) — everything here reads from it."""
    if path is None or not os.path.exists(path):
        return EvalConfig()
    raw = _read_yaml(path)
    paths = raw.get("paths", {}) or {}
    models = raw.get("models", {}) or {}
    ev = raw.get("evaluation", {}) or {}
    return EvalConfig(
        train_csv=paths.get("train_csv", "data/text/train_fashion.csv"),
        val_csv=paths.get("val_csv", "data/text/val_fashion.csv"),
        test_csv=paths.get("test_csv", "data/text/val_fashion.csv"),
        image_root=paths.get("image_root", "data/text/images"),
        lora_dir=paths.get("lora_dir", "models/saved/clip-lora"),
        results_dir=paths.get("results_dir", "results"),
        plots_dir=paths.get("plots_dir", "results/plots"),
        qualitative_dir=paths.get("qualitative_dir", "results/qualitative"),
        lora_epochs=tuple(models.get("lora_epochs", (1,))),
        best_epoch=models.get("best_epoch", 1),
        recall_k_values=tuple(ev.get("recall_k_values", (1, 5, 10))),
        num_failure_cases=ev.get("num_failure_cases", 10),
        num_top_k_visualize=ev.get("num_top_k_visualize", 5),
        embedding_viz_method=ev.get("embedding_viz_method", "tsne"),
        skip_base=ev.get("skip_base", False),
        skip_qualitative=ev.get("skip_qualitative", False),
    )


def to_dict(cfg: Any) -> dict:
    """Dataclass → plain dict (for JSON artifacts / checkpoint metadata)."""
    return dataclasses.asdict(cfg)
