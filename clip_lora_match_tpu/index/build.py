"""Index builders — batched, device-accelerated.

Replaces the reference's one-forward-per-text loops
(ref:scripts/build_text_index.py:57-62, ref:scripts/rebuild_index.py:68) with
batched encodes through the bucketed jit path; the multi-chip sharded build
lives in parallel/sharded_encode.py and plugs in via the ``encode_fn`` hook.
"""

from __future__ import annotations

import csv
from typing import Callable, Optional, Sequence

import numpy as np

from clip_lora_match_tpu.core.logging import get_logger
from clip_lora_match_tpu.index.store import EmbeddingIndex
from clip_lora_match_tpu.models.encoder import ClipEncoder

log = get_logger("index.build")


def build_text_index(
    texts: Sequence[str],
    image_paths: Sequence[str],
    encoder: ClipEncoder,
    batch_size: int = 256,
    encode_fn: Optional[Callable[[Sequence[str]], np.ndarray]] = None,
) -> EmbeddingIndex:
    """Encode `texts` in batches → normalized index (ref:build_text_index.py:13-77)."""
    encode = encode_fn or (lambda chunk: encoder.encode_text(list(chunk)))
    chunks = []
    for start in range(0, len(texts), batch_size):
        chunk = texts[start : start + batch_size]
        chunks.append(encode(chunk))
        log.info("encoded %d/%d texts", min(start + batch_size, len(texts)), len(texts))
    emb = (
        np.concatenate(chunks)
        if chunks
        else np.zeros((0, encoder.arch.projection_dim), np.float32)
    )
    return EmbeddingIndex(emb, image_paths=list(image_paths), texts=list(texts))


def read_pairs_csv(csv_path: str) -> tuple[list[str], list[str]]:
    """Read an `image_path,text` CSV (ref:datasets/dataset.py:39-40 column
    contract). Returns (image_paths, texts)."""
    image_paths, texts = [], []
    with open(csv_path, newline="", encoding="utf-8") as f:
        reader = csv.DictReader(f)
        if reader.fieldnames is None or not {"image_path", "text"} <= set(
            reader.fieldnames
        ):
            raise ValueError(
                f"{csv_path} must have 'image_path' and 'text' columns, "
                f"got {reader.fieldnames}"
            )
        for row in reader:
            image_paths.append(row["image_path"])
            texts.append(row["text"])
    return image_paths, texts


def read_custom_items_csv(csv_path: str) -> tuple[list[str], list[str]]:
    """Parse the malformed custom-items CSV the same way the reference does.

    The shipped ``data/custom/my_items.csv`` has unquoted commas in the text
    column, so a naive parse shifts columns. The reference reads it with
    ``index_col=0`` making column 0 the image path, column 1 the description,
    and column 2 the location, then joins description+location back into one
    text (ref:scripts/build_custom_index.py:33-54). Reproduced here with the
    csv module: first field = image path, remaining fields rejoined = text.
    """
    image_paths, texts = [], []
    with open(csv_path, newline="", encoding="utf-8") as f:
        reader = csv.reader(f)
        header = next(reader, None)
        for row in reader:
            if not row:
                continue
            image_paths.append(row[0])
            texts.append(",".join(row[1:]).strip())
    return image_paths, texts


def build_index_from_csv(
    csv_path: str,
    encoder: ClipEncoder,
    custom_format: bool = False,
    batch_size: int = 256,
    encode_fn: Optional[Callable[[Sequence[str]], np.ndarray]] = None,
) -> EmbeddingIndex:
    reader = read_custom_items_csv if custom_format else read_pairs_csv
    image_paths, texts = reader(csv_path)
    return build_text_index(texts, image_paths, encoder, batch_size, encode_fn)


def verify_index(index: EmbeddingIndex) -> bool:
    """Self-check counts like ref:scripts/rebuild_index.py:100-112."""
    n = len(index)
    ok = len(index.image_paths) == n and len(index.texts) == n
    norms = np.linalg.norm(index.embeddings_np(), axis=-1) if n else np.ones(0)
    ok = ok and bool(np.allclose(norms, 1.0, atol=1e-3))
    if not ok:
        log.warning(
            "index verify failed: rows=%d paths=%d texts=%d norm_ok=%s",
            n, len(index.image_paths), len(index.texts),
            bool(np.allclose(norms, 1.0, atol=1e-3)),
        )
    return ok
