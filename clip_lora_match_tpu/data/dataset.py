"""CSV pair dataset + prefetching host input pipeline.

Replaces ``ClipPairDataset`` + torch DataLoader (ref:datasets/dataset.py:16-89,
ref:scripts/train_lora.py:37-80) with a numpy pipeline tuned for XLA feeding:

- same CSV contract (``image_path,text`` columns required, ref L39-40);
- per-item: RGB load → optional augment → preprocess → dict of
  ``pixel_values (H,W,3) / input_ids (77,) / attention_mask (77,)``;
- batches have STATIC shapes (fixed batch size, drop_last) so the jit'd train
  step never retraces;
- a background-thread prefetcher double-buffers batch assembly against device
  compute (the reference used 2 fork workers + pin_memory; one thread is the
  single-host analogue and keeps numpy/PIL work off the device timeline).
"""

from __future__ import annotations

import csv
import os
import queue
import threading
from typing import Iterator, Optional, Sequence

import numpy as np
from PIL import Image

from clip_lora_match_tpu.core.config import PreprocessConfig
from clip_lora_match_tpu.preprocess.augment import ImageAugmenter
from clip_lora_match_tpu.preprocess.image import (
    load_resized_cropped_u8,
    preprocess_pil,
)
from clip_lora_match_tpu.tokenizer import ClipTokenizer


class ClipPairDataset:
    """Image–caption pairs from a CSV (ref:datasets/dataset.py:16-89)."""

    def __init__(
        self,
        csv_path: str,
        tokenizer: ClipTokenizer,
        preprocess: Optional[PreprocessConfig] = None,
        image_root: str = ".",
        augment: bool = False,
        augmenter: Optional[ImageAugmenter] = None,
        max_rows: Optional[int] = None,
        uint8_pixels: bool = False,
    ):
        """``uint8_pixels``: emit resized/cropped uint8 ``pixel_values``
        (NOT normalized) for the on-device-normalization feed — same
        numbers as the float path (both quantize through the source uint8
        image) at a quarter of the host→device bytes. The train/eval steps
        normalize uint8 batches on device (train/step._tower_features)."""
        self.pre = preprocess or PreprocessConfig()
        self.uint8_pixels = uint8_pixels
        self.tokenizer = tokenizer
        self.image_root = image_root
        self.augmenter = augmenter or (ImageAugmenter() if augment else None)
        self.image_paths: list[str] = []
        self.texts: list[str] = []
        with open(csv_path, newline="", encoding="utf-8") as f:
            reader = csv.DictReader(f)
            if reader.fieldnames is None or not {"image_path", "text"} <= set(
                reader.fieldnames
            ):
                raise ValueError(
                    f"CSV must contain 'image_path' and 'text' columns, got "
                    f"{reader.fieldnames}"
                )
            for row in reader:
                self.image_paths.append(row["image_path"])
                self.texts.append(row["text"])
                if max_rows and len(self.texts) >= max_rows:
                    break
        # pre-tokenize all captions once (fixed 77-length, cheap to hold)
        enc = tokenizer(self.texts, pad_to_max=True)
        self._input_ids = enc["input_ids"]
        self._attention_mask = enc["attention_mask"]

    def __len__(self) -> int:
        return len(self.texts)

    def _resolve(self, path: str) -> str:
        return path if os.path.isabs(path) else os.path.join(self.image_root, path)

    def __getitem__(self, i: int) -> dict[str, np.ndarray]:
        img = Image.open(self._resolve(self.image_paths[i])).convert("RGB")
        if self.augmenter is not None:
            img = self.augmenter(img)
        if self.uint8_pixels:
            pix = load_resized_cropped_u8(img, self.pre)
        else:
            pix = preprocess_pil(
                img,
                image_size=self.pre.image_size,
                mean=self.pre.mean,
                std=self.pre.std,
                center_crop=self.pre.center_crop,
            )
        return {
            "pixel_values": pix,
            "input_ids": self._input_ids[i],
            "attention_mask": self._attention_mask[i],
        }


def batch_iterator(
    dataset: ClipPairDataset,
    batch_size: int,
    shuffle: bool = True,
    seed: int = 42,
    epoch: int = 0,
    drop_last: bool = True,
    indices: Optional[Sequence[int]] = None,
) -> Iterator[dict[str, np.ndarray]]:
    """Yield fixed-shape batches; per-epoch deterministic shuffle."""
    idx = np.asarray(indices if indices is not None else np.arange(len(dataset)))
    if shuffle:
        rng = np.random.default_rng(seed + epoch)
        idx = rng.permutation(idx)
    end = len(idx) - (len(idx) % batch_size) if drop_last else len(idx)
    for start in range(0, end, batch_size):
        chunk = idx[start : start + batch_size]
        items = [dataset[int(i)] for i in chunk]
        yield {
            k: np.stack([it[k] for it in items]) for k in items[0]
        }


def prefetch(
    it: Iterator[dict[str, np.ndarray]], depth: int = 2
) -> Iterator[dict[str, np.ndarray]]:
    """Run an iterator in a background thread with a bounded queue, so host
    batch assembly overlaps device compute.

    Abandoning the generator early (break / exception in the consumer)
    unblocks and stops the worker via the ``finally`` below — otherwise a
    worker stuck in ``q.put`` would pin ``depth`` assembled batches per
    abandoned epoch for the life of the process.
    """
    q: queue.Queue = queue.Queue(maxsize=depth)
    _SENTINEL = object()
    err: list[BaseException] = []
    stop = threading.Event()

    def worker():
        try:
            for item in it:
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # surfaced on the consumer side
            err.append(e)
        finally:
            # deliver the sentinel unless the consumer has abandoned us
            while not stop.is_set():
                try:
                    q.put(_SENTINEL, timeout=0.1)
                    break
                except queue.Full:
                    continue
    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()


def train_val_iterators(
    train_ds: ClipPairDataset,
    val_ds: Optional[ClipPairDataset],
    batch_size: int,
    seed: int,
    epoch: int,
) -> tuple[Iterator, Optional[Iterator]]:
    train_it = prefetch(
        batch_iterator(train_ds, batch_size, shuffle=True, seed=seed, epoch=epoch)
    )
    val_it = (
        prefetch(batch_iterator(val_ds, batch_size, shuffle=False, drop_last=True))
        if val_ds is not None and len(val_ds) >= batch_size
        else None
    )
    return train_it, val_it
