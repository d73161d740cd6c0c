"""Grain-backed input pipeline (optional alternative to data/dataset.py).

SURVEY §2.1 maps the reference's torch DataLoader to a "grain/tf.data-style
or custom prefetcher" — the custom prefetcher is the default; this module
offers the same batches through `grain` (Google's deterministic JAX data
loader) when available, giving multi-worker parallel decode and reproducible
global shuffles for large corpora.

Same contract as data.dataset.batch_iterator: fixed-shape batch dicts of
pixel_values/input_ids/attention_mask, per-epoch deterministic order.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from clip_lora_match_tpu.data.dataset import ClipPairDataset


def grain_available() -> bool:
    try:
        import grain  # noqa: F401

        return True
    except ImportError:
        return False


def grain_batch_iterator(
    dataset: ClipPairDataset,
    batch_size: int,
    shuffle: bool = True,
    seed: int = 42,
    epoch: int = 0,
    drop_last: bool = True,
    num_workers: int = 0,
    read_buffer: int = 64,
) -> Iterator[dict[str, np.ndarray]]:
    """Yield batches via grain.MapDataset (multi-process decode when
    num_workers > 0)."""
    import grain.python as grain

    source = grain.MapDataset.source(dataset)
    if shuffle:
        # fold the epoch into the seed: fresh order per epoch, reproducible
        source = source.shuffle(seed=seed + epoch)
    ds = source.batch(batch_size, drop_remainder=drop_last)
    if num_workers > 0:
        ds = ds.to_iter_dataset(
            grain.ReadOptions(num_threads=num_workers, prefetch_buffer_size=read_buffer)
        )
    for batch in ds:
        if isinstance(batch, dict):
            yield {k: np.asarray(v) for k, v in batch.items()}
        else:  # list of per-item dicts
            yield {
                k: np.stack([np.asarray(item[k]) for item in batch])
                for k in batch[0]
            }
