"""Micro-batching queue in front of the encoder.

SURVEY §2.1 (API row): "batched request queue in front of the encoder for
throughput". Concurrent API requests each encode a single item in the
reference; on TPU that wastes the chip (batch-1 forwards). This queue
coalesces concurrent encode requests into one padded batch per device
dispatch: callers block on a per-request future, a single worker drains the
queue with a small linger window and issues ONE bucketed jit call.

Throughput path only — single in-flight requests see at most ``linger_ms``
added latency.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from dataclasses import dataclass
from typing import Optional

import numpy as np

from clip_lora_match_tpu.core.logging import get_logger
from clip_lora_match_tpu.models.encoder import ClipEncoder

log = get_logger("batch_queue")


@dataclass
class _Request:
    kind: str  # "text" | "image"
    payload: object  # str | pixel array
    future: Future


class EncoderBatchQueue:
    def __init__(
        self,
        encoder: ClipEncoder,
        max_batch: int = 64,
        linger_ms: float = 2.0,
    ):
        self.encoder = encoder
        self.max_batch = max_batch
        self.linger = linger_ms / 1e3
        self._q: "queue.Queue[Optional[_Request]]" = queue.Queue()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._closed = False
        self._close_lock = threading.Lock()
        self._worker.start()

    # -- public API -----------------------------------------------------------

    def encode_text(self, text: str) -> np.ndarray:
        return self._submit("text", text).result()

    def encode_image(self, image) -> np.ndarray:
        return self._submit("image", image).result()

    def close(self) -> None:
        # _close_lock makes closed-flag + sentinel atomic vs _submit: without
        # it a request enqueued between the flag check and close()'s sentinel
        # would sit in a queue nobody drains and its future never resolve
        with self._close_lock:
            self._closed = True
            self._q.put(None)
        self._worker.join(timeout=5)
        # fail any requests that raced past the worker's shutdown
        while True:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                break
            if item is not None:
                item.future.set_exception(RuntimeError("queue closed"))

    # -- internals ------------------------------------------------------------

    def _submit(self, kind: str, payload) -> Future:
        with self._close_lock:
            if self._closed:
                raise RuntimeError("queue closed")
            req = _Request(kind, payload, Future())
            self._q.put(req)
        return req.future

    def _drain(self, first: _Request) -> list[_Request]:
        batch = [first]
        deadline = None
        while len(batch) < self.max_batch:
            import time

            if deadline is None:
                deadline = time.perf_counter() + self.linger
            timeout = deadline - time.perf_counter()
            if timeout <= 0:
                break
            try:
                item = self._q.get(timeout=timeout)
            except queue.Empty:
                break
            if item is None:
                self._q.put(None)  # re-signal shutdown
                break
            batch.append(item)
        return batch

    def _run(self) -> None:
        while True:
            item = self._q.get()
            if item is None:
                return
            batch = self._drain(item)
            by_kind: dict[str, list[_Request]] = {}
            for r in batch:
                by_kind.setdefault(r.kind, []).append(r)
            for kind, reqs in by_kind.items():
                try:
                    if kind == "text":
                        out = self.encoder.encode_text([r.payload for r in reqs])
                    else:
                        out = self.encoder.encode_image([r.payload for r in reqs])
                    for r, vec in zip(reqs, out):
                        r.future.set_result(np.asarray(vec))
                except Exception as e:
                    log.exception("batched %s encode failed", kind)
                    for r in reqs:
                        r.future.set_exception(e)


class QueuedEncoder:
    """Drop-in encoder facade that routes single-item text/image encodes
    through an EncoderBatchQueue (so concurrent service calls coalesce into
    one padded device batch) and everything else to the wrapped encoder.

    This is what actually wires the queue into the serving path:
    ``create_app(use_batch_queue=True)`` hands services a QueuedEncoder, and
    finder/seeker keep calling plain ``encode_text``/``encode_image``.
    """

    def __init__(self, encoder: ClipEncoder, **queue_kwargs):
        self._encoder = encoder
        self.queue = EncoderBatchQueue(encoder, **queue_kwargs)

    def encode_text(self, text, normalize: bool = True):
        if isinstance(text, str) and normalize:
            return self.queue.encode_text(text)
        return self._encoder.encode_text(text, normalize=normalize)

    def encode_image(self, image, normalize: bool = True):
        if not isinstance(image, (list, tuple)) and normalize:
            return self.queue.encode_image(image)
        return self._encoder.encode_image(image, normalize=normalize)

    def close(self) -> None:
        self.queue.close()

    def __getattr__(self, name):
        return getattr(self._encoder, name)
